"""Headline benchmark: one Pianist worker's mainnet-scale proving task.

The reference's production configuration is scale 24 / machines_scale 8
(reference: Makefile:63-87): each worker owns a 2^16-coefficient row and must
KZG-commit + open it within the 30-second challenge deadline on a ≥8-core CPU
(reference: neurons/validator.py:206, README.md:54-59). The reference
publishes no throughput numbers (BASELINE.md), so that deadline is the
baseline: vs_baseline = 30 s / our wall time for commit+open of one row.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Diagnostics go to stderr. Bases are cached under artifacts/.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

LOG_T = int(os.environ.get("BENCH_LOG_T", "16"))
BASELINE_S = 30.0
ITERS = int(os.environ.get("BENCH_ITERS", "3"))


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def load_or_make_bases(n: int):
    """[τ^j]G1 for j < n — a real SRS row, cached on disk."""
    import jax
    import jax.numpy as jnp
    from zkp_subnet_tpu.ops.field import FR, FQ
    from zkp_subnet_tpu.ops import curve as cv
    from zkp_subnet_tpu.utils import oracle as o

    path = os.path.join(REPO, "artifacts", f"bench_bases_{LOG_T}.npy")
    if os.path.exists(path):
        log(f"loading bases from {path}")
        return jnp.asarray(np.load(path))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    log(f"generating {n} SRS bases (one-time)...")
    tau = 0x1F2E3D4C5B6A79880123456789ABCDEF1122334455667788  # fixed test tau
    t0 = time.time()
    pow_tau = FR.from_mont(FR.powers(FR.encode([tau])[0], n))
    gen = cv.g1_encode([o.G1.from_affine(o.G1_GEN)])[0]
    # chunked: one fixed-shape compiled program, bounded device memory
    chunk = min(n, 4096)
    gen_b = jnp.broadcast_to(gen, (chunk, 3, FQ.L))
    pieces = []
    for off in range(0, n, chunk):
        out = cv.g1_scalar_mul(gen_b, pow_tau[off:off + chunk])
        pieces.append(np.asarray(jax.device_get(out), dtype=np.uint32))
        log(f"  bases {off + chunk}/{n} at {round(time.time() - t0, 1)}s")
    host = np.concatenate(pieces, axis=0)
    np.save(path, host)
    log(f"bases generated in {round(time.time() - t0, 1)}s")
    return jnp.asarray(host)


def main():
    import jax
    import jax.numpy as jnp
    import zkp_subnet_tpu  # noqa: F401  (enables the persistent compile cache)
    from zkp_subnet_tpu.ops.field import FR
    from zkp_subnet_tpu.models import kzg
    from zkp_subnet_tpu.models import pianist as pn

    log("backend:", jax.default_backend(), jax.devices()[:1])
    n = 1 << LOG_T
    bases = load_or_make_bases(n)

    @jax.jit
    def prove_row(bases, row, x):
        com = kzg.commit(bases, row)
        y, prf = kzg.open_(bases, row, x)
        return com, y, prf

    key = jax.random.PRNGKey(42)
    rows = [pn._uniform_fr(jax.random.fold_in(key, i), (n,))
            for i in range(ITERS + 1)]
    xs = [pn.random_point(jax.random.fold_in(key, 100 + i))
          for i in range(ITERS + 1)]

    t0 = time.time()
    jax.block_until_ready(prove_row(bases, rows[0], xs[0]))
    log(f"compile+first run: {round(time.time() - t0, 1)}s")

    times = []
    for i in range(1, ITERS + 1):
        t0 = time.time()
        jax.block_until_ready(prove_row(bases, rows[i], xs[i]))
        times.append(time.time() - t0)
    best = min(times)
    log(f"runs: {[round(t, 3) for t in times]}s")

    print(json.dumps({
        "metric": f"pianist_row_commit_open_2^{LOG_T}",
        "value": round(best * 1000.0, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_S / best, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
