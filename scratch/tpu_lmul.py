"""Chained field-kernel cost attribution on the TPU (PROFILE.md).

A single forced call through the axon tunnel carries ~300-600 ms of RPC
latency, so every kernel number here comes from K in-jit CHAINED repetitions
(fori_loop) and is reported as delta/(K_hi - K_lo) — the marginal per-op
device time, immune to the tunnel floor.

Usage:  python scratch/tpu_lmul.py [lanes]
Knobs:  ZKP_PALLAS_TILE (256/512/1024), ZKP_MUL_SCHOOLBOOK (grouped|skew),
        ZKP_PALLAS_CANONS.
Prints per-op ms for: lazy lmul, lazy ladd, canonical mont_mul, lazy
point-add (g19_add_seq through the per-op kernels).
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    from zkp_subnet_tpu.ops import lane8 as l8
    from zkp_subnet_tpu.ops import lazy8 as lz
    from zkp_subnet_tpu.ops import pallas_g1 as pg
    from zkp_subnet_tpu.ops.field import FQ

    print(f"backend={jax.default_backend()} lanes={lanes} "
          f"TILE={pg.TILE} schoolbook={l8._SCHOOLBOOK}", file=sys.stderr)

    rng = np.random.default_rng(5)
    vals = [int.from_bytes(rng.bytes(47), "little") for _ in range(2)]
    x48 = jnp.broadcast_to(
        l8.to_lane8(FQ.encode_vec([vals[0]]))[..., 0:1], (48, lanes)) * 1.0
    y48 = jnp.broadcast_to(
        l8.to_lane8(FQ.encode_vec([vals[1]]))[..., 0:1], (48, lanes)) * 1.0
    x49 = jnp.pad(x48, [(0, 1), (0, 0)])
    y49 = jnp.pad(y48, [(0, 1), (0, 0)])

    def chain(opname, F, x, y, k):
        @jax.jit
        def run(x, y):
            def body(_, v):
                return pg.pfield(opname, F, v, y)
            return jax.lax.fori_loop(0, k, body, x)
        return run

    def measure(label, mk, x, y, klo=8, khi=72):
        f_lo, f_hi = mk(klo), mk(khi)
        np.asarray(jax.device_get(f_lo(x, y)))          # compile both
        np.asarray(jax.device_get(f_hi(x, y)))
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(jax.device_get(f_lo(x, y)))
            t1 = time.time()
            np.asarray(jax.device_get(f_hi(x, y)))
            ts.append((time.time() - t1) - (t1 - t0))
        per = np.median(ts) / (khi - klo)
        print(f"{label}: {per * 1000:.3f} ms/op at {lanes} lanes")
        return per

    measure("lazy lmul   ", lambda k: chain("mont_mul", lz.ZFQ, x49, y49, k),
            x49, y49)
    measure("lazy ladd   ", lambda k: chain("add", lz.ZFQ, x49, y49, k),
            x49, y49)
    measure("canon mont_mul", lambda k: chain("mont_mul", l8.BFQ, x48, y48, k),
            x48, y48)

    # lazy complete point-add through the per-op kernels
    p = jnp.stack([x49, y49, lz.ZFQ.ones((lanes,))], axis=0)

    def mk_padd(k):
        @jax.jit
        def run(p, q):
            def body(_, v):
                return pg.dispatch_ladd(v, q)
            return jax.lax.fori_loop(0, k, body, p)
        return run

    measure("lazy point-add", mk_padd, p, p, klo=4, khi=20)


if __name__ == "__main__":
    main()
