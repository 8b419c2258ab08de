"""Minimal repro: the axon TPU worker deterministically faults EXECUTING any
single >= 2^21-point MSM program.

WARNING: running this kills the TPU worker for every process sharing the
tunnel — run it ONLY to test a runtime/toolchain upgrade.

Evidence trail (r4-r5 bisect):
- 2^20 MSM programs compile AND execute fine (bench.py msm_20 stage).
- The same msm() program at 2^21 COMPILES fine; the fault happens at
  execute time, after the scalar inputs are transferred: the worker
  disconnects mid-call and every subsequent RPC returns UNAVAILABLE.
- Independent of engine (canonical uint32 lane engine r3, byte-limb f32
  engine r4, lazy 49-limb engine r5) and of window_bits (4 and 8 tried),
  which rules out one specific kernel body: the common factor is program
  *size/liveness* (2^21 points = 1.2 GB of f32 lane arrays live across the
  bucket scan), pointing at the axon worker's memory accounting, not at a
  math bug. The MSM itself is correct at 2^21+ when sliced (the sliced
  results are oracle-checked in bench.py msm_22 self-check).
- Mitigation in-tree: ops/msm.py msm_auto() slices any N > ZKP_MSM_MAX_N
  (default 2^20) into separate 2^20-point programs and point-adds the
  partials; remove the cap once this script survives on a fixed runtime.

Expected on a healthy runtime: prints the MSM result checksum and exits 0.
Observed (r4, r5): the jax.device_get never returns / the client raises
UNAVAILABLE and the worker process on the far side of the tunnel is gone.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    n = 1 << 21
    os.environ["ZKP_MSM_MAX_N"] = str(n)      # disable the slicing mitigation
    from zkp_subnet_tpu.ops import msm as jmsm
    from zkp_subnet_tpu.ops import curve as cv
    from zkp_subnet_tpu.utils import oracle as o

    print(f"backend={jax.default_backend()}; building {n}-point MSM "
          f"(ONE program, no slicing)...", file=sys.stderr)
    g = cv.g1_encode([o.G1.from_affine(o.G1_GEN)])
    pts = jnp.broadcast_to(g[0], (n, 3, 24))
    base = np.zeros((1 << 16, 16), np.uint32)         # canonical 16-bit limbs
    base[:, 0] = np.arange(1, (1 << 16) + 1)
    sc = jnp.tile(jnp.asarray(base), (n >> 16, 1))
    print("executing (this is where the r4/r5 worker dies)...",
          file=sys.stderr)
    out = np.asarray(jax.device_get(jmsm.msm(pts, sc)))
    print(f"SURVIVED: result checksum {int(out.sum())} — the runtime is "
          f"fixed; consider removing the ZKP_MSM_MAX_N slicing cap.")


if __name__ == "__main__":
    main()
