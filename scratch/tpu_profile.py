"""Probe: does jax.profiler capture a device xplane through the axon tunnel?

Through the tunneled axon platform the device-side xplane has come back
EMPTY every round (r4, r5) — host traces only — which is why all kernel
attribution in PROFILE.md is differential (chained in-jit repetition,
scratch/tpu_lmul.py) instead of trace-based. Re-run this after any runtime
upgrade; if it starts printing device events, switch the profiling story
back to real traces (bench.py --stage headline with BENCH_PROFILE=<dir>
already records one).
"""

import glob
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    out = tempfile.mkdtemp(prefix="zkp_xplane_")
    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((1024, 1024), jnp.bfloat16)
    np.asarray(jax.device_get(f(x)))                     # compile
    with jax.profiler.trace(out):
        np.asarray(jax.device_get(f(x)))
    traces = glob.glob(os.path.join(out, "**", "*.xplane.pb"),
                       recursive=True)
    print(f"backend={jax.default_backend()}  trace dir: {out}")
    for t in traces:
        print(f"  {os.path.basename(t)}: {os.path.getsize(t)} bytes")
    if not traces:
        print("  NO xplane files captured")
    sizes = [os.path.getsize(t) for t in traces]
    # heuristic: a real device xplane for a 1k matmul is >> 10 kB
    if any(s > 10_000 for s in sizes):
        print("device xplane PRESENT — trace-based profiling is back")
    else:
        print("device xplane EMPTY/absent — keep using differential "
              "attribution (scratch/tpu_lmul.py)")


if __name__ == "__main__":
    main()
