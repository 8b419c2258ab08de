"""Mainnet-shape validation: scale 24 / machines 8 (reference: Makefile:63-87).

The reference's production artifacts are ``setup_24_8`` / ``precompute_24_8``
— a degree-2^24 bivariate circuit split over 256 workers with 2^16-coefficient
rows. This script exercises that exact shape end-to-end on the TPU:

  1. ``setup`` CLI: streaming generation into the 4.8 GB sidecar
     (Srs.generate_to_disk) + sha256 manifest;
  2. ``check`` CLI: manifest + pairing spot-checks over the artifacts;
  3. lazy load (worker_bases stays a host memmap), prove ONE worker's
     2^16 row (commit + open, timed, the 30 s challenge-deadline shape,
     reference: neurons/validator.py:206), verify by pairing.

Prints one JSON line with generation time, artifact sizes, prove time and
verify result. Run standalone on the TPU host:  python scratch/mainnet_24_8.py
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ART = os.path.join(REPO, "artifacts")
SETUP = os.path.join(ART, "setup_24_8.npz")
PRE = os.path.join(ART, "precompute_24_8.npz")
SIDECAR = PRE + ".bases.npy"


def main():
    os.makedirs(ART, exist_ok=True)
    out = {"scale": 24, "machines_scale": 8}

    if not (os.path.exists(SETUP) and os.path.exists(PRE)
            and os.path.exists(SIDECAR)):
        t0 = time.time()
        subprocess.run(
            [sys.executable, "-m", "zkp_subnet_tpu", "setup",
             "--scale", "24", "--machines-scale", "8",
             "--setup-path", SETUP, "--precompute-path", PRE,
             "--generate-setup", "--generate-precompute", "--overwrite"],
            cwd=REPO, check=True)
        out["generate_s"] = round(time.time() - t0, 1)

    out["setup_bytes"] = os.path.getsize(SETUP)
    out["precompute_bytes"] = os.path.getsize(PRE)
    out["sidecar_bytes"] = os.path.getsize(SIDECAR)

    t0 = time.time()
    rc = subprocess.run(
        [sys.executable, "-m", "zkp_subnet_tpu", "check",
         "--setup-path", SETUP, "--precompute-path", PRE],
        cwd=REPO).returncode
    out["check_s"] = round(time.time() - t0, 1)
    out["check_ok"] = rc == 0

    # prove + verify one row in-process (fresh TPU client)
    import numpy as np
    import jax
    from zkp_subnet_tpu.models.srs import Srs
    from zkp_subnet_tpu.models import pianist
    from zkp_subnet_tpu.ops import curve as cv
    from zkp_subnet_tpu.ops.field import FR

    srs = Srs.load(SETUP, PRE, lazy=True)
    assert isinstance(srs.worker_bases, np.ndarray)       # host memmap
    key = jax.random.PRNGKey(17)
    row = pianist._uniform_fr(key, (srs.row_size,))
    alpha = pianist.random_point(jax.random.fold_in(key, 1))

    def force(x):
        return jax.tree_util.tree_map(
            lambda a: np.asarray(jax.device_get(a)), x)

    t0 = time.time()
    com = force(pianist.worker_commit(srs, 0, row))
    y, prf = force(pianist.worker_open(srs, 0, row, alpha))
    out["prove_first_s"] = round(time.time() - t0, 1)     # incl. compile +
    t0 = time.time()                                      # 18 MB slice xfer
    com = force(pianist.worker_commit(srs, 0, row))
    y, prf = force(pianist.worker_open(srs, 0, row, alpha))
    out["prove_row_s"] = round(time.time() - t0, 3)

    alpha_int = FR.decode(np.asarray(force(alpha))[None])[0]
    y_int = FR.decode(np.asarray(y)[None])[0]
    ok = pianist.worker_verify(
        srs, 0, cv.g1_decode(np.asarray(prf)[None])[0], alpha_int, y_int,
        cv.g1_decode(np.asarray(com)[None])[0])
    out["verify_ok"] = bool(ok)
    out["within_deadline"] = out["prove_row_s"] <= 30.0
    print(json.dumps(out))


if __name__ == "__main__":
    main()
