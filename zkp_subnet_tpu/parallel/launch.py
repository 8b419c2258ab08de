"""Multi-host pod-slice launch: the ops layer replacing pm2/docker.

The reference deploys miners/validators as pm2 processes per host with a
Makefile (reference: Makefile:63-144) and a docker localnet
(docker-compose.yml:3-50, scripts/localnet.sh). A TPU pod slice needs none
of that: every host runs THE SAME program under `jax.distributed`, the mesh
assigns each host its Pianist workers, and the coordinator role lives on
process 0. This module is that single entry point:

    # on every host of the slice (GCE TPU VM, GKE, or manual):
    python -m zkp_subnet_tpu.parallel.launch --rounds 100 --scale 20 \
        --machines-scale 8 [--coordinator-address host0:8476 \
        --num-processes N --process-id i]

On Cloud TPU the three jax.distributed flags are auto-detected from the TPU
metadata; pass them explicitly anywhere else (parity with the reference's
per-host `make miner`/`make validator` split, collapsed into one SPMD
program).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from typing import Optional

import jax

log = logging.getLogger("zkp_subnet_tpu.launch")


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Bring up the jax.distributed runtime; no-op on a single process.

    Returns this host's process index. Safe to call when already
    initialized (re-raises only on genuine config errors).
    """
    if num_processes in (None, 1) and coordinator_address is None:
        return 0
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError as exc:        # already initialized
        if "already" not in str(exc).lower():
            raise
    return jax.process_index()


def launch(args) -> int:
    """SPMD entry: same binary on every host; process 0 narrates."""
    pid = initialize_distributed(args.coordinator_address,
                                 args.num_processes, args.process_id)
    is_lead = pid == 0
    devs = jax.devices()
    if is_lead:
        log.info("slice up: %d processes, %d global devices (%s)",
                 jax.process_count(), len(devs), devs[0].platform)

    from .pianist import make_mesh, shard_srs, prove, fft
    from ..models import pianist as pn
    from ..models.srs import Srs, default_paths

    machines = 1 << args.machines_scale
    n = len(devs)
    n_batch = max(1, n // machines)
    mesh = make_mesh(n_machines=min(machines, n), n_batch=n_batch)

    setup_p, pre_p = default_paths(args.srs_dir, args.scale,
                                   args.machines_scale)
    try:
        srs = Srs.load(setup_p, pre_p, lazy=True)
        if is_lead:
            log.info("loaded SRS from %s", setup_p)
    except FileNotFoundError:
        if is_lead:
            log.info("generating SRS scale=%d machines_scale=%d",
                     args.scale, args.machines_scale)
        srs = Srs.generate(args.scale, args.machines_scale, seed=args.seed)
        if is_lead:
            os.makedirs(args.srs_dir, exist_ok=True)
            srs.save(setup_p, pre_p)
    srs = shard_srs(srs, mesh)

    key = jax.random.PRNGKey(args.seed)
    for step in range(args.rounds):
        key, k_rows, k_alpha, k_beta = jax.random.split(key, 4)
        rows = pn._uniform_fr(k_rows, (n_batch, srs.machines, srs.row_size))
        alpha = pn.random_point(k_alpha)
        beta = pn._uniform_fr(k_beta, (n_batch,))
        coeff = fft(rows, mesh, left=True, inverse=True)
        out = prove(srs, coeff, alpha, beta, mesh)
        jax.block_until_ready(out.value)
        if is_lead:
            log.info("round %d: %d sub-proofs aggregated", step,
                     n_batch * srs.machines)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="zkp_subnet_tpu.parallel.launch")
    p.add_argument("--coordinator-address", default=None,
                   help="host:port of process 0 (auto on Cloud TPU)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--rounds", type=int, default=10)
    p.add_argument("--scale", type=int, default=18)
    p.add_argument("--machines-scale", dest="machines_scale", type=int,
                   default=8)
    p.add_argument("--srs-dir", default="./artifacts")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    return launch(args)


if __name__ == "__main__":
    sys.exit(main())
