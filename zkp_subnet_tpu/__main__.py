"""CLI: ``python -m zkp_subnet_tpu <command>``.

``setup`` is flag-parity with the reference prover's CLI
(reference: tests/conftest.py:50-65):
    fourier setup --setup-path P --precompute-path P --scale N
        --machines-scale M --generate-setup --generate-precompute --overwrite

``round`` runs one full coordinator challenge round against in-process
workers (the reference's miner/validator loop collapsed onto one host), and
``aggregate`` additionally folds the sub-proofs into one bivariate proof.
``run`` is the continuous validator loop (reference:
base/validator.py:128-180): concurrent forwards, epoch-cadenced weight
emission, state checkpointing each sync.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

# CLI polish, best-effort: XLA:CPU logs a benign-but-noisy cpu_aot_loader
# E-line for every persistent-cache entry (pseudo-features like
# +prefer-no-scatter are absent from its host feature probe); the cache
# still hits. TF_CPP_MIN_LOG_LEVEL alone does not silence it (the line is
# emitted at glog ERROR severity before TSL applies the TF filter), so the
# absl floor is raised too. Some jaxlib builds still print it; that is
# cosmetic — real failures surface as Python exceptions regardless.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("ABSL_MIN_LOG_LEVEL", "3")


def _setup(args) -> int:
    from .models.srs import Srs

    for path, gen in ((args.setup_path, args.generate_setup),
                      (args.precompute_path, args.generate_precompute)):
        if gen and os.path.exists(path) and not args.overwrite:
            print(f"refusing to overwrite {path} (pass --overwrite)",
                  file=sys.stderr)
            return 1
    if (1 << args.scale) > Srs._SIDE_CAR_LIMIT:
        # mainnet-class shapes (scale 24/8 reference: Makefile:63-87):
        # stream chunks straight into the sidecar — never materializes the
        # multi-GB worker_bases on device or host
        def progress(done, total):
            print(f"  worker slices {done}/{total}", file=sys.stderr)
        Srs.generate_to_disk(
            scale=args.scale, machines_scale=args.machines_scale,
            seed=args.seed, setup_path=args.setup_path,
            precompute_path=args.precompute_path, progress=progress)
    else:
        srs = Srs.generate(scale=args.scale,
                           machines_scale=args.machines_scale, seed=args.seed)
        srs.save(args.setup_path, args.precompute_path)
    # integrity manifest for `check` (the reference trusts its S3 download;
    # here artifact integrity is verifiable offline)
    import hashlib
    paths = [args.setup_path, args.precompute_path]
    sidecar = Srs._sidecar_path(args.precompute_path)
    if os.path.exists(sidecar):
        paths.append(sidecar)
    with open(args.setup_path + ".sha256", "w") as f:
        for path in paths:
            h = hashlib.sha256()
            with open(path, "rb") as src:          # stream: sidecar is GBs
                for block in iter(lambda: src.read(1 << 24), b""):
                    h.update(block)
            f.write(f"{h.hexdigest()}  {os.path.basename(path)}\n")
    print(f"wrote {args.setup_path} and {args.precompute_path} "
          f"(scale={args.scale}, machines_scale={args.machines_scale})")
    return 0


def _load_srs(args):
    from .models.srs import Srs
    if os.path.exists(args.setup_path) and os.path.exists(
            args.precompute_path):
        # lazy: a mainnet-size sidecar stays a host memmap and each worker
        # transfers only its own (row_size, 3, L) slice on first prove
        return Srs.load(args.setup_path, args.precompute_path, lazy=True)
    print("setup files not found; generating in-memory SRS", file=sys.stderr)
    return Srs.generate(scale=args.scale,
                        machines_scale=args.machines_scale, seed=args.seed)


def _round(args) -> int:
    from .runtime import (Coordinator, CoordinatorConfig, LocalTransport,
                          ProverConfig, Worker, WorkerConfig)

    srs = _load_srs(args)
    m = srs.machines
    prover = ProverConfig(scale=srs.scale,
                          machines_scale=srs.machines_scale,
                          setup_path=args.setup_path,
                          precompute_path=args.precompute_path)
    hotkeys = [f"worker-{i}" for i in range(m)]
    workers = {i: Worker(srs, WorkerConfig(prover=prover),
                         members=set(hotkeys)) for i in range(m)}
    coord = Coordinator(
        srs, CoordinatorConfig(prover=prover, sample_size=m,
                               timeout=args.timeout), hotkeys=hotkeys)
    transport = LocalTransport(workers)

    # compile before the clock starts — the challenge deadline measures
    # proving, not XLA compilation (workers share the cached program)
    print(f"warmup: {workers[0].warmup():.1f}s", file=sys.stderr)

    challenge, responses, rewards = coord.run_round(transport)
    for r, rew in zip(responses, rewards):
        print(f"worker {r.index}: reward={rew:.3f} "
              f"t={r.process_time and round(r.process_time, 3)}s")

    if args.aggregate:
        agg, alpha, beta = coord.aggregate_responses(challenge, responses)
        ok = coord.verify_aggregated(agg, alpha, beta)
        print(f"aggregated bivariate proof verifies: {ok}")
        if not ok:
            return 1
    uids, weights = coord.set_weights()
    print(f"weights: {dict(zip(uids.tolist(), weights.tolist()))}")
    return 0


def _run(args) -> int:
    """Continuous loop: ``run --rounds K`` exercises the epoch cadence."""
    import asyncio

    from .runtime import (Coordinator, CoordinatorConfig, LocalTransport,
                          ProverConfig, Worker, WorkerConfig)

    srs = _load_srs(args)
    m = srs.machines
    prover = ProverConfig(scale=srs.scale,
                          machines_scale=srs.machines_scale,
                          setup_path=args.setup_path,
                          precompute_path=args.precompute_path)
    hotkeys = [f"worker-{i}" for i in range(m)]
    workers = {i: Worker(srs, WorkerConfig(prover=prover),
                         members=set(hotkeys)) for i in range(m)}
    cfg = CoordinatorConfig(
        prover=prover, sample_size=m, timeout=args.timeout,
        epoch_length=args.epoch_length,
        num_concurrent_forwards=args.num_concurrent_forwards,
        disable_set_weights=args.disable_set_weights,
        state_dir=args.state_dir)
    coord = Coordinator(srs, cfg, hotkeys=hotkeys)
    if coord.load_state():
        print(f"resumed from {cfg.state_dir}/state.npz at step {coord.step}")
    print(f"warmup: {workers[0].warmup():.1f}s", file=sys.stderr)
    ok = asyncio.run(coord.run(LocalTransport(workers), rounds=args.rounds))
    uids, weights = coord.last_weights or ((), ())
    print(f"{ok} forwards ok, step={coord.step}, "
          f"last_weights_step={coord.last_weights_step}, "
          f"scores_max={coord.scores.max():.3f}")
    print(f"state saved to {coord.save_state()}")
    return 0 if ok > 0 else 1


def _check(args) -> int:
    """Validate SRS artifacts cryptographically + by checksum manifest.

    The reference distributes production SRS files and trusts the transport
    (S3 download, Makefile:30-48); here integrity is checked in-process:
    pairing consistency of the powers, the Lagrange partition of unity, and
    a sha256 manifest written at setup time (the fetch/verify story of
    SURVEY.md §2.12 without a network)."""
    import hashlib
    from .models.srs import Srs
    from .ops import curve as cv
    from .utils import native, oracle as o

    failures = []

    def report(name: str, ok: bool):
        print(f"  {'PASS' if ok else 'FAIL'}  {name}")
        if not ok:
            failures.append(name)

    # 1. checksum manifest (written by `setup`, optional for older artifacts)
    manifest = args.setup_path + ".sha256"
    if os.path.exists(manifest):
        want = dict(line.split()[::-1] for line in
                    open(manifest).read().splitlines() if line.strip())
        for path in (args.setup_path, args.precompute_path,
                     Srs._sidecar_path(args.precompute_path)):
            base = os.path.basename(path)
            if base in want and os.path.exists(path):
                h = hashlib.sha256()
                with open(path, "rb") as src:      # stream: sidecar is GBs
                    for block in iter(lambda: src.read(1 << 24), b""):
                        h.update(block)
                report(f"sha256 {base}", h.hexdigest() == want[base])
    else:
        print(f"  note: no manifest at {manifest}")

    # lazy: a mainnet-size sidecar stays a host memmap; the checks below
    # touch only worker_bases[:, :2]
    srs = Srs.load(args.setup_path, args.precompute_path, lazy=True)
    g = o.G1.from_affine(o.G1_GEN)
    g2 = srs.g2_gen
    g1x = cv.g1_decode(srs.g1_x[:min(4, srs.row_size)])
    report("g1_x[0] == G1 generator",
           o.G1.to_affine(g1x[0]) == o.G1_GEN)
    # e(g1_x[j+1], G2) == e(g1_x[j], [tau]G2): consecutive powers consistent
    for j in range(len(g1x) - 1):
        ok = native.pairing_check([
            (g1x[j + 1], o.G2.neg(g2)), (g1x[j], srs.g2_tau_x)])
        report(f"e(g1_x[{j + 1}], G2) == e(g1_x[{j}], [tau_x]G2)", ok)
    # Lagrange partition of unity: sum_i [R_i(tau_y)]G1 == G1
    lag = cv.g1_decode(srs.lagrange_y)
    acc = o.G1.infinity()
    for p in lag:
        acc = o.G1.add(acc, p)
    report("sum_i lagrange_y[i] == G1 (partition of unity)",
           o.G1.to_affine(acc) == o.G1_GEN)
    # worker bases anchor: U_i[0] == V_i for each worker
    u0 = cv.g1_decode(srs.worker_bases[:, 0])
    ok = all(o.G1.to_affine(a) == o.G1.to_affine(b)
             for a, b in zip(u0, lag))
    report("worker_bases[i][0] == lagrange_y[i]", ok)
    # worker bases power step: e(U_i[1], G2) == e(U_i[0], [tau_x]G2)
    u1 = cv.g1_decode(srs.worker_bases[:, 1])
    ok = all(native.pairing_check([(b, o.G2.neg(g2)), (a, srs.g2_tau_x)])
             for a, b in zip(u0, u1))
    report("e(worker_bases[i][1], G2) == e(worker_bases[i][0], [tau_x]G2)",
           ok)

    if failures:
        print(f"{len(failures)} check(s) FAILED")
        return 1
    print("all checks passed")
    return 0


def _serve(args) -> int:
    """Standalone worker process: the reference's miner surface (axon +
    localhost prover RPC, base/miner.py:62-84) as one HTTP server."""
    from .runtime import ProverConfig, Worker, WorkerConfig
    from .runtime.server import WorkerServer

    srs = _load_srs(args)
    prover = ProverConfig(scale=srs.scale, machines_scale=srs.machines_scale,
                          setup_path=args.setup_path,
                          precompute_path=args.precompute_path)
    worker = Worker(srs, WorkerConfig(prover=prover,
                                      allow_non_registered=True))
    print(f"warmup: {worker.warmup():.1f}s", file=sys.stderr)
    server = WorkerServer(worker, host=args.host, port=args.port,
                          seed=args.seed)
    server.serve_forever()
    return 0


def _localnet(args) -> int:
    """Local multi-process network: N worker server processes + a scoring
    coordinator over HTTP — the reference's docker localnet
    (docker-compose.yml:3-50, scripts/localnet.sh) without containers."""
    import socket
    import subprocess
    import time as _time

    from .runtime import Coordinator, CoordinatorConfig
    from .runtime.server import HttpTransport

    srs = _load_srs(args)
    n = args.workers
    ports = []
    for _ in range(n):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            ports.append(s.getsockname()[1])
    def spawn(i: int):
        return subprocess.Popen(
            [sys.executable, "-m", "zkp_subnet_tpu", "serve",
             "--setup-path", args.setup_path,
             "--precompute-path", args.precompute_path,
             "--scale", str(args.scale),
             "--machines-scale", str(args.machines_scale),
             "--port", str(ports[i]), "--seed", str(100 + i)])

    procs = []
    try:
        for i in range(n):
            procs.append(spawn(i))
        # wait for every server to accept (includes worker warmup)
        deadline = _time.time() + args.spawn_timeout
        for port in ports:
            while True:
                try:
                    socket.create_connection(("127.0.0.1", port),
                                             timeout=2).close()
                    break
                except OSError:
                    if _time.time() > deadline:
                        print(f"worker on :{port} never came up",
                              file=sys.stderr)
                        return 1
                    _time.sleep(1)
        print(f"{n} worker processes serving on {ports}", file=sys.stderr)

        # worker supervision: respawn dead worker processes, the analog of
        # the reference's restart-forever loops
        # (reference: scripts/miner_setup.sh:16-19 — `while true; do ...
        # python miner.py; done`). The coordinator's catch-and-continue
        # round loop rides through the outage; the respawned worker
        # re-warms and serves again.
        import threading
        stop = threading.Event()

        def supervise():
            while not stop.wait(1.0):
                for i in range(n):
                    rc = procs[i].poll()
                    if rc is not None:
                        print(f"worker {i} (:{ports[i]}) died rc={rc}; "
                              "respawning", file=sys.stderr)
                        procs[i] = spawn(i)

        sup = threading.Thread(target=supervise, daemon=True)
        if args.supervise:
            sup.start()

        if getattr(args, "chaos_kill_after", 0):
            # test hook: hard-kill worker 0 after N seconds to demonstrate
            # supervision (the reference's restart loop is exercised the
            # same way: kill the miner, watch it come back)
            def chaos():
                _time.sleep(args.chaos_kill_after)
                print("chaos: killing worker 0", file=sys.stderr)
                procs[0].kill()
            threading.Thread(target=chaos, daemon=True).start()

        m = srs.machines
        hotkeys = [f"local-{i}" for i in range(m)]
        urls = {u: f"http://127.0.0.1:{ports[u % n]}" for u in range(m)}
        coord = Coordinator(
            srs, CoordinatorConfig(sample_size=m, timeout=args.timeout),
            hotkeys=hotkeys, seed=args.seed)
        import asyncio
        ok = asyncio.run(coord.run(HttpTransport(urls), rounds=args.rounds))
        stop.set()
        uids, weights = coord.set_weights()
        print(f"{ok}/{args.rounds} rounds ok over {n} worker processes; "
              f"weights: {dict(zip(uids.tolist(), weights.tolist()))}")
        return 0 if ok == args.rounds else 1
    finally:
        for p in procs:                     # exact child PIDs only
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="zkp_subnet_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("setup", help="generate SRS + worker precompute")
    sp.add_argument("--setup-path", "--setup_path", dest="setup_path",
                    default="./setup.npz")
    sp.add_argument("--precompute-path", "--precompute_path",
                    dest="precompute_path", default="./precompute.npz")
    sp.add_argument("--scale", type=int, default=18)
    sp.add_argument("--machines-scale", "--machines_scale",
                    dest="machines_scale", type=int, default=8)
    sp.add_argument("--generate-setup", dest="generate_setup",
                    action="store_true")
    sp.add_argument("--generate-precompute", dest="generate_precompute",
                    action="store_true")
    sp.add_argument("--overwrite", action="store_true")
    sp.add_argument("--seed", type=int, default=0)
    sp.set_defaults(fn=_setup)

    for name, agg in (("round", False), ("aggregate", True)):
        rp = sub.add_parser(name, help="run one challenge round"
                            + (" + aggregation" if agg else ""))
        rp.add_argument("--setup-path", dest="setup_path",
                        default="./setup.npz")
        rp.add_argument("--precompute-path", dest="precompute_path",
                        default="./precompute.npz")
        rp.add_argument("--scale", type=int, default=6)
        rp.add_argument("--machines-scale", dest="machines_scale",
                        type=int, default=2)
        rp.add_argument("--timeout", type=float, default=30.0)
        rp.add_argument("--seed", type=int, default=0)
        rp.set_defaults(fn=_round, aggregate=agg)

    lp = sub.add_parser("run", help="continuous validator loop")
    lp.add_argument("--setup-path", dest="setup_path", default="./setup.npz")
    lp.add_argument("--precompute-path", dest="precompute_path",
                    default="./precompute.npz")
    lp.add_argument("--scale", type=int, default=6)
    lp.add_argument("--machines-scale", dest="machines_scale",
                    type=int, default=2)
    lp.add_argument("--timeout", type=float, default=30.0)
    lp.add_argument("--seed", type=int, default=0)
    lp.add_argument("--rounds", type=int, default=10)
    lp.add_argument("--neuron.epoch_length", dest="epoch_length",
                    type=int, default=100)
    lp.add_argument("--neuron.num_concurrent_forwards",
                    dest="num_concurrent_forwards", type=int, default=1)
    lp.add_argument("--neuron.disable_set_weights",
                    dest="disable_set_weights", action="store_true")
    lp.add_argument("--neuron.state_dir", dest="state_dir",
                    default="./state")
    lp.set_defaults(fn=_run)

    cp = sub.add_parser("check", help="validate SRS artifacts (pairing "
                        "consistency + sha256 manifest)")
    cp.add_argument("--setup-path", dest="setup_path", default="./setup.npz")
    cp.add_argument("--precompute-path", dest="precompute_path",
                    default="./precompute.npz")
    cp.set_defaults(fn=_check)

    vp = sub.add_parser("serve", help="standalone worker HTTP server "
                        "(prover RPC + Prove synapse surface)")
    vp.add_argument("--setup-path", dest="setup_path", default="./setup.npz")
    vp.add_argument("--precompute-path", dest="precompute_path",
                    default="./precompute.npz")
    vp.add_argument("--scale", type=int, default=6)
    vp.add_argument("--machines-scale", dest="machines_scale",
                    type=int, default=2)
    vp.add_argument("--host", default="127.0.0.1")
    vp.add_argument("--port", type=int, default=1337)
    vp.add_argument("--seed", type=int, default=0)
    vp.set_defaults(fn=_serve)

    np_ = sub.add_parser("localnet", help="spawn N worker server processes "
                         "and score them over HTTP (docker-localnet analog)")
    np_.add_argument("--setup-path", dest="setup_path",
                     default="./setup.npz")
    np_.add_argument("--precompute-path", dest="precompute_path",
                     default="./precompute.npz")
    np_.add_argument("--scale", type=int, default=6)
    np_.add_argument("--machines-scale", dest="machines_scale",
                     type=int, default=2)
    np_.add_argument("--workers", type=int, default=2)
    np_.add_argument("--rounds", type=int, default=1)
    np_.add_argument("--no-supervise", dest="supervise",
                     action="store_false", default=True,
                     help="disable automatic respawn of dead workers")
    np_.add_argument("--chaos-kill-after", dest="chaos_kill_after",
                     type=float, default=0.0, help=argparse.SUPPRESS)
    np_.add_argument("--timeout", type=float, default=600.0)
    np_.add_argument("--spawn-timeout", dest="spawn_timeout", type=float,
                     default=600.0)
    np_.add_argument("--seed", type=int, default=0)
    np_.set_defaults(fn=_localnet)

    p.add_argument("-v", "--verbose", action="store_true",
                   help="INFO-level logs from coordinator/worker/transport")
    args = p.parse_args(argv)
    logging.basicConfig(
        level=logging.INFO if args.verbose else logging.WARNING,
        format="%(asctime)s %(name)s %(levelname)s %(message)s")
    from . import ensure_backend
    ensure_backend()   # fall back to CPU if the TPU plugin is broken
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
