"""Standalone worker HTTP server + HTTP transport (runtime/server.py).

The reference serves each miner over two HTTP surfaces — the localhost
prover RPC (reference: base/miner.py:74-84) and the axon synapse server
(base/miner.py:62-70). These tests drive the collapsed server end-to-end
over real sockets: every prover RPC against the direct Worker results, the
Prove synapse surface, and a full scored Coordinator round via
HttpTransport including the connection-failure → 408 path.
"""

import asyncio

import numpy as np
import pytest

from zkp_subnet_tpu.runtime import (Coordinator, CoordinatorConfig,
                                    HttpTransport, Worker, WorkerServer)
from zkp_subnet_tpu.runtime.server import rpc as _rpc
from zkp_subnet_tpu.utils import encoding as enc
from zkp_subnet_tpu.ops.field import FR

from tests.conftest import TEST_MACHINES_SCALE

M = 1 << TEST_MACHINES_SCALE


def rpc(url, method, payload):
    # cold jit compiles take ~60 s on the 2-CPU box; generous client timeout
    return _rpc(url, method, payload, timeout=600.0)


@pytest.fixture(scope="module")
def server(srs):
    worker = Worker(srs)
    s = WorkerServer(worker, port=0, seed=7).start()   # ephemeral port
    yield s
    s.stop()


def _random_row(srs, seed=5):
    import random
    from zkp_subnet_tpu.utils import oracle as o
    rng = random.Random(seed)
    return [enc.fr_to_b64(rng.randrange(o.R)) for _ in range(srs.row_size)]


def test_rpc_commit_open_verify_roundtrip(srs, server):
    poly = _random_row(srs)
    worker = server.worker
    com = rpc(server.url, "worker_commit", {"index": 1, "poly": poly})
    assert com["commitment"] == worker.worker_commit(1, poly)

    x = rpc(server.url, "random_point", {})["point"]
    opened = rpc(server.url, "worker_open", {"index": 1, "poly": poly,
                                             "x": x})
    ev, prf = worker.worker_open(1, poly, x)
    assert opened == {"eval": ev, "proof": prf}

    ok = rpc(server.url, "worker_verify",
             {"index": 1, "proof": opened["proof"], "alpha": x,
              "eval": opened["eval"], "commitment": com["commitment"]})
    assert ok == {"valid": True}
    bad = rpc(server.url, "worker_verify",
              {"index": 0, "proof": opened["proof"], "alpha": x,
               "eval": opened["eval"], "commitment": com["commitment"]})
    assert bad == {"valid": False}


def test_rpc_fft_eval_random(srs, server):
    from zkp_subnet_tpu.models import pianist as pn
    import jax.numpy as jnp

    poly = _random_row(srs)
    out = rpc(server.url, "fft", {"poly": poly, "left": True,
                                  "inverse": True})
    coeffs = FR.to_mont(jnp.asarray(enc.b64_to_limbs(poly)))
    want = np.asarray(FR.from_mont(pn.fft(coeffs, left=True, inverse=True)))
    assert out["poly"] == enc.limbs_to_b64(want)

    y = rpc(server.url, "eval", {"poly": out["poly"],
                                 "x": out["poly"][1]})
    assert len(y["y"]) == 43

    rp = rpc(server.url, "random_poly", {})
    assert len(rp["poly"]) == srs.machines
    assert len(rp["poly"][0]) == srs.row_size


def test_rpc_rejects_bad_index(server):
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as ei:
        rpc(server.url, "worker_commit", {"index": 99, "poly": []})
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei2:
        rpc(server.url, "no_such_method", {})
    assert ei2.value.code == 400


def test_scored_round_over_http(srs, server):
    """Coordinator round with the dendrite-role HttpTransport: all workers
    answer over sockets; one uid points at a dead port and 408s."""
    hotkeys = [f"http{i}" for i in range(M)]
    cfg = CoordinatorConfig(sample_size=M, timeout=600.0)
    coord = Coordinator(srs, cfg, hotkeys=hotkeys, seed=9)
    urls = {u: server.url for u in range(M)}
    urls[M - 1] = "http://127.0.0.1:1"          # dead port → 408 path
    transport = HttpTransport(urls)
    challenge, responses, rewards = coord.run_round(transport)
    assert len(responses) == M
    dead = [i for i, r in enumerate(responses) if r.status_code == 408]
    assert len(dead) == 1
    assert (rewards > 0).sum() == M - 1
    assert rewards[dead[0]] == 0.0
