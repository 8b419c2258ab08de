"""Standalone worker serving process + HTTP transport.

The reference runs two network surfaces per miner: the Rust prover as a
localhost HTTP JSON-RPC server (`fourier` on :1337/:1338 — reference:
base/miner.py:74-84, base/validator.py:80-91) and a bittensor axon serving
``Prove`` synapses over the WAN (reference: base/miner.py:62-70). Here both
collapse into ONE stdlib HTTP server around a ``Worker``:

- ``POST /worker_commit|worker_open|worker_verify|fft|eval|random_poly|
  random_point`` — the full fourier RPC surface, same JSON keys as the
  reference call sites (reference: neurons/miner.py:38-54,
  neurons/validator.py:58-104).
- ``POST /prove`` — the synapse surface: a ``Prove`` request JSON in, the
  stripped response (echoed index, eval/commitment/proof, process_time) out
  (reference: neurons/miner.py:106-135).

``HttpTransport`` is the coordinator-side counterpart (the dendrite role):
it fans challenges out to worker URLs with one thread per worker and feeds
the responses to the same scoring path as Local/Mesh/Mock transports —
closing the cross-host scoring loop over real sockets.
"""

from __future__ import annotations

import asyncio
import json
import logging
import threading
import time
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from .protocol import Prove
from .worker import Worker

log = logging.getLogger("zkp_subnet_tpu.server")


class WorkerServer:
    """Serve one ``Worker`` (all its logical row indices) over HTTP.

    Like the reference's single prover process serving every logical
    machine index (reference: tests/conftest.py:57 machines on one box),
    one server answers for any row index its SRS covers.
    """

    def __init__(self, worker: Worker, host: str = "127.0.0.1",
                 port: int = 1337, seed: int = 0):
        self.worker = worker
        self._key = jax.random.PRNGKey(seed)
        self._lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # route to logging, not stderr
                log.debug("http: " + fmt, *args)

            def do_POST(self):
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length) if length else b"{}"
                try:
                    req = json.loads(body or b"{}")
                    out = outer._dispatch(self.path.lstrip("/"), req)
                    code = 200
                except _BadRequest as exc:
                    out, code = {"error": str(exc)}, 400
                except Exception as exc:  # noqa: BLE001 — serving loop
                    log.error("rpc %s failed: %s", self.path, exc)
                    out, code = {"error": f"{type(exc).__name__}: {exc}"}, 500
                raw = json.dumps(out).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(raw)))
                self.end_headers()
                self.wfile.write(raw)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: Optional[threading.Thread] = None

    # -- lifecycle (reference: Client.start/stop, base/miner.py:82-84) ------

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "WorkerServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        log.info("worker server on %s", self.url)
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)

    def serve_forever(self) -> None:
        """Foreground serve (the CLI path); Ctrl-C stops."""
        log.info("worker server on %s (Ctrl-C to stop)", self.url)
        try:
            self._httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            self._httpd.server_close()

    # -- dispatch -----------------------------------------------------------

    def _next_key(self):
        with self._lock:
            self._key, sub = jax.random.split(self._key)
        return sub

    def _dispatch(self, method: str, req: dict) -> dict:
        from ..models import pianist as pn
        from ..ops.field import FR
        from ..utils import encoding as enc
        import jax.numpy as jnp

        w = self.worker
        if method == "worker_commit":
            return {"commitment":
                    w.worker_commit(_index(req, w), req["poly"])}
        if method == "worker_open":
            ev, prf = w.worker_open(_index(req, w), req["poly"], req["x"])
            return {"eval": ev, "proof": prf}
        if method == "worker_verify":
            return {"valid": w.worker_verify(
                _index(req, w), req["proof"], req["alpha"], req["eval"],
                req["commitment"])}
        if method == "prove":
            syn = Prove(index=int(req["index"]), poly=req.get("poly") or [],
                        alpha=req.get("alpha"), eval_=req.get("eval"))
            resp = w.forward(syn)
            return {"index": resp.index, "eval": resp.eval_,
                    "commitment": resp.commitment, "proof": resp.proof,
                    "process_time": resp.process_time}
        if method == "fft":
            poly = req["poly"]
            left = bool(req.get("left", True))
            inverse = bool(req.get("inverse", False))
            bivariate = bool(poly) and isinstance(poly[0], list)
            rows_b64 = poly if bivariate else [poly]
            limbs = np.stack([enc.b64_to_limbs(r) for r in rows_b64])
            rows = FR.to_mont(jnp.asarray(limbs))
            out = pn.fft(rows if bivariate else rows[0],
                         left=left, inverse=inverse)
            out_limbs = np.asarray(jax.device_get(FR.from_mont(out)))
            if bivariate:
                return {"poly": [enc.limbs_to_b64(r) for r in out_limbs]}
            return {"poly": enc.limbs_to_b64(out_limbs)}
        if method == "eval":
            limbs = enc.b64_to_limbs(req["poly"])
            coeffs = FR.to_mont(jnp.asarray(limbs))
            x = FR.encode([enc.fr_from_b64(req["x"])])[0]
            y = pn.eval_poly(coeffs, x)
            return {"y": enc.fr_to_b64(FR.decode(y[None])[0])}
        if method == "random_poly":
            rows = pn.random_poly(w.srs, self._next_key())
            out_limbs = np.asarray(jax.device_get(FR.from_mont(rows)))
            return {"poly": [enc.limbs_to_b64(r) for r in out_limbs]}
        if method == "random_point":
            pt = pn.random_point(self._next_key())
            return {"point": enc.fr_to_b64(FR.decode(pt[None])[0])}
        raise _BadRequest(f"unknown method {method!r}")


class _BadRequest(ValueError):
    pass


def _index(req: dict, w: Worker) -> int:
    i = int(req.get("index", req.get("i", -1)))
    if not 0 <= i < w.srs.machines:
        raise _BadRequest(f"index {i} out of range")
    return i


# ---------------------------------------------------------------------------
# Client side
# ---------------------------------------------------------------------------


def rpc(url: str, method: str, payload: dict, timeout: float = 30.0) -> dict:
    """One JSON POST round trip; raises on non-200."""
    req = urllib.request.Request(
        f"{url}/{method}", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


class HttpTransport:
    """Coordinator-side fan-out over HTTP — the dendrite role (reference:
    neurons/validator.py:209-224): one request per sampled worker, empty
    408 responses on timeout/connection failure."""

    def __init__(self, urls: Dict[int, str]):
        self.urls = urls

    async def query(self, uids: Sequence[int], synapses: Sequence[Prove],
                    timeout: float) -> List[Prove]:
        loop = asyncio.get_running_loop()
        tasks = [loop.run_in_executor(None, self._query_one, u, s, timeout)
                 for u, s in zip(uids, synapses)]
        return list(await asyncio.gather(*tasks))

    def _query_one(self, uid: int, syn: Prove, timeout: float) -> Prove:
        url = self.urls.get(uid)
        t0 = time.perf_counter()
        try:
            if url is None:
                raise OSError(f"no url for uid {uid}")
            out = rpc(url, "prove",
                      {"index": syn.index, "poly": syn.poly,
                       "alpha": syn.alpha, "eval": syn.eval_},
                      timeout=timeout)
            resp = syn.response(eval_=out.get("eval"),
                                commitment=out.get("commitment"),
                                proof=out.get("proof"))
            resp.process_time = out.get("process_time",
                                        time.perf_counter() - t0)
            return resp
        except Exception as exc:  # noqa: BLE001 — network edge
            log.warning("uid %d failed over http: %s", uid, exc)
            late = Prove(index=syn.index, poly=[])
            late.status_code = 408
            late.process_time = timeout
            return late
