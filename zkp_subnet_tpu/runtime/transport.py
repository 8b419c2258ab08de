"""Transports: how challenges reach workers.

The reference fans out over the Bittensor dendrite→axon WAN (reference:
neurons/validator.py:209-224) and fakes it in tests with a MockDendrite that
fabricates latencies and timeouts (reference: base/mock.py:71-115). Here the
production path is in-process (workers are mesh-resident), and the mock keeps
the reference's test fabric: fabricated process_time, 408 on timeout, and
optional proof corruption for the reward matrix.
"""

from __future__ import annotations

import asyncio
import logging
import random
import time
from typing import Dict, List, Optional, Sequence

from .protocol import Prove
from .worker import Worker

log = logging.getLogger("zkp_subnet_tpu.transport")


class LocalTransport:
    """Dispatch to in-process workers; concurrent like the reference's
    one-asyncio-task-per-miner fan-out (neurons/validator.py:209-224)."""

    def __init__(self, workers: Dict[int, Worker]):
        self.workers = workers

    async def query_one(self, uid: int, synapse: Prove,
                        timeout: float) -> Prove:
        worker = self.workers.get(uid)
        if worker is None:
            bad = Prove(index=synapse.index, poly=[])
            bad.status_code = 404
            return bad
        loop = asyncio.get_running_loop()
        try:
            out = await asyncio.wait_for(
                loop.run_in_executor(None, worker.forward, synapse),
                timeout=timeout)
            return out
        except asyncio.TimeoutError:
            log.warning("uid %d timed out after %.1fs (index %d)",
                        uid, timeout, synapse.index)
            late = Prove(index=synapse.index, poly=[])
            late.status_code = 408
            late.process_time = timeout
            return late

    async def query(self, uids: Sequence[int], synapses: Sequence[Prove],
                    timeout: float) -> List[Prove]:
        tasks = [self.query_one(u, s, timeout)
                 for u, s in zip(uids, synapses)]
        return list(await asyncio.gather(*tasks))


class MockTransport:
    """Fabricated network for tests (reference: base/mock.py:71-115).

    Each response gets process_time ~ U(min_time, max_time); if it exceeds
    ``timeout`` the response is an empty 408. ``corrupt_uids`` get a
    +1-perturbed proof (the reference's corruption scheme,
    tests/test_validator.py:79-86).
    """

    def __init__(self, workers: Dict[int, Worker], min_time: float = 0.0,
                 max_time: float = 1.0, seed: int = 0,
                 corrupt_uids: Optional[Sequence[int]] = None):
        self.workers = workers
        self.min_time = min_time
        self.max_time = max_time
        self.rng = random.Random(seed)
        self.corrupt_uids = set(corrupt_uids or ())

    async def query(self, uids: Sequence[int], synapses: Sequence[Prove],
                    timeout: float) -> List[Prove]:
        out = []
        for uid, syn in zip(uids, synapses):
            t = self.min_time + self.rng.random() * (
                self.max_time - self.min_time)
            if t >= timeout:
                late = Prove(index=syn.index, poly=[])
                late.status_code = 408
                late.process_time = timeout
                out.append(late)
                continue
            resp = self.workers[uid].forward(syn)
            resp.process_time = t
            if uid in self.corrupt_uids and resp.proof:
                resp.proof = _corrupt_b64(resp.proof)
            out.append(resp)
        return out


def _corrupt_b64(s: str) -> str:
    """+1 on the decoded integer (reference: tests/test_validator.py:79-86)."""
    from ..utils import encoding as enc
    raw = enc.b64_decode(s)
    val = int.from_bytes(raw, "big") + 1
    return enc.b64_encode(val.to_bytes(len(raw), "big"))
