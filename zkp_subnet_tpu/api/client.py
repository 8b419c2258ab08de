"""Client-facing commit / open / verify API.

The reference's api/ module is the *intended* consumer surface — broken as
shipped (reference: api/commit.py, api/open.py, api/verify.py; defect list in
SURVEY.md §2.10). This is the clean version of that capability: fan a request
out to several workers, take the first valid response (reference:
api/commit.py:60-75 intent), with the transport/sampling pluggable.
"""

from __future__ import annotations

import asyncio
import numpy as np
from typing import List, Optional, Sequence, Tuple

from ..runtime.coordinator import Coordinator
from ..runtime.protocol import Prove


async def ping_uids(transport, uids: Sequence[int], timeout: float = 3.0
                    ) -> Tuple[List[int], List[int]]:
    """Probe uids for availability → (successful, failed).

    The ping is a ``Prove`` with an empty poly — answered immediately by
    ``Worker.forward`` with no device work (reference analog: an empty
    ``bt.Synapse()`` the axon answers without reaching the miner,
    api/get_query_axons.py:46-87). Success is status 200; a missing worker
    (404) or timeout (408) fails.
    """
    pings = [Prove(index=-1, poly=[]) for _ in uids]
    responses = await transport.query(list(uids), pings, timeout)
    ok = [u for u, r in zip(uids, responses) if r.status_code == 200]
    bad = [u for u, r in zip(uids, responses) if r.status_code != 200]
    return ok, bad


async def get_query_uids(coordinator: Coordinator, transport,
                         top_fraction: float = 0.1, timeout: float = 3.0,
                         limit: int = 3) -> List[int]:
    """Pick ≤``limit`` workers to serve client API calls: available uids in
    the top score quantile that answer a ping (reference:
    api/get_query_axons.py:89-116 — top-stake ∩ trusted ∩ ping-reachable,
    then ``random.sample`` down to 3).

    The reference's quality signal is chain stake; here it is the
    coordinator's own EMA score vector — the quantity this runtime actually
    maintains per worker. Divergence from the reference, deliberately: when
    the quantile filter would empty the pool (cold start, all scores equal
    zero), it falls back to the whole available pool instead of returning
    nobody — the reference version deadlocks a fresh subnet.
    """
    pool = [u for u in range(len(coordinator.hotkeys))
            if coordinator.check_uid_availability(u)]
    if not pool:
        return []
    scores = coordinator.scores[np.asarray(pool)]
    cut = float(np.quantile(scores, 1.0 - top_fraction))
    top = [u for u, s in zip(pool, scores) if s > cut]
    candidates = top or pool
    ok, _ = await ping_uids(transport, candidates, timeout=timeout)
    if len(ok) > limit:
        ok = coordinator.rng.sample(ok, limit)
    return ok


class SubnetClient:
    """commit/open/verify against a worker pool, first-valid-response wins."""

    def __init__(self, coordinator: Coordinator, transport,
                 sample_size: int = 3):
        self.coordinator = coordinator
        self.transport = transport
        self.sample_size = sample_size
        self._query_uids: Optional[List[int]] = None

    def discover(self, top_fraction: float = 0.1,
                 timeout: float = 3.0) -> List[int]:
        """Pin the fan-out pool to ping-reachable top-score workers
        (reference: api/get_query_axons.py:118-142). Subsequent
        commit/open calls fan out over these uids instead of uniform
        samples; call again to refresh, or clear with ``reset_pool()``."""
        uids = asyncio.run(get_query_uids(
            self.coordinator, self.transport, top_fraction=top_fraction,
            timeout=timeout, limit=self.sample_size))
        self._query_uids = uids or None
        return uids

    def reset_pool(self) -> None:
        self._query_uids = None

    async def _fan_out(self, index: int, poly: Sequence[str],
                       alpha: Optional[str]) -> List[Prove]:
        uids = (self._query_uids if self._query_uids is not None
                else self.coordinator.get_random_uids(self.sample_size))
        syn = Prove(index=index, poly=list(poly), alpha=alpha)
        return await self.transport.query(
            uids, [syn] * len(uids), self.coordinator.config.timeout)

    def commit(self, poly: Sequence[str], index: int = 0) -> Optional[str]:
        """b64 coefficient row → b64 commitment (first non-empty response).

        Reference intent: api/commit.py:34-100.
        """
        responses = asyncio.run(self._fan_out(index, poly, None))
        for r in responses:
            if r.commitment:
                return r.commitment
        return None

    def open(self, poly: Sequence[str], x: str,
             index: int = 0) -> Optional[Tuple[str, str]]:
        """b64 row + point → (b64 eval, b64 proof). Reference intent:
        api/open.py:33-101."""
        responses = asyncio.run(self._fan_out(index, poly, x))
        for r in responses:
            if r.proof and r.eval_:
                return r.eval_, r.proof
        return None

    def verify(self, commitment: str, x: str, y: str, proof: str,
               index: int = 0) -> bool:
        """Local pairing check (the one reference API that needs no miner).
        Reference intent: api/verify.py:33-115."""
        return self.coordinator.verify_worker(index, proof, x, y, commitment)
