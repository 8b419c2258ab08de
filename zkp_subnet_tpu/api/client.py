"""Client-facing commit / open / verify API.

The reference's api/ module is the *intended* consumer surface — broken as
shipped (reference: api/commit.py, api/open.py, api/verify.py; defect list in
SURVEY.md §2.10). This is the clean version of that capability: fan a request
out to several workers, take the first valid response (reference:
api/commit.py:60-75 intent), with the transport/sampling pluggable.
"""

from __future__ import annotations

import asyncio
from typing import List, Optional, Sequence, Tuple

from ..runtime.coordinator import Coordinator
from ..runtime.protocol import Prove


class SubnetClient:
    """commit/open/verify against a worker pool, first-valid-response wins."""

    def __init__(self, coordinator: Coordinator, transport,
                 sample_size: int = 3):
        self.coordinator = coordinator
        self.transport = transport
        self.sample_size = sample_size

    async def _fan_out(self, index: int, poly: Sequence[str],
                       alpha: Optional[str]) -> List[Prove]:
        uids = self.coordinator.get_random_uids(self.sample_size)
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
