"""Worker (the reference's miner neuron, reimagined for the mesh).

The reference miner is an HTTP axon that forwards each ``Prove`` synapse to a
localhost Rust prover over two RPC hops (reference: neurons/miner.py:38-61,
106-135). Here the prover *is* the worker: one resident SRS slice, one jitted
commit+open program, zero RPC hops. The blacklist/priority surface survives
as hooks (reference: neurons/miner.py:63-104) keyed on a static membership
set instead of the metagraph.
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Callable, Optional, Set, Tuple

import jax
import jax.numpy as jnp

from ..models import kzg
from ..models.srs import Srs
from ..ops.field import FR
from ..ops import curve as cv
from ..ops import msm as jmsm
from ..utils import encoding as enc
from ..utils import oracle as o
from .config import WorkerConfig
from .protocol import Prove

log = logging.getLogger("zkp_subnet_tpu.worker")


@functools.lru_cache(maxsize=32)
def _prove_row_fn(t: int, window_bits: int):
    """One jitted program per row length: (bases, row, x) → (com, y, proof)."""
    @jax.jit
    def prove_row(bases, row, x):
        com = kzg.commit(bases, row, window_bits)
        y, prf = kzg.open_(bases, row, x, window_bits)
        return com, y, prf
    return prove_row


class Worker:
    """One Pianist worker: holds SRS slices, serves commit/open/verify.

    ``members`` plays the metagraph-registration role for the blacklist hook
    (reference: neurons/miner.py:63-82): requests from unknown callers are
    rejected unless ``allow_non_registered``.
    """

    def __init__(self, srs: Srs, config: Optional[WorkerConfig] = None,
                 members: Optional[Set[str]] = None,
                 window_bits=None):
        self.srs = srs
        self.config = config or WorkerConfig()
        self.members = members if members is not None else set()
        self.window_bits = window_bits
        self.compressed = not self.config.prover.uncompressed

    def warmup(self) -> float:
        """Compile + run the fused prove program once so the first real
        challenge isn't charged for XLA compilation (the reference miner
        likewise starts its prover and loads the SRS before serving,
        base/miner.py:74-84). Returns the warmup wall time in seconds."""
        t0 = time.perf_counter()
        fn = _prove_row_fn(self.srs.row_size, self.window_bits)
        row = FR.zeros((self.srs.row_size,))
        jax.block_until_ready(
            fn(self.srs.worker_bases[0], row, FR.zeros(())))
        dt = time.perf_counter() - t0
        log.info("warmup compiled prove program in %.1fs", dt)
        return dt

    # -- RPC-parity compute surface (reference: neurons/miner.py:38-54) -----

    def worker_commit(self, i: int, poly_b64) -> str:
        """b64 row → b64 commitment."""
        row = FR.to_mont(jnp.asarray(enc.b64_to_limbs(poly_b64)))
        com = kzg.commit(self.srs.worker_bases[i], row, self.window_bits)
        return enc.g1_to_b64(cv.g1_decode(com[None])[0], self.compressed)

    def worker_open(self, i: int, poly_b64, x_b64: str) -> Tuple[str, str]:
        """b64 row + point → (b64 eval, b64 proof)."""
        row = FR.to_mont(jnp.asarray(enc.b64_to_limbs(poly_b64)))
        x = FR.encode([enc.fr_from_b64(x_b64)])[0]
        y, prf = kzg.open_(self.srs.worker_bases[i], row, x,
                           self.window_bits)
        return (enc.fr_to_b64(FR.decode(y[None])[0]),
                enc.g1_to_b64(cv.g1_decode(prf[None])[0], self.compressed))

    def worker_verify(self, i: int, proof_b64: str, alpha_b64: str,
                      eval_b64: str, commitment_b64: str) -> bool:
        """Pairing check with the per-worker key (reference:
        neurons/validator.py:77-86). Malformed inputs → False."""
        try:
            proof = enc.g1_from_b64(proof_b64)
            commitment = enc.g1_from_b64(commitment_b64)
            alpha = enc.fr_from_b64(alpha_b64)
            eval_ = enc.fr_from_b64(eval_b64)
        except Exception:
            return False
        v_i = cv.g1_decode(self.srs.lagrange_y[i][None])[0]
        return kzg.verify(commitment, alpha, eval_, proof,
                          self.srs.g2_gen, self.srs.g2_tau_x, shift_g1=v_i)

    # -- request handling (reference: neurons/miner.py:106-135) -------------

    def forward(self, synapse: Prove) -> Prove:
        """Commit + open the row in one fused jitted program, timed.

        A request without ``alpha`` is commit-only (the client API's
        ``commit``, reference intent api/commit.py): the same fused program
        runs with a dummy point and the opening outputs are dropped, so no
        extra program shape is ever compiled.

        An EMPTY ``poly`` is a ping (the reference's availability probe is
        an empty ``bt.Synapse()`` the axon answers 200 without reaching the
        miner, api/get_query_axons.py:46-87): answered immediately, no
        device work, so discovery can't queue behind a prove.
        """
        if not synapse.poly:
            out = synapse.response(eval_=None, commitment=None, proof=None)
            out.process_time = 0.0
            return out
        try:
            t0 = time.perf_counter()
            row = FR.to_mont(jnp.asarray(enc.b64_to_limbs(synapse.poly)))
            commit_only = synapse.alpha is None
            x = (FR.zeros(()) if commit_only
                 else FR.encode([enc.fr_from_b64(synapse.alpha)])[0])
            fn = _prove_row_fn(row.shape[0], self.window_bits)
            com, y, prf = jax.block_until_ready(
                fn(self.srs.worker_bases[synapse.index], row, x))
            out = synapse.response(
                eval_=None if commit_only
                else enc.fr_to_b64(FR.decode(y[None])[0]),
                commitment=enc.g1_to_b64(cv.g1_decode(com[None])[0],
                                         self.compressed),
                proof=None if commit_only
                else enc.g1_to_b64(cv.g1_decode(prf[None])[0],
                                   self.compressed))
            out.process_time = time.perf_counter() - t0
            return out
        except Exception as exc:
            # parity: on error return the request unchanged, but LOG it —
            # the reference logs before returning (neurons/miner.py:133-135)
            log.error("forward failed for index %s: %s", synapse.index, exc)
            return synapse

    def blacklist(self, caller: str,
                  validator_permits: Optional[Set[str]] = None
                  ) -> Tuple[bool, str]:
        """(should_reject, reason) — reference: neurons/miner.py:63-82.

        With ``force_validator_permit`` (the default, reference
        utils/config.py:191-196) callers must also hold a validator permit;
        pass the permit set from membership state. ``None`` skips the check
        (static-mesh deployments where every member is the coordinator).
        """
        if caller not in self.members:
            if self.config.allow_non_registered:
                return False, "allow_non_registered"
            return True, f"unrecognized caller {caller!r}"
        if (self.config.force_validator_permit
                and validator_permits is not None
                and caller not in validator_permits):
            return True, f"caller {caller!r} lacks validator permit"
        return False, "ok"

    def priority(self, caller: str,
                 stake: Callable[[str], float] = lambda _: 0.0) -> float:
        """Queue priority = caller stake (reference: neurons/miner.py:84-104)."""
        return float(stake(caller))
