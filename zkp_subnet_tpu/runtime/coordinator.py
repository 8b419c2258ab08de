"""Coordinator (the reference's validator neuron, mesh-native).

Owns challenge generation, fan-out, verification, latency-proportional
scoring with EMA, weight emission, and state checkpointing — the full
surface of reference base/validator.py + neurons/validator.py — plus the
step the reference documents but never implemented (neurons/validator.py:
194-198): Pianist aggregation of the per-worker sub-proofs into one
bivariate opening, verified with two pairings.
"""

from __future__ import annotations

import asyncio
import dataclasses
import os
import random
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import kzg
from ..models import pianist as pn
from ..models.srs import Srs
from ..ops.field import FR
from ..ops import curve as cv
from ..ops import poly as jpoly
from ..utils import encoding as enc
from ..utils import oracle as o
from .config import CoordinatorConfig
from .protocol import Prove


@dataclasses.dataclass
class Challenge:
    """Per-machine rows + shared point + expected evals
    (reference: neurons/validator.py:35-42)."""
    polys: List[List[str]]          # coefficient-form rows, b64
    alpha: str                      # b64 challenge point
    evals: List[str]                # expected f_i(alpha), b64

    def to_synapse(self, i: int) -> Prove:
        return Prove(index=i, poly=self.polys[i], alpha=self.alpha,
                     eval_=self.evals[i])


class Coordinator:
    """Drives challenge rounds against a set of workers.

    ``hotkeys`` is the membership list (uid → identity string) standing in
    for the metagraph; ``scores`` is the EMA'd reward vector
    (reference: base/validator.py:66, 321-348).
    """

    def __init__(self, srs: Srs, config: Optional[CoordinatorConfig] = None,
                 hotkeys: Optional[Sequence[str]] = None, seed: int = 0):
        self.srs = srs
        self.config = config or CoordinatorConfig()
        self.hotkeys: List[str] = list(hotkeys or [])
        self.scores = np.zeros(len(self.hotkeys), dtype=np.float32)
        self.step = 0
        self.rng = random.Random(seed)
        self.key = jax.random.PRNGKey(seed)
        self.last_weights: Optional[Tuple[np.ndarray, np.ndarray]] = None

    # -- challenge generation (reference: neurons/validator.py:106-120) -----

    def _next_key(self) -> jax.Array:
        self.key, sub = jax.random.split(self.key)
        return sub

    def generate_challenge(self, machines_count: int) -> Challenge:
        """Random bivariate rows (evaluation form), iNTT'd to coefficient
        form, expected evals computed locally — the coordinator never trusts
        a worker's claimed eval (reference: neurons/validator.py:160-166)."""
        t = self.srs.row_size
        rows_eval = pn._uniform_fr(self._next_key(), (machines_count, t))
        alpha = pn.random_point(self._next_key())
        rows_coeff = pn.fft(rows_eval, left=True, inverse=True)
        evals = jax.vmap(lambda r: jpoly.poly_eval(r, alpha))(rows_coeff)

        polys_int = [FR.decode_vec(rows_coeff[i])
                     for i in range(machines_count)]
        evals_int = FR.decode_vec(evals)
        return Challenge(
            polys=[enc.poly_to_b64(p) for p in polys_int],
            alpha=enc.fr_to_b64(FR.decode(alpha[None])[0]),
            evals=[enc.fr_to_b64(e) for e in evals_int])

    # -- uid sampling (reference: utils/uids.py:47-82) ----------------------

    def get_random_uids(self, k: int,
                        exclude: Optional[Sequence[int]] = None,
                        available: Optional[Sequence[int]] = None
                        ) -> List[int]:
        pool = list(available if available is not None
                    else range(len(self.hotkeys)))
        if exclude:
            pool = [u for u in pool if u not in set(exclude)]
        k = min(k, len(pool))
        return self.rng.sample(pool, k)

    # -- scoring (reference: neurons/validator.py:135-192) ------------------

    def reward(self, challenge: Challenge, response: Prove,
               timeout: Optional[float] = None) -> float:
        """Latency-proportional score with hard validity gates:
        0.0 for missing pieces, lateness, or a failed pairing check;
        else 1 − process_time/timeout (reference: neurons/validator.py:176).
        """
        timeout = self.config.timeout if timeout is None else timeout
        if not response.commitment or not response.proof:
            return 0.0
        if response.process_time is None or response.process_time > timeout:
            return 0.0
        expected_eval = challenge.evals[response.index]
        if not self._verify_worker(response.index, response.proof,
                                   challenge.alpha, expected_eval,
                                   response.commitment):
            return 0.0
        return 1.0 - response.process_time / timeout

    def _verify_worker(self, i: int, proof_b64: str, alpha_b64: str,
                       eval_b64: str, commitment_b64: str) -> bool:
        try:
            proof = enc.g1_from_b64(proof_b64)
            commitment = enc.g1_from_b64(commitment_b64)
        except ValueError:
            return False
        alpha = enc.fr_from_b64(alpha_b64)
        eval_ = enc.fr_from_b64(eval_b64)
        v_i = cv.g1_decode(self.srs.lagrange_y[i][None])[0]
        return kzg.verify(commitment, alpha, eval_, proof,
                          self.srs.g2_gen, self.srs.g2_tau_x, shift_g1=v_i)

    def get_rewards(self, challenge: Challenge,
                    responses: Sequence[Prove],
                    timeout: Optional[float] = None) -> np.ndarray:
        return np.array([self.reward(challenge, r, timeout)
                         for r in responses], dtype=np.float32)

    def update_scores(self, rewards: np.ndarray,
                      uids: Sequence[int]) -> None:
        """Scatter + EMA (reference: base/validator.py:321-348)."""
        rewards = np.nan_to_num(np.asarray(rewards, dtype=np.float32))
        scattered = np.zeros_like(self.scores)
        scattered[np.asarray(list(uids), dtype=int)] = rewards
        alpha = self.config.moving_average_alpha
        self.scores = alpha * scattered + (1 - alpha) * self.scores

    # -- weights (reference: base/validator.py:231-281) ---------------------

    def set_weights(self) -> Tuple[np.ndarray, np.ndarray]:
        """L1-normalize scores → uint16 weights (emit-format parity with
        bt convert_weights_and_uids_for_emit). Returns (uids, weights)."""
        norm = np.linalg.norm(self.scores, ord=1)
        if norm == 0 or not np.isfinite(norm):
            norm = 1.0
        w = self.scores / norm
        nz = np.nonzero(w)[0]
        if nz.size == 0:
            self.last_weights = (np.array([], dtype=np.int64),
                                 np.array([], dtype=np.uint16))
            return self.last_weights
        scaled = np.round(w[nz] / np.max(w[nz]) * 65535.0).astype(np.uint16)
        self.last_weights = (nz.astype(np.int64), scaled)
        return self.last_weights

    # -- membership churn (reference: base/validator.py:287-319) ------------

    def resync(self, new_hotkeys: Sequence[str]) -> None:
        """Zero replaced identities; grow the score vector as needed."""
        for uid, hk in enumerate(new_hotkeys[:len(self.hotkeys)]):
            if hk != self.hotkeys[uid]:
                self.scores[uid] = 0.0
        if len(new_hotkeys) > len(self.hotkeys):
            grown = np.zeros(len(new_hotkeys), dtype=np.float32)
            grown[:len(self.scores)] = self.scores
            self.scores = grown
        self.hotkeys = list(new_hotkeys)

    # -- state (reference: base/validator.py:350-370) -----------------------

    def save_state(self) -> str:
        os.makedirs(self.config.state_dir, exist_ok=True)
        path = os.path.join(self.config.state_dir, "state.npz")
        np.savez(path, step=self.step, scores=self.scores,
                 hotkeys=np.array(self.hotkeys, dtype=object))
        return path

    def load_state(self) -> bool:
        path = os.path.join(self.config.state_dir, "state.npz")
        if not os.path.exists(path):
            return False
        data = np.load(path, allow_pickle=True)
        self.step = int(data["step"])
        self.scores = data["scores"].astype(np.float32)
        self.hotkeys = [str(h) for h in data["hotkeys"]]
        return True

    # -- round driving (reference: neurons/validator.py:122-133, 194-246) ---

    async def forward(self, transport, timeout: Optional[float] = None
                      ) -> Tuple[Challenge, List[Prove], np.ndarray]:
        """One challenge round: sample, dispatch, score, EMA-update."""
        timeout = self.config.timeout if timeout is None else timeout
        m = min(self.config.sample_size, len(self.hotkeys),
                self.srs.machines)
        uids = self.get_random_uids(m)
        challenge = self.generate_challenge(self.srs.machines)
        synapses = [challenge.to_synapse(u % self.srs.machines)
                    for u in uids]
        responses = await transport.query(uids, synapses, timeout)
        if all(not r.commitment and not r.proof for r in responses):
            raise RuntimeError("all workers failed to respond")
        rewards = self.get_rewards(challenge, responses, timeout)
        self.update_scores(rewards, uids)
        self.step += 1
        return challenge, responses, rewards

    def run_round(self, transport, timeout: Optional[float] = None):
        return asyncio.run(self.forward(transport, timeout))

    # -- aggregation (the step the reference never wired) --------------------

    def aggregate_responses(self, challenge: Challenge,
                            responses: Sequence[Prove]
                            ) -> Tuple[pn.AggregatedProof, int, int]:
        """Fold all M worker responses into one bivariate opening at
        (α, β) with a fresh β, and return (proof, alpha_int, beta_int).
        Requires a complete response set (index i → response i)."""
        m = self.srs.machines
        by_index = {r.index: r for r in responses}
        if set(by_index) != set(range(m)):
            raise ValueError("aggregation needs all worker responses")
        coms = cv.g1_encode([enc.g1_from_b64(by_index[i].commitment)
                             for i in range(m)])
        prfs = cv.g1_encode([enc.g1_from_b64(by_index[i].proof)
                             for i in range(m)])
        evals = FR.encode_vec([enc.fr_from_b64(challenge.evals[i])
                               for i in range(m)])
        beta = pn.random_point(self._next_key())
        agg = pn.aggregate(self.srs, coms, prfs, evals, beta)
        alpha_int = enc.fr_from_b64(challenge.alpha)
        beta_int = FR.decode(beta[None])[0]
        return agg, alpha_int, beta_int

    def verify_aggregated(self, agg: pn.AggregatedProof, alpha: int,
                          beta: int) -> bool:
        return pn.verify_aggregated(self.srs, agg, alpha, beta)
