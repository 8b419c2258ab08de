"""KZG polynomial commitments on TPU: commit / open / verify.

The compute surface matches the reference prover RPCs
(reference: neurons/miner.py:38-54, neurons/validator.py:77-104):
commit = MSM(SRS, coefficients), open = synthetic-division quotient + MSM,
verify = two pairings. Commit/open run fully on TPU; the O(1) pairing check
runs on the host (C++ native library when built, bigint oracle otherwise) —
pairings are branch-heavy scalar code with no batch dimension, the one part
of the stack a TPU should *not* run.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.field import FR, FQ
from ..ops import curve as cv
from ..ops import msm as jmsm
from ..ops import poly as jpoly
from ..utils import oracle as o
from ..utils import native


def commit(bases: jnp.ndarray, coeffs: jnp.ndarray,
           window_bits=None) -> jnp.ndarray:
    """[f(τ)]G1 from Montgomery-form coefficients. bases: (N, 3, L)."""
    scalars = jpoly.from_mont_wide(coeffs)   # canonical limbs, byte engine
    return jmsm.msm_auto(bases, scalars, window_bits=window_bits)


def open_(bases: jnp.ndarray, coeffs: jnp.ndarray, x: jnp.ndarray,
          window_bits=None
          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (eval f(x), proof [q(τ)]G1); x is (L,) Montgomery.

    The quotient arrives zero-padded to full width (q[N-1] = 0) so the MSM
    runs over all N bases lane-aligned — the extra term is 0·base."""
    y, scalars = jpoly.poly_open_scalars(coeffs, x)
    return y, jmsm.msm_auto(bases, scalars, window_bits=window_bits)


def verify(commitment, x: int, y: int, proof,
           g2_gen, g2_tau, shift_g1=None) -> bool:
    """Host-side pairing check: e(C − y·G − shift, G2) == e(W, [τ−x]G2).

    commitment/proof: oracle G1 points (already decoded). ``shift_g1``
    generalizes the check for Pianist worker verification where the
    eval-term base is [R_i(τ_Y)]G1 instead of G1 (pass base point there).
    """
    base = shift_g1 if shift_g1 is not None else o.G1.from_affine(o.G1_GEN)
    c_minus = o.G1.add(commitment, o.G1.neg(o.G1.mul(base, y)))
    tau_minus_x = o.G2.add(g2_tau, o.G2.neg(o.G2.mul(g2_gen, x)))
    return native.pairing_check([
        (c_minus, o.G2.neg(g2_gen)),
        (proof, tau_minus_x),
    ])
