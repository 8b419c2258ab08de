"""Pianist-style distributed KZG prover (eprint 2023/1271).

The bivariate witness f(X, Y) = Σ_i R_i(Y)·f_i(X) is sharded row-per-worker:
M = 2^machines_scale workers, each holding T = 2^(scale − machines_scale)
coefficients (reference: conftest.py:57, config.py:152-164). Surface parity
with the reference prover RPCs:

- ``worker_commit(i, poly)``  → com_i = [R_i(τ_Y)·f_i(τ_X)]G1
  (reference: neurons/miner.py:38-45)
- ``worker_open(i, poly, x)`` → (f_i(x), W_i = [R_i(τ_Y)·q_i(τ_X)]G1)
  (reference: neurons/miner.py:47-54); polynomials are coefficient-form,
  c[0] = constant (golden-vector anchored, reference: tests/test_miner.py:33-55)
- ``worker_verify(i, ...)``   → pairing check with the per-worker key
  V_i = [R_i(τ_Y)]G1 (reference: neurons/validator.py:77-86)

Plus the step the reference documents but never implemented
(reference: neurons/validator.py:194-198): **aggregation**. Per-worker
commitments/proofs sum to a commitment/proof for f itself:
    C = Σ C_i,  W = Σ W_i,  C_y = Σ y_i·V_i = [y(τ_Y)]G1
with y(Y) = f(α, Y) in Lagrange form. Two pairing checks make the full
bivariate opening at (α, β):
    e(C − C_y, G2) == e(W, [τ_X − α]G2)            (X opening, aggregated)
    e(C_y − f(α,β)·G1, G2) == e(W_y, [τ_Y − β]G2)  (Y opening, Lagrange KZG)

Everything batched-over-workers runs as one jitted TPU program; the
multi-chip version shards the worker axis over a mesh
(zkp_subnet_tpu.parallel).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.field import FR, FQ
from ..ops import curve as cv
from ..ops import msm as jmsm
from ..ops import ntt as jntt
from ..ops import poly as jpoly
from ..utils import oracle as o
from ..utils import encoding as enc
from ..utils import native
from .srs import Srs
from . import kzg


# ---------------------------------------------------------------------------
# Worker-side programs (batched over the worker axis)
# ---------------------------------------------------------------------------


def worker_commit(srs: Srs, i: int, row: jnp.ndarray,
                  window_bits=None) -> jnp.ndarray:
    """Commitment of worker i's row (coefficients, Montgomery form)."""
    return kzg.commit(srs.device_worker_bases(i), row, window_bits)


def worker_open(srs: Srs, i: int, row: jnp.ndarray, x: jnp.ndarray,
                window_bits=None):
    """(f_i(x), W_i) for worker i; x (L,) Montgomery."""
    return kzg.open_(srs.device_worker_bases(i), row, x, window_bits)


def worker_verify(srs: Srs, i: int, proof, alpha: int, eval_: int,
                  commitment) -> bool:
    """Pairing check for one worker's proof (host-side; oracle points)."""
    v_i = cv.g1_decode(srs.lagrange_y[i][None])[0]
    return kzg.verify(commitment, alpha, eval_, proof,
                      srs.g2_gen, srs.g2_tau_x, shift_g1=v_i)


def commit_all(srs: Srs, rows: jnp.ndarray,
               window_bits=None) -> jnp.ndarray:
    """All workers' commitments: rows (M, T, L) → (M, 3, L)."""
    return jax.vmap(
        lambda b, r: kzg.commit(b, r, window_bits)
    )(srs.worker_bases, rows)


def open_all(srs: Srs, rows: jnp.ndarray, x: jnp.ndarray,
             window_bits=None):
    """All workers' openings at the shared point x."""
    return jax.vmap(
        lambda b, r: kzg.open_(b, r, x, window_bits)
    )(srs.worker_bases, rows)


# ---------------------------------------------------------------------------
# Aggregation (the Pianist coordinator step)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class AggregatedProof:
    """One proof for the whole bivariate f, built from worker sub-proofs."""
    commitment: jnp.ndarray      # C = Σ C_i                       (3, L)
    proof_x: jnp.ndarray         # W = Σ W_i                       (3, L)
    evals: jnp.ndarray           # y_i = f_i(α)                    (M, L)
    commitment_y: jnp.ndarray    # C_y = Σ y_i·V_i                 (3, L)
    proof_y: jnp.ndarray         # W_y (Lagrange KZG open of y at β) (3, L)
    value: jnp.ndarray           # f(α, β)                         (L,)


def _lagrange_eval_domain(m: int):
    """Montgomery-form domain points ω^i for the size-m worker domain."""
    log_m = m.bit_length() - 1
    w = FR.encode([o.fr_root_of_unity(log_m)])[0]
    return FR.powers(w, m)                       # (m, L)


def aggregate_core(lagrange_y: jnp.ndarray, commitments: jnp.ndarray,
                   proofs: jnp.ndarray, evals: jnp.ndarray,
                   beta: jnp.ndarray, dom: jnp.ndarray, m_inv: jnp.ndarray,
                   window_bits=None):
    """Traceable aggregation math (no host constants computed inside).

    All inputs are arrays: lagrange_y (M, 3, Lq), commitments/proofs
    (M, 3, Lq), evals (M, L) Montgomery, beta (L,), dom (M, L) = domain points
    ω^i, m_inv (L,) = 1/M — all Montgomery form. Returns
    (C, W, C_y, W_y, value). Callable both single-chip (``aggregate``) and
    inside a shard_map block after all_gather (zkp_subnet_tpu.parallel).
    """
    m = evals.shape[0]
    C = cv.g1_sum(commitments)
    W = cv.g1_sum(proofs)

    # C_y = Σ y_i·V_i  (an MSM over the Lagrange-Y basis)
    C_y = jmsm.msm_auto(lagrange_y, FR.from_mont(evals),
                        window_bits=window_bits)

    # y(β) via barycentric: (β^m − 1)/m · Σ y_i·ω^i/(β − ω^i)
    diff = FR.sub(jnp.broadcast_to(beta, dom.shape), dom)   # β − ω^i
    inv_diff = FR.inv(diff)
    terms = FR.mont_mul(FR.mont_mul(evals, dom), inv_diff)
    s = terms
    while s.shape[0] > 1:
        half = s.shape[0] // 2
        s = FR.add(s[:half], s[half:])
    beta_m = FR.pow_static(beta, m)
    num = FR.sub(beta_m, FR.ones(()))
    value = FR.mont_mul(FR.mont_mul(num, m_inv), s[0])

    # quotient in Lagrange form: q_i = (y_i − v)/(ω^i − β)
    q_evals = FR.mont_mul(
        FR.sub(evals, jnp.broadcast_to(value, evals.shape)),
        FR.inv(FR.sub(dom, jnp.broadcast_to(beta, dom.shape))))
    W_y = jmsm.msm_auto(lagrange_y, FR.from_mont(q_evals),
                        window_bits=window_bits)
    return C, W, C_y, W_y, value


def aggregation_constants(m: int):
    """Host-prepared (dom, m_inv) Montgomery arrays for ``aggregate_core``."""
    dom = _lagrange_eval_domain(m)
    m_inv = FR.encode([pow(m, o.R - 2, o.R)])[0]
    return dom, m_inv


def aggregate(srs: Srs, commitments: jnp.ndarray, proofs: jnp.ndarray,
              evals: jnp.ndarray, beta: jnp.ndarray,
              window_bits=None) -> AggregatedProof:
    """Fold per-worker sub-proofs into a single bivariate opening at (α, β).

    commitments/proofs: (M, 3, L); evals: (M, L) Montgomery; beta (L,).
    """
    dom, m_inv = aggregation_constants(srs.machines)
    C, W, C_y, W_y, value = aggregate_core(
        srs.lagrange_y, commitments, proofs, evals, beta, dom, m_inv,
        window_bits=window_bits)
    return AggregatedProof(commitment=C, proof_x=W, evals=evals,
                           commitment_y=C_y, proof_y=W_y, value=value)


def verify_aggregated(srs: Srs, agg: AggregatedProof, alpha: int,
                      beta: int) -> bool:
    """Both pairing checks for the aggregated bivariate opening (host-side)."""
    g1 = o.G1.from_affine(o.G1_GEN)
    C = cv.g1_decode(agg.commitment[None])[0]
    W = cv.g1_decode(agg.proof_x[None])[0]
    C_y = cv.g1_decode(agg.commitment_y[None])[0]
    W_y = cv.g1_decode(agg.proof_y[None])[0]
    value = FR.decode(agg.value[None])[0]

    # X opening: e(C − C_y, −G2)·e(W, [τ_X − α]G2) == 1
    tau_minus_a = o.G2.add(srs.g2_tau_x,
                           o.G2.neg(o.G2.mul(srs.g2_gen, alpha)))
    ok_x = native.pairing_check([
        (o.G1.add(C, o.G1.neg(C_y)), o.G2.neg(srs.g2_gen)),
        (W, tau_minus_a),
    ])
    # Y opening: e(C_y − v·G1, −G2)·e(W_y, [τ_Y − β]G2) == 1
    tau_minus_b = o.G2.add(srs.g2_tau_y,
                           o.G2.neg(o.G2.mul(srs.g2_gen, beta)))
    ok_y = native.pairing_check([
        (o.G1.add(C_y, o.G1.neg(o.G1.mul(g1, value))), o.G2.neg(srs.g2_gen)),
        (W_y, tau_minus_b),
    ])
    return ok_x and ok_y


# ---------------------------------------------------------------------------
# Validator-side RPC parity: random_poly / random_point / fft / eval
# (reference: neurons/validator.py:58-104)
# ---------------------------------------------------------------------------


def random_poly(srs: Srs, key: jax.Array) -> jnp.ndarray:
    """Random bivariate polynomial as coefficient rows (M, T, L) Montgomery.

    Uniform Fr sampling via rejection-free reduction of 512 random bits
    (bias < 2^-256); generated on device.
    """
    m, t = srs.machines, srs.row_size
    return _uniform_fr(key, (m, t))


def _uniform_fr(key: jax.Array, shape) -> jnp.ndarray:
    """Uniform Fr elements (Montgomery form): v = (a·2^256 + b) mod r from
    two 256-bit draws (statistical bias < 2^-256).

    a·2^256 mod r = to_mont(a) read as canonical limbs; b mod r =
    from_mont(to_mont(b)). Their field sum is v, then re-encoded to
    Montgomery form.
    """
    bits_a = jax.random.bits(key, shape + (FR.L,), dtype=jnp.uint32) & 0xFFFF
    k2 = jax.random.fold_in(key, 1)
    bits_b = jax.random.bits(k2, shape + (FR.L,), dtype=jnp.uint32) & 0xFFFF
    a_mod = FR.to_mont(bits_a)                   # a·2^256 mod r (canonical)
    b_mod = FR.from_mont(FR.to_mont(bits_b))     # b mod r (canonical)
    return FR.to_mont(FR.add(a_mod, b_mod))


def random_point(key: jax.Array) -> jnp.ndarray:
    """One uniform Fr element, Montgomery form, shape (L,)."""
    return _uniform_fr(key, (1,))[0]


def fft(rows: jnp.ndarray, left: bool = True,
        inverse: bool = False) -> jnp.ndarray:
    """NTT/iNTT of the bivariate rows, matching ``fft(poly, left, inverse)``
    (reference: neurons/validator.py:58-65): left=True transforms along X
    (within each row), left=False along Y (across workers per column)."""
    if rows.ndim == 2:
        return jntt.ntt(rows, inverse=inverse)
    if left:
        return jntt.ntt_batch(rows, inverse=inverse)
    swapped = jnp.swapaxes(rows, 0, 1)
    out = jntt.ntt_batch(swapped, inverse=inverse)
    return jnp.swapaxes(out, 0, 1)


def eval_poly(coeffs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Coefficient-form Horner evaluation (reference: validator.py:97-104)."""
    return jpoly.poly_eval(coeffs, x)
