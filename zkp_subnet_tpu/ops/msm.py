"""Pippenger multi-scalar multiplication on TPU.

Computes Σ k_i·P_i for (N, 16)-limb scalars and (N, 3, L) projective points.
This is the hot kernel behind KZG ``worker_commit``/``worker_open``
(reference: neurons/miner.py:38-54 delegates it to the Rust prover).

TPU-first formulation — no scatter-accumulate, no data-dependent branches:

- Window size = 16 bits = exactly one scalar limb → 16 windows.
- Per window: sort points by digit (dense sort + gather, both regular),
  take an inclusive prefix scan of the sorted points (tiled: a lax.scan over
  tile columns + Hillis-Steele across tile offsets), and scatter only the
  *run-end* prefix values into a bucket-indexed table (unique indices).
- Bucket weighted sum via the telescoping identity: with E_d = "prefix of all
  points with digit ≤ d" (forward-filled over absent digits) and D = 2^16-1,
      Σ_d d·B_d  =  D·E_D − Σ_{d=0}^{D-1} E_d,
  where E_D is the plain sum of all points. This removes the classic
  suffix-scan over buckets entirely: one more prefix scan over the bucket
  axis and a constant-scalar multiply.
- Window recombination is a Horner scan: 16 doublings + one add per window.

All point operations are the complete RCB15 formulas (ops/curve.py), so the
whole thing is one branch-free jitted program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .field import FQ, FR
from .curve import (g1_add, g1_double, g1_infinity, g1_neg, g1_select)

#: default window size. Cost model per window: ~2N point-adds for the
#: prefix scan + ~2·wb·2^wb for the bucket fill/scan, times 256/wb windows.
#: 8-bit windows win below N≈2^20 (bucket machinery stays tiny); 16-bit
#: windows only pay off once the 2N term dominates. ``msm_auto`` picks by N;
#: this constant is the legacy explicit default.
DEFAULT_WINDOW_BITS = 16

#: N at which 16-bit windows overtake 8-bit ones (cost-model crossover,
#: ~2^20; bench extras on real hardware can refine this)
WIDE_WINDOW_THRESHOLD = 1 << 20


def pick_window_bits(n: int) -> int:
    """Size-aware window choice for the telescoping-bucket Pippenger."""
    return 16 if n >= WIDE_WINDOW_THRESHOLD else 8


def _shift_points(points, d: int):
    """Points shifted toward higher index by static d; infinity fills the
    front. Static-slice + concat only — no roll, no gather, no mask."""
    return jnp.concatenate([g1_infinity((d,)), points[:-d]], axis=0)


def _hs_prefix(points):
    """Inclusive Hillis-Steele prefix scan over axis 0 of (T, 3, L) points.

    Trace-time unroll over log2(T) static shifts. The shifted-in identity is
    the point at infinity, and the RCB15 add is complete, so no select or
    wraparound mask is needed — each step is exactly one batched add of two
    statically-sliced arrays. (A fori_loop with dynamic jnp.roll compiled
    pathologically on XLA:CPU — VERDICT r1 weak #10.)
    """
    T = points.shape[0]
    d = 1
    while d < T:
        points = g1_add(points, _shift_points(points, d))
        d <<= 1
    return points


def _prefix_scan(points, tile: int = 32):
    """Inclusive prefix scan of (M, 3, L) points.

    Layout (T, K): a lax.scan down the K columns (vectorized over T tiles)
    gives within-tile prefixes; Hillis-Steele over the T tile totals gives
    offsets; one broadcast add combines them. ~(2M + M·log(T)/K) point-add
    work with only K + log2(T) sequential steps — sequential step count, not
    point-add count, dominates wall clock on TPU, so tiles are short and fat.
    """
    M = points.shape[0]
    K = min(tile, M)
    assert M % K == 0
    T = M // K
    arr = points.reshape(T, K, 3, FQ.L)
    arr = jnp.swapaxes(arr, 0, 1)        # (K, T, 3, L): scan over columns

    def step(carry, row):
        new = g1_add(carry, row)
        return new, new

    carry0 = g1_infinity((T,))
    totals, within = jax.lax.scan(step, carry0, arr)   # within: (K, T, 3, L)
    within = jnp.swapaxes(within, 0, 1)                # (T, K, 3, L)

    if T > 1:
        offsets_inc = _hs_prefix(totals)               # inclusive over tiles
        # exclusive: shift down one tile, infinity in front
        offsets = jnp.concatenate(
            [g1_infinity((1,)), offsets_inc[:-1]], axis=0)
        within = g1_add(within, offsets[:, None])
    return within.reshape(M, 3, FQ.L)


def _window_sum(points, sorted_d, perm, window_bits: int):
    """Σ_d d·(sum of points with digit d) for one window.

    points: (N, 3, L); sorted_d/perm: (N,) pre-sorted digits + permutation.
    """
    NUM_BUCKETS = 1 << window_bits
    N = points.shape[0]
    spts = jnp.take(points, perm, axis=0)
    prefix = _prefix_scan(spts)

    # run ends: position i is the last of its digit run
    is_end = jnp.concatenate(
        [sorted_d[1:] != sorted_d[:-1], jnp.ones((1,), dtype=bool)])
    scatter_idx = jnp.where(is_end, sorted_d, jnp.uint32(NUM_BUCKETS))

    E = g1_infinity((NUM_BUCKETS + 1,))
    E = E.at[scatter_idx].set(prefix)
    valid = jnp.zeros((NUM_BUCKETS + 1,), dtype=jnp.uint32)
    valid = valid.at[scatter_idx].set(jnp.ones((N,), dtype=jnp.uint32))
    E, valid = E[:NUM_BUCKETS], valid[:NUM_BUCKETS]

    # Forward fill E over the bucket axis: Hillis-Steele "rightmost valid"
    # scan, statically unrolled over window_bits steps. Invariant: a slot
    # with valid=0 always holds infinity (scatter init + copies only flow
    # from equally-invalid slots), so empty low buckets stay at the identity.
    for s in range(window_bits):
        d = 1 << s
        es = jnp.concatenate([g1_infinity((d,)), E[:-d]], axis=0)
        vs = jnp.concatenate(
            [jnp.zeros((d,), jnp.uint32), valid[:-d]], axis=0)
        E = g1_select(valid, E, es)               # keep once valid
        valid = jnp.maximum(valid, vs)

    # Σ_{d=0}^{D-1} E_d = (Σ_{d=0}^{D} E_d) − E_D   (D = NUM_BUCKETS - 1)
    total = prefix[-1]                       # E_D = sum of all points
    sum_all = _hs_prefix(E)[-1]              # same-shape levels compile fast
    sum_E = g1_add(sum_all, g1_neg(total))

    # D·total = 2^wb·total − total
    t16 = jax.lax.fori_loop(0, window_bits, lambda _, a: g1_double(a), total)
    d_total = g1_add(t16, g1_neg(total))
    return g1_add(d_total, g1_neg(sum_E))


@functools.partial(jax.jit, static_argnames=("window_bits",))
def msm(points, scalars, window_bits: int = DEFAULT_WINDOW_BITS):
    """Σ k_i·P_i. points: (N, 3, L) Montgomery projective; scalars: (N, 16)
    canonical little-endian 16-bit limbs. Returns one (3, L) point.

    N must be a multiple of 256 (pad with infinity / zero scalars).
    """
    assert 16 % window_bits == 0
    per_limb = 16 // window_bits
    mask = jnp.uint32((1 << window_bits) - 1)
    # (N, 16) limbs → (N, 16·per_limb) digits, little-endian digit order
    parts = [(scalars >> (window_bits * j)) & mask for j in range(per_limb)]
    digits = jnp.stack(parts, axis=-1).reshape(scalars.shape[0], -1)
    digits = jnp.swapaxes(digits, 0, 1)[::-1]    # (W, N), high window first

    # one batched sort for all windows
    n = digits.shape[1]
    idx0 = jax.lax.broadcasted_iota(jnp.uint32, digits.shape, 1)
    sorted_d, perms = jax.lax.sort_key_val(digits, idx0, dimension=1)

    def window_body(acc, dw):
        d, perm = dw
        def dbl(i, a):
            return g1_double(a)
        acc = jax.lax.fori_loop(0, window_bits, dbl, acc)
        w = _window_sum(points, d, perm, window_bits)
        return g1_add(acc, w), None

    acc0 = g1_infinity(())
    acc, _ = jax.lax.scan(window_body, acc0, (sorted_d, perms))
    return acc


#: below this point count, batched double-and-add + tree sum beats Pippenger
#: (sort/bucket machinery is pure overhead at tiny N)
NAIVE_THRESHOLD = 2048


@jax.jit
def msm_naive(points, scalars):
    """Σ k_i·P_i by batched double-and-add + one tree reduction.

    Better than bucketing for small N: one scalar-mul sweep (256 fused
    double/add steps over the whole batch) and log2(N) pairwise adds.
    """
    from .curve import g1_scalar_mul, g1_sum
    n = points.shape[0]
    target = max(1, 1 << (n - 1).bit_length())
    if target != n:
        pad = g1_infinity((target - n,))
        points = jnp.concatenate([points, pad], axis=0)
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((target - n, FR.L), jnp.uint32)], axis=0)
    return g1_sum(g1_scalar_mul(points, scalars))


def msm_auto(points, scalars, window_bits=None):
    """Dispatch to the naive or Pippenger path by problem size.

    window_bits=None picks the size-optimal window (``pick_window_bits``);
    pass an explicit value to override (tests pin 8 for the CPU backend).
    """
    n = points.shape[0]
    if n <= NAIVE_THRESHOLD:
        return msm_naive(points, scalars)
    if window_bits is None:
        window_bits = pick_window_bits(n)
    return msm(*pad_for_msm(points, scalars), window_bits=window_bits)


def pad_for_msm(points, scalars):
    """Pad N up to a multiple of 256 with (infinity, 0) pairs."""
    n = points.shape[0]
    target = -(-n // 256) * 256
    if target == n:
        return points, scalars
    extra = target - n
    pad_pts = g1_infinity((extra,))
    pad_sc = jnp.zeros((extra, FR.L), dtype=jnp.uint32)
    return (jnp.concatenate([points, pad_pts], axis=0),
            jnp.concatenate([scalars, pad_sc], axis=0))
