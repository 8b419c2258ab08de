"""Pippenger multi-scalar multiplication on TPU.

Computes Σ k_i·P_i for (N, 16)-limb scalars and (N, 3, L) projective points.
This is the hot kernel behind KZG ``worker_commit``/``worker_open``
(reference: neurons/miner.py:38-54 delegates it to the Rust prover).

TPU-first formulation — no scatter-accumulate in the hot loop, no
data-dependent branches, and all point math in the lane-major engine
(ops/lane.py: batch on TPU lanes, limbs on sublanes — the layout that makes
the field ops ~100x faster than the naive (N, L) layout on real TPU):

- Window size = 8 or 16 bits (divisors of the 16-bit scalar limbs).
- Per window: sort points by digit (dense sort + gather, both regular),
  take an inclusive prefix scan of the sorted points (tiled: a lax.scan over
  tile columns + Hillis-Steele across tile totals), and scatter only the
  *run-end* prefix values into a bucket-indexed table (unique indices).
- Bucket weighted sum via the telescoping identity: with E_d = "prefix of all
  points with digit ≤ d" (forward-filled over absent digits) and D = 2^wb−1,
      Σ_d d·B_d  =  D·E_D − Σ_{d=0}^{D-1} E_d,
  where E_D is the plain sum of all points. This removes the classic
  suffix-scan over buckets entirely: one halving-tree sum over the bucket
  axis (2·2^wb point-add work) and a constant-scalar multiply.
- Window recombination is a Horner scan: wb doublings + one add per window.

All point operations are the complete RCB15 formulas, so the whole thing is
one branch-free jitted program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .field import FQ, FR
from .curve import g1_infinity
from .lane import (LFQ, g1l_add, g1l_double, g1l_infinity, g1l_neg,
                   g1l_select, g1l_sum, pts_to_lane, pts_from_lane)

#: default window size. Cost model per window: ~2N point-adds for the
#: prefix scan + ~4·2^wb for the bucket fill/tree, times 256/wb windows.
#: 8-bit windows win up to N≈2^20; 16-bit windows only pay off once the 2N
#: term dominates the bucket machinery.
DEFAULT_WINDOW_BITS = 16

#: N at which 16-bit windows overtake 8-bit ones (cost-model crossover,
#: ~2^20; bench extras on real hardware can refine this)
WIDE_WINDOW_THRESHOLD = 1 << 20


def pick_window_bits(n: int) -> int:
    """Size-aware window choice for the telescoping-bucket Pippenger."""
    return 16 if n >= WIDE_WINDOW_THRESHOLD else 8


def _hs_prefix_lane(points):
    """Inclusive Hillis-Steele prefix scan over the lane axis of
    (..., 3, L, T) points.

    Trace-time unroll over log2(T) static shifts; the shifted-in identity is
    the point at infinity and the RCB15 add is complete, so no select or
    wraparound mask is needed.
    """
    T = points.shape[-1]
    d = 1
    while d < T:
        shifted = jnp.concatenate(
            [g1l_infinity((d,)), points[..., :-d]], axis=-1)
        points = g1l_add(points, shifted)
        d <<= 1
    return points


def _prefix_scan_pieces(points, tile: int = 32):
    """Piecewise inclusive prefix scan of (3, L, M) lane-major points.

    Layout (T tiles × K columns): a lax.scan down the K columns (vectorized
    over T tiles on the lane axis) gives within-tile prefixes; Hillis-Steele
    over the T tile totals gives exclusive per-tile offsets. The pieces are
    NOT combined here: global_prefix[i] = within[i] + offsets[i // K], and
    ``_window_sum`` only needs global prefixes at ≤ 2^wb run-end positions,
    so combining at the bucket table costs B adds instead of M (this is the
    difference between ~2 and ~1 point-adds per point per window).

    Returns (within (3,L,M), offsets (3,L,T), total (3,L,1), K).
    """
    M = points.shape[-1]
    K = min(tile, M)
    assert M % K == 0
    T = M // K
    arr = points.reshape(3, FQ.L, T, K)
    arr = jnp.moveaxis(arr, -1, 0)               # (K, 3, L, T)

    def step(carry, row):
        new = g1l_add(carry, row)
        return new, new

    carry0 = g1l_infinity((T,))
    totals, within = jax.lax.scan(step, carry0, arr)   # within: (K, 3, L, T)
    within = jnp.moveaxis(within, 0, -1)               # (3, L, T, K)
    within = within.reshape(3, FQ.L, M)

    offsets_inc = _hs_prefix_lane(totals)              # inclusive over tiles
    # exclusive: shift down one tile, infinity in front
    offsets = jnp.concatenate(
        [g1l_infinity((1,)), offsets_inc[..., :-1]], axis=-1)
    total = offsets_inc[..., -1:]
    return within, offsets, total, K


def _window_sum(points, sorted_d, perm, window_bits: int):
    """Σ_d d·(sum of points with digit d) for one window → (3, L, 1).

    points: (3, L, N) lane-major; sorted_d/perm: (N,) pre-sorted digits +
    permutation.
    """
    NUM_BUCKETS = 1 << window_bits
    N = points.shape[-1]
    spts = jnp.take(points, perm, axis=-1)
    within, offsets, total, K = _prefix_scan_pieces(spts)

    # run ends: position i is the last of its digit run
    is_end = jnp.concatenate(
        [sorted_d[1:] != sorted_d[:-1], jnp.ones((1,), dtype=bool)])
    scatter_idx = jnp.where(is_end, sorted_d, jnp.uint32(NUM_BUCKETS))

    # scatter run-end within-tile prefixes into the bucket table, gather the
    # matching tile offsets, and combine with ONE B-wide add. The scatter
    # itself runs in batch (point-major) layout — scattering rows along a
    # leading axis is the one indexed op TPUs do well.
    E_b = g1_infinity((NUM_BUCKETS + 1,))              # (B+1, 3, L)
    E_b = E_b.at[scatter_idx].set(pts_from_lane(within))
    E_w = pts_to_lane(E_b)[..., :NUM_BUCKETS]          # (3, L, B)
    valid = jnp.zeros((NUM_BUCKETS + 1,), dtype=jnp.uint32)
    valid = valid.at[scatter_idx].set(jnp.ones((N,), dtype=jnp.uint32))
    tile_of = jnp.zeros((NUM_BUCKETS + 1,), dtype=jnp.uint32)
    pos = (jax.lax.broadcasted_iota(jnp.uint32, (N, 1), 0) //
           jnp.uint32(K)).squeeze(-1)
    tile_of = tile_of.at[scatter_idx].set(pos)
    valid, tile_of = valid[:NUM_BUCKETS], tile_of[:NUM_BUCKETS]
    E_off = jnp.take(offsets, tile_of, axis=-1)        # (3, L, B)
    # empty slots must hold infinity for the forward fill below (the gather
    # pulled offsets[0] into them); select it back in
    E = g1l_select(valid, g1l_add(E_w, E_off),
                   g1l_infinity((NUM_BUCKETS,)))

    # Forward fill E over the bucket axis: Hillis-Steele "rightmost valid"
    # scan, statically unrolled over window_bits steps. Invariant: a slot
    # with valid=0 always holds infinity (scatter init + copies only flow
    # from equally-invalid slots), so empty low buckets stay at the identity.
    for s in range(window_bits):
        d = 1 << s
        es = jnp.concatenate([g1l_infinity((d,)), E[..., :-d]], axis=-1)
        vs = jnp.concatenate(
            [jnp.zeros((d,), jnp.uint32), valid[:-d]], axis=0)
        E = g1l_select(valid, E, es)               # keep once valid
        valid = jnp.maximum(valid, vs)

    # Σ_{d=0}^{D-1} E_d = (Σ_{d=0}^{D} E_d) − E_D   (D = NUM_BUCKETS - 1);
    # E_D = `total` from the piecewise scan = sum of all points
    sum_all = g1l_sum(E)                     # halving tree: 2B add work
    sum_E = g1l_add(sum_all, g1l_neg(total))

    # D·total = 2^wb·total − total
    t16 = jax.lax.fori_loop(
        0, window_bits, lambda _, a: g1l_double(a), total)
    d_total = g1l_add(t16, g1l_neg(total))
    return g1l_add(d_total, g1l_neg(sum_E))


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
    idx0 = jax.lax.broadcasted_iota(jnp.uint32, digits.shape, 1)
    sorted_d, perms = jax.lax.sort_key_val(digits, idx0, dimension=1)

    pts = pts_to_lane(points)                    # (3, L, N)

    def window_body(acc, dw):
        d, perm = dw
        acc = jax.lax.fori_loop(
            0, window_bits, lambda _, a: g1l_double(a), acc)
        w = _window_sum(pts, d, perm, window_bits)
        return g1l_add(acc, w), None

    acc0 = g1l_infinity(())                      # (3, L, 1)
    acc, _ = jax.lax.scan(window_body, acc0, (sorted_d, perms))
    return pts_from_lane(acc)[0]                 # (3, L)


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
