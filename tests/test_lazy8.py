"""Lazy (redundant, signed-digit, 49-limb) Fq engine vs the bigint oracle.

The lazy engine (ops/lazy8.py) never canonicalizes between ops, so tests
reduce through ``lane9_to_field`` (exact Horner) before comparing; point
results are compared in AFFINE coordinates because the lazy Montgomery
R' = 2^392 scales projective coordinates uniformly (scale cancels at X/Z).
"""

import random

import jax
import jax.numpy as jnp
import numpy as np

from zkp_subnet_tpu.ops import curve as cv
from zkp_subnet_tpu.ops import lazy8 as lz
from zkp_subnet_tpu.ops import lane8 as l8
from zkp_subnet_tpu.ops.field import FQ
from zkp_subnet_tpu.utils import oracle as o

RP = 1 << (8 * lz.ZFQ.L8)             # R' = 2^392
RP_INV = pow(RP, -1, o.Q)


def _enc(vals):
    """ints → (L9, N) lazy digit lanes (canonical digits, top 0)."""
    arr = np.stack([FQ.to_limbs(v) for v in vals])
    return lz.to_lane9(jnp.asarray(arr))


def _dec(lanes):
    """(L9, N) lazy digits → list of ints (value mod p)."""
    limbs = np.asarray(jax.block_until_ready(lz.lane9_to_field(lanes)))
    return [FQ.from_limbs(row) for row in limbs]


def test_lane9_roundtrip(rng):
    vals = [0, 1, o.Q - 1, rng.randrange(o.Q), rng.randrange(o.Q)]
    assert _dec(_enc(vals)) == vals


def test_lmul_vs_oracle(rng):
    n = 8
    a = [rng.randrange(o.Q) for _ in range(n)]
    b = [rng.randrange(o.Q) for _ in range(n)]
    out = _dec(lz.ZFQ.lmul(_enc(a), _enc(b)))
    want = [x * y * RP_INV % o.Q for x, y in zip(a, b)]
    assert out == want


def test_lazy_chain_vs_oracle(rng):
    """add/sub/neg chains stay exact through redundant signed digits."""
    n = 8
    a = [rng.randrange(o.Q) for _ in range(n)]
    b = [rng.randrange(o.Q) for _ in range(n)]
    c = [rng.randrange(o.Q) for _ in range(n)]
    F = lz.ZFQ
    av, bv, cv_ = _enc(a), _enc(b), _enc(c)
    # ((a+b)·c - b + (-a)) — mixes all ops, feeds redundant values into lmul
    r = F.ladd(F.lsub(F.lmul(F.ladd(av, bv), cv_), bv), F.lneg(av))
    want = [((x + y) * z * RP_INV - y - x) % o.Q
            for x, y, z in zip(a, b, c)]
    assert _dec(r) == want


def test_lazy_digit_bounds_stable(rng):
    """Digits stay in [-256, 256] (f32/bf16-exact) through deep chains."""
    n = 4
    a = _enc([rng.randrange(o.Q) for _ in range(n)])
    v = a
    for _ in range(12):
        v = lz.ZFQ.lmul(lz.ZFQ.ladd(v, v), lz.ZFQ.lsub(v, a))
    d = np.asarray(jax.block_until_ready(v))
    assert np.abs(d).max() <= 256.0
    assert d[-1].max() <= 8.0          # open-top digit stays value-bound


def _rand_points(rnd, n):
    g = o.G1.from_affine(o.G1_GEN)
    pts = [o.G1.mul(g, rnd.randrange(1, o.R)) for _ in range(n)]
    return cv.g1_encode(pts), pts


def _affine(lanes9):
    """(3, L9, N) lazy points → list of oracle affine points."""
    return [o.G1.to_affine(pt)
            for pt in cv.g1_decode(np.asarray(
                jax.block_until_ready(lz.pts_from_lane9(lanes9))))]


def test_g19_add_double_vs_oracle(rng):
    n = 4
    enc_p, pts_p = _rand_points(rng, n)
    enc_q, pts_q = _rand_points(rng, n)
    lp, lq = lz.pts_to_lane9(enc_p), lz.pts_to_lane9(enc_q)
    got_add = _affine(lz.g19_add(lp, lq))
    want_add = [o.G1.to_affine(o.G1.add(a, b))
                for a, b in zip(pts_p, pts_q)]
    assert got_add == want_add
    got_dbl = _affine(lz.g19_double(lp))
    want_dbl = [o.G1.to_affine(o.G1.add(a, a)) for a in pts_p]
    assert got_dbl == want_dbl


def test_g19_complete_cases(rng):
    """Completeness: P+∞, ∞+P, P+(−P), P+P through the ADD formula."""
    enc_p, pts_p = _rand_points(rng, 2)
    lp = lz.pts_to_lane9(enc_p)
    inf = lz.g19_infinity((2,))
    assert _affine(lz.g19_add(lp, inf)) == [o.G1.to_affine(p)
                                            for p in pts_p]
    assert _affine(lz.g19_add(inf, lp)) == [o.G1.to_affine(p)
                                            for p in pts_p]
    neg = lz.g19_neg(lp)
    got = lz.pts_from_lane9(lz.g19_add(lp, neg))
    back = cv.g1_decode(np.asarray(jax.block_until_ready(got)))
    assert all(o.G1.is_infinity(pt) for pt in back)
    assert _affine(lz.g19_add(lp, lp)) == [
        o.G1.to_affine(o.G1.add(p, p)) for p in pts_p]


def test_g19_seq_matches_stacked(rng):
    """The kernel-shaped sequential formulas are bit-identical to the
    layer-stacked XLA-graph versions (same ops, same order)."""
    enc_p, _ = _rand_points(rng, 4)
    enc_q, _ = _rand_points(rng, 4)
    lp, lq = lz.pts_to_lane9(enc_p), lz.pts_to_lane9(enc_q)
    a = np.asarray(jax.block_until_ready(lz.g19_add(lp, lq)))
    b = np.asarray(jax.block_until_ready(lz.g19_add_seq(lp, lq)))
    assert (a == b).all()
    c = np.asarray(jax.block_until_ready(lz.g19_double(lp)))
    d = np.asarray(jax.block_until_ready(lz.g19_double_seq(lp)))
    assert (c == d).all()


def test_g19_wide_matches_stacked(rng):
    """The lane-batched wide add (concatenated layers, the launch-count
    A/B form behind pallas_g1.WIDE_MAX) is bit-identical to the layer-
    stacked and sequential versions — same ops per lane, only batched
    along the lane axis."""
    enc_p, _ = _rand_points(rng, 4)
    enc_q, _ = _rand_points(rng, 4)
    lp, lq = lz.pts_to_lane9(enc_p), lz.pts_to_lane9(enc_q)
    a = np.asarray(jax.block_until_ready(lz.g19_add(lp, lq)))
    b = np.asarray(jax.block_until_ready(lz.g19_add_wide(lp, lq)))
    assert (a == b).all()


def test_g19_long_chain_stability(rng):
    """A 64-deep add/double ladder (the MSM scan regime): digits stay
    bounded and the point stays right."""
    enc_p, pts_p = _rand_points(rng, 2)
    lp = lz.pts_to_lane9(enc_p)
    acc = lz.g19_infinity((2,))
    mult = 0
    for i in range(8):
        acc = lz.g19_double(acc)
        acc = lz.g19_add(acc, lp)
        mult = 2 * mult + 1
    d = np.asarray(jax.block_until_ready(acc))
    assert np.abs(d).max() <= 256.0
    want = [o.G1.to_affine(o.G1.mul(p, mult)) for p in pts_p]
    assert _affine(acc) == want
