"""Bit-exactness of the byte-limb f32 engine (ops/lane8.py) against the
radix-2^16 engines (ops/field.py, ops/curve.py) — and transitively against
the bigint oracle those are pinned to (tests/test_field.py, test_lane.py).

Strategy mirrors tests/test_lane.py: random canonical inputs, exact array
equality after converting layouts. The f32 engine's claim is EXACTNESS
(every intermediate an integer < 2^24), so any drift is a hard failure.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from zkp_subnet_tpu.ops.field import FQ, FR
from zkp_subnet_tpu.ops import curve as cv
from zkp_subnet_tpu.ops import lane8 as l8


N = 64


def _rand_fq(rng, n):
    """(n, L) canonical random field elements as 16-bit limbs."""
    ints = [rng.randrange(FQ.p) for _ in range(n)]
    return jnp.asarray(np.stack([FQ.to_limbs(v) for v in ints]))


def _rand_pts(rng, n):
    """(n, 3, L) random curve points (multiples of the generator),
    encoded exactly as curve.py represents them (g1_encode)."""
    from zkp_subnet_tpu.utils import oracle as o
    g = o.G1.from_affine(o.G1_GEN)
    pts = [o.G1.mul(g, rng.randrange(1, o.R)) for _ in range(n)]
    return cv.g1_encode(pts)


@pytest.fixture(scope="module")
def rng():
    import random
    return random.Random(0xB17E)


def test_limb_roundtrip(rng):
    a = _rand_fq(rng, N)
    b = l8.from_lane8(l8.to_lane8(a))
    assert np.array_equal(np.asarray(a), np.asarray(b))
    # every byte limb is an exact small integer in f32
    lanes = np.asarray(l8.to_lane8(a))
    assert lanes.dtype == np.float32
    assert (lanes == np.floor(lanes)).all() and lanes.max() <= 255


def test_add_sub_neg(rng):
    a, b = _rand_fq(rng, N), _rand_fq(rng, N)
    a8, b8 = l8.to_lane8(a), l8.to_lane8(b)
    assert np.array_equal(np.asarray(l8.from_lane8(l8.BFQ.add(a8, b8))),
                          np.asarray(FQ.add(a, b)))
    assert np.array_equal(np.asarray(l8.from_lane8(l8.BFQ.sub(a8, b8))),
                          np.asarray(FQ.sub(a, b)))
    assert np.array_equal(np.asarray(l8.from_lane8(l8.BFQ.neg(a8))),
                          np.asarray(FQ.neg(a)))


def test_add_carry_edges():
    """p-1 + 1 == 0, 0 - 1 == p-1, and near-2^384 wraps."""
    cases = [(FQ.p - 1, 1), (0, 0), (FQ.p - 1, FQ.p - 1), (1, FQ.p - 1)]
    a = jnp.asarray(np.stack([FQ.to_limbs(x) for x, _ in cases]))
    b = jnp.asarray(np.stack([FQ.to_limbs(y) for _, y in cases]))
    a8, b8 = l8.to_lane8(a), l8.to_lane8(b)
    assert np.array_equal(np.asarray(l8.from_lane8(l8.BFQ.add(a8, b8))),
                          np.asarray(FQ.add(a, b)))
    assert np.array_equal(np.asarray(l8.from_lane8(l8.BFQ.sub(a8, b8))),
                          np.asarray(FQ.sub(a, b)))


def test_mont_mul(rng):
    a, b = _rand_fq(rng, N), _rand_fq(rng, N)
    want = FQ.mont_mul(a, b)
    got = l8.from_lane8(l8.BFQ.mont_mul(l8.to_lane8(a), l8.to_lane8(b)))
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_mont_mul_edge_values():
    """0, 1, p-1 products — the carry/borrow extremes."""
    vals = [0, 1, 2, FQ.p - 1, FQ.p - 2, FQ.p // 2]
    pairs = [(x, y) for x in vals for y in vals]
    a = jnp.asarray(np.stack([FQ.to_limbs(x) for x, _ in pairs]))
    b = jnp.asarray(np.stack([FQ.to_limbs(y) for _, y in pairs]))
    want = FQ.mont_mul(a, b)
    got = l8.from_lane8(l8.BFQ.mont_mul(l8.to_lane8(a), l8.to_lane8(b)))
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_mont_mul_fr(rng):
    ints = [rng.randrange(FR.p) for _ in range(N)]
    a = jnp.asarray(np.stack([FR.to_limbs(v) for v in ints]))
    ints = [rng.randrange(FR.p) for _ in range(N)]
    b = jnp.asarray(np.stack([FR.to_limbs(v) for v in ints]))
    want = FR.mont_mul(a, b)
    got = l8.from_lane8(l8.BFR.mont_mul(l8.to_lane8(a), l8.to_lane8(b)))
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_point_add_double_matches_curve(rng):
    pts = _rand_pts(rng, 16)
    q = jnp.roll(pts, 1, axis=0)
    want_add = cv.g1_add(pts, q)
    want_dbl = cv.g1_double(pts)
    p8, q8 = l8.pts_to_lane8(pts), l8.pts_to_lane8(q)
    got_add = l8.pts_from_lane8(l8.g18_add(p8, q8))
    got_dbl = l8.pts_from_lane8(l8.g18_double(p8))
    assert np.array_equal(np.asarray(got_add), np.asarray(want_add))
    assert np.array_equal(np.asarray(got_dbl), np.asarray(want_dbl))


def test_point_add_identity_and_inverse(rng):
    """Complete-formula edges: P+∞, ∞+P, P+(−P), ∞+∞."""
    pts = _rand_pts(rng, 8)
    p8 = l8.pts_to_lane8(pts)
    inf8 = jnp.broadcast_to(l8.g18_infinity(), p8.shape)
    # P + ∞ == P (projectively: compare against curve.py's own result)
    want = cv.g1_add(pts, cv.g1_infinity((8,)))
    got = l8.pts_from_lane8(l8.g18_add(p8, inf8))
    assert np.array_equal(np.asarray(got), np.asarray(want))
    want = cv.g1_add(cv.g1_infinity((8,)), pts)
    got = l8.pts_from_lane8(l8.g18_add(inf8, p8))
    assert np.array_equal(np.asarray(got), np.asarray(want))
    neg = cv.g1_neg(pts)
    want = cv.g1_add(pts, neg)
    got = l8.pts_from_lane8(l8.g18_add(p8, l8.pts_to_lane8(neg)))
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_sum_and_select(rng):
    from zkp_subnet_tpu.utils import oracle as o
    pts = _rand_pts(rng, 8)
    p8 = l8.pts_to_lane8(pts)
    # g18_sum's halving tree and g1_sum's shifted reduction add in
    # different orders → different projective representatives of the SAME
    # point; compare affine
    want = o.G1.to_affine(cv.g1_decode(np.asarray(cv.g1_sum(pts))[None])[0])
    got = o.G1.to_affine(cv.g1_decode(
        np.asarray(l8.pts_from_lane8(l8.g18_sum(p8))))[0])
    assert got == want
    cond = jnp.asarray([True, False] * 4)
    q8 = jnp.broadcast_to(l8.g18_infinity(), p8.shape)
    sel = l8.pts_from_lane8(l8.g18_select(cond, p8, q8))
    assert np.array_equal(np.asarray(sel[0]), np.asarray(pts[0]))
    assert np.array_equal(np.asarray(sel[1]),
                          np.asarray(cv.g1_infinity((1,))[0]))


def test_sequential_formulas_match_stacked(rng):
    """The Pallas kernels run the sequential RCB15 transcriptions; they must
    be bit-identical to the layer-stacked XLA-graph versions (mont ops are
    deterministic and canonical, so op-order unstacking changes nothing)."""
    pts = _rand_pts(rng, 8)
    q = jnp.roll(pts, 3, axis=0)
    p8, q8 = l8.pts_to_lane8(pts), l8.pts_to_lane8(q)
    assert np.array_equal(np.asarray(l8.g18_add_seq(p8, q8)),
                          np.asarray(l8.g18_add(p8, q8)))
    assert np.array_equal(np.asarray(l8.g18_double_seq(p8)),
                          np.asarray(l8.g18_double(p8)))
    inf8 = jnp.broadcast_to(l8.g18_infinity(), p8.shape)
    assert np.array_equal(np.asarray(l8.g18_add_seq(p8, inf8)),
                          np.asarray(l8.g18_add(p8, inf8)))
