"""Bit-exactness of the lane-major hot engine vs the batch-layout reference.

The lane engine (ops/lane.py) is the TPU-fast transpose of ops/field.py /
ops/curve.py; these tests pin every op bit-exact against the originals (which
are themselves pinned against the bigint oracle in test_field.py), on random
inputs including edge cases (zero, p-1, infinity, doubling, inverses).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from zkp_subnet_tpu.ops.field import FR, FQ
from zkp_subnet_tpu.ops import curve as cv
from zkp_subnet_tpu.ops import lane as ln
from zkp_subnet_tpu.utils import oracle as o

N = 64


def _rand_field(rng, field, n):
    vals = [rng.randrange(field.p) for _ in range(n)]
    # force edge cases into the batch
    vals[0] = 0
    vals[1] = field.p - 1
    vals[2] = 1
    return field.encode(vals)


@pytest.mark.parametrize("field,lfield", [(FR, ln.LFR), (FQ, ln.LFQ)])
def test_lane_field_ops_bit_exact(rng, field, lfield):
    a = _rand_field(rng, field, N)
    b = _rand_field(rng, field, N)
    al, bl = ln.to_lane(a), ln.to_lane(b)

    for name, batch_fn, lane_fn in [
        ("add", field.add, lfield.add),
        ("sub", field.sub, lfield.sub),
        ("mont_mul", field.mont_mul, lfield.mont_mul),
    ]:
        want = np.asarray(batch_fn(a, b))
        got = np.asarray(ln.from_lane(lane_fn(al, bl)))
        assert (want == got).all(), f"{field.name}.{name} mismatch"

    assert (np.asarray(field.neg(a)) ==
            np.asarray(ln.from_lane(lfield.neg(al)))).all()
    assert (np.asarray(field.from_mont(a)) ==
            np.asarray(ln.from_lane(lfield.from_mont(al)))).all()
    assert (np.asarray(field.to_mont(a)) ==
            np.asarray(ln.from_lane(lfield.to_mont(al)))).all()


def test_lane_field_select_is_zero(rng):
    a = _rand_field(rng, FR, N)
    b = _rand_field(rng, FR, N)
    al, bl = ln.to_lane(a), ln.to_lane(b)
    cond = jnp.asarray((np.arange(N) % 2).astype(np.uint32))
    want = np.asarray(FR.select(cond, a, b))
    got = np.asarray(ln.from_lane(ln.LFR.select(cond, al, bl)))
    assert (want == got).all()
    assert (np.asarray(FR.is_zero(a)) == np.asarray(ln.LFR.is_zero(al))).all()


def _rand_points(rng, n):
    """Random G1 points with edge cases: infinity, generator, doubles, P/-P."""
    g = o.G1.from_affine(o.G1_GEN)
    pts = [o.G1.mul(g, rng.randrange(1, o.R)) for _ in range(n)]
    pts[0] = o.G1.infinity()
    pts[1] = g
    pts[2] = pts[3]                       # force a doubling pair with [3]
    pts[4] = o.G1.neg(pts[5])             # force an inverse pair with [5]
    return cv.g1_encode(pts)


def test_lane_curve_ops_bit_exact(rng):
    p = _rand_points(rng, N)
    q = jnp.concatenate([p[1:], p[:1]], axis=0)
    # make indices 2,3 a doubling pair and 4,5 an inverse pair within add
    q = q.at[2].set(p[2])
    q = q.at[4].set(p[5])

    pl, ql = ln.pts_to_lane(p), ln.pts_to_lane(q)

    want_add = np.asarray(cv.g1_add(p, q))
    got_add = np.asarray(ln.pts_from_lane(ln.g1l_add(pl, ql)))
    assert (want_add == got_add).all(), "g1l_add mismatch"

    want_dbl = np.asarray(cv.g1_double(p))
    got_dbl = np.asarray(ln.pts_from_lane(ln.g1l_double(pl)))
    assert (want_dbl == got_dbl).all(), "g1l_double mismatch"

    want_neg = np.asarray(cv.g1_neg(p))
    got_neg = np.asarray(ln.pts_from_lane(ln.g1l_neg(pl)))
    assert (want_neg == got_neg).all(), "g1l_neg mismatch"


def test_lane_g1_sum_matches_batch(rng):
    # halving-tree order differs from g1_sum's shifted-sum order, so the
    # projective Z differs; compare as group elements (affine).
    p = _rand_points(rng, N)
    want = o.G1.to_affine(cv.g1_decode(np.asarray(cv.g1_sum(p))[None])[0])
    got_pt = ln.pts_from_lane(ln.g1l_sum(ln.pts_to_lane(p)))
    got = o.G1.to_affine(cv.g1_decode(np.asarray(got_pt))[0])
    assert want == got


def test_lane_ntt_vs_oracle(rng):
    """Device NTT (lane-major butterflies) vs the bigint oracle, covering
    the direct kernel (≤ 2^BASE_LOG) and the Bailey four-step path."""
    from zkp_subnet_tpu.ops import ntt as jntt
    for log_n in (1, 5, 13):       # 13 > BASE_LOG exercises Bailey
        n = 1 << log_n
        vals = [rng.randrange(o.R) for _ in range(n)]
        x = FR.encode_vec(vals)
        assert FR.decode_vec(jntt.ntt(x)) == o.ntt(vals), f"2^{log_n}"
        assert FR.decode_vec(jntt.intt(jntt.ntt(x))) == vals, f"inv 2^{log_n}"
    # natively-batched path
    xb = FR.encode_vec([rng.randrange(o.R) for _ in range(3 * 16)]
                       ).reshape(3, 16, FR.L)
    outb = jntt.ntt_batch(xb)
    for i in range(3):
        assert FR.decode_vec(outb[i]) == o.ntt(FR.decode_vec(xb[i]))


def test_lane_select_infinity_shapes():
    inf = ln.g1l_infinity((5,))
    assert inf.shape == (3, FQ.L, 5)
    # select whole batches
    g = cv.g1_encode([o.G1.from_affine(o.G1_GEN)] * 5)
    gl = ln.pts_to_lane(g)
    cond = jnp.asarray(np.array([1, 0, 1, 0, 1], dtype=np.uint32))
    out = ln.g1l_select(cond, gl, inf)
    back = cv.g1_decode(ln.pts_from_lane(out))
    assert o.G1.is_infinity(back[1]) and not o.G1.is_infinity(back[0])


def test_ntt_batch_non_power_of_two_batch(rng):
    """Odd batch counts (R=5) through the natively-batched byte-engine NTT
    (the r4 uint32 engine needed batch-streaming divisibility guards here;
    the byte engine must handle any R directly)."""
    from zkp_subnet_tpu.ops import ntt as jntt
    R, n = 5, 8
    xb = FR.encode_vec([rng.randrange(o.R) for _ in range(R * n)]
                       ).reshape(R, n, FR.L)
    outb = jntt.ntt_batch(xb)
    for i in range(R):
        assert FR.decode_vec(outb[i]) == o.ntt(FR.decode_vec(xb[i])), i
