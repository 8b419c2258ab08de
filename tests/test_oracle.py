"""Self-consistency of the bigint oracle: curve laws, pairing, KZG, NTT."""

import random

import pytest

from zkp_subnet_tpu.utils import oracle as o


def test_generators_on_curve_and_order():
    g1 = o.G1.from_affine(o.G1_GEN)
    g2 = o.G2.from_affine(o.G2_GEN)
    assert o.G1.on_curve(g1) and o.G2.on_curve(g2)
    assert o.G1.is_infinity(o.G1.mul(g1, o.R))
    assert o.G2.is_infinity(o.G2.mul(g2, o.R))


def test_group_laws():
    g = o.G1.from_affine(o.G1_GEN)
    a, b = 123456789, 987654321
    pa, pb = o.G1.mul(g, a), o.G1.mul(g, b)
    assert o.G1.to_affine(o.G1.add(pa, pb)) == o.G1.to_affine(o.G1.mul(g, a + b))
    assert o.G1.to_affine(o.G1.add(pa, pa)) == o.G1.to_affine(o.G1.mul(g, 2 * a))
    assert o.G1.is_infinity(o.G1.add(pa, o.G1.neg(pa)))
    assert o.G1.to_affine(o.G1.add(pa, o.G1.infinity())) == o.G1.to_affine(pa)


def test_pairing_bilinear():
    g1 = o.G1.from_affine(o.G1_GEN)
    g2 = o.G2.from_affine(o.G2_GEN)
    e = o.pairing(g1, g2)
    assert e != o.FQ12_ONE
    a, b = 1234567, 987654321987654
    assert o.pairing(o.G1.mul(g1, a), o.G2.mul(g2, b)) == \
        o.fq12_pow(e, a * b % o.R)


def test_kzg_roundtrip():
    rnd = random.Random(7)
    srs = o.Srs.generate(16, tau=rnd.randrange(o.R))
    coeffs = [rnd.randrange(o.R) for _ in range(16)]
    commitment = o.kzg_commit(srs, coeffs)
    x = rnd.randrange(o.R)
    y, proof = o.kzg_open(srs, coeffs, x)
    assert y == o.poly_eval(coeffs, x)
    assert o.kzg_verify(srs, commitment, x, y, proof)
    assert not o.kzg_verify(srs, commitment, x, (y + 1) % o.R, proof)
    # corrupted proof (the reference perturbs by +1,
    # reference: tests/test_validator.py:79-86)
    bad = o.G1.add(proof, o.G1.from_affine(o.G1_GEN))
    assert not o.kzg_verify(srs, commitment, x, y, bad)


def test_ntt_roundtrip_and_eval():
    rnd = random.Random(9)
    n = 32
    coeffs = [rnd.randrange(o.R) for _ in range(n)]
    evals = o.ntt(coeffs)
    w = o.fr_root_of_unity(5)
    for k in [0, 1, 17, 31]:
        assert evals[k] == o.poly_eval(coeffs, pow(w, k, o.R))
    assert o.intt(evals) == coeffs


def test_g1_fast_subgroup_check_equivalence():
    """g1_in_subgroup_fast (GLV eigenvalue test) must agree with the exact
    [r]P ladder on subgroup points, random curve points (cofactor ≠ 1, so
    these are almost never in G1), and adversarial cofactor-order points
    [r]Q — the class where an unsound eigenvalue test would false-accept."""
    import random
    rng = random.Random(1717)
    g = o.G1.from_affine(o.G1_GEN)

    def rand_curve_point():
        while True:
            x = rng.randrange(o.Q)
            y = o.fq_sqrt((x * x % o.Q * x + o.G1_B) % o.Q)
            if y is not None:
                return o.G1.from_affine((x, y))

    assert o.g1_in_subgroup_fast(o.G1.infinity())
    assert o.g1_in_subgroup_fast(g)
    for _ in range(5):
        p = o.G1.mul(g, rng.randrange(1, o.R))
        assert o.g1_in_subgroup_fast(p)
    for _ in range(5):
        q = rand_curve_point()
        assert o.g1_in_subgroup_fast(q) == o.G1.in_subgroup(q)
        # exact [r]Q (no mod-R reduction) → a point of cofactor order
        cp, base, k = o.G1.infinity(), q, o.R
        while k:
            if k & 1:
                cp = o.G1.add(cp, base)
            base = o.G1.double(base)
            k >>= 1
        if not o.G1.is_infinity(cp):
            assert not o.g1_in_subgroup_fast(cp)
