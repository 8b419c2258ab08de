"""Native C++ pairing library vs the pure-Python oracle.

The native lib (native/bls12_381.cc) is the counterpart of the reference's
Rust prover binary (reference: SURVEY.md §2.1); the oracle is the independent
implementation it must agree with bit-for-bit on accept/reject decisions.
"""

import random

import pytest

from zkp_subnet_tpu.utils import oracle as o
from zkp_subnet_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    handle = native.load()
    if handle is None:
        pytest.skip("native library unavailable (no g++?)")
    return handle


def _aff(pairs):
    return [(o.G1.to_affine(p), o.G2.to_affine(q)) for p, q in pairs]


def test_bilinearity_accept_reject(lib):
    rnd = random.Random(11)
    g1 = o.G1.from_affine(o.G1_GEN)
    g2 = o.G2.from_affine(o.G2_GEN)
    for _ in range(2):
        a, b = rnd.randrange(1, o.R), rnd.randrange(1, o.R)
        good = [(o.G1.mul(g1, a), o.G2.mul(g2, b)),
                (o.G1.neg(o.G1.mul(g1, a * b % o.R)), g2)]
        bad = [(o.G1.mul(g1, a), o.G2.mul(g2, b)),
               (o.G1.neg(o.G1.mul(g1, (a * b + 1) % o.R)), g2)]
        assert native.pairing_product_is_one(_aff(good)) is True
        assert native.pairing_product_is_one(_aff(bad)) is False


def test_matches_oracle_single_pairing(lib):
    """e(aP, Q)·e(-P, aQ) == 1 through the pure-Python oracle (never native)."""
    g1 = o.G1.from_affine(o.G1_GEN)
    g2 = o.G2.from_affine(o.G2_GEN)
    a = 987654321
    pairs = [(o.G1.mul(g1, a), g2), (o.G1.neg(g1), o.G2.mul(g2, a))]
    assert o.pairing_product_is_one(pairs)


def test_native_and_oracle_agree_bit_identically(lib):
    """Run BOTH implementations on identical pairs; accept/reject must match.

    The oracle is pure Python by construction (it is the independent check
    the native lib is validated against); this test is the explicit
    both-implementations comparison ADVICE.md r1 asked for.
    """
    rnd = random.Random(29)
    g1 = o.G1.from_affine(o.G1_GEN)
    g2 = o.G2.from_affine(o.G2_GEN)
    for trial in range(3):
        a, b = rnd.randrange(1, o.R), rnd.randrange(1, o.R)
        offset = trial  # trial 0 accepts, 1 and 2 reject
        pairs = [(o.G1.mul(g1, a), o.G2.mul(g2, b)),
                 (o.G1.neg(o.G1.mul(g1, (a * b + offset) % o.R)), g2)]
        oracle_verdict = o.pairing_product_is_one(pairs)
        native_verdict = native.pairing_product_is_one(_aff(pairs))
        dispatch_verdict = native.pairing_check(pairs)
        assert oracle_verdict == (offset == 0)
        assert native_verdict == oracle_verdict
        assert dispatch_verdict == oracle_verdict


def test_pairing_check_dispatcher_infinity(lib):
    """Infinity pairs are filtered before hitting the native ABI."""
    g1 = o.G1.from_affine(o.G1_GEN)
    g2 = o.G2.from_affine(o.G2_GEN)
    assert native.pairing_check([]) is True
    assert native.pairing_check([(o.G1.infinity(), g2)]) is True
    assert native.pairing_check(
        [(o.G1.infinity(), g2), (g1, g2), (o.G1.neg(g1), g2)]) is True


def test_kzg_verify_through_native(lib):
    """Full KZG commit/open/verify on the oracle SRS, native pairing check."""
    tau = 0xABCDEF0123456789
    srs = o.Srs.generate(16, tau)
    rnd = random.Random(3)
    coeffs = [rnd.randrange(o.R) for _ in range(16)]
    x = rnd.randrange(o.R)
    com = o.kzg_commit(srs, coeffs)
    y, proof = o.kzg_open(srs, coeffs, x)
    assert o.kzg_verify(srs, com, x, y, proof)
    assert not o.kzg_verify(srs, com, x, (y + 1) % o.R, proof)
