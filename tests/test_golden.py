"""Golden-vector parity with the reference prover surface.

TEST_POLY / TEST_POINT / TEST_EVAL are the reference's bit-exactness anchors
(reference: tests/test_miner.py:33-55): a 16-coefficient row of the scale-6 /
machines-2 bivariate polynomial, the challenge point, and the expected
evaluation. They pin down our serialization (32-byte big-endian base64) and
evaluation semantics (coefficient form, Horner, c[0] constant).
"""

import jax.numpy as jnp
import pytest

from zkp_subnet_tpu.ops.field import FR
from zkp_subnet_tpu.ops import poly as jpoly
from zkp_subnet_tpu.utils import encoding as enc
from zkp_subnet_tpu.utils import oracle as o

TEST_POLY = [
    "aUXcXE/02sinJ4ybjw1GEzIM+H/5R/Iayb9CMn7BlEg",
    "aOQMCI2Ce8zgLO80vcjBK7Al++oEe8bADAyMXJJbf68",
    "ZygfrBZOk0i4BpO6MNXU4xHeWHjrPSDjSlhQe0hLJDw",
    "X3w3fa5rnZq6113BXk//n+dSDR+FIkyV9IX0SXgVTFo",
    "LYXDdqRAtuJcP3wRVZtqJ2hAI/NsPXoKzX59AZ3jmcc",
    "Sm+5XwJBs1g3ceeZEgyHquPIQ+zbUKOCVKkuGYloki8",
    "EAUHn5bsQSpxn+Lp+mfUIdmPtN7EGBRZ5ZQw9dUCvSo",
    "ZJYLhpIGLcsBwP+6xWlHiomtiA7Tyd9xC+1c519IRpM",
    "A8KIIVWkR2Qr0h+xzyVT+AlVcT8Ju7vZck4sv9ixnUE",
    "CrB/7LWe40NfYSn81gLLUZ5W17QmlBYz43o7Z2okgw8",
    "EvpYYUWe/7rmVIJ9mL/f6lVF3fi7lihXlGPaIfF0YrU",
    "amKWoDdtgHUw2wnci7Bp/97D11QUl7gscioZnWt8WwY",
    "FT0sgbVNfhw+g+phx/Zv2IFV8XE+5YHivoQ4yp/uGgI",
    "IWvMxK6X/j4dSyHDdcRhQPoVPnhoIBpDSAiJBHrNDC0",
    "OBvU/pJOsQ4I8qIn09sgg6oOWh9mHNPHAsS4qTheeDk",
    "cjp2QP1+ZUcxMVY6tVFJFqyGHCaVzmUT5QYeWX5eGoE",
]
TEST_POINT = "RWAG//VkEtMp1SeQHQKHelgaic+md8qWPrnWgHZiNMw"
TEST_EVAL = "KXMqHg4HSrBe5qnld5TFrRlluYtsjG7N6WrHduoG/1s"


def test_b64_roundtrip():
    for s in TEST_POLY + [TEST_POINT, TEST_EVAL]:
        assert enc.fr_to_b64(enc.fr_from_b64(s)) == s


def test_oracle_eval_matches_reference():
    coeffs = enc.poly_from_b64(TEST_POLY)
    x = enc.fr_from_b64(TEST_POINT)
    assert enc.fr_to_b64(o.poly_eval(coeffs, x)) == TEST_EVAL


def test_jax_eval_matches_reference():
    coeffs = FR.encode(enc.poly_from_b64(TEST_POLY))
    x = FR.encode([enc.fr_from_b64(TEST_POINT)])[0]
    y = jpoly.poly_eval(coeffs, x)
    assert enc.fr_to_b64(FR.decode(y[None])[0]) == TEST_EVAL


def test_jax_quotient_matches_oracle():
    coeffs_int = enc.poly_from_b64(TEST_POLY)
    x_int = enc.fr_from_b64(TEST_POINT)
    want = o.poly_quotient(coeffs_int, x_int)
    coeffs = FR.encode(coeffs_int)
    x = FR.encode([x_int])[0]
    got = FR.decode(jpoly.poly_quotient(coeffs, x))
    assert got == want


def test_point_serialization_roundtrip():
    g = o.G1.from_affine(o.G1_GEN)
    for k in [1, 2, 12345, o.R - 1]:
        p = o.G1.mul(g, k)
        for compressed in (True, False):
            raw = enc.g1_to_bytes(p, compressed)
            assert len(raw) == (48 if compressed else 96)
            q = enc.g1_from_bytes(raw)
            assert o.G1.to_affine(q) == o.G1.to_affine(p)
    g2 = o.G2.from_affine(o.G2_GEN)
    for k in [1, 7, 98765]:
        p = o.G2.mul(g2, k)
        for compressed in (True, False):
            raw = enc.g2_to_bytes(p, compressed)
            assert len(raw) == (96 if compressed else 192)
            q = enc.g2_from_bytes(raw)
            assert o.G2.to_affine(q) == o.G2.to_affine(p)


def test_infinity_serialization():
    inf = o.G1.infinity()
    raw = enc.g1_to_bytes(inf, True)
    assert raw[0] & 0x40
    assert o.G1.is_infinity(enc.g1_from_bytes(raw))


def _non_subgroup_g1():
    """An on-curve G1 point OUTSIDE the r-torsion (cofactor ≠ 1): walk x
    until the curve equation has a root and the point fails [r]P == ∞."""
    x = 3
    while True:
        y = o.fq_sqrt((x * x % o.Q * x + o.G1_B) % o.Q)
        if y is not None:
            p = o.G1.from_affine((x, y))
            assert o.G1.on_curve(p)
            if not o.G1.in_subgroup(p):
                return p
        x += 1


def _non_subgroup_g2():
    x = (1, 0)
    while True:
        rhs = o.fq2_add(o.fq2_mul(o.fq2_sqr(x), x), o.G2_B)
        y = enc._fq2_sqrt(rhs)
        if y is not None:
            p = o.G2.from_affine((x, y))
            assert o.G2.on_curve(p)
            if not o.G2.in_subgroup(p):
                return p
        x = ((x[0] + 1) % o.Q, x[1])


def test_non_subgroup_points_rejected():
    """Deserialization must reject on-curve points outside the r-torsion
    (VERDICT r1 weak #4 — arkworks-parity subgroup checks; the reference
    feeds deserialized points straight into worker_verify,
    reference: neurons/validator.py:77-86)."""
    p = _non_subgroup_g1()
    for compressed in (True, False):
        raw = enc.g1_to_bytes(p, compressed)
        with pytest.raises(ValueError, match="subgroup"):
            enc.g1_from_bytes(raw)
    q = _non_subgroup_g2()
    for compressed in (True, False):
        raw = enc.g2_to_bytes(q, compressed)
        with pytest.raises(ValueError, match="subgroup"):
            enc.g2_from_bytes(raw)


def test_generator_multiples_pass_subgroup_check():
    g = o.G1.from_affine(o.G1_GEN)
    assert o.G1.in_subgroup(o.G1.mul(g, 987654321))
    assert o.G1.in_subgroup(o.G1.infinity())
    g2 = o.G2.from_affine(o.G2_GEN)
    assert o.G2.in_subgroup(o.G2.mul(g2, 123456789))
