"""End-to-end Pianist flow at the reference's toy scale (6, 2).

Mirrors the reference integration strategy (reference: tests/conftest.py:26-27,
tests/test_miner.py:85-121, tests/test_validator.py:60-121): real crypto at
small scale — commit/open/verify round trips, corrupted-proof rejection, and
the aggregation step the reference never implemented.
"""

import random

import jax
import jax.numpy as jnp
import pytest

from zkp_subnet_tpu.models import kzg, pianist
from zkp_subnet_tpu.models.srs import Srs
from zkp_subnet_tpu.ops import curve as cv
from zkp_subnet_tpu.ops.field import FR
from zkp_subnet_tpu.utils import oracle as o

from tests.conftest import TEST_SCALE, TEST_MACHINES_SCALE

WB = 8  # 8-bit MSM windows: small bucket arrays for the CPU test backend


# srs: the shared session-scoped fixture from conftest.py (disk-cached)


@pytest.fixture(scope="module")
def challenge(srs):
    key = jax.random.key(7)
    rows = pianist.random_poly(srs, key)
    alpha = pianist.random_point(jax.random.fold_in(key, 99))
    return rows, alpha


def test_srs_shapes(srs):
    assert srs.machines == 4 and srs.row_size == 16
    assert srs.worker_bases.shape == (4, 16, 3, 24)
    # U_i[0] == V_i (τ_X^0 = 1)
    u0 = cv.g1_decode(srs.worker_bases[:, 0])
    v = cv.g1_decode(srs.lagrange_y)
    assert [o.G1.to_affine(p) for p in u0] == [o.G1.to_affine(p) for p in v]


def test_srs_save_load(srs, tmp_path):
    sp = str(tmp_path / "setup_6_2.npz")
    pp = str(tmp_path / "precompute_6_2.npz")
    srs.save(sp, pp)
    loaded = Srs.load(sp, pp)
    assert loaded.scale == srs.scale
    assert (loaded.worker_bases == srs.worker_bases).all()
    assert o.G2.to_affine(loaded.g2_tau_x) == o.G2.to_affine(srs.g2_tau_x)


def test_worker_commit_open_verify(srs, challenge):
    rows, alpha = challenge
    i = 1
    com = pianist.worker_commit(srs, i, rows[i], window_bits=WB)
    y, proof = pianist.worker_open(srs, i, rows[i], alpha, window_bits=WB)

    com_pt = cv.g1_decode(com[None])[0]
    proof_pt = cv.g1_decode(proof[None])[0]
    alpha_int = FR.decode(alpha[None])[0]
    y_int = FR.decode(y[None])[0]

    # eval parity with coefficient-form Horner (oracle)
    row_ints = FR.decode_vec(rows[i])
    assert y_int == o.poly_eval(row_ints, alpha_int)

    assert pianist.worker_verify(srs, i, proof_pt, alpha_int, y_int, com_pt)
    # wrong eval rejected
    assert not pianist.worker_verify(
        srs, i, proof_pt, alpha_int, (y_int + 1) % o.R, com_pt)
    # corrupted proof rejected (reference corrupts by +1,
    # reference: tests/test_validator.py:79-86)
    bad = o.G1.add(proof_pt, o.G1.from_affine(o.G1_GEN))
    assert not pianist.worker_verify(srs, i, bad, alpha_int, y_int, com_pt)


def test_commitment_is_bivariate_eval(srs, challenge):
    """Σ com_i must equal [f(τ_X, τ_Y)]G1 — checked via a second SRS built
    from known taus."""
    srs2 = Srs.generate(TEST_SCALE, TEST_MACHINES_SCALE,
                        tau_x=12345, tau_y=67890)
    rows, _ = challenge
    coms = pianist.commit_all(srs2, rows, window_bits=WB)
    C = cv.g1_decode(cv.g1_sum(coms)[None])[0]

    # host: f(τ_X, τ_Y) = Σ_i R_i(τ_Y)·f_i(τ_X)
    from zkp_subnet_tpu.models.srs import _lagrange_coeffs_at
    lag = _lagrange_coeffs_at(67890, srs2.machines)
    acc = 0
    for i in range(srs2.machines):
        row_ints = FR.decode_vec(rows[i])
        acc = (acc + lag[i] * o.poly_eval(row_ints, 12345)) % o.R
    want = o.G1.mul(o.G1.from_affine(o.G1_GEN), acc)
    assert o.G1.to_affine(C) == o.G1.to_affine(want)


def test_aggregated_proof(srs, challenge):
    rows, alpha = challenge
    key = jax.random.key(123)
    beta = pianist.random_point(key)

    coms = pianist.commit_all(srs, rows, window_bits=WB)
    ys, proofs = pianist.open_all(srs, rows, alpha, window_bits=WB)
    agg = pianist.aggregate(srs, coms, proofs, ys, beta, window_bits=WB)

    alpha_int = FR.decode(alpha[None])[0]
    beta_int = FR.decode(beta[None])[0]
    assert pianist.verify_aggregated(srs, agg, alpha_int, beta_int)

    # tampered aggregate value must fail
    import dataclasses
    bad = dataclasses.replace(agg, value=FR.encode([1])[0])
    assert not pianist.verify_aggregated(srs, bad, alpha_int, beta_int)

    # the aggregated value is really f(α, β)
    from zkp_subnet_tpu.models.srs import _lagrange_coeffs_at
    lag_b = _lagrange_coeffs_at(beta_int, srs.machines)
    want = 0
    for i in range(srs.machines):
        row_ints = FR.decode_vec(rows[i])
        want = (want + lag_b[i] * o.poly_eval(row_ints, alpha_int)) % o.R
    assert FR.decode(agg.value[None])[0] == want


def test_fft_parity(srs, challenge):
    rows, _ = challenge
    # left=True, inverse=True then eval == evaluation of iNTT'd coefficients
    coeffs = pianist.fft(rows, left=True, inverse=True)
    back = pianist.fft(coeffs, left=True, inverse=False)
    assert (back == rows).all()
    # Y-direction transform round trip
    ycoef = pianist.fft(rows, left=False, inverse=True)
    yback = pianist.fft(ycoef, left=False, inverse=False)
    assert (yback == rows).all()


def test_srs_sidecar_save_load(srs, tmp_path, monkeypatch):
    """Large-scale persistence path: worker_bases in a memmap sidecar .npy,
    loaded eagerly and lazily (mmap) with identical content."""
    monkeypatch.setattr(Srs, "_SIDE_CAR_LIMIT", 1)   # force the sidecar path
    sp = str(tmp_path / "setup_6_2.npz")
    pp = str(tmp_path / "precompute_6_2.npz")
    srs.save(sp, pp)
    assert (tmp_path / "precompute_6_2.npz.bases.npy").exists()
    eager = Srs.load(sp, pp)
    assert (jnp.asarray(eager.worker_bases) == srs.worker_bases).all()
    lazy = Srs.load(sp, pp, lazy=True)
    import numpy as np
    assert isinstance(lazy.worker_bases, np.ndarray)   # host memmap
    assert (np.asarray(lazy.worker_bases) ==
            np.asarray(srs.worker_bases)).all()
    # a lazy slice still drives the jitted prove path
    row = jnp.asarray(FR.encode_vec([3] * srs.row_size))
    com = pianist.worker_commit(srs, 0, row, window_bits=WB)
    com_lazy = kzg.commit(jnp.asarray(lazy.worker_bases[0]), row,
                          window_bits=WB)
    assert (com == com_lazy).all()
