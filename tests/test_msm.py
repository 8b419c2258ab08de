"""Direct unit tests for the Pippenger ``msm()`` kernel (VERDICT r1 #3:
the flagship TPU kernel previously had zero direct coverage — every test
reached msm_auto at N≤16, which dispatches to the naive path).

The oracle expectation costs ONE scalar multiplication: points are built as
[a_i]G with known a_i, so Σ k_i·P_i = [Σ k_i·a_i mod r]G.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkp_subnet_tpu.ops import curve as cv
from zkp_subnet_tpu.ops import msm as jmsm
from zkp_subnet_tpu.ops.field import FR
from zkp_subnet_tpu.utils import oracle as o


def _known_dlog_instance(n: int, seed: int):
    """(points, scalars, expected) with points = [a_i]G of known dlog."""
    rnd = random.Random(seed)
    g = o.G1.from_affine(o.G1_GEN)
    dlogs = [rnd.randrange(1, o.R) for _ in range(n)]
    ks = [rnd.randrange(o.R) for _ in range(n)]
    # device points via ONE batched fixed-base multiplication
    tables = cv.g1_fixed_base_tables()
    pts = cv.g1_fixed_base_mul(tables, cv.fr_to_scalar_limbs(dlogs))
    scalars = cv.fr_to_scalar_limbs(ks)
    total = sum(k * a for k, a in zip(ks, dlogs)) % o.R
    want = o.G1.to_affine(o.G1.mul(g, total))
    return pts, scalars, want


def _run_msm(pts, scalars, wb):
    out = jax.block_until_ready(jmsm.msm(pts, scalars, window_bits=wb))
    return o.G1.to_affine(cv.g1_decode(np.asarray(out)[None])[0])


def test_pippenger_256_wb8():
    pts, scalars, want = _known_dlog_instance(256, seed=11)
    assert _run_msm(pts, scalars, 8) == want


def test_pippenger_zero_and_duplicate_digits():
    """Edge digits: zero scalars (empty buckets), all-equal scalars
    (one giant bucket run), and infinity padding."""
    rnd = random.Random(13)
    g = o.G1.from_affine(o.G1_GEN)
    dlogs = [rnd.randrange(1, o.R) for _ in range(128)]
    tables = cv.g1_fixed_base_tables()
    pts = cv.g1_fixed_base_mul(tables, cv.fr_to_scalar_limbs(dlogs))
    k = rnd.randrange(o.R)
    ks = [0] * 64 + [k] * 64
    pts_pad, sc_pad = jmsm.pad_for_msm(
        pts, cv.fr_to_scalar_limbs(ks))
    out = _run_msm(pts_pad, sc_pad, 8)
    total = sum(k * a for a in dlogs[64:]) % o.R
    assert out == o.G1.to_affine(o.G1.mul(g, total))


def test_msm_naive_matches_pippenger():
    pts, scalars, want = _known_dlog_instance(256, seed=17)
    naive = o.G1.to_affine(cv.g1_decode(
        np.asarray(jax.block_until_ready(
            jmsm.msm_naive(pts, scalars)))[None])[0])
    assert naive == want


def test_fixed_base_mul_matches_scalar_mul():
    """g1_fixed_base_mul (the SRS-generation comb) vs double-and-add."""
    rnd = random.Random(19)
    ks = [0, 1, rnd.randrange(o.R), o.R - 1]
    tables = cv.g1_fixed_base_tables()
    got = cv.g1_fixed_base_mul(tables, cv.fr_to_scalar_limbs(ks))
    gen = cv.g1_encode([o.G1.from_affine(o.G1_GEN)])[0]
    want = cv.g1_scalar_mul(
        jnp.broadcast_to(gen, (len(ks), 3, 24)), cv.fr_to_scalar_limbs(ks))
    g_aff = [o.G1.to_affine(p) for p in cv.g1_decode(got)]
    w_aff = [o.G1.to_affine(p) for p in cv.g1_decode(want)]
    assert g_aff == w_aff
    g = o.G1.from_affine(o.G1_GEN)
    assert g_aff == [o.G1.to_affine(o.G1.mul(g, k)) for k in ks]


@pytest.mark.slow
def test_pippenger_512_wb4():
    pts, scalars, want = _known_dlog_instance(512, seed=23)
    assert _run_msm(pts, scalars, 4) == want


@pytest.mark.slow
def test_pippenger_256_wb16():
    """16-bit windows (the legacy full-materialization comparison path —
    production is wb=8 chunk-streaming, see msm.pick_window_bits) at small
    N — slow on CPU because the 65k-bucket machinery dominates;
    correctness only."""
    pts, scalars, want = _known_dlog_instance(256, seed=29)
    assert _run_msm(pts, scalars, 16) == want


def test_hs_prefix_masked_non_power_of_two_tiles():
    """ADVICE r4 high: floor(log2 T) Hillis-Steele steps dropped early-tile
    contributions whenever T was not a power of two (reachable via any
    N multiple of 256 with chunk/SCAN_COLS non-power-of-two, e.g. N=2304).
    The prefix must match a sequential sum for EVERY T."""
    from zkp_subnet_tpu.ops import lane8 as l8

    rnd = random.Random(29)
    g = o.G1.from_affine(o.G1_GEN)
    tables = cv.g1_fixed_base_tables()
    for T in (3, 6):
        dlogs = [rnd.randrange(1, o.R) for _ in range(T)]
        pts = cv.g1_fixed_base_mul(tables, cv.fr_to_scalar_limbs(dlogs))
        lanes = l8.pts_to_lane8(pts)          # (3, L8, T)
        pre = jax.block_until_ready(
            jmsm._hs_prefix_masked(lanes[:, :, None, :]))[:, :, 0, :]
        got = cv.g1_decode(np.asarray(l8.pts_from_lane8(pre)))  # T points
        acc = 0
        for i in range(T):
            acc = (acc + dlogs[i]) % o.R
            assert (o.G1.to_affine(got[i])
                    == o.G1.to_affine(o.G1.mul(g, acc))), f"T={T} i={i}"


def test_pippenger_non_power_of_two_chunk(monkeypatch):
    """End-to-end msm() with a chunk whose tile count T=chunk/SCAN_COLS is
    not a power of two (CHUNK=24 → T=3) — the silent-wrong-result shape
    from ADVICE r4."""
    monkeypatch.setattr(jmsm, "CHUNK", 24)
    jmsm.msm._clear_cache()   # shapes collide with default-CHUNK programs
    try:
        pts, scalars, want = _known_dlog_instance(64, seed=31)
        pts_pad, sc_pad = jmsm.pad_for_msm(pts, scalars)
        assert _run_msm(pts_pad, sc_pad, 8) == want
    finally:
        jmsm.msm._clear_cache()


def test_pippenger_grouped_chunks(monkeypatch):
    """G>1 chunk grouping (launch-count optimization): small CHUNK forces
    nchunks=8 → G=8; result must match the known-dlog oracle."""
    monkeypatch.setattr(jmsm, "CHUNK", 128)
    jmsm.msm._clear_cache()
    try:
        pts, scalars, want = _known_dlog_instance(1024, seed=37)
        assert _run_msm(pts, scalars, 8) == want
    finally:
        jmsm.msm._clear_cache()
