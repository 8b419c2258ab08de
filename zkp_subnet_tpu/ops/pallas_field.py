"""Pallas TPU kernels for the field layer.

First kernel: blocked Montgomery multiply. The XLA path (ops/field.py
mont_mul) materializes its (N, L, 2L) skew intermediates through HBM when N
is large; the Pallas version grids N into VMEM-resident tiles so the whole
product → reduce → carry chain runs on-chip per tile. The limb algebra is
the same as the XLA path (skew-trick products, Kogge-Stone carries), with
the field constants passed as kernel operands (Mosaic forbids captured
device constants), so bit-exactness is verified by tests/test_pallas.py
against both the XLA path and the bigint oracle.

bench.py reports the before/after in extras (BENCH notes, VERDICT r1 #8).
Falls back to the XLA path on CPU (Mosaic is TPU-only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .field import FR, FQ, PrimeField, LIMB_BITS, LIMB_MASK

try:                                     # Mosaic is TPU-only
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

#: rows per grid tile — 512×24 u32 inputs ≈ 49 KB, intermediates
#: (512, 24, 48) ≈ 2.4 MB: comfortably inside the ~16 MB VMEM budget
TILE_N = 512


def _shift_up(x, d: int):
    lead = [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, lead + [(d, 0)])[..., :x.shape[-1]]


def _ks_carry(digits):
    """Kogge-Stone carry propagation for digits ≤ 2^16 (field.py parity).

    Indices are positive throughout — jnp's negative indexing lowers to
    dynamic_slice, which Mosaic does not implement."""
    n = digits.shape[-1]
    g = digits >> LIMB_BITS
    p = (digits == LIMB_MASK).astype(jnp.uint32)
    d = 1
    while d < n:
        g = g | (p & _shift_up(g, d))
        p = p & _shift_up(p, d)
        d <<= 1
    res = (digits + _shift_up(g, 1)) & LIMB_MASK
    return res, g[..., n - 1]


def _ks_borrow(a, b):
    g = (a < b).astype(jnp.uint32)
    p = (a == b).astype(jnp.uint32)
    n = a.shape[-1]
    d = 1
    while d < n:
        g = g | (p & _shift_up(g, d))
        p = p & _shift_up(p, d)
        d <<= 1
    diff = (a - b - _shift_up(g, 1)) & LIMB_MASK
    return diff, g[..., n - 1]


def _sub_p_if_ge(v, p_vec, extra):
    diff, borrow = _ks_borrow(v, p_vec)
    use_diff = (extra | (1 - borrow)).astype(jnp.uint32)
    mask = use_diff[..., None] * jnp.uint32(0xFFFFFFFF)
    return (diff & mask) | (v & ~mask)


def _skew_sum(rows, shift0: int, out_cols: int):
    """Σ_i shift(rows[..., i, :], i + shift0): static unroll of pad+add.

    The XLA path's flatten/reshape skew trick crashes Mosaic on minor-dim
    reshapes; a plain L-step accumulation of padded rows lowers cleanly and
    stays entirely in registers/VMEM."""
    n, m = rows.shape[-2], rows.shape[-1]
    lead = [(0, 0)] * (rows.ndim - 2)
    acc = None
    for i in range(n):
        row = rows[..., i, :]
        shifted = jnp.pad(row, lead + [(shift0 + i,
                                        out_cols - m - shift0 - i)])
        acc = shifted if acc is None else acc + shifted
    return acc


def _mul_columns(a, b, out_cols: int):
    prods = a[..., :, None] * b[..., None, :]
    lo = prods & jnp.uint32(LIMB_MASK)
    hi = prods >> LIMB_BITS
    return _skew_sum(lo, 0, out_cols) + _skew_sum(hi, 1, out_cols)


def _norm2(t):
    for _ in range(2):
        t = (t & LIMB_MASK) + _shift_up(t >> LIMB_BITS, 1)
    return t


def mont_mul_body(a, b, p_vec, np_vec, L: int):
    """field.py mont_mul with the constants as arguments — usable inside
    Pallas kernel bodies (no captured device constants) and bit-identical
    to PrimeField.mont_mul by construction."""
    T = _mul_columns(a, b, 2 * L)
    Tn = _norm2(T)
    m = _norm2(_mul_columns(Tn[..., :L], np_vec, 2 * L)[..., :L])
    U = _mul_columns(m, p_vec, 2 * L)
    S = Tn + U
    lead = [(0, 0)] * (S.ndim - 1)
    S = jnp.pad(S, lead + [(0, 1)])
    S = _norm2(S)
    S, _ = _ks_carry(S)
    return _sub_p_if_ge(S[..., L:2 * L], p_vec, S[..., 2 * L])


def _mont_mul_kernel(L: int):
    def kernel(a_ref, b_ref, p_ref, np_ref, out_ref):
        out_ref[:] = mont_mul_body(a_ref[:], b_ref[:], p_ref[:], np_ref[:],
                                   L)
    return kernel


@functools.partial(jax.jit, static_argnames=("field",))
def mont_mul_pallas(a: jnp.ndarray, b: jnp.ndarray,
                    field: PrimeField = FQ) -> jnp.ndarray:
    """Tiled Montgomery product over (N, L) uint32 Montgomery operands.

    N must be a multiple of TILE_N (pad with zeros; 0·x = 0 is harmless).
    """
    n, L = a.shape
    assert b.shape == (n, L) and L == field.L
    assert n % TILE_N == 0, f"pad N to a multiple of {TILE_N}"
    p_vec = jnp.asarray(field.p_limbs, dtype=jnp.uint32)
    np_vec = jnp.asarray(field.nprime_limbs, dtype=jnp.uint32)
    grid = (n // TILE_N,)
    spec = pl.BlockSpec((TILE_N, L), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((L,), lambda i: (0,),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _mont_mul_kernel(L),
        out_shape=jax.ShapeDtypeStruct((n, L), jnp.uint32),
        grid=grid,
        in_specs=[spec, spec, const_spec, const_spec],
        out_specs=spec,
    )(a, b, p_vec, np_vec)


def mont_mul_auto(a, b, field: PrimeField = FQ):
    """Pallas on TPU, XLA path elsewhere (or when shapes don't tile)."""
    if (HAVE_PALLAS and jax.default_backend() == "tpu"
            and a.ndim == 2 and a.shape == b.shape
            and a.shape[0] % TILE_N == 0):
        return mont_mul_pallas(a, b, field=field)
    return field.mont_mul(a, b)
