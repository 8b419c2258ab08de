"""Pallas-fused G1 point operations — the TPU kernel layer.

The XLA-graph formulations of the field/curve ops (ops/lane.py, ops/lane8.py)
round-trip HBM between every field op: a 64k-wide RCB15 add measured 156-333
ms on a v5e against a ~2-3 ms compute bound, because each of its ~36 field
ops reads and writes (48, 64k) arrays from HBM and the skew-product reshapes
force relayouts (r4 measurement log, scratch/tpu_check8.py).

These kernels fuse a WHOLE point operation per lane-tile: the tile's three
coordinate rows are loaded into VMEM once, all ~36 field ops (every partial
product, carry scan and conditional subtract of the byte-limb engine,
ops/lane8.py) happen on-chip, and one result tile is written back. HBM
traffic per add drops from ~36 round trips to exactly 3 reads + 1 write.

The kernel bodies REUSE the byte-limb engine verbatim — ByteLaneField ops
are pure jnp on (..., L8, lane) arrays, which is exactly Pallas's value
model; the field constants ride in as extra kernel inputs
(ByteLaneField.const_args / kernel_view). Montgomery's two constant
products ride the MXU (bf16-exact inputs, f32 accumulation) inside the
kernel.

Replaces the compute core of the reference's external Rust prover
(reference: requirements.txt:3, neurons/miner.py:38-54) at the innermost
level; used by ops/msm.py's bucket machinery when the backend is available.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from . import lane8 as l8

#: lanes per kernel instance. VMEM per tile ≈ (live temporaries ~20) ×
#: (48, TILE) f32 ≈ 20·48·TILE·4 B — 2 MB at TILE=512, well under 16 MB.
TILE = 512

_NCONST = len(l8.ByteLaneField.CONST_NAMES)


def _zero_idx(ndim, i):
    return (0,) * ndim


def _const_specs():
    """Whole-array VMEM blocks for the injected field constants."""
    return [pl.BlockSpec(c.shape, functools.partial(_zero_idx, c.ndim))
            for c in l8.BFQ.const_args()]


def _load_view(refs):
    return l8.BFQ.kernel_view(*(r[:] for r in refs))


def _add_kernel(*refs):
    F = _load_view(refs[:_NCONST])
    p_ref, q_ref, o_ref = refs[_NCONST:]
    o_ref[:] = l8.g18_add(p_ref[:], q_ref[:], F=F)


def _double_kernel(*refs):
    F = _load_view(refs[:_NCONST])
    p_ref, o_ref = refs[_NCONST:]
    o_ref[:] = l8.g18_double(p_ref[:], F=F)


def _mul_kernel(*refs):
    F = _load_view(refs[:_NCONST])
    a_ref, b_ref, o_ref = refs[_NCONST:]
    o_ref[:] = F.mont_mul(a_ref[:], b_ref[:])


def _lane_tiles(n: int) -> int:
    assert n % TILE == 0, f"lane count {n} not a multiple of {TILE}"
    return n // TILE


@jax.jit
def padd(p, q):
    """(3, L8, N) ⊕ (3, L8, N) complete RCB15 add, one fused kernel pass.

    N must be a multiple of TILE (pad with anything; lanes are independent).
    """
    n = p.shape[-1]
    spec = pl.BlockSpec((3, l8.BFQ.L8, TILE), lambda i: (0, 0, i))
    return pl.pallas_call(
        _add_kernel,
        grid=(_lane_tiles(n),),
        in_specs=_const_specs() + [spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(p.shape, jnp.float32),
    )(*l8.BFQ.const_args(), p, q)


@jax.jit
def pdouble(p):
    """(3, L8, N) complete RCB15 doubling, one fused kernel pass."""
    n = p.shape[-1]
    spec = pl.BlockSpec((3, l8.BFQ.L8, TILE), lambda i: (0, 0, i))
    return pl.pallas_call(
        _double_kernel,
        grid=(_lane_tiles(n),),
        in_specs=_const_specs() + [spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(p.shape, jnp.float32),
    )(*l8.BFQ.const_args(), p)


@jax.jit
def pmul(a, b):
    """(L8, N) Montgomery products, one fused kernel pass (microbench /
    building block; the point kernels above are the production surface)."""
    n = a.shape[-1]
    spec = pl.BlockSpec((l8.BFQ.L8, TILE), lambda i: (0, i))
    return pl.pallas_call(
        _mul_kernel,
        grid=(_lane_tiles(n),),
        in_specs=_const_specs() + [spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.float32),
    )(*l8.BFQ.const_args(), a, b)


@functools.cache
def available() -> bool:
    """True when the Pallas kernels compile+run on the current backend.

    CPU runs use interpret-mode only in tests; production dispatch
    (ops/msm.py) falls back to the XLA-graph engine when this is False.
    """
    try:
        x = l8.g18_infinity((TILE,))
        jax.block_until_ready(padd(x, x))
        return True
    except Exception:  # pragma: no cover - backend-specific
        return False
