"""Radix-2 NTT / iNTT over Fr for TPU — byte-limb engine edition.

Matches the reference prover's ``fft(poly, left, inverse)`` RPC semantics
(reference: neurons/validator.py:58-65, used with left=True, inverse=True to
move evaluation-form rows to coefficient form at validator.py:116).

Design, TPU-first. All butterfly math runs in the byte-limb f32 engine
(ops/lane8.py) through the fused Pallas field kernels (ops/pallas_g1.pfield)
at aligned widths — the r4 NTT still multiplied through the radix-2^16
uint32 engine at 21 ms per 64k-mul vs 1.16 ms for the byte kernel
(PROFILE.md; VERDICT r4 next-round #3 is this port):

- Working layout is ``(L8, n, R)`` f32: byte limbs leading, the transform
  index on a middle axis, the batch innermost on lanes. Every stage's
  even/odd split, twiddle broadcast, and concat act on MIDDLE axes, so the
  lane (minor) axis is never re-laid-out inside the base kernel, and each
  butterfly runs (n/2)·R lanes wide — one fused kernel pass per field op.
- Small sizes (≤ 2^BASE_LOG): iterative decimation-in-time, natively
  R-batched (no thin early/late stages).
- Large sizes: Bailey four-step N = n1·n2 — the inner transforms need NO
  transpose at all in this layout (the s2 axis is already the middle
  axis); one corner turn before the outer transforms is the only real
  transpose, which is also the multi-chip all-to-all seam
  (parallel/pianist.py).
- Twiddle tables are generated on device, cached, and passed as jit
  ARGUMENTS: closed-over tables become embedded HLO constants, and at 2^22
  the Bailey twiddle matrix is 268 MB — the axon remote-compile POST dies
  with HTTP 413 (r4).

The r4 uint32 path needed batch-streaming guards (MAX_BASE_BATCH) because
its schoolbook scratch padded ~33·L-limb intermediates (8-17 GB at 2^22);
the byte engine's per-tile VMEM kernels have no such blowup, so this file
has no streaming special cases.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .field import FR
from ..utils import oracle as o

# NOTE: ops.lane8 / ops.pallas_g1 are imported INSIDE functions: their
# module-level field constants are jnp arrays, and creating one initializes
# the XLA backend — which must not happen at package-import time or
# jax.distributed.initialize() in parallel/launch.py can never run first
# (r5 regression caught by tests/test_multiprocess.py).

#: max log-size handled by the direct stage-unrolled kernel
BASE_LOG = 11

_twiddle_cache: Dict[Tuple[int, bool], jnp.ndarray] = {}
_wmat_cache: Dict[Tuple[int, int, bool], jnp.ndarray] = {}
_twiddle8_cache: Dict[Tuple[int, bool], jnp.ndarray] = {}
_wmat8_cache: Dict[Tuple[int, int, bool], jnp.ndarray] = {}


def root_of_unity(log_n: int, inverse: bool = False) -> int:
    w = o.fr_root_of_unity(log_n)
    return pow(w, o.R - 2, o.R) if inverse else w


def twiddles(log_n: int, inverse: bool) -> jnp.ndarray:
    """[w^0 .. w^(n/2-1)] in Montgomery form, shape (n/2, L). Cached."""
    key = (log_n, inverse)
    if key not in _twiddle_cache:
        w = FR.encode([root_of_unity(log_n, inverse)])[0]
        _twiddle_cache[key] = FR.powers(w, max(1 << (log_n - 1), 1))
    return _twiddle_cache[key]


def _twiddles8(log_n: int, inverse: bool) -> jnp.ndarray:
    """Byte-lane twiddles (L8, n/2) f32 (same Montgomery values)."""
    from . import lane8 as l8
    key = (log_n, inverse)
    if key not in _twiddle8_cache:
        _twiddle8_cache[key] = l8.to_lane8(twiddles(log_n, inverse))
    return _twiddle8_cache[key]


def _twiddle_matrix(log_n1: int, log_n2: int, inverse: bool) -> jnp.ndarray:
    """W[s1, t2] = w_N^(s1·t2) in Montgomery form, shape (n1, n2, L)."""
    key = (log_n1, log_n2, inverse)
    if key not in _wmat_cache:
        n1, n2 = 1 << log_n1, 1 << log_n2
        w = FR.encode([root_of_unity(log_n1 + log_n2, inverse)])[0]
        col = FR.powers(w, n1)  # w^s1
        _wmat_cache[key] = jax.jit(
            jax.vmap(lambda base: FR.powers(base, n2)),
            static_argnums=())(col)
    return _wmat_cache[key]


def _twiddle_matrix8(log_n1: int, log_n2: int, inverse: bool) -> jnp.ndarray:
    """Byte-lane Bailey matrix, PRE-TRANSPOSED to (L8, n2, n1) so it aligns
    with the inner-transform output axes (t2, s1) without a device-side
    transpose."""
    from . import lane8 as l8
    key = (log_n1, log_n2, inverse)
    if key not in _wmat8_cache:
        m = _twiddle_matrix(log_n1, log_n2, inverse)     # (n1, n2, L)
        m8 = l8.to_lane8(m)                              # (n1, L8, n2)
        _wmat8_cache[key] = jnp.transpose(m8, (1, 2, 0))
    return _wmat8_cache[key]


def _collect_tables(log_n: int, inverse: bool):
    """The byte-lane twiddle pytree for a size-2^log_n transform, as jit
    ARGUMENTS (see module docstring: constants would embed in the HLO)."""
    if log_n <= BASE_LOG:
        return (_twiddles8(log_n, inverse),) if log_n >= 1 else ()
    log_n1 = (log_n + 1) // 2
    log_n2 = log_n - log_n1
    return (_collect_tables(log_n2, inverse),
            _twiddle_matrix8(log_n1, log_n2, inverse),
            _collect_tables(log_n1, inverse))


def _ensure_tables(log_n: int, inverse: bool) -> None:
    """Populate twiddle caches eagerly (outside any jit trace)."""
    if log_n <= BASE_LOG:
        if log_n >= 1:
            _twiddles8(log_n, inverse)
        return
    log_n1 = (log_n + 1) // 2
    log_n2 = log_n - log_n1
    _ensure_tables(log_n1, inverse)
    _ensure_tables(log_n2, inverse)
    _twiddle_matrix8(log_n1, log_n2, inverse)


def _f8(op: str, *args):
    """One Fr field op on (L8, N) byte lanes: fused Pallas kernel at
    aligned widths on TPU, XLA-graph byte engine otherwise."""
    from . import lane8 as l8
    from . import pallas_g1 as pg
    if pg.aligned(args[0].shape[-1]):
        return pg.pfield(op, l8.BFR, *args)
    return getattr(l8.BFR, op)(*args)


def _bfly8(even: jnp.ndarray, odd: jnp.ndarray,
           wf: jnp.ndarray) -> jnp.ndarray:
    """One DIT butterfly layer on (L8, N) lanes → stacked (2, L8, N)
    [even + odd·w, even − odd·w]: ONE fused kernel launch at aligned
    widths on TPU (pallas_g1.pbutterfly — 5 array passes per stage
    instead of 9), the XLA-graph byte engine otherwise."""
    from . import lane8 as l8
    from . import pallas_g1 as pg
    if pg.aligned(even.shape[-1]):
        return pg.pbutterfly(l8.BFR, even, odd, wf)
    t = l8.BFR.mont_mul(odd, wf)
    return jnp.stack([l8.BFR.add(even, t), l8.BFR.sub(even, t)])


def _ntt_base8(v: jnp.ndarray, tw8: jnp.ndarray) -> jnp.ndarray:
    """Direct DIT NTT. v: (L8, n, R) — n the transform, R the batch on
    lanes; tw8: (L8, n/2). Every butterfly is (n/2)·R lanes wide."""
    L8, n, R = v.shape
    log_n = n.bit_length() - 1

    # bit-reversal permutation as a transpose over the middle bit axes
    v = v.reshape((L8,) + (2,) * log_n + (R,))
    v = jnp.transpose(
        v, (0,) + tuple(range(log_n, 0, -1)) + (log_n + 1,))
    v = v.reshape(L8, n, R)

    for s in range(1, log_n + 1):
        m = 1 << s
        half = m // 2
        stride = (n // 2) // half
        w = tw8[:, ::stride][:, :half]               # (L8, half)
        v4 = v.reshape(L8, n // m, m, R)
        even = v4[:, :, :half].reshape(L8, -1)
        odd = v4[:, :, half:]
        wf = jnp.broadcast_to(
            w[:, None, :, None], odd.shape).reshape(L8, -1)
        ab = _bfly8(even, odd.reshape(L8, -1), wf)   # (2, L8, half·…)
        # stage layout: position j < half ← ab[0], j ≥ half ← ab[1]
        v = jnp.transpose(ab.reshape(2, L8, n // m, half, R),
                          (1, 2, 0, 3, 4)).reshape(L8, n, R)
    return v


def _ntt_batched8(x: jnp.ndarray, inverse: bool, tables) -> jnp.ndarray:
    """Unscaled NTT of R batched size-n transforms. x: (L8, n, R) byte-lane
    Montgomery; ``tables`` the matching _collect_tables pytree."""
    L8, n, R = x.shape
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "size must be a power of two"
    if log_n == 0:
        return x
    if log_n <= BASE_LOG:
        return _ntt_base8(x, tables[0])

    log_n1 = (log_n + 1) // 2
    log_n2 = log_n - log_n1
    n1, n2 = 1 << log_n1, 1 << log_n2
    t2_tables, W8, t1_tables = tables
    # a[s1 + n1·s2] → axes (s2, s1): the inner transforms (over s2, batch
    # n1·R) need NO transpose in this layout
    A = x.reshape(L8, n2, n1 * R)
    B = _ntt_batched8(A, inverse, t2_tables).reshape(L8, n2, n1, R)
    # twiddle: C[t2, s1] = B[t2, s1] · W[s1, t2]; W8 comes pre-transposed
    # as (L8, n2, n1)
    Wf = jnp.broadcast_to(W8[..., None], B.shape).reshape(L8, -1)
    C = _f8("mont_mul", B.reshape(L8, -1), Wf).reshape(L8, n2, n1, R)
    # the ONE corner turn: outer transforms run over s1 per (t2, R)
    Ct = jnp.transpose(C, (0, 2, 1, 3)).reshape(L8, n1, n2 * R)
    D = _ntt_batched8(Ct, inverse, t1_tables)
    # out[t1·n2 + t2] = D[t1, t2]
    return D.reshape(L8, n, R)


@functools.partial(jax.jit, static_argnames=("inverse",))
def _ntt_jit(x: jnp.ndarray, tables, inverse: bool) -> jnp.ndarray:
    """Batched NTT/iNTT over axis -2 of (..., N, L) Montgomery values."""
    from . import lane8 as l8
    shape = x.shape
    n = shape[-2]
    xb = x.reshape(-1, n, FR.L)                     # (R, n, L)
    y8 = jnp.transpose(l8.to_lane8(xb), (1, 2, 0))  # (L8, n, R)
    z8 = _ntt_batched8(y8, inverse, tables)
    if inverse:
        n_inv_mont = pow(n, o.R - 2, o.R) * FR.mont_r % o.R
        c8 = l8.to_lane8(jnp.asarray(FR.to_limbs(n_inv_mont))[None])
        flat = z8.reshape(l8.BFR.L8, -1)
        z8 = _f8("mont_mul", flat,
                 jnp.broadcast_to(c8, flat.shape)).reshape(z8.shape)
    y = l8.from_lane8(jnp.transpose(z8, (2, 0, 1)))  # (R, n, L)
    return y.reshape(shape)


def ntt(x: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """NTT/iNTT of (N, L) Montgomery-form values; natural order in and out.

    Forward: out[k] = f(w^k) from coefficients. Inverse includes 1/n scaling.
    """
    log_n = x.shape[0].bit_length() - 1
    _ensure_tables(log_n, inverse)
    return _ntt_jit(x, _collect_tables(log_n, inverse), inverse=inverse)


def intt(x: jnp.ndarray) -> jnp.ndarray:
    return ntt(x, inverse=True)


def ntt_batch(x: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Batched NTT over axis -2: x (..., N, L). All transforms in the batch
    run inside ONE natively-batched kernel (the batch rides the lane axis)."""
    log_n = x.shape[-2].bit_length() - 1
    _ensure_tables(log_n, inverse)
    return _ntt_jit(x, _collect_tables(log_n, inverse), inverse=inverse)
