"""Radix-2 NTT / iNTT over Fr for TPU.

Matches the reference prover's ``fft(poly, left, inverse)`` RPC semantics
(reference: neurons/validator.py:58-65, used with left=True, inverse=True to
move evaluation-form rows to coefficient form at validator.py:116).

Design, TPU-first — all butterfly math runs in the lane-major engine
(ops/lane.py: limbs on sublanes, data on lanes):

- Small sizes (≤ 2^BASE_LOG): iterative decimation-in-time. The transform
  index lives on *leading* axes (so every stage's even/odd split, twiddle
  multiply, and concat are full-width, layout-free ops) while the *batch* of
  independent transforms rides the lane axis — the base kernel is natively
  R-batched, so the Bailey row/column sweeps below never run a thin kernel.
- Large sizes: Bailey four-step decomposition N = n1·n2 — batched column
  NTTs, twiddle matrix multiply, batched row NTTs, one transpose. This keeps
  the compiled graph small (the base NTT is traced once per axis) and
  expresses the data movement as dense corner-turns, which XLA maps to
  efficient TPU layouts; it is also the natural seam for multi-chip
  sharding (rows sharded over the mesh, the transpose becomes an all-to-all).
Twiddle tables are generated on device (log-depth doubling) and cached.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .field import FR
from .lane import LFR
from ..utils import oracle as o

#: max log-size handled by the direct stage-unrolled kernel
BASE_LOG = 11

#: max batch of base transforms evaluated at once. The fully-batched 2^22
#: Bailey decomposition (2048 batches of 2048) keeps several hundred-MB
#: stage copies live at once and OOMs the 16 GB chip (r4: 17.5 GB
#: requested); batches beyond this stream through one lax.map instance.
MAX_BASE_BATCH = int(__import__("os").environ.get(
    "ZKP_NTT_MAX_BATCH", "1024"))

_twiddle_cache: Dict[Tuple[int, bool], jnp.ndarray] = {}
_wmat_cache: Dict[Tuple[int, int, bool], jnp.ndarray] = {}


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


def _collect_tables(log_n: int, inverse: bool):
    """The twiddle pytree for a size-2^log_n transform, as jit ARGUMENTS.

    Closed-over tables become embedded HLO constants; at 2^22 the Bailey
    twiddle matrix is 268 MB and the axon remote-compile POST dies with
    HTTP 413 (request length limit). Passing them as arguments keeps the
    program text small at any size."""
    if log_n <= BASE_LOG:
        return (twiddles(log_n, inverse),) if log_n >= 1 else ()
    log_n1 = (log_n + 1) // 2
    log_n2 = log_n - log_n1
    return (_collect_tables(log_n2, inverse),
            _twiddle_matrix(log_n1, log_n2, inverse),
            _collect_tables(log_n1, inverse))


def _ntt_base(x: jnp.ndarray, tw: jnp.ndarray) -> jnp.ndarray:
    """Direct DIT NTT of R batched transforms. x: (R, n, L); tw: (n/2, L).

    Lane-major internally: v is (n..., L, R) — the transform index on leading
    axes (stage reshapes/slices/concats are all leading-axis ops, free on
    TPU), the batch R on lanes (every butterfly is R lanes wide at every
    stage, so there are no thin early/late stages).
    """
    R, n = x.shape[0], x.shape[1]
    log_n = n.bit_length() - 1

    v = jnp.transpose(x, (1, 2, 0))              # (n, L, R)

    # Bit-reversal permutation as a transpose over the leading bit axes.
    v = v.reshape((2,) * log_n + (FR.L, R))
    v = jnp.transpose(
        v, tuple(reversed(range(log_n))) + (log_n, log_n + 1))
    v = v.reshape(n, FR.L, R)

    for s in range(1, log_n + 1):
        m = 1 << s
        half = m // 2
        stride = (n // 2) // half
        w = tw[::stride][:half]                  # (half, L)
        wl = w[None, :, :, None]                 # (1, half, L, 1)
        v4 = v.reshape(n // m, m, FR.L, R)
        even, odd = v4[:, :half], v4[:, half:]
        t = LFR.mont_mul(odd, wl)
        v = jnp.concatenate(
            [LFR.add(even, t), LFR.sub(even, t)], axis=1).reshape(n, FR.L, R)
    return jnp.transpose(v, (2, 0, 1))           # (R, n, L)


def _ntt_batched(x: jnp.ndarray, inverse: bool, tables) -> jnp.ndarray:
    """Unscaled NTT of R batched size-n transforms. x: (R, n, L) Montgomery;
    ``tables`` is the matching _collect_tables pytree."""
    R, n = x.shape[0], x.shape[1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "size must be a power of two"
    if log_n == 0:
        return x
    if log_n <= BASE_LOG:
        if R > MAX_BASE_BATCH:
            # stream ceil(R / MAX_BASE_BATCH) slabs (pad the last one so a
            # non-multiple R can't fall through to the OOMing full-batch
            # call — ADVICE r4 low #2)
            tw = tables[0]
            g = -(-R // MAX_BASE_BATCH)
            pad = g * MAX_BASE_BATCH - R
            if pad:
                x = jnp.concatenate(
                    [x, jnp.zeros((pad, n, FR.L), x.dtype)], axis=0)
            xs = x.reshape(g, MAX_BASE_BATCH, n, FR.L)
            out = jax.lax.map(lambda v: _ntt_base(v, tw), xs)
            return out.reshape(g * MAX_BASE_BATCH, n, FR.L)[:R]
        return _ntt_base(x, tables[0])

    log_n1 = (log_n + 1) // 2
    log_n2 = log_n - log_n1
    n1, n2 = 1 << log_n1, 1 << log_n2
    t2_tables, W, t1_tables = tables
    # A[s1, s2] = a[s1 + n1·s2]
    A = jnp.transpose(x.reshape(R, n2, n1, FR.L), (0, 2, 1, 3))
    # inner transforms over s2 (R·n1 of size n2) — one natively-batched call
    B = _ntt_batched(A.reshape(R * n1, n2, FR.L), inverse, t2_tables)
    B = B.reshape(R, n1, n2, FR.L)
    # twiddle: C[s1, t2] = B[s1, t2] · w^(s1·t2), lane-major (lanes = n2).
    # Slab over s1: the full-width lane16 product pads a
    # (R, n1, 33·L, n2) scratch — 8.25 GB at 2^22 (r4 OOM report).
    Bt = jnp.swapaxes(B, -1, -2)                            # (R, n1, L, n2)
    Wt = jnp.swapaxes(W, -1, -2)                            # (n1, L, n2)
    cap = max(1, MAX_BASE_BATCH // max(1, R))
    cap = 1 << (cap.bit_length() - 1)   # power of two so it divides n1
    if n1 > cap and n1 % cap == 0:
        g = n1 // cap
        Bg = jnp.moveaxis(Bt.reshape(R, g, cap, FR.L, n2), 1, 0)
        Wg = Wt.reshape(g, cap, FR.L, n2)
        Ct = jax.lax.map(
            lambda bw: LFR.mont_mul(bw[0], bw[1][None]), (Bg, Wg))
        Ct = jnp.moveaxis(Ct, 0, 1).reshape(R, n1, FR.L, n2)
    else:
        Ct = LFR.mont_mul(Bt, Wt[None])
    C = jnp.swapaxes(Ct, -1, -2)                            # (R, n1, n2, L)
    # outer transforms over s1 (R·n2 of size n1)
    D = _ntt_batched(
        jnp.transpose(C, (0, 2, 1, 3)).reshape(R * n2, n1, FR.L), inverse,
        t1_tables)
    D = D.reshape(R, n2, n1, FR.L)
    # out[t1·n2 + t2] = D[t2, t1]
    return jnp.transpose(D, (0, 2, 1, 3)).reshape(R, n, FR.L)


def _ensure_tables(log_n: int, inverse: bool) -> None:
    """Populate twiddle caches eagerly (outside any jit trace)."""
    if log_n <= BASE_LOG:
        if log_n >= 1:
            twiddles(log_n, inverse)
        return
    log_n1 = (log_n + 1) // 2
    log_n2 = log_n - log_n1
    _ensure_tables(log_n1, inverse)
    _ensure_tables(log_n2, inverse)
    _twiddle_matrix(log_n1, log_n2, inverse)


@functools.partial(jax.jit, static_argnames=("inverse",))
def _ntt_jit(x: jnp.ndarray, tables, inverse: bool) -> jnp.ndarray:
    """Batched NTT/iNTT over axis -2 of (..., N, L) Montgomery values."""
    shape = x.shape
    y = _ntt_batched(x.reshape(-1, shape[-2], FR.L), inverse, tables)
    if inverse:
        n = shape[-2]
        n_inv_mont = pow(n, o.R - 2, o.R) * FR.mont_r % o.R
        # scale through the byte engine: BOTH uint32 engines' schoolbook
        # pads scale with full width (8.25 GB at 2^22, r4 OOM reports for
        # field.py:233 and lane.py:180); the fused kernel path works per
        # VMEM tile and the graph fallback only ever sees small test sizes
        from . import lane8 as l8
        from . import pallas_g1 as pg
        y8 = l8.to_lane8(y.reshape(-1, FR.L))          # (32, R·n)
        c8 = l8.to_lane8(jnp.asarray(
            FR.to_limbs(n_inv_mont))[None])            # (32, 1)
        cb = jnp.broadcast_to(c8, y8.shape)
        if pg.aligned(y8.shape[-1]):
            y8 = pg.pfield("mont_mul", l8.BFR, y8, cb)
        else:
            y8 = l8.BFR.mont_mul(y8, cb)
        y = l8.from_lane8(y8)
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
