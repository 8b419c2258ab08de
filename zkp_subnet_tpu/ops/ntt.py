"""Radix-2 NTT / iNTT over Fr for TPU.

Matches the reference prover's ``fft(poly, left, inverse)`` RPC semantics
(reference: neurons/validator.py:58-65, used with left=True, inverse=True to
move evaluation-form rows to coefficient form at validator.py:116).

Design, TPU-first:
- Small sizes (≤ 2^11): iterative decimation-in-time with bit-reversal done by
  a pure axis transpose (no gathers) and one batched Montgomery multiply per
  stage. Compiled once, reused via vmap.
- Large sizes: Bailey four-step decomposition N = n1·n2 — batched column
  NTTs, twiddle matrix multiply, batched row NTTs, one transpose. This keeps
  the compiled graph small (the base NTT is traced once per axis) and
  expresses the data movement as dense transposes, which XLA maps to
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
from ..utils import oracle as o

#: max log-size handled by the direct stage-unrolled kernel
BASE_LOG = 11

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


def _ntt_base(x: jnp.ndarray, tw: jnp.ndarray) -> jnp.ndarray:
    """Direct DIT NTT for N ≤ 2^BASE_LOG. x: (N, L); tw: (N/2, L)."""
    n = x.shape[0]
    log_n = n.bit_length() - 1

    # Bit-reversal permutation as a transpose over the bit axes (no gathers).
    y = x.reshape((2,) * log_n + (FR.L,))
    y = jnp.transpose(y, tuple(reversed(range(log_n))) + (log_n,))
    y = y.reshape(n, FR.L)

    for s in range(1, log_n + 1):
        m = 1 << s
        half = m // 2
        stride = (n // 2) // half
        w = tw[::stride][:half]  # (half, L)
        v = y.reshape(n // m, m, FR.L)
        even, odd = v[:, :half], v[:, half:]
        t = FR.mont_mul(odd, w[None, :, :])
        y = jnp.concatenate([FR.add(even, t), FR.sub(even, t)],
                            axis=1).reshape(n, FR.L)
    return y


def _ntt_unscaled(x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    """NTT without the 1/n inverse scaling. x: (N, L) Montgomery form."""
    n = x.shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "size must be a power of two"
    if log_n == 0:
        return x
    if log_n <= BASE_LOG:
        return _ntt_base(x, twiddles(log_n, inverse))

    log_n1 = (log_n + 1) // 2
    log_n2 = log_n - log_n1
    n1, n2 = 1 << log_n1, 1 << log_n2
    # A[s1, s2] = a[s1 + n1·s2]
    A = jnp.transpose(x.reshape(n2, n1, FR.L), (1, 0, 2))
    # inner transforms over s2 (n1 of size n2)
    B = jax.vmap(lambda v: _ntt_unscaled(v, inverse))(A)
    # twiddle: C[s1, t2] = B[s1, t2] · w^(s1·t2)
    C = FR.mont_mul(B, _twiddle_matrix(log_n1, log_n2, inverse))
    # outer transforms over s1 (n2 of size n1)
    D = jax.vmap(lambda v: _ntt_unscaled(v, inverse))(
        jnp.transpose(C, (1, 0, 2)))
    # D[t2, t1] → out[t1·n2 + t2] = D[t2, t1]
    return jnp.transpose(D, (1, 0, 2)).reshape(n, FR.L)


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
def _ntt_jit(x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    y = _ntt_unscaled(x, inverse)
    if inverse:
        n = x.shape[0]
        n_inv_mont = pow(n, o.R - 2, o.R) * FR.mont_r % o.R
        y = FR.mul_const(y, FR.to_limbs(n_inv_mont))
    return y


def ntt(x: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """NTT/iNTT of (N, L) Montgomery-form values; natural order in and out.

    Forward: out[k] = f(w^k) from coefficients. Inverse includes 1/n scaling.
    """
    log_n = x.shape[0].bit_length() - 1
    _ensure_tables(log_n, inverse)
    return _ntt_jit(x, inverse=inverse)


def intt(x: jnp.ndarray) -> jnp.ndarray:
    return ntt(x, inverse=True)


def ntt_batch(x: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Batched NTT over axis -2: x (..., N, L)."""
    fn = lambda v: ntt(v, inverse)
    for _ in range(x.ndim - 2):
        fn = jax.vmap(fn)
    return fn(x)
