"""Polynomial operations over Fr (coefficient form, c[0] = constant term).

Semantics match the reference prover's ``eval`` RPC
(reference: neurons/validator.py:97-104) and the quotient construction used by
KZG ``worker_open`` (reference: neurons/miner.py:47-54).

TPU-first formulation: Horner is a length-N *sequential* chain — poison for a
vector machine. Instead both evaluation and the synthetic-division quotient
come from one log-depth pipeline over the termwise products t_k = c_k·x^k:

    f(x)  = Σ_k t_k                      (tree reduction)
    S_j   = Σ_{k≥j} t_k                  (suffix sums: one associative scan)
    q_j   = (f(X) − f(x))/(X − x)[j] = x^{-(j+1)}·S_{j+1}

so a degree-2^16 opening is ~log₂N sequential steps instead of 2^16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .field import FR


def _tree_sum(terms):
    """Field-sum over axis 0 by trace-time halving; any N ≥ 1."""
    n = terms.shape[0]
    while n > 1:
        half = n // 2
        rest = terms[2 * half:]
        terms = FR.add(terms[:half], terms[half:2 * half])
        if rest.shape[0]:
            terms = jnp.concatenate([terms, rest], axis=0)
        n = terms.shape[0]
    return terms[0]


def poly_eval(coeffs, x):
    """Evaluate f(x). coeffs: (N, L) Montgomery; x: (L,)."""
    n = coeffs.shape[0]
    pw = FR.powers(x, n)                       # (n, L): x^0 .. x^{n-1}
    return _tree_sum(FR.mont_mul(coeffs, pw))


def poly_eval_many(coeffs, xs):
    """Evaluate one polynomial at many points: coeffs (N,L), xs (B,L) → (B,L)."""
    return jax.vmap(lambda x: poly_eval(coeffs, x))(xs)


def poly_eval_and_quotient(coeffs, x):
    """(f(x), q) with q(X) = (f(X) − f(x))/(X − x), shape (N−1, L).

    One suffix scan serves both: f(x) = S_0 and q_j = x^{-(j+1)}·S_{j+1}.
    The x = 0 corner (never hit by random challenge points, but kept exact)
    degenerates to q = c[1:], selected branchlessly.
    """
    n = coeffs.shape[0]
    pw = FR.powers(x, n)
    terms = FR.mont_mul(coeffs, pw)            # t_k = c_k·x^k
    suffix = jax.lax.associative_scan(FR.add, terms, reverse=True, axis=0)
    y = suffix[0]

    x_inv = FR.inv(x)                          # 0 → 0 (Fermat)
    inv_pw = FR.mont_mul(FR.powers(x_inv, n - 1), x_inv[None])  # x^{-1}..x^{-(n-1)}
    q = FR.mont_mul(suffix[1:], inv_pw)
    q_zero = coeffs[1:]                        # exact quotient at x = 0
    zero = FR.is_zero(x)
    q = FR.select(jnp.broadcast_to(zero, q.shape[:-1]), q_zero, q)
    return y, q


def poly_quotient(coeffs, x):
    """q(X) = (f(X) − f(x))/(X − x) via the suffix-scan identity above."""
    return poly_eval_and_quotient(coeffs, x)[1]


def poly_add(a, b):
    return FR.add(a, b)


def poly_scale(coeffs, k):
    """Multiply every coefficient by scalar k (Montgomery)."""
    return FR.mont_mul(coeffs, jnp.broadcast_to(k, coeffs.shape))
