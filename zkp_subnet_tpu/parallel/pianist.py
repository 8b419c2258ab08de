"""Multi-chip Pianist proving: the worker axis sharded over a device mesh.

This layer is the TPU-native replacement for the reference's miner/validator
*network*: where the reference fans a challenge out to remote miners over
HTTP synapses and aggregates nothing (reference: neurons/validator.py:194-224,
aggregation documented-but-unimplemented at validator.py:196-198), here the
2^machines_scale Pianist workers live on a ``jax.sharding.Mesh`` axis and the
whole distributed prove — per-worker commit + open, cross-worker gather,
bivariate aggregation — is ONE jitted SPMD program whose collectives ride ICI.

Mesh layout:
- ``machines`` axis: Pianist row parallelism (the reference's miner fan-out,
  §2.13 of SURVEY.md). Worker i's SRS slice and coefficient row are resident
  on its shard; commitments/evals/openings are (3, L)-sized, so the
  all_gather that replaces the reference's HTTP responses moves O(M) tiny
  payloads.
- ``batch`` axis: independent challenges proved concurrently (the reference's
  ``neuron.num_concurrent_forwards``, base/validator.py:122-126) — pure data
  parallelism.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.field import FR, FQ
from ..ops import curve as cv
from ..ops import msm as jmsm
from ..ops import ntt as jntt
from ..models import kzg
from ..models import pianist as pn
from ..models.srs import Srs

BATCH_AXIS = "batch"
MACHINES_AXIS = "machines"


def make_mesh(n_machines: Optional[int] = None, n_batch: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (batch, machines) mesh from the available devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_machines is None:
        n_machines = len(devs) // n_batch
    need = n_batch * n_machines
    if len(devs) < need:
        raise ValueError(f"need {need} devices, have {len(devs)}")
    grid = np.array(devs[:need]).reshape(n_batch, n_machines)
    return Mesh(grid, (BATCH_AXIS, MACHINES_AXIS))


def shard_srs(srs: Srs, mesh: Mesh) -> Srs:
    """Place the per-worker SRS slices on their machines-axis shards."""
    row_shard = NamedSharding(mesh, P(MACHINES_AXIS))
    return Srs(
        scale=srs.scale, machines_scale=srs.machines_scale,
        g1_x=srs.g1_x,
        worker_bases=jax.device_put(srs.worker_bases, row_shard),
        lagrange_y=jax.device_put(srs.lagrange_y, row_shard),
        g2_gen=srs.g2_gen, g2_tau_x=srs.g2_tau_x, g2_tau_y=srs.g2_tau_y)


class DistributedProof(NamedTuple):
    """Per-worker pieces (sharded) + the aggregated bivariate proof."""
    commitments: jnp.ndarray    # (B, M, 3, Lq) — sharded (batch, machines)
    evals: jnp.ndarray          # (B, M, L)
    proofs: jnp.ndarray         # (B, M, 3, Lq)
    commitment: jnp.ndarray     # C   (B, 3, Lq) — sharded (batch,)
    proof_x: jnp.ndarray        # W   (B, 3, Lq)
    commitment_y: jnp.ndarray   # C_y (B, 3, Lq)
    proof_y: jnp.ndarray        # W_y (B, 3, Lq)
    value: jnp.ndarray          # f(α, β) (B, L)


def _prove_block(bases, lag, rows, alpha, beta, dom, m_inv, *,
                 window_bits: int):
    """Per-shard body: local commit/open, gather, replicated aggregation.

    bases (Ml, T, 3, Lq), lag (Ml, 3, Lq), rows (Bl, Ml, T, L),
    alpha (L,), beta (Bl, L), dom (M, L), m_inv (L,).
    """
    com = jax.vmap(jax.vmap(
        lambda b, r: kzg.commit(b, r, window_bits), in_axes=(0, 0)),
        in_axes=(None, 0))(bases, rows)                     # (Bl, Ml, 3, Lq)
    ev, prf = jax.vmap(jax.vmap(
        lambda b, r: kzg.open_(b, r, alpha, window_bits), in_axes=(0, 0)),
        in_axes=(None, 0))(bases, rows)                     # (Bl,Ml,L)/(..3,Lq)

    # The "network": replace the reference's HTTP fan-in with one all_gather
    # per quantity over the machines axis (payloads are single points/evals).
    coms = jax.lax.all_gather(com, MACHINES_AXIS, axis=1, tiled=True)
    prfs = jax.lax.all_gather(prf, MACHINES_AXIS, axis=1, tiled=True)
    evals = jax.lax.all_gather(ev, MACHINES_AXIS, axis=1, tiled=True)
    lags = jax.lax.all_gather(lag, MACHINES_AXIS, axis=0, tiled=True)

    def agg_one(c, w, e, b):
        return pn.aggregate_core(lags, c, w, e, b, dom, m_inv,
                                 window_bits=window_bits)

    C, W, C_y, W_y, value = jax.vmap(agg_one)(coms, prfs, evals, beta)
    return com, ev, prf, C, W, C_y, W_y, value


@functools.lru_cache(maxsize=8)
def _build_prove(mesh: Mesh, window_bits: int):
    body = functools.partial(_prove_block, window_bits=window_bits)
    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(MACHINES_AXIS), P(MACHINES_AXIS),
                  P(BATCH_AXIS, MACHINES_AXIS), P(), P(BATCH_AXIS),
                  P(), P()),
        out_specs=(P(BATCH_AXIS, MACHINES_AXIS),
                   P(BATCH_AXIS, MACHINES_AXIS),
                   P(BATCH_AXIS, MACHINES_AXIS),
                   P(BATCH_AXIS), P(BATCH_AXIS), P(BATCH_AXIS),
                   P(BATCH_AXIS), P(BATCH_AXIS)),
        check_vma=False)
    return jax.jit(mapped)


def prove(srs: Srs, rows: jnp.ndarray, alpha: jnp.ndarray,
          beta: jnp.ndarray, mesh: Mesh,
          window_bits=None) -> DistributedProof:
    """Full distributed Pianist prove as one SPMD program.

    rows: (B, M, T, L) Montgomery coefficients, sharded (batch, machines);
    alpha: (L,) shared opening point; beta: (B, L) per-challenge Y point.
    """
    dom, m_inv = pn.aggregation_constants(srs.machines)
    fn = _build_prove(mesh, window_bits)
    out = fn(srs.worker_bases, srs.lagrange_y, rows, alpha, beta, dom, m_inv)
    return DistributedProof(*out)


# ---------------------------------------------------------------------------
# Distributed NTT over the bivariate rows
# ---------------------------------------------------------------------------


def _fft_rows_block(rows, *, inverse: bool):
    """left=True transform: per-row NTT along X — zero communication."""
    return jntt.ntt_batch(rows, inverse=inverse)


def _fft_cols_block(rows, *, inverse: bool, n_shards: int):
    """left=False transform along Y (across machines): all-to-all transpose,
    local NTT over the now-resident Y axis, transpose back — the classic
    Bailey decomposition seam mapped onto ICI.

    rows (Bl, Ml, T, L) with M = Ml·n_shards total machines.
    """
    if n_shards == 1:
        swapped = jnp.swapaxes(rows, 1, 2)
        out = jntt.ntt_batch(swapped, inverse=inverse)
        return jnp.swapaxes(out, 1, 2)
    # (Bl, Ml, T, L) → (Bl, M, T/n, L): every shard now holds T/n full columns
    cols = jax.lax.all_to_all(rows, MACHINES_AXIS, split_axis=2,
                              concat_axis=1, tiled=True)
    swapped = jnp.swapaxes(cols, 1, 2)               # (Bl, T/n, M, L)
    out = jntt.ntt_batch(swapped, inverse=inverse)
    out = jnp.swapaxes(out, 1, 2)                    # (Bl, M, T/n, L)
    return jax.lax.all_to_all(out, MACHINES_AXIS, split_axis=1,
                              concat_axis=2, tiled=True)


@functools.lru_cache(maxsize=16)
def _build_fft(mesh: Mesh, left: bool, inverse: bool):
    if left:
        body = functools.partial(_fft_rows_block, inverse=inverse)
    else:
        n_shards = mesh.shape[MACHINES_AXIS]
        body = functools.partial(_fft_cols_block, inverse=inverse,
                                 n_shards=n_shards)
    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(BATCH_AXIS, MACHINES_AXIS),),
        out_specs=P(BATCH_AXIS, MACHINES_AXIS),
        check_vma=False)
    return jax.jit(mapped)


def fft(rows: jnp.ndarray, mesh: Mesh, left: bool = True,
        inverse: bool = False) -> jnp.ndarray:
    """Distributed ``fft(poly, left, inverse)`` (reference:
    neurons/validator.py:58-65) over (B, M, T, L) sharded rows."""
    # populate twiddle caches outside the trace
    if left:
        jntt._ensure_tables(rows.shape[2].bit_length() - 1, inverse)
    else:
        jntt._ensure_tables(rows.shape[1].bit_length() - 1, inverse)
    return _build_fft(mesh, left, inverse)(rows)
