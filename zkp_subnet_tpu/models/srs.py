"""KZG structured reference string: generation, worker slices, persistence.

Parity surface: the reference's ``fourier setup --setup-path P
--precompute-path P --scale N --machines-scale M --generate-setup
--generate-precompute --overwrite`` CLI (reference: tests/conftest.py:50-65)
and the ``setup_{scale}_{machines}`` artifact naming (reference:
Makefile:30-48). Here *setup* = the monomial τ_X/τ_Y powers in G1/G2 and
*precompute* = the per-worker Pianist slices (Lagrange-scaled SRS rows).

Pianist structure (README.md:17 cites eprint 2023/1271): the bivariate
f(X, Y) = Σ_i R_i(Y)·f_i(X) with M = 2^machines_scale workers, each owning a
row of T = 2^(scale − machines_scale) coefficients. Worker i commits with the
slice U_i[j] = [R_i(τ_Y)·τ_X^j]G1, so Σ_i com_i = [f(τ_X, τ_Y)]G1 — the
per-worker proofs aggregate by plain point addition, which is what the
reference documents but never wired (reference: neurons/validator.py:194-198).

SRS generation runs on TPU: powers of τ via log-depth doubling, then a
fixed-base comb multiplication (precomputed generator window tables —
W lookups + adds per scalar instead of 256 double-and-add steps), chunked so
device memory stays bounded at any scale. At the reference mainnet size
(scale 24 / machines 8, reference: Makefile:63-87) that is 2^24 scalars in
2^16-sized chunks.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.field import FR, FQ
from ..ops import curve as cv
from ..ops import ntt as jntt
from ..utils import oracle as o
from ..utils import encoding as enc

FORMAT_VERSION = 1

#: scalars per fixed-base chunk during SRS generation — bounds device
#: memory to ~chunk·(3·24·4 + tables) bytes regardless of scale
GEN_CHUNK = 1 << 16


def _fixed_base_chunked(scalars_canonical: "jnp.ndarray") -> "jnp.ndarray":
    """[k]G for (N, 16) canonical scalars via the comb tables, in fixed-shape
    chunks (one compiled program; final chunk zero-padded then trimmed)."""
    tables = cv.g1_fixed_base_tables()
    n = scalars_canonical.shape[0]
    if n <= GEN_CHUNK:
        # small problems: one call at the next power-of-two shape to bound
        # the number of distinct compiled shapes
        target = max(16, 1 << (n - 1).bit_length())
        pad = target - n
        if pad:
            scalars_canonical = jnp.concatenate(
                [scalars_canonical,
                 jnp.zeros((pad, FR.L), jnp.uint32)], axis=0)
        return cv.g1_fixed_base_mul(tables, scalars_canonical)[:n]
    pieces = []
    for off in range(0, n, GEN_CHUNK):
        chunk = scalars_canonical[off:off + GEN_CHUNK]
        pad = GEN_CHUNK - chunk.shape[0]
        if pad:
            chunk = jnp.concatenate(
                [chunk, jnp.zeros((pad, FR.L), jnp.uint32)], axis=0)
        out = cv.g1_fixed_base_mul(tables, chunk)
        pieces.append(np.asarray(jax.device_get(out), dtype=np.uint32))
    host = np.concatenate(pieces, axis=0)[:n]
    return jnp.asarray(host)


def _lagrange_coeffs_at(tau_y: int, m: int) -> List[int]:
    """R_i(τ_Y) for the size-m roots-of-unity domain, i = 0..m-1.

    R_i(Y) = (Y^m - 1)·ω^i / (m·(Y - ω^i)); computed with host bigints
    (m ≤ 2^8 in practice).
    """
    log_m = m.bit_length() - 1
    w = o.fr_root_of_unity(log_m)
    num = (pow(tau_y, m, o.R) - 1) % o.R
    minv = pow(m, o.R - 2, o.R)
    out = []
    for i in range(m):
        wi = pow(w, i, o.R)
        denom = (tau_y - wi) % o.R
        if denom == 0:
            # τ_Y hit the domain (astronomically unlikely); L_i(τ)=δ
            out.append(1 if pow(w, i, o.R) == tau_y else 0)
            continue
        out.append(num * wi % o.R * minv % o.R * pow(denom, o.R - 2, o.R) % o.R)
    return out


@dataclasses.dataclass
class Srs:
    """Device-resident SRS.

    g1_x: (2^scale_x, 3, L) — [τ_X^j]G1 (monomial basis), Montgomery form.
    worker_bases: (M, T, 3, L) — U_i[j] = [R_i(τ_Y)·τ_X^j]G1.
    lagrange_y: (M, 3, L) — V_i = [R_i(τ_Y)]G1 (per-worker verifier keys,
        and the Lagrange-basis Y-SRS used for aggregation opening).
    g2_gen / g2_tau_x / g2_tau_y: host oracle G2 points.
    """
    scale: int
    machines_scale: int
    g1_x: jnp.ndarray
    worker_bases: jnp.ndarray
    lagrange_y: jnp.ndarray
    g2_gen: tuple
    g2_tau_x: tuple
    g2_tau_y: tuple

    @property
    def machines(self) -> int:
        return 1 << self.machines_scale

    @property
    def row_size(self) -> int:
        return 1 << (self.scale - self.machines_scale)

    def device_worker_bases(self, i: int) -> "jnp.ndarray":
        """Worker i's base slice as a device array, cached per worker.

        With a lazy (memmap) load, worker_bases[i] is an 18 MB host page-in
        at mainnet shape; without the cache every prove re-transfers it —
        measured ~9 s/prove vs the ~0.5 s device time at scale 24/8. Each
        worker process typically touches only its own slice, so the cache
        holds one row; the coordinator's verify path touches none."""
        cache = self.__dict__.setdefault("_dev_bases", {})
        if i not in cache:
            wb = self.worker_bases[i]
            if isinstance(wb, np.ndarray):       # lazy memmap slice
                wb = jnp.asarray(np.ascontiguousarray(wb))
            cache[i] = wb                        # eager: already on device
        return cache[i]

    # -- generation ----------------------------------------------------------

    @classmethod
    def generate(cls, scale: int, machines_scale: int,
                 tau_x: Optional[int] = None, tau_y: Optional[int] = None,
                 seed: int = 0) -> "Srs":
        """Generate a fresh SRS (trusted-setup emulation, parity with
        ``fourier setup --generate-setup --generate-precompute``)."""
        import random
        rnd = random.Random(seed + 0x5E70)
        if tau_x is None:
            tau_x = rnd.randrange(1, o.R)
        if tau_y is None:
            tau_y = rnd.randrange(1, o.R)
        m = 1 << machines_scale
        t = 1 << (scale - machines_scale)

        # [τ_X^j]G1 for j < t (per-worker row length; the full 2^scale
        # monomial basis is recoverable but unused by the Pianist flow)
        tx_mont = FR.encode([tau_x])[0]
        pow_x = FR.powers(tx_mont, t)                       # (t, L) Montgomery

        # R_i(τ_Y) scalars and worker bases U_i[j] = [R_i(τ_Y)·τ_X^j]G1
        lag = _lagrange_coeffs_at(tau_y, m)                 # host ints
        lag_mont = FR.encode_vec(lag)                       # (m, L)
        s = FR.mont_mul(lag_mont[:, None, :], pow_x[None, :, :])  # (m, t, L)

        # fixed-base comb multiplication, chunked: bounded device memory at
        # any scale, one compiled program shape
        all_scalars = FR.from_mont(jnp.concatenate(
            [pow_x, s.reshape(m * t, FR.L), lag_mont], axis=0))
        all_points = _fixed_base_chunked(all_scalars)
        g1_x = all_points[:t]
        worker_bases = all_points[t:t + m * t].reshape(m, t, 3, FQ.L)
        lagrange_y = all_points[t + m * t:]

        g2 = o.G2.from_affine(o.G2_GEN)
        return cls(
            scale=scale, machines_scale=machines_scale,
            g1_x=g1_x, worker_bases=worker_bases, lagrange_y=lagrange_y,
            g2_gen=g2,
            g2_tau_x=o.G2.mul(g2, tau_x),
            g2_tau_y=o.G2.mul(g2, tau_y),
        )

    @classmethod
    def generate_to_disk(cls, scale: int, machines_scale: int,
                         setup_path: str, precompute_path: str,
                         tau_x: Optional[int] = None,
                         tau_y: Optional[int] = None,
                         seed: int = 0, progress=None) -> None:
        """Stream-generate straight into the ``save()`` format.

        Worker slices go chunk-by-chunk into the sidecar memmap: neither
        device nor host ever holds more than one GEN_CHUNK of points, so the
        reference mainnet shape — scale 24 / machines 8, a 4.8 GB sidecar
        (reference: Makefile:63-87) — generates with ~18 MB resident per
        step. This also sidesteps the full-width ``FR.from_mont``, whose
        limb-minor pad intermediate OOMs at ≥2^21 (PROFILE.md big-shape
        notes); every from_mont here is at most GEN_CHUNK wide.

        ``progress`` (optional): callback(done_rows, total_rows) after each
        worker slice, for long-run liveness logging.
        """
        import random
        rnd = random.Random(seed + 0x5E70)
        if tau_x is None:
            tau_x = rnd.randrange(1, o.R)
        if tau_y is None:
            tau_y = rnd.randrange(1, o.R)
        m = 1 << machines_scale
        t = 1 << (scale - machines_scale)

        tx_mont = FR.encode([tau_x])[0]
        pow_x = FR.powers(tx_mont, t)                       # (t, L) Montgomery
        lag_mont = FR.encode_vec(_lagrange_coeffs_at(tau_y, m))  # (m, L)

        def host(x):
            return np.asarray(jax.device_get(x), dtype=np.uint32)

        def fixed_base_mont(mont_scalars):
            """comb fixed-base of Montgomery scalars, GEN_CHUNK at a time."""
            outs = []
            for off in range(0, mont_scalars.shape[0], GEN_CHUNK):
                canon = FR.from_mont(mont_scalars[off:off + GEN_CHUNK])
                outs.append(host(_fixed_base_chunked(canon)))
            return np.concatenate(outs, axis=0)

        g1_x = fixed_base_mont(pow_x)
        lagrange_y = fixed_base_mont(lag_mont)

        g2 = o.G2.from_affine(o.G2_GEN)
        np.savez_compressed(
            setup_path,
            version=FORMAT_VERSION, scale=scale,
            machines_scale=machines_scale, g1_x=g1_x,
            g2_gen=np.frombuffer(enc.g2_to_bytes(g2, False), dtype=np.uint8),
            g2_tau_x=np.frombuffer(enc.g2_to_bytes(o.G2.mul(g2, tau_x), False),
                                   dtype=np.uint8),
            g2_tau_y=np.frombuffer(enc.g2_to_bytes(o.G2.mul(g2, tau_y), False),
                                   dtype=np.uint8),
        )
        meta = dict(version=FORMAT_VERSION, scale=scale,
                    machines_scale=machines_scale, lagrange_y=lagrange_y)
        np.savez_compressed(precompute_path, sidecar=1, **meta)
        side = np.lib.format.open_memmap(
            cls._sidecar_path(precompute_path), mode="w+",
            dtype=np.uint32, shape=(m, t, 3, FQ.L))
        # one compiled program per distinct chunk shape (GEN_CHUNK-padded):
        # scale each worker's τ_X powers by R_i(τ_Y), from_mont, comb-mul
        row_fn = jax.jit(lambda li, px: _fixed_base_chunked(
            FR.from_mont(FR.mont_mul(li[None, :], px))))
        for i in range(m):
            for off in range(0, t, GEN_CHUNK):
                px = pow_x[off:off + GEN_CHUNK]
                side[i, off:off + px.shape[0]] = host(row_fn(lag_mont[i], px))
            if progress is not None:
                progress(i + 1, m)
        side.flush()

    # -- persistence ---------------------------------------------------------

    #: above this many coefficients, worker_bases goes to a sidecar .npy
    #: written incrementally via memmap (npz would need the whole ~GBs
    #: array compressed in memory; the sidecar also allows lazy/mmap loads)
    _SIDE_CAR_LIMIT = 1 << 18

    def save(self, setup_path: str, precompute_path: str) -> None:
        """Write setup (G1/G2 powers) and precompute (worker slices) files.

        Small scales: everything inside the two .npz files (v1 layout).
        Large scales: worker_bases streams to ``<precompute>.bases.npy`` via
        memmap, chunk by chunk — scale-24/8 (reference mainnet,
        Makefile:63-87) writes 4.8 GB without ever holding a second copy.
        """
        def host(x):
            return np.asarray(jax.device_get(x), dtype=np.uint32)

        np.savez_compressed(
            setup_path,
            version=FORMAT_VERSION, scale=self.scale,
            machines_scale=self.machines_scale,
            g1_x=host(self.g1_x),
            g2_gen=np.frombuffer(enc.g2_to_bytes(self.g2_gen, False),
                                 dtype=np.uint8),
            g2_tau_x=np.frombuffer(enc.g2_to_bytes(self.g2_tau_x, False),
                                   dtype=np.uint8),
            g2_tau_y=np.frombuffer(enc.g2_to_bytes(self.g2_tau_y, False),
                                   dtype=np.uint8),
        )
        m, t = self.machines, self.row_size
        meta = dict(version=FORMAT_VERSION, scale=self.scale,
                    machines_scale=self.machines_scale,
                    lagrange_y=host(self.lagrange_y))
        if m * t <= self._SIDE_CAR_LIMIT:
            np.savez_compressed(precompute_path,
                                worker_bases=host(self.worker_bases), **meta)
            return
        np.savez_compressed(precompute_path, sidecar=1, **meta)
        side = np.lib.format.open_memmap(
            self._sidecar_path(precompute_path), mode="w+",
            dtype=np.uint32, shape=(m, t, 3, FQ.L))
        for i in range(m):                      # one worker slice at a time
            side[i] = host(self.worker_bases[i])
        side.flush()

    @staticmethod
    def _sidecar_path(precompute_path: str) -> str:
        return precompute_path + ".bases.npy"

    @classmethod
    def load(cls, setup_path: str, precompute_path: str,
             lazy: bool = False) -> "Srs":
        """Load an SRS pair. ``lazy=True`` keeps a sidecar worker_bases as a
        read-only host memmap — per-worker slices (or mesh shards via
        parallel.shard_srs) are paged in and transferred on first use, so a
        host never materializes bases it doesn't own."""
        for path in (setup_path, precompute_path):
            if not os.path.exists(path):
                raise FileNotFoundError(path)
        s = np.load(setup_path)
        p = np.load(precompute_path)
        if int(s["version"]) != FORMAT_VERSION:
            raise ValueError("unsupported setup format")
        if int(s["scale"]) != int(p["scale"]) or \
                int(s["machines_scale"]) != int(p["machines_scale"]):
            raise ValueError("setup/precompute mismatch")
        if "worker_bases" in p.files:
            bases = jnp.asarray(p["worker_bases"])
        else:
            bases = np.load(cls._sidecar_path(precompute_path),
                            mmap_mode="r")
            if not lazy:
                bases = jnp.asarray(np.ascontiguousarray(bases))
        return cls(
            scale=int(s["scale"]), machines_scale=int(s["machines_scale"]),
            g1_x=jnp.asarray(s["g1_x"]),
            worker_bases=bases,
            lagrange_y=jnp.asarray(p["lagrange_y"]),
            g2_gen=enc.g2_from_bytes(s["g2_gen"].tobytes()),
            g2_tau_x=enc.g2_from_bytes(s["g2_tau_x"].tobytes()),
            g2_tau_y=enc.g2_from_bytes(s["g2_tau_y"].tobytes()),
        )


def default_paths(base_dir: str, scale: int, machines_scale: int):
    """``setup_{scale}_{machines}`` naming parity (reference: Makefile:40-48)."""
    return (os.path.join(base_dir, f"setup_{scale}_{machines_scale}.npz"),
            os.path.join(base_dir, f"precompute_{scale}_{machines_scale}.npz"))
