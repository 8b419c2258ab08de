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

#: lanes per kernel instance. The dominant VMEM transient is the padded
#: skew product (L9, 2·L9+1, TILE) f32 — ~9.9 MB at 512 — against the
#: v5e's 16 MB scoped-vmem stack limit: 1024 OOMs the Mosaic compile
#: (21.1 MB requested, r5), 512 fits and roughly HALVES the per-op kernel
#: cost vs 256 (lazy lmul 2.77 → 1.3 ms per 64k lanes — fixed per-tile
#: costs amortize over twice the lanes). The r4 whole-point fused kernels
#: (MODE=fused) still want 256; set ZKP_PALLAS_TILE accordingly there.
TILE = int(__import__("os").environ.get("ZKP_PALLAS_TILE", "512"))

#: canonical lane widths a pallas_call may run at, largest first. Mosaic's
#: compile cache keys include the GRID, so each distinct width recompiles
#: the kernel (~900 s for the r4 fused add kernel); restricting calls to
#: this short ladder bounds compiles to ≤ len(CANONS) per kernel (only the
#: widths actually used compile, 3-4 s each for the op-level kernels).
#: Why a ladder and not one width: per-LAUNCH overhead (~0.1 ms through
#: the axon runtime) dominates the small field ops, while GRID steps
#: within one launch stream at DMA speed — a 64k-lane op as one launch of
#: grid 256 is ~8× cheaper than 8 launches of grid 32 (r5 measurement:
#: lazy MSM stayed at 2.7 s because the scan was launch-bound).
#: (when enabling the wide lane-batched add below — ZKP_LAZY_WIDE_MAX —
#: add its 49152/32768/24576/16384 rungs here so each concatenated layer
#: of 6n/4n/3n/2n lanes at the scan's n = 8192 is ONE launch instead of
#: a lax.map over 8k slabs; only widths actually used compile, 3-4 s
#: each. It measured net-negative, so the default ladder stays minimal.)
CANONS = tuple(int(s) for s in __import__("os").environ.get(
    "ZKP_PALLAS_CANONS", "65536,8192").split(","))
CANON = CANONS[-1]      # smallest: the alignment quantum for dispatch

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
    o_ref[:] = l8.g18_add_seq(p_ref[:], q_ref[:], F=F)


def _double_kernel(*refs):
    F = _load_view(refs[:_NCONST])
    p_ref, o_ref = refs[_NCONST:]
    o_ref[:] = l8.g18_double_seq(p_ref[:], F=F)


def _mul_kernel(*refs):
    F = _load_view(refs[:_NCONST])
    a_ref, b_ref, o_ref = refs[_NCONST:]
    o_ref[:] = F.mont_mul(a_ref[:], b_ref[:])


def _lane_tiles(n: int) -> int:
    assert n % TILE == 0, f"lane count {n} not a multiple of {TILE}"
    return n // TILE


def _pick_canon(n: int) -> int:
    """Largest canonical width dividing n (see CANONS)."""
    for c in CANONS:
        if n % c == 0:
            return c
    raise AssertionError(f"width {n} not a multiple of {CANONS[-1]}")


def _slabbed(call1):
    """Wrap a canon-width kernel call (``call1(canon, *xs)``) into an
    any-multiple caller: the largest canon dividing N is chosen; N == canon
    passes through as ONE launch; larger N streams slabs through ONE
    lax.map (scan) instance. Each (kernel, canon) pair compiles once."""
    def run(*xs):
        n = xs[0].shape[-1]
        canon = _pick_canon(n)
        if n == canon:
            return call1(canon, *xs)
        ns = n // canon
        slabbed = tuple(
            jnp.moveaxis(x.reshape(x.shape[:-1] + (ns, canon)), -2, 0)
            for x in xs)
        out = jax.lax.map(lambda args: call1(canon, *args), slabbed)
        return jnp.moveaxis(out, 0, -2).reshape(
            out.shape[1:-1] + (ns * canon,))
    return run


def _padd1(canon, p, q):
    spec = pl.BlockSpec((3, l8.BFQ.L8, TILE), lambda i: (0, 0, i))
    return pl.pallas_call(
        _add_kernel,
        grid=(_lane_tiles(canon),),
        in_specs=_const_specs() + [spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(p.shape, jnp.float32),
    )(*l8.BFQ.const_args(), p, q)


def _pdouble1(canon, p):
    spec = pl.BlockSpec((3, l8.BFQ.L8, TILE), lambda i: (0, 0, i))
    return pl.pallas_call(
        _double_kernel,
        grid=(_lane_tiles(canon),),
        in_specs=_const_specs() + [spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(p.shape, jnp.float32),
    )(*l8.BFQ.const_args(), p)


def _pmul1(canon, a, b):
    spec = pl.BlockSpec((l8.BFQ.L8, TILE), lambda i: (0, i))
    return pl.pallas_call(
        _mul_kernel,
        grid=(_lane_tiles(canon),),
        in_specs=_const_specs() + [spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.float32),
    )(*l8.BFQ.const_args(), a, b)


#: (3, L8, N) ⊕ (3, L8, N) complete RCB15 add, fused per CANON slab.
padd = jax.jit(_slabbed(_padd1))

#: (3, L8, N) complete RCB15 doubling, fused per CANON slab.
pdouble = jax.jit(_slabbed(_pdouble1))

#: (L8, N) Montgomery products, fused per CANON slab.
pmul = jax.jit(_slabbed(_pmul1))


# -- generic fused field ops (any ByteLaneField: Fq and Fr) -----------------

_FIELD_CALLS = {}


def pfield(op: str, F, *args):
    """One fused kernel pass of ByteLaneField.<op> on (L8, N) f32 arrays.

    Used by the polynomial pipeline (ops/poly.py) for the Fr hot ops
    (mont_mul / add / sub at row width); same VMEM-fusion rationale as the
    point kernels above. N must be a multiple of TILE.
    """
    key = (op, F.base.name, F.L8)    # L8 disambiguates the lazy 49-limb
    fn = _FIELD_CALLS.get(key)       # engine from the canonical 48-limb one
    if fn is None:
        nconst = len(F.CONST_NAMES)
        nargs = len(args)

        def kernel(*refs):
            Fv = F.kernel_view(*(r[:] for r in refs[:nconst]))
            ins = [r[:] for r in refs[nconst:-1]]
            refs[-1][:] = getattr(Fv, op)(*ins)

        cspecs = [pl.BlockSpec(c.shape, functools.partial(_zero_idx, c.ndim))
                  for c in F.const_args()]

        def call1(canon, *xs):
            spec = pl.BlockSpec((F.L8, TILE), lambda i: (0, i))
            return pl.pallas_call(
                kernel,
                grid=(_lane_tiles(canon),),
                in_specs=cspecs + [spec] * nargs,
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct(xs[0].shape, jnp.float32),
            )(*F.const_args(), *xs)

        fn = _FIELD_CALLS[key] = jax.jit(_slabbed(call1))
    return fn(*args)


_BFLY_CALLS = {}


def pbutterfly(F, even, odd, w):
    """Fused DIT butterfly: t = odd·w; returns stacked (2, L8, N) with
    [0] = even + t and [1] = even − t — ONE kernel launch and one HBM
    round trip instead of the three separate mont_mul/add/sub passes
    (each butterfly stage of ops/ntt.py reads/writes the full (L8, N)
    operands per op; fusing cuts the stage's array passes 9 → 5, the
    per-field-op HBM boundary the PROFILE.md roofline names as the NTT's
    gap). Bit-identical math: the same ByteLaneField ops composed in
    VMEM instead of through HBM."""
    key = (F.base.name, F.L8)
    fn = _BFLY_CALLS.get(key)
    if fn is None:
        nconst = len(F.CONST_NAMES)

        def kernel(*refs):
            Fv = F.kernel_view(*(r[:] for r in refs[:nconst]))
            e_ref, o_ref, w_ref, out_ref = refs[nconst:]
            e = e_ref[:]
            t = Fv.mont_mul(o_ref[:], w_ref[:])
            out_ref[0, :, :] = Fv.add(e, t)
            out_ref[1, :, :] = Fv.sub(e, t)

        cspecs = [pl.BlockSpec(c.shape, functools.partial(_zero_idx, c.ndim))
                  for c in F.const_args()]

        def call1(canon, *xs):
            spec = pl.BlockSpec((F.L8, TILE), lambda i: (0, i))
            ospec = pl.BlockSpec((2, F.L8, TILE), lambda i: (0, 0, i))
            return pl.pallas_call(
                kernel,
                grid=(_lane_tiles(canon),),
                in_specs=cspecs + [spec] * 3,
                out_specs=ospec,
                out_shape=jax.ShapeDtypeStruct((2,) + xs[0].shape,
                                               jnp.float32),
            )(*F.const_args(), *xs)

        fn = _BFLY_CALLS[key] = jax.jit(_slabbed(call1))
    return fn(even, odd, w)


class OpPallasField:
    """A ByteLaneField facade whose mul/add/sub each run as ONE fused
    pfield kernel — the op-granularity alternative to the whole-point
    kernels. Three tiny kernels (seconds of Mosaic compile each, vs ~18
    minutes for the fused add kernel, which the axon remote-compile path
    cannot cache across processes) at the cost of one HBM round trip per
    field op. Used by the dispatchers below when ZKP_PALLAS_MODE=ops."""

    def __init__(self, F):
        self.F = F
        self.L8 = F.L8
        self.b3_col = F.b3_col
        self.one_col = F.one_col

    def mont_mul(self, a, b):
        return pfield("mont_mul", self.F, a, b)

    def add(self, a, b):
        return pfield("add", self.F, a, b)

    def sub(self, a, b):
        return pfield("sub", self.F, a, b)


_OPFQ = None


def op_field():
    global _OPFQ
    if _OPFQ is None:
        _OPFQ = OpPallasField(l8.BFQ)
    return _OPFQ


class OpPallasLazyField:
    """OpPallasField analog for the lazy 49-limb engine (ops/lazy8.py):
    mont_mul/add/sub run as fused pfield kernels; neg is a plain sign flip
    (free in the XLA graph — the lazy engine's digits are signed)."""

    def __init__(self, F):
        self.F = F
        self.L8 = F.L8
        self.b3_col = F.b3_col
        self.one_col = F.one_col

    def mont_mul(self, a, b):
        return pfield("mont_mul", self.F, a, b)

    def add(self, a, b):
        return pfield("add", self.F, a, b)

    def sub(self, a, b):
        return pfield("sub", self.F, a, b)

    def neg(self, a):
        return -a


_OPZFQ = None


def op_lazy_field():
    global _OPZFQ
    if _OPZFQ is None:
        from . import lazy8 as lz
        _OPZFQ = OpPallasLazyField(lz.ZFQ)
    return _OPZFQ


#: kernel granularity: "fused" = whole-point kernels (fastest steady-state,
#: ~23 min of uncacheable Mosaic compiles per process), "ops" = per-field-op
#: kernels (seconds of compile, ~field-op HBM boundaries). Measured pair in
#: BENCH extras / PROFILE.md.
MODE = __import__("os").environ.get("ZKP_PALLAS_MODE", "ops")


# -- width-dispatch helpers (shared by msm/poly/curve hot paths) ------------


def aligned(width: int) -> bool:
    """True when the fused kernels should take this op: CANON-aligned width
    on a non-CPU backend (CPU tests and narrow tails use the XLA-graph
    byte engine)."""
    return width % CANON == 0 and jax.default_backend() not in ("cpu",)


def dispatch_padd(p, q):
    if aligned(p.shape[-1]) and p.shape == q.shape and p.ndim == 3:
        if MODE == "fused":
            return padd(p, q)
        return l8.g18_add_seq(p, q, F=op_field())
    return l8.g18_add(p, q)


def dispatch_pdouble(p):
    if aligned(p.shape[-1]) and p.ndim == 3:
        if MODE == "fused":
            return pdouble(p)
        return l8.g18_double_seq(p, F=op_field())
    return l8.g18_double(p)


#: widths up to this run the lane-batched wide add (8 launches of 2n-6n
#: lanes, lazy8.g19_add_wide) instead of the 29-launch sequential form.
#: MEASURED NEGATIVE at the MSM scan width (oracle-checked bench.py
#: --stage msm_16: 261 ms wide vs 246 ms seq): the concatenate/slice
#: copies around each launch (~106 MB/step of pure HBM moves) cost more
#: than the launches they merge — per-op launches evidently pipeline
#: behind each other, so the "~0.1 ms fixed per launch" is NOT serialized
#: per op. Default off; kept as the A/B knob that documents this.
WIDE_MAX = int(__import__("os").environ.get("ZKP_LAZY_WIDE_MAX", "0"))


def dispatch_ladd(p, q):
    """Lazy-engine add: fused per-op kernels at aligned widths (lane-
    batched wide form when narrow enough to be launch-bound), stacked
    XLA-graph formulas otherwise (CPU tests, narrow tails)."""
    from . import lazy8 as lz
    if aligned(p.shape[-1]) and p.shape == q.shape and p.ndim == 3:
        if p.shape[-1] <= WIDE_MAX:
            return lz.g19_add_wide(p, q, F=op_lazy_field())
        return lz.g19_add_seq(p, q, F=op_lazy_field())
    return lz.g19_add(p, q)


def dispatch_ldouble(p):
    from . import lazy8 as lz
    if aligned(p.shape[-1]) and p.ndim == 3:
        return lz.g19_double_seq(p, F=op_lazy_field())
    return lz.g19_double(p)


@functools.cache
def available() -> bool:
    """True when the Pallas kernels compile+run on the current backend.

    CPU runs use interpret-mode only in tests; production dispatch
    (ops/msm.py) falls back to the XLA-graph engine when this is False.
    """
    try:
        x = l8.BFQ.zeros((CANON,))
        jax.block_until_ready(pfield("add", l8.BFQ, x, x))
        return True
    except Exception:  # pragma: no cover - backend-specific
        return False
