"""Pallas implicit-GEMM 3x3 convolution (stride 1, SAME, NHWC).

Motivation (PERF.md "r3: GN statistics to zero cost"): after the GN
statistics were folded into conv epilogues, the CIFAR-10 NCSN++ forward is
~97% device-occupied with XLA convolution fusions running at ~80% MXU
efficiency — the remaining headline gap is XLA's conv schedule itself.  This
kernel is the "custom Pallas conv" lever named in COVERAGE.md: each 3x3
SAME conv is nine accumulated ``[nb*H*W, C_in] @ [C_in, C_out]`` MXU matmuls
over a halo-padded VMEM-resident input block, so the im2col never
materializes in HBM and the f32 accumulator never leaves VMEM.

Scope: stride 1, SAME padding, dilation 1, ``C_in``/``C_out`` multiples of
128 (every NCSN++/DDPM resblock conv; the 3->nf stem and nf->3 head stay on
XLA).  The reference's equivalents are cuDNN convs behind torch
(``deps/score_sde_pytorch/models/layerspp.py``).

Autodiff: a ``jax.custom_vjp`` whose backward runs XLA convs (input-rotated
correlation for dx, patch correlation for dw) — training paths stay exact
while only inference pays the kernel's constraints.

The in-model switch is ``NATDIFF_PALLAS_CONV=1`` (read per call, like the
GN kernel's A/B flags); default off until the on-chip A/B proves a win —
the Pallas GN lesson (layout copies around custom calls, PERF.md "What did
NOT work") applies here too, which is why the dispatcher only engages when
it can cover the model's whole hot path.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P

# trace-time opt-out: forward-mode autodiff (jax.jvp) cannot cross a
# custom_vjp / raw pallas_call, so jvp consumers (the Hutchinson divergence
# in eval/likelihood.py) trace their model calls under xla_conv_only()
_XLA_ONLY = contextvars.ContextVar("natdiff_conv_xla_only", default=False)


@contextlib.contextmanager
def xla_conv_only():
    """Disable the Pallas conv flags for calls traced inside this context
    (regardless of ``NATDIFF_PALLAS_CONV``) — used by code that needs
    forward-mode autodiff through the model."""
    tok = _XLA_ONLY.set(True)
    try:
        yield
    finally:
        _XLA_ONLY.reset(tok)


def pallas_conv_enabled() -> bool:
    """Read per call (trace time) so one process can A/B both paths.
    ``1`` = plain kernel swap; ``2`` = also the fused resblock path
    (conv + GN prologue/stats/skip in one kernel, see
    :func:`conv3x3_gn_pallas`)."""
    if _XLA_ONLY.get():
        return False
    return os.environ.get("NATDIFF_PALLAS_CONV", "0") in ("1", "2")


def fused_resblock_enabled() -> bool:
    if _XLA_ONLY.get():
        return False
    return os.environ.get("NATDIFF_PALLAS_CONV", "0") == "2"


def fused_resblock_ok(x, out_ch: int, *, shape=None) -> bool:
    """Full dispatch gate for the fused-resblock kernels: flag on, both
    channel counts lane-aligned, and the WORST-CASE working set of the
    block's two fused convs (pre + skip + stats at block-batch 1) fits
    VMEM — large-feature-map configs fall through to the unfused path.

    ``shape`` overrides the shape the convs will actually see (the
    up/down BigGAN blocks resample between GN_0 and Conv_0, so their
    fused convs run at 4x / 0.25x the input's spatial area)."""
    shape = shape or x.shape
    cin = shape[-1]
    if not (fused_resblock_enabled() and cin % 128 == 0 and out_ch % 128 == 0):
        return False
    worst = (shape[0], shape[1], shape[2], max(cin, out_ch))
    return pallas_conv_fits(worst, out_ch, x.dtype.itemsize, "valid9",
                            fused=True, has_pre=True, has_skip=True)


def default_variant() -> str:
    """In-model kernel formulation (``NATDIFF_CONV_VARIANT``); default is
    ``taps9`` — fastest Pallas form at 4/6 measured hot shapes on the v5e
    chip (PERF.md r4 table; ``valid9``'s pad-free HBM saving did not show
    up on hardware: 12.5 vs 18.2 TFLOP/s at the 32x32x128 shape)."""
    return os.environ.get("NATDIFF_CONV_VARIANT", "taps9")


def tiled_variant() -> str:
    """Large-feature-map formulation (``NATDIFF_CONV_TILED``): ``tiled``
    (manual-DMA halo scratch, serial fetch) or ``tiledew`` (Mosaic
    element-window halo, double-buffered fetch by the pipeline emitter);
    the r4 chip A/B measured them equal within noise at every shape
    (PERF.md), so the simpler ``tiled`` is the default — and both lose
    ~2x to XLA's spatial tiling at the celebahq L0 shape, so the whole
    halo path stays opt-in."""
    return os.environ.get("NATDIFF_CONV_TILED", "tiled")

# per-grid-step VMEM budget for (double-buffered input + output) + f32
# accumulator + weights; v5e has ~16MB of VMEM per core
_VMEM_BUDGET = 10 * 1024 * 1024
# hard eligibility cap: if even ONE image's working set (+ the resident
# weight block) exceeds this, the kernel cannot be tiled on the batch grid
# at all and the dispatcher must stay on XLA (which tiles spatially)
_VMEM_FIT = 12 * 1024 * 1024


def _vmem_array_bytes(dims, itemsize):
    """Mosaic-allocated VMEM bytes for an array blocked at ``dims``: the
    last dim pads to the 128-lane vreg width and the second-to-last to the
    sublane granule (8 f32 words -> 32/itemsize elements).  The r4 chip run
    caught the logical-size estimate under-counting 4x at the UNet's deep
    4x4 blocks (scoped-vmem OOM, 16.07M vs the 16M cap, PERF.md)."""
    *lead, s, l = dims
    sub = 32 // itemsize
    padded = -(-s // sub) * sub * -(-l // 128) * 128
    for d in lead:
        padded *= d
    return padded * itemsize


def _working_set_bytes(nb, hh, ww, cin, cout, itemsize, variant,
                       fused=False, has_pre=False, has_skip=False):
    """VMEM bytes for one grid step at block-batch ``nb`` (padded layouts)."""
    halo = 0 if (variant == "valid9" or fused) else 2
    per = (
        2 * _vmem_array_bytes((nb, hh + halo, ww + halo, cin), itemsize)
        + 2 * _vmem_array_bytes((nb, hh, ww, cout), itemsize)  # out, dbl-buf
        + _vmem_array_bytes((nb, hh, ww, cout), 4)             # f32 acc
    )
    if variant == "kstack":
        per += _vmem_array_bytes((nb, hh, ww, 3 * cin), itemsize)
    if fused and has_pre:
        per += _vmem_array_bytes((nb, hh, ww, cin), 4)         # f32 prologue
    if fused and has_skip:
        per += 2 * _vmem_array_bytes((nb, hh, ww, cout), itemsize)
    return per + _vmem_array_bytes((9, cin, cout), itemsize)   # weights


def pallas_conv_fits(shape, cout, itemsize, variant="valid9", *,
                     fused=False, has_pre=False, has_skip=False) -> bool:
    """True when a single-image grid step fits the VMEM cap — the dispatch
    gate that keeps large-feature-map configs (e.g. celebahq-256 level-0
    maps) on the XLA conv instead of failing Mosaic VMEM allocation."""
    _, hh, ww, cin = shape
    if variant in ("tiled", "tiledew"):
        return _pick_tile_rows(hh, ww, cin, cout, itemsize,
                               variant) is not None
    return _working_set_bytes(1, hh, ww, cin, cout, itemsize, variant,
                              fused=fused, has_pre=has_pre,
                              has_skip=has_skip) <= _VMEM_FIT


def _tiled_working_set(th, ww, cin, cout, itemsize):
    """VMEM bytes for one (batch=1, H-tile=th) grid step of the tiled
    variant: manually-DMA'd halo scratch (single-buffered), pipelined
    output block (double-buffered), f32 accumulator, resident weights."""
    return ((th + 2) * ww * cin * itemsize
            + 2 * th * ww * cout * itemsize
            + th * ww * cout * 4
            + 9 * cin * cout * itemsize)


def _tiledew_working_set(th, ww, cin, cout, itemsize):
    """VMEM bytes for one grid step of the element-window variant: the
    pipeline emitter double-buffers the overlapping (th+2)-row input
    window, plus double-buffered output, f32 accumulator, resident
    weights.  (The input is H-prepadded in HBM; that costs bandwidth,
    not VMEM.)"""
    return (2 * (th + 2) * ww * cin * itemsize
            + 2 * th * ww * cout * itemsize
            + th * ww * cout * 4
            + 9 * cin * cout * itemsize)


def _pick_tile_rows(hh, ww, cin, cout, itemsize, variant="tiled"):
    """Largest H-tile (a divisor of H, at least 2 tiles) whose tiled
    working set fits the budget; None if even a 1-row tile does not."""
    ws = _tiledew_working_set if variant == "tiledew" else _tiled_working_set
    best = None
    for th in range(1, hh // 2 + 1):
        if hh % th == 0 and ws(th, ww, cin, cout, itemsize) <= _VMEM_BUDGET:
            best = th
    return best


def _conv_kernel(x_ref, w_ref, b_ref, o_ref, *, hh, ww, cin, cout, variant):
    nb = x_ref.shape[0]
    m = nb * hh * ww
    if variant == "taps9":
        # nine shallow dots, K = C_in: no data duplication, each tap is a
        # sublane-shifted view of the resident block
        acc = jnp.zeros((m, cout), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                xs = x_ref[:, dy:dy + hh, dx:dx + ww, :].reshape(m, cin)
                acc = acc + jnp.dot(xs, w_ref[dy, dx],
                                    preferred_element_type=jnp.float32)
    elif variant == "kstack":
        # three deep dots, K = 3*C_in: the dx taps concatenate on the lane
        # axis (VPU copies) so each dot amortizes its accumulator traffic
        # over a 3x deeper contraction.  The dx shift is a sublane ROTATE
        # (tpu.dynamic_rotate), not a slice: shifted slices carry sublane
        # offsets 0/1/2 and Mosaic's concatenate cannot relayout them
        # ("result/input offset mismatch on non-concat dimension",
        # results/perf_r4/bench_mods1.err); the rotate lands at offset 0.
        # Wrapped columns fall outside the [:ww] window, so values match.
        acc = jnp.zeros((m, cout), jnp.float32)
        for dy in range(3):
            row = x_ref[:, dy:dy + hh, :, :]
            xs = jnp.concatenate(
                [(row if dx == 0 else           # roll(0) -> 0-size slice
                  jnp.roll(row, -dx, axis=2))[:, :, :ww, :]
                 for dx in range(3)],
                axis=-1).reshape(m, 3 * cin)
            wk = w_ref[dy].reshape(3 * cin, cout)
            acc = acc + jnp.dot(xs, wk, preferred_element_type=jnp.float32)
    elif variant == "valid9":
        # pad-free: x_ref is the UNPADDED block; each tap contracts only its
        # valid region and accumulates into a shifted slice of the f32
        # accumulator.  Saves the jnp.pad pre-pass — a full extra HBM
        # read+write of the activation per conv in the padded variants.
        acc = jnp.zeros((nb, hh, ww, cout), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                iy0, iy1 = max(0, dy - 1), hh + min(0, dy - 1)
                ix0, ix1 = max(0, dx - 1), ww + min(0, dx - 1)
                oy0, oy1 = max(0, 1 - dy), hh + min(0, 1 - dy)
                ox0, ox1 = max(0, 1 - dx), ww + min(0, 1 - dx)
                xs = x_ref[:, iy0:iy1, ix0:ix1, :]
                mh, mw = iy1 - iy0, ix1 - ix0
                part = jnp.dot(xs.reshape(nb * mh * mw, cin), w_ref[dy, dx],
                               preferred_element_type=jnp.float32)
                acc = acc + jnp.pad(
                    part.reshape(nb, mh, mw, cout),
                    ((0, 0), (oy0, hh - oy1), (ox0, ww - ox1), (0, 0)))
        if b_ref is not None:
            acc = acc + b_ref[0].astype(jnp.float32)
        o_ref[:] = acc.astype(o_ref.dtype)
        return
    else:
        raise ValueError(f"unknown variant {variant!r}")
    if b_ref is not None:
        acc = acc + b_ref[0].astype(jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype).reshape(nb, hh, ww, cout)


def _pick_block_batch(b, hh, ww, cin, cout, itemsize, variant="taps9", *,
                      fused=False, has_pre=False, has_skip=False):
    """Largest divisor of ``b`` whose working set (the SAME model the
    eligibility gate uses — :func:`_working_set_bytes`, with this call's
    actual fused/pre/skip configuration) fits the VMEM budget."""
    nb = 1
    for d in range(2, b + 1):
        if b % d == 0 and _working_set_bytes(
                d, hh, ww, cin, cout, itemsize, variant, fused=fused,
                has_pre=has_pre, has_skip=has_skip) <= _VMEM_BUDGET:
            nb = d
    return nb


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3x3_pallas(x, w, b=None, interpret=None, variant="taps9"):
    """3x3/stride-1/SAME NHWC conv: ``x [B,H,W,Cin] * w [3,3,Cin,Cout]``.

    ``b`` is an optional ``[Cout]`` bias.  ``interpret=None`` auto-selects
    interpreter mode off-TPU so CPU tests exercise the same kernel.
    ``variant`` picks the in-kernel GEMM formulation (``taps9``/``kstack``,
    A/B'd on chip — see ``apps/bench_conv.py``).
    """
    return _forward(x, w, b, interpret, variant)


def _batch_axis(sharding):
    """The mesh axis (or axes tuple) the batch dim is sharded over, else
    None.  Only dim-0 sharding is grid-parallelizable here; any other dim's
    sharding is dropped (the partition callback reshards to batch-only)."""
    spec = getattr(sharding, "spec", None)
    if spec is None or len(spec) == 0:
        return None
    return spec[0]


def _cp_wrap(raw, batch_args, out_specs_of, rule):
    """Wrap ``raw`` (positional array args) in a custom_partitioning that
    grids the Mosaic call on the LOCAL batch shard under DP instead of
    forcing GSPMD to treat the custom call as opaque (which would
    all-gather the global batch onto every device).

    ``batch_args``: indices of args that carry the batch dim (sharded along
    it; the rest — weights/bias — are replicated).
    ``out_specs_of(ax)``: output sharding spec(s) given the batch axis.
    ``rule``: shardy einsum-like sharding rule (batch factor shared only).
    """
    cp = custom_partitioning(raw)
    batch_args = frozenset(batch_args)

    def partition(mesh, arg_infos, result_infos):
        ax = _batch_axis(arg_infos[0].sharding)
        arg_shardings = tuple(
            NamedSharding(mesh, P(ax, *([None] * (len(info.shape) - 1))))
            if i in batch_args
            else NamedSharding(mesh, P())
            for i, info in enumerate(arg_infos))
        outs = out_specs_of(ax)
        out_shardings = (NamedSharding(mesh, outs[0]) if len(outs) == 1
                         else tuple(NamedSharding(mesh, s) for s in outs))
        return mesh, raw, out_shardings, arg_shardings

    def infer(mesh, arg_infos, result_infos):
        ax = _batch_axis(arg_infos[0].sharding)
        outs = out_specs_of(ax)
        if len(outs) == 1:
            return NamedSharding(mesh, outs[0])
        return tuple(NamedSharding(mesh, s) for s in outs)

    cp.def_partition(partition=partition,
                     infer_sharding_from_operands=infer,
                     sharding_rule=rule)
    return cp


@functools.lru_cache(maxsize=None)
def _cp_conv(has_bias, interpret, variant):
    if has_bias:
        def raw(x, w, b):
            return _pallas_conv_call(x, w, b, interpret, variant)
        rule = "b h w i, p q r s, z -> b m n o"
    else:
        def raw(x, w):
            return _pallas_conv_call(x, w, None, interpret, variant)
        rule = "b h w i, p q r s -> b m n o"
    return _cp_wrap(raw, (0,), lambda ax: (P(ax, None, None, None),), rule)


def _forward(x, w, b, interpret, variant):
    bsz, hh, ww, cin = x.shape
    cout = w.shape[-1]
    if w.shape[:3] != (3, 3, cin):
        raise ValueError(f"weight {w.shape} does not match input {x.shape}")
    if cin % 128 or cout % 128:
        raise ValueError(f"channels must be multiples of 128, got "
                         f"{cin}->{cout} (use XLA conv for this shape)")
    if not pallas_conv_fits(x.shape, cout, x.dtype.itemsize, variant):
        raise ValueError(
            f"conv3x3_pallas working set for {x.shape}->{cout} exceeds VMEM "
            f"({_working_set_bytes(1, hh, ww, cin, cout, x.dtype.itemsize, variant)} "
            f"> {_VMEM_FIT} bytes at block-batch 1); use conv3x3_xla")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cp = _cp_conv(b is not None, interpret, variant)
    return cp(x, w, b) if b is not None else cp(x, w)


def _conv_tiled_kernel(x_any, w_ref, b_ref, o_ref, scratch, sem, *,
                       hh, ww, cin, cout, th, n_tiles):
    """Spatially-tiled valid9: the input stays in HBM (ANY); each grid
    step DMAs its H-tile plus a one-row halo on each side into a VMEM
    scratch (image-edge halo rows zeroed — SAME padding), then runs the
    nine-tap accumulation.  H needs no output-slice shifting (the halo
    absorbs it); W uses the valid-region trick."""
    bi = pl.program_id(0)
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _first():
        scratch[0] = jnp.zeros((ww, cin), scratch.dtype)
        dma = pltpu.make_async_copy(
            x_any.at[bi, pl.ds(0, th + 1)],
            scratch.at[pl.ds(1, th + 1)], sem)
        dma.start()
        dma.wait()

    @pl.when(ti == n_tiles - 1)
    def _last():
        dma = pltpu.make_async_copy(
            x_any.at[bi, pl.ds(hh - th - 1, th + 1)],
            scratch.at[pl.ds(0, th + 1)], sem)
        dma.start()
        dma.wait()
        scratch[th + 1] = jnp.zeros((ww, cin), scratch.dtype)

    @pl.when(jnp.logical_and(ti > 0, ti < n_tiles - 1))
    def _interior():
        dma = pltpu.make_async_copy(
            x_any.at[bi, pl.ds(ti * th - 1, th + 2)], scratch, sem)
        dma.start()
        dma.wait()

    acc = jnp.zeros((th, ww, cout), jnp.float32)
    for dy in range(3):
        rows = scratch[dy:dy + th]
        for dx in range(3):
            ix0, ix1 = max(0, dx - 1), ww + min(0, dx - 1)
            ox0, ox1 = max(0, 1 - dx), ww + min(0, 1 - dx)
            mw = ix1 - ix0
            part = jnp.dot(rows[:, ix0:ix1, :].reshape(th * mw, cin),
                           w_ref[dy, dx], preferred_element_type=jnp.float32)
            acc = acc + jnp.pad(part.reshape(th, mw, cout),
                                ((0, 0), (ox0, ww - ox1), (0, 0)))
    if b_ref is not None:
        acc = acc + b_ref[0].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _pallas_conv_tiled_call(x, w, b, interpret):
    bsz, hh, ww, cin = x.shape
    cout = w.shape[-1]
    th = _pick_tile_rows(hh, ww, cin, cout, x.dtype.itemsize)
    if th is None:
        raise ValueError(
            f"tiled conv3x3 working set for {x.shape}->{cout} exceeds VMEM "
            "even at 1-row tiles; use conv3x3_xla")
    n_tiles = hh // th
    grid = (bsz, n_tiles)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),          # full input, HBM
        pl.BlockSpec((3, 3, cin, cout), lambda bi, ti: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, w]
    if b is not None:
        in_specs.append(pl.BlockSpec((1, cout), lambda bi, ti: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(b.reshape(1, cout))

    def kern(*refs):
        if b is not None:
            x_any, w_ref, b_ref, o_ref, scratch, sem = refs
        else:
            x_any, w_ref, o_ref, scratch, sem = refs
            b_ref = None
        _conv_tiled_kernel(x_any, w_ref, b_ref, o_ref, scratch, sem,
                           hh=hh, ww=ww, cin=cin, cout=cout, th=th,
                           n_tiles=n_tiles)

    flops = 2 * bsz * hh * ww * 9 * cin * cout
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, ww, cout),
                               lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, hh, ww, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((th + 2, ww, cin), x.dtype),
                        pltpu.SemaphoreType.DMA(())],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize
            + w.size * w.dtype.itemsize
            + bsz * hh * ww * cout * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(*args)


def _conv_tiledew_kernel(x_ref, w_ref, b_ref, o_ref, *, hh, ww, cin, cout,
                         th):
    """Element-window tiled valid9: ``x_ref`` is an OVERLAPPING
    (th+2)-row window (Mosaic ``#tpu.element_window``, double-buffered by
    the XLA pipeline emitter) of the H-prepadded input, so the one-row
    halo on each side is real zeros and no edge masking is needed.  (The
    original implicit-pad form — ``pl.Element(th+2, (1, 1))`` with a
    predicated ``where`` — dies in Mosaic: "Low padding not supported
    yet", results/perf_r4/bench_mods1.err.)"""
    xw = x_ref[...]
    acc = jnp.zeros((th, ww, cout), jnp.float32)
    for dy in range(3):
        rows_d = xw[dy:dy + th]
        for dx in range(3):
            ix0, ix1 = max(0, dx - 1), ww + min(0, dx - 1)
            ox0, ox1 = max(0, 1 - dx), ww + min(0, 1 - dx)
            mw = ix1 - ix0
            part = jnp.dot(rows_d[:, ix0:ix1, :].reshape(th * mw, cin),
                           w_ref[dy, dx], preferred_element_type=jnp.float32)
            acc = acc + jnp.pad(part.reshape(th, mw, cout),
                                ((0, 0), (ox0, ww - ox1), (0, 0)))
    if b_ref is not None:
        acc = acc + b_ref[0].astype(jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def _pallas_conv_tiledew_call(x, w, b, interpret):
    bsz, hh, ww, cin = x.shape
    cout = w.shape[-1]
    th = _pick_tile_rows(hh, ww, cin, cout, x.dtype.itemsize, "tiledew")
    if th is None:
        raise ValueError(
            f"tiledew conv3x3 working set for {x.shape}->{cout} exceeds "
            "VMEM even at 1-row tiles; use conv3x3_xla")
    n_tiles = hh // th

    # H is pre-padded by one zero row each side; tile ti's window
    # [ti*th, ti*th + th+2) over the PADDED rows covers original rows
    # [ti*th - 1, ti*th + th + 1) — the one-row halo on each side, with
    # every window start >= 0 (Mosaic has no low-padding support)
    xh = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    in_specs = [
        pl.BlockSpec((None, pl.Element(th + 2), pl.Element(ww),
                      pl.Element(cin)),
                     lambda bi, ti: (bi, ti * th, 0, 0)),
        pl.BlockSpec((3, 3, cin, cout), lambda bi, ti: (0, 0, 0, 0)),
    ]
    args = [xh, w]
    if b is not None:
        in_specs.append(pl.BlockSpec((1, cout), lambda bi, ti: (0, 0)))
        args.append(b.reshape(1, cout))

    def kern(*refs):
        if b is not None:
            x_ref, w_ref, b_ref, o_ref = refs
        else:
            x_ref, w_ref, o_ref = refs
            b_ref = None
        _conv_tiledew_kernel(x_ref, w_ref, b_ref, o_ref, hh=hh, ww=ww,
                             cin=cin, cout=cout, th=th)

    flops = 2 * bsz * hh * ww * 9 * cin * cout
    return pl.pallas_call(
        kern,
        grid=(bsz, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, th, ww, cout),
                               lambda bi, ti: (bi, ti, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, hh, ww, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize
            + w.size * w.dtype.itemsize
            + bsz * hh * ww * cout * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(*args)


def _pallas_conv_call(x, w, b, interpret, variant):
    bsz, hh, ww, cin = x.shape
    cout = w.shape[-1]
    if variant == "tiled":
        return _pallas_conv_tiled_call(x, w, b, interpret)
    if variant == "tiledew":
        return _pallas_conv_tiledew_call(x, w, b, interpret)
    pad = variant != "valid9"
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))) if pad else x
    nb = _pick_block_batch(bsz, hh, ww, cin, cout, x.dtype.itemsize, variant)
    grid = (bsz // nb,)
    halo = 2 if pad else 0

    in_specs = [
        pl.BlockSpec((nb, hh + halo, ww + halo, cin), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [xp, w]
    if b is not None:
        in_specs.append(pl.BlockSpec((1, cout), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(b.reshape(1, cout))
        kern = functools.partial(_conv_kernel, hh=hh, ww=ww, cin=cin,
                                 cout=cout, variant=variant)
    else:
        def kern(x_ref, w_ref, o_ref):
            _conv_kernel(x_ref, w_ref, None, o_ref, hh=hh, ww=ww, cin=cin,
                         cout=cout, variant=variant)

    flops = 2 * bsz * hh * ww * 9 * cin * cout
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((nb, hh, ww, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, hh, ww, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=xp.size * xp.dtype.itemsize
            + w.size * w.dtype.itemsize
            + bsz * hh * ww * cout * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(*args)


def _conv_gn_kernel(refs, *, hh, ww, cin, cout, has_bias, has_pre, has_skip,
                    skip_rescale, emit_stats, pre_act):
    """Fused resblock conv (valid9 math): optional GN-normalize(+SiLU)
    prologue on the VMEM-resident input, optional skip-add(+1/sqrt2)
    epilogue, optional per-(sample,channel) sum/sumsq outputs of the final
    f32 accumulator — the statistics the NEXT GroupNorm needs, emitted for
    free while the data is resident."""
    it = iter(refs)
    x_ref = next(it)
    w_ref = next(it)
    b_ref = next(it) if has_bias else None
    pw_ref = next(it) if has_pre else None
    pb_ref = next(it) if has_pre else None
    skip_ref = next(it) if has_skip else None
    o_ref = next(it)
    s1_ref = next(it) if emit_stats else None
    s2_ref = next(it) if emit_stats else None

    nb = x_ref.shape[0]
    xin = x_ref[:]
    if has_pre:
        # pre refs are (nb, 1, cin): the singleton keeps the block's last
        # two dims Mosaic-legal when nb < bsz (sublane rule: second-minor
        # block dim must be 8-divisible OR equal the array dim)
        xf = xin.astype(jnp.float32)
        xf = xf * pw_ref[:].reshape(nb, 1, 1, cin) \
            + pb_ref[:].reshape(nb, 1, 1, cin)
        if pre_act == "silu":
            xf = xf * jax.nn.sigmoid(xf)
        xin = xf.astype(x_ref.dtype)

    acc = jnp.zeros((nb, hh, ww, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            iy0, iy1 = max(0, dy - 1), hh + min(0, dy - 1)
            ix0, ix1 = max(0, dx - 1), ww + min(0, dx - 1)
            oy0, oy1 = max(0, 1 - dy), hh + min(0, 1 - dy)
            ox0, ox1 = max(0, 1 - dx), ww + min(0, 1 - dx)
            xs = xin[:, iy0:iy1, ix0:ix1, :]
            mh, mw = iy1 - iy0, ix1 - ix0
            part = jnp.dot(xs.reshape(nb * mh * mw, cin), w_ref[dy, dx],
                           preferred_element_type=jnp.float32)
            acc = acc + jnp.pad(
                part.reshape(nb, mh, mw, cout),
                ((0, 0), (oy0, hh - oy1), (ox0, ww - ox1), (0, 0)))
    if has_bias:
        acc = acc + b_ref[0].astype(jnp.float32)
    if has_skip:
        acc = acc + skip_ref[:].astype(jnp.float32)
        if skip_rescale:
            acc = acc * jnp.float32(0.7071067811865476)
    o_ref[:] = acc.astype(o_ref.dtype)
    if emit_stats:
        flat = acc.reshape(nb, hh * ww, cout)
        s1_ref[:] = jnp.sum(flat, axis=1).reshape(nb, 1, cout)
        s2_ref[:] = jnp.sum(flat * flat, axis=1).reshape(nb, 1, cout)


@functools.lru_cache(maxsize=None)
def _cp_fused(has_bias, has_pre, has_skip, skip_rescale, emit_stats,
              pre_act, interpret):
    def raw(*args):
        return _pallas_fused_call(
            args, has_bias=has_bias, has_pre=has_pre, has_skip=has_skip,
            skip_rescale=skip_rescale, emit_stats=emit_stats,
            pre_act=pre_act, interpret=interpret)

    ins = ["b h w i", "p q r s"]
    batch_idx, i = [0], 2
    if has_bias:
        ins.append("z")
        i += 1
    if has_pre:
        ins += ["b c1", "b c2"]
        batch_idx += [i, i + 1]
        i += 2
    if has_skip:
        ins.append("b e f g")
        batch_idx.append(i)
    outs = ["b m n o"] + (["b t1", "b t2"] if emit_stats else [])
    rule = ", ".join(ins) + " -> " + ", ".join(outs)

    def out_specs(ax):
        specs = [P(ax, None, None, None)]
        if emit_stats:
            specs += [P(ax, None), P(ax, None)]
        return tuple(specs)

    return _cp_wrap(raw, tuple(batch_idx), out_specs, rule)


def _fused_reference_xla(arrays, *, has_bias, has_pre, has_skip,
                         skip_rescale, emit_stats, pre_act):
    """Pure-XLA twin of the fused kernel (same arg packing, same output
    structure, f32 accumulation).  Used as the autodiff oracle: the fused
    op's custom VJP differentiates THIS, so reverse-mode callers (e.g.
    gradient-guided sampling with the flag set) get correct gradients
    instead of an opaque missing-AD-rule error from the raw pallas_call."""
    it = iter(arrays)
    x = next(it)
    w = next(it)
    b = next(it) if has_bias else None
    pre = (next(it), next(it)) if has_pre else None
    skip = next(it) if has_skip else None
    xin = x
    if pre is not None:
        xf = x.astype(jnp.float32) * pre[0][:, None, None, :] \
            + pre[1][:, None, None, :]
        if pre_act == "silu":
            xf = xf * jax.nn.sigmoid(xf)
        xin = xf.astype(x.dtype)
    at = jnp.promote_types(xin.dtype, jnp.float32)  # f32 accumulation
    acc = jax.lax.conv_general_dilated(
        xin, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=at)
    if b is not None:
        acc = acc + b.astype(at)
    if skip is not None:
        acc = acc + skip.astype(at)
        if skip_rescale:
            acc = acc * jnp.asarray(0.7071067811865476, at)
    y = acc.astype(x.dtype)
    if not emit_stats:
        return y
    # mirror the kernel's output dtypes exactly (stats are f32 refs) so
    # the custom-VJP cotangent structures line up under x64 too
    flat = acc.reshape(acc.shape[0], -1, acc.shape[-1])
    return (y, jnp.sum(flat, axis=1).astype(jnp.float32),
            jnp.sum(flat * flat, axis=1).astype(jnp.float32))


@functools.lru_cache(maxsize=None)
def _fused_with_vjp(has_bias, has_pre, has_skip, skip_rescale, emit_stats,
                    pre_act, interpret):
    """The fused kernel behind a custom VJP: forward is the Pallas call
    (via its DP-aware custom_partitioning), backward differentiates the
    XLA reference recompute.  The fused path is dispatched on inference
    hot paths, so the backward's extra recompute only ever runs when a
    caller differentiates a deterministic forward anyway."""
    cp = _cp_fused(has_bias, has_pre, has_skip, skip_rescale, emit_stats,
                   pre_act, interpret)
    ref = functools.partial(
        _fused_reference_xla, has_bias=has_bias, has_pre=has_pre,
        has_skip=has_skip, skip_rescale=skip_rescale,
        emit_stats=emit_stats, pre_act=pre_act)

    @jax.custom_vjp
    def f(*arrays):
        return cp(*arrays)

    def fwd(*arrays):
        return cp(*arrays), arrays

    def bwd(arrays, g):
        _, pullback = jax.vjp(lambda *a: ref(a), *arrays)
        return pullback(g)

    f.defvjp(fwd, bwd)
    return f


def conv3x3_gn_pallas(x, w, b=None, *, pre=None, pre_act="silu", skip=None,
                      skip_rescale=False, emit_stats=False, interpret=None):
    """Fused resblock conv: ``y = conv3x3(act(x*pre_w + pre_b)) [+ b]
    [+ skip] [*1/sqrt2]``, optionally also returning per-(sample,channel)
    ``(sum, sumsq)`` of ``y``'s f32 accumulator over H,W.

    ``pre`` is ``(pre_w, pre_b)`` with shape ``[B, C_in]`` f32 — the
    GroupNorm normalize-affine collapsed to per-channel scalars (see
    ``ops.group_norm.gn_affine_coeffs``); ``pre_act`` applies inside the
    kernel on the VMEM-resident block, so the normalized activation is
    never materialized in HBM.  Forward-only (inference hot path; training
    uses the unfused modules).
    """
    bsz, hh, ww, cin = x.shape
    cout = w.shape[-1]
    if w.shape[:3] != (3, 3, cin):
        raise ValueError(f"weight {w.shape} does not match input {x.shape}")
    if cin % 128 or cout % 128:
        raise ValueError(f"channels must be multiples of 128, got "
                         f"{cin}->{cout}")
    if pre_act not in (None, "silu"):
        raise ValueError(f"unsupported pre_act {pre_act!r} "
                         "(kernel prologue implements None | 'silu')")
    if skip is not None and skip.shape != (bsz, hh, ww, cout):
        raise ValueError(f"skip {skip.shape} != output {(bsz, hh, ww, cout)}")
    if not pallas_conv_fits(x.shape, cout, x.dtype.itemsize, "valid9",
                            fused=True, has_pre=pre is not None,
                            has_skip=skip is not None):
        raise ValueError(
            f"conv3x3_gn_pallas working set for {x.shape}->{cout} exceeds "
            f"VMEM at block-batch 1; use the unfused XLA path")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    args = [x, w]
    if b is not None:
        args.append(b)
    if pre is not None:
        pw, pb = pre
        for t in (pw, pb):
            if t.shape != (bsz, cin):
                raise ValueError(f"pre coeffs {t.shape} != {(bsz, cin)}")
        args += [pw.astype(jnp.float32), pb.astype(jnp.float32)]
    if skip is not None:
        args.append(skip)
    f = _fused_with_vjp(b is not None, pre is not None, skip is not None,
                        skip_rescale, emit_stats, pre_act, interpret)
    return f(*args)


def _pallas_fused_call(arrays, *, has_bias, has_pre, has_skip, skip_rescale,
                       emit_stats, pre_act, interpret):
    it = iter(arrays)
    x = next(it)
    w = next(it)
    b = next(it) if has_bias else None
    pre = (next(it), next(it)) if has_pre else None
    skip = next(it) if has_skip else None
    bsz, hh, ww, cin = x.shape
    cout = w.shape[-1]

    nb = _pick_block_batch(bsz, hh, ww, cin, cout, x.dtype.itemsize,
                           "valid9", fused=True, has_pre=pre is not None,
                           has_skip=skip is not None)
    grid = (bsz // nb,)

    args, in_specs = [x, w], [
        pl.BlockSpec((nb, hh, ww, cin), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if b is not None:
        args.append(b.reshape(1, cout))
        in_specs.append(pl.BlockSpec((1, cout), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    if pre is not None:
        # (B, 1, C) so the per-grid-step block (nb, 1, C) keeps its last
        # two dims equal to the array's (Mosaic sublane rule when nb < B)
        args += [pre[0].reshape(bsz, 1, cin), pre[1].reshape(bsz, 1, cin)]
        in_specs += [pl.BlockSpec((nb, 1, cin), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)] * 2
    if skip is not None:
        args.append(skip)
        in_specs.append(pl.BlockSpec((nb, hh, ww, cout),
                                     lambda i: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM))

    out_shape = [jax.ShapeDtypeStruct((bsz, hh, ww, cout), x.dtype)]
    out_specs = [pl.BlockSpec((nb, hh, ww, cout), lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)]
    if emit_stats:
        out_shape += [jax.ShapeDtypeStruct((bsz, 1, cout), jnp.float32)] * 2
        out_specs += [pl.BlockSpec((nb, 1, cout), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)] * 2

    kern = functools.partial(
        lambda *refs, **kw: _conv_gn_kernel(refs, **kw),
        hh=hh, ww=ww, cin=cin, cout=cout, has_bias=b is not None,
        has_pre=pre is not None, has_skip=skip is not None,
        skip_rescale=skip_rescale, emit_stats=emit_stats, pre_act=pre_act)

    flops = 2 * bsz * hh * ww * 9 * cin * cout
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs) if emit_stats else out_specs[0],
        out_shape=tuple(out_shape) if emit_stats else out_shape[0],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize
            + w.size * w.dtype.itemsize
            + bsz * hh * ww * cout * x.dtype.itemsize
            + (skip.size * skip.dtype.itemsize if skip is not None else 0),
            transcendentals=bsz * hh * ww * cin if pre is not None else 0),
        interpret=interpret,
    )(*args)
    if emit_stats:
        y, s1, s2 = out
        return y, s1.reshape(bsz, cout), s2.reshape(bsz, cout)
    return out


def conv3x3_xla(x, w, b=None):
    """The XLA twin (used as the VJP oracle and the A/B control)."""
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y if b is None else y + b


def _fwd(x, w, b, interpret, variant):
    return _forward(x, w, b, interpret, variant), (x, w, b is not None)


def _bwd(interpret, variant, res, g):
    x, w, has_b = res
    # dx: correlate the cotangent with the spatially-flipped, in/out-swapped
    # kernel; dw: correlate input patches with the cotangent.  Both as XLA
    # convs — the backward runs only in training, which keeps XLA's layouts.
    w_flip = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
    dx = jax.lax.conv_general_dilated(
        g, w_flip.astype(g.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(x.dtype)
    dw = jax.lax.conv_general_dilated(
        x.transpose(3, 1, 2, 0), g.transpose(1, 2, 0, 3), (1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).transpose(1, 2, 0, 3).astype(w.dtype)
    db = g.sum(axis=(0, 1, 2)) if has_b else None
    return dx, dw, db


conv3x3_pallas.defvjp(_fwd, _bwd)
