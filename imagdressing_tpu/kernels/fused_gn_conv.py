"""Fused GroupNorm(+temb)+SiLU+3x3-conv Pallas kernel (implicit GEMM).

The UNet resnet blocks (reference diffusers ResnetBlock2D semantics,
/root/reference `train.py:320,367` SD1.5 UNets) are chains of
`group_norm -> silu -> conv3x3`. Round-3 profiling put XLA's conv at
54-69% MXU utilization on the step's shapes, with the normalized
activation making a full HBM round-trip between the GroupNorm kernel and
the conv (see VERDICT r3 next #8). This kernel does the whole chain in ONE
pass over the activation:

  1. per-batch-row GroupNorm statistics (chunked fp32 sums, group
     aggregation as a one-hot matmul — same scheme as fused_groupnorm.py),
     with the optional time-embedding bias folded into the stats
     algebraically;
  2. normalize + SiLU written into a ZERO-BORDERED (H+2, W+2, Cin) VMEM
     scratch — the conv's SAME padding and the normalized activation never
     exist in HBM;
  3. implicit-GEMM 3x3 conv from the scratch: for each output row block,
     nine (rows, Cin) x (Cin, Cout) MXU dots accumulated in fp32
     (measured r4: 83-89% MXU utilization at the 40x32/20x16 UNet levels
     vs 56-70% for XLA's conv, 1.2-1.6x per-conv; ties XLA at 80x64 where
     the saved GroupNorm round-trip is the win).

Backward: custom_vjp recomputing the reference XLA chain — exact XLA
gradients, no extra residuals (the same contract as fused_groupnorm.py).

SPMD: a custom_partitioning rule shards over batch only (conv weights are
replicated under tensor parallelism — core/tp.py shards attention/FF
linears, never convs), so multi-device pjit keeps the kernel per shard.

Shapes that do not fit the VMEM budget (VAE-scale spatial dims) or whose
geometry the kernel does not handle fall back to the unfused pair
automatically.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imagdressing_tpu.kernels import fused_groupnorm as _fg

# Set True (tests) to run through the Pallas interpreter on CPU.
INTERPRET = False

# VMEM budget for x block + padded scratch + weight block + accumulator.
_VMEM_BUDGET = 40 * 1024 * 1024


def _kernel(
    x_ref,      # (1, H, W, Cin) one batch row
    gw_ref,     # (1, Cin) GroupNorm scale
    gb_ref,     # (1, Cin) GroupNorm bias
    add_ref,    # (1, 1, Cin) per-row bias (time embedding) or None
    w_ref,      # (3, 3, Cin, Cot) conv weights for this Cout block
    cb_ref,     # (1, Cot) conv bias
    o_ref,      # (1, hb, W, Cot)
    xn_ref,     # VMEM scratch (H+2, W+2, Cin): zero-bordered silu(gn(x))
    *,
    hb: int,
    H: int,
    W: int,
    cin: int,
    cot: int,
    num_groups: int,
    eps: float,
    act: str,
    rchunk: int,
):
    co_i = pl.program_id(1)
    h_i = pl.program_id(2)

    # ---- once per batch row: stats + normalized fill (grid iterates co/h
    # fastest, so (0, 0) runs before any GEMM step reads the scratch)
    @pl.when((co_i == 0) & (h_i == 0))
    def _prep():
        def stats(i, carry):
            s1, s2 = carry
            xc = x_ref[0, pl.ds(i * rchunk, rchunk), :, :].astype(jnp.float32)
            return s1 + jnp.sum(xc, axis=(0, 1)), s2 + jnp.sum(
                xc * xc, axis=(0, 1)
            )

        s1 = jnp.zeros((cin,), jnp.float32)
        s2 = jnp.zeros((cin,), jnp.float32)
        s1, s2 = jax.lax.fori_loop(0, H // rchunk, stats, (s1, s2))

        m = jnp.float32(H * W)
        if add_ref is not None:
            t = add_ref[0, 0, :].astype(jnp.float32)
            s2 = s2 + 2.0 * t * s1 + m * t * t
            s1 = s1 + m * t

        # group aggregation via one-hot matmul (no lane-dim reshapes)
        g = num_groups
        cpg = cin // g
        col_group = jax.lax.broadcasted_iota(jnp.int32, (cin, g), 0) // cpg
        grp = jax.lax.broadcasted_iota(jnp.int32, (cin, g), 1)
        onehot = (col_group == grp).astype(jnp.float32)
        n = m * cpg
        gs1 = jnp.dot(s1[None, :], onehot, preferred_element_type=jnp.float32)
        gs2 = jnp.dot(s2[None, :], onehot, preferred_element_type=jnp.float32)
        mean_g = gs1 / n
        var_g = gs2 / n - mean_g * mean_g
        inv_g = jax.lax.rsqrt(var_g + eps)
        mean = jnp.dot(mean_g, onehot.T, preferred_element_type=jnp.float32)
        inv = jnp.dot(inv_g, onehot.T, preferred_element_type=jnp.float32)

        gw = gw_ref[0, :].astype(jnp.float32)[None, :]
        gb = gb_ref[0, :].astype(jnp.float32)[None, :]
        scale = inv * gw  # (1, Cin)
        shift = gb - mean * scale
        if add_ref is not None:
            shift = shift + add_ref[0, 0, :].astype(jnp.float32)[None, :] * scale

        # zero borders, then fill the body with silu(gn(x))
        xn_ref[...] = jnp.zeros_like(xn_ref)

        def fill(i, _):
            xc = x_ref[0, pl.ds(i * rchunk, rchunk), :, :].astype(jnp.float32)
            y = xc * scale.reshape(1, 1, cin) + shift.reshape(1, 1, cin)
            if act == "silu":
                y = y * jax.nn.sigmoid(y)
            xn_ref[pl.ds(1 + i * rchunk, rchunk), 1 : W + 1, :] = y.astype(
                xn_ref.dtype
            )
            return 0

        jax.lax.fori_loop(0, H // rchunk, fill, 0)

    # ---- implicit-GEMM 3x3 conv for this (Cout block, row block)
    h0 = h_i * hb
    acc = jnp.zeros((hb * W, cot), jnp.float32)
    for dy in range(3):
        xrow = xn_ref[pl.ds(h0 + dy, hb), :, :]  # (hb, W+2, Cin)
        for dx in range(3):
            xs = xrow[:, dx : dx + W, :].reshape(hb * W, cin)
            acc = acc + jnp.dot(
                xs, w_ref[dy, dx], preferred_element_type=jnp.float32
            )
    acc = acc + cb_ref[0, :].astype(jnp.float32)
    o_ref[0, :, :, :] = acc.reshape(hb, W, cot).astype(o_ref.dtype)


def _pick_cot(cin: int, co: int) -> Optional[int]:
    """Full-Cout weight block when it fits comfortably; else the largest
    128-multiple divisor (Mosaic: lane-dim blocks must be 128k or full).
    Returns None when neither fits — `_supported` then routes the call to
    the unfused XLA pair, so a non-SD channel count (e.g. an odd Cout with
    no 128-multiple divisor) can never request a weight block over the
    24 MB comfort bound (VERDICT r4 weak #4)."""
    if 9 * cin * co * 2 <= 24 * 1024 * 1024:
        return co
    for cand in (512, 384, 256, 128):
        if co % cand == 0:
            return cand
    return None


def _pick_hb(h: int, w: int) -> int:
    hb = max(1, min(h, 512 // w))
    while h % hb:
        hb -= 1
    return hb


def _pick_rchunk(h: int) -> int:
    for cand in (8, 4, 2):
        if h % cand == 0:
            return cand
    return 1


def _supported(x, w, num_groups: int) -> bool:
    if x.ndim != 4 or w.shape[:2] != (3, 3):
        return False
    b, h, wd, cin = x.shape
    co = w.shape[-1]
    if cin % num_groups:
        return False
    # The mid-block 10x8 level is the one shape where XLA's conv wins
    # (M=160 rows starves the MXU; measured r4) — keep the unfused path
    # below 256 output pixels.
    if h < 4 or wd < 8 or h * wd < 256:
        return False
    # tiny channel counts (the UNet's 4-channel conv_out) waste the MXU's
    # 128-lane tiles; XLA's conv handles them fine
    if cin < 128 or co < 128:
        return False
    itemsize = jnp.dtype(x.dtype).itemsize
    cot = _pick_cot(cin, co)
    if cot is None:
        return False
    hb = _pick_hb(h, wd)
    need = (
        h * wd * cin * itemsize                 # x block
        + (h + 2) * (wd + 2) * cin * itemsize   # padded scratch
        + 9 * cin * cot * itemsize              # weight block
        + hb * wd * cot * 4                     # fp32 accumulator
        + hb * (wd + 2) * cin * itemsize        # row slice temp
    )
    return need <= _VMEM_BUDGET


def _fused_call(x, gw, gb, add, w, cb, *, num_groups, eps, act, interpret):
    b, h, wd, cin = x.shape
    co = w.shape[-1]
    cot = _pick_cot(cin, co)
    assert cot is not None, "unreachable: _supported gates _pick_cot=None"
    hb = _pick_hb(h, wd)
    rchunk = _pick_rchunk(h)
    kern = functools.partial(
        _kernel, hb=hb, H=h, W=wd, cin=cin, cot=cot,
        num_groups=num_groups, eps=eps, act=act, rchunk=rchunk,
    )
    in_specs = [
        pl.BlockSpec((1, h, wd, cin), lambda bi, c, hi: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cin), lambda bi, c, hi: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cin), lambda bi, c, hi: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [
        x,
        gw.reshape(1, cin),
        gb.reshape(1, cin),
    ]
    if add is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, cin), lambda bi, c, hi: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(add.reshape(b, 1, cin))
        kernel = kern
    else:
        def kernel(x_ref, gw_ref, gb_ref, w_ref, cb_ref, o_ref, xn_ref,
                   k=kern):
            return k(x_ref, gw_ref, gb_ref, None, w_ref, cb_ref, o_ref,
                     xn_ref)

    in_specs += [
        pl.BlockSpec((3, 3, cin, cot), lambda bi, c, hi: (0, 0, 0, c),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cot), lambda bi, c, hi: (0, c),
                     memory_space=pltpu.VMEM),
    ]
    args += [w.astype(x.dtype), cb.reshape(1, co).astype(x.dtype)]
    return pl.pallas_call(
        kernel,
        grid=(b, co // cot, h // hb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, hb, wd, cot), lambda bi, c, hi: (bi, hi, 0, c),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, co), x.dtype),
        scratch_shapes=[pltpu.VMEM((h + 2, wd + 2, cin), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=80 * 1024 * 1024,
        ),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(*args)


# ---------------------------------------------------------------------------
# Row-windowed variant for activations too large to sit in VMEM (the VAE
# encoder/decoder's pixel-resolution levels, VERDICT r4 next #4). GroupNorm
# statistics are computed in XLA (a fused fp32 reduction over the producer's
# output — one HBM read, often fused into the producer's epilogue); the
# Pallas kernel then streams H-windows of x from HBM via manual DMA with a
# one-row halo on each side, normalizes into a zero-bordered VMEM scratch,
# and runs the same nine-tap implicit-GEMM conv. Total traffic: ~2 reads of
# x + 1 write of y, vs 3 reads + 2 writes for the unfused GN-kernel + XLA
# conv pair.
#
# MEASURED MIXED RESULT (r5, v5e; see tools/bench_conv.py --vae): dispatch
# is a per-shape TABLE, not a blanket rule. Under scan-based timing (fresh
# activations each iteration — the serving situation, where each VAE-decode
# conv runs once per image) the windowed kernel wins where the GN+conv
# pair's spatial reduction is bandwidth-exposed: (512,640,256)->128
# 3.41 vs 4.41 ms (1.29x) and (128,160,512)->512 0.72 vs 0.91 ms (1.26x).
# It loses at skinny channel counts — (512,640,128)->128 1.37 vs 1.16 ms,
# (256,320,512)->512 2.86 vs 2.77 ms — where the exposed per-window DMA +
# VPU normalize eats the one-HBM-move advantage (XLA's conv runs at 75-88%
# MXU at pixel resolutions, unlike the 54-69% it gets on latent shapes).
# Only the measured winners are dispatched (_WINDOWED_SHAPES). The shapes
# with the biggest XLA headroom (960/1920-channel up-concat levels at 768p)
# cannot be manually DMA'd at all: Mosaic requires lane-dim slices of an
# HBM memref to be 128-aligned.

# (H, W, Cin, Cout) keys where the windowed kernel measured >=1.25x vs the
# unfused pair (scan-based, v5e). Batch is excluded: the grid scales
# linearly with it.
_WINDOWED_SHAPES = frozenset({
    (512, 640, 256, 128),   # VAE decoder up3 entry resnet conv1
    (128, 160, 512, 512),   # VAE decoder up1 resnets
})


def _windowed_preferred(x, w, num_groups: int) -> bool:
    """True when the measured dispatch table picks the windowed kernel."""
    if x.ndim != 4 or w.ndim != 4:
        return False
    key = (x.shape[1], x.shape[2], x.shape[3], w.shape[-1])
    return key in _WINDOWED_SHAPES and _windowed_supported(x, w, num_groups)


def _scale_shift(x, gw, gb, add, *, num_groups, eps):
    """Per-(B, C) GroupNorm scale/shift in fp32 (spatial reduction per
    channel, group aggregation on (B, C) moments — never reshaping the
    activation to (B, HW, G, C/G))."""
    b, h, wd, cin = x.shape
    x32 = x.astype(jnp.float32)
    s1 = jnp.sum(x32, axis=(1, 2))            # (B, C)
    s2 = jnp.sum(x32 * x32, axis=(1, 2))      # (B, C)
    m = jnp.float32(h * wd)
    if add is not None:
        t = add.astype(jnp.float32)
        s2 = s2 + 2.0 * t * s1 + m * t * t
        s1 = s1 + m * t
    g = num_groups
    cpg = cin // g
    n = m * cpg
    gs1 = s1.reshape(b, g, cpg).sum(-1)
    gs2 = s2.reshape(b, g, cpg).sum(-1)
    mean_g = gs1 / n
    var_g = gs2 / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean = jnp.repeat(mean_g, cpg, axis=-1)   # (B, C)
    inv = jnp.repeat(inv_g, cpg, axis=-1)
    scale = inv * gw.astype(jnp.float32)[None, :]
    shift = gb.astype(jnp.float32)[None, :] - mean * scale
    if add is not None:
        shift = shift + add.astype(jnp.float32) * scale
    return scale, shift


def _windowed_kernel(
    ss_ref,     # (1, 2, Cin) fp32: [scale, shift] for this batch row
    w_ref,      # (3, 3, Cin, Cot)
    cb_ref,     # (1, Cot)
    x_ref,      # (B, H, W, Cin) in HBM/ANY — manually DMA'd
    o_ref,      # (1, hwin, W, Cot)
    raw_ref,    # VMEM (hwin+2, W, Cin): raw x rows [h0-1, h0+hwin+1)
    xn_ref,     # VMEM (hwin+2, W+2, Cin): zero-bordered silu(gn(x))
    sems,       # DMA semaphores (3,)
    *,
    hwin: int,
    H: int,
    W: int,
    cin: int,
    cot: int,
    nwin: int,
    act: str,
):
    bi = pl.program_id(0)
    wi = pl.program_id(1)
    ci = pl.program_id(2)
    h0 = wi * hwin

    # ---- once per window (ci == 0): DMA rows + normalize into the scratch
    @pl.when(ci == 0)
    def _prep():
        # clamped halo rows: at the image top/bottom the halo row is
        # re-fetched from inside the image and ZEROED after normalize
        # (SAME padding), keeping every DMA the same static shape.
        top = jnp.maximum(h0 - 1, 0)
        bot = jnp.minimum(h0 + hwin, H - 1)
        cp_main = pltpu.make_async_copy(
            x_ref.at[bi, pl.ds(h0, hwin)], raw_ref.at[pl.ds(1, hwin)],
            sems.at[0],
        )
        cp_top = pltpu.make_async_copy(
            x_ref.at[bi, pl.ds(top, 1)], raw_ref.at[pl.ds(0, 1)], sems.at[1],
        )
        cp_bot = pltpu.make_async_copy(
            x_ref.at[bi, pl.ds(bot, 1)], raw_ref.at[pl.ds(hwin + 1, 1)],
            sems.at[2],
        )
        cp_main.start()
        cp_top.start()
        cp_bot.start()

        # zero the side columns once (the scratch persists across grid
        # steps and nothing below writes columns 0 / W+1)
        @pl.when((bi == 0) & (wi == 0))
        def _zero_cols():
            xn_ref[:, 0, :] = jnp.zeros((hwin + 2, cin), xn_ref.dtype)
            xn_ref[:, W + 1, :] = jnp.zeros((hwin + 2, cin), xn_ref.dtype)

        scale = ss_ref[0, 0, :][None, :]  # (1, Cin) fp32
        shift = ss_ref[0, 1, :][None, :]
        cp_main.wait()
        cp_top.wait()
        cp_bot.wait()

        def norm_row(r, _):
            y = raw_ref[pl.ds(r, 1)].astype(jnp.float32) * scale + shift
            if act == "silu":
                y = y * jax.nn.sigmoid(y)
            xn_ref[pl.ds(r, 1), 1 : W + 1, :] = y.astype(xn_ref.dtype)
            return 0

        jax.lax.fori_loop(0, hwin + 2, norm_row, 0)

        # SAME-pad zeros where the clamped halo row lies outside the image
        @pl.when(wi == 0)
        def _zero_top():
            xn_ref[0, 1 : W + 1, :] = jnp.zeros((W, cin), xn_ref.dtype)

        @pl.when(wi == nwin - 1)
        def _zero_bot():
            xn_ref[hwin + 1, 1 : W + 1, :] = jnp.zeros((W, cin), xn_ref.dtype)

    # ---- nine-tap implicit-GEMM conv for this (window, Cout block)
    acc = jnp.zeros((hwin * W, cot), jnp.float32)
    for dy in range(3):
        xrow = xn_ref[pl.ds(dy, hwin), :, :]  # (hwin, W+2, Cin)
        for dx in range(3):
            xs = xrow[:, dx : dx + W, :].reshape(hwin * W, cin)
            acc = acc + jnp.dot(
                xs, w_ref[dy, dx], preferred_element_type=jnp.float32
            )
    acc = acc + cb_ref[0, :].astype(jnp.float32)
    o_ref[0, :, :, :] = acc.reshape(hwin, W, cot).astype(o_ref.dtype)


def _pick_hwin(h: int, w: int, cin: int, cot: int, itemsize: int
               ) -> Optional[int]:
    """Largest divisor-of-H window whose VMEM footprint fits, preferring
    MXU-friendly GEMM heights (hwin*W >= ~2048 rows)."""
    for hwin in (32, 16, 8, 4):
        if h % hwin or h // hwin < 2:
            continue
        need = (
            (hwin + 2) * w * cin * itemsize          # raw rows
            + (hwin + 2) * (w + 2) * cin * itemsize  # padded scratch
            + 9 * cin * cot * itemsize               # weight block
            + hwin * w * cot * 4                     # fp32 accumulator
            + hwin * w * cot * itemsize              # out block
            + w * cin * 4 * 2                        # per-row fp32 temp
        )
        if need <= _VMEM_BUDGET and hwin * w >= 2048:
            return hwin
    return None


def _windowed_supported(x, w, num_groups: int) -> bool:
    if x.ndim != 4 or w.shape[:2] != (3, 3):
        return False
    b, h, wd, cin = x.shape
    co = w.shape[-1]
    if cin % num_groups:
        return False
    # the manual HBM->VMEM row DMA slices the lane (channel) dim of x's
    # HBM memref: Mosaic requires that slice 128-aligned (a 960-channel
    # up-concat x is tiled to 1024 in HBM and cannot be DMA-sliced)
    if cin < 128 or co < 128 or cin % 128:
        return False
    itemsize = jnp.dtype(x.dtype).itemsize
    cot = _pick_cot(cin, co)
    if cot is None:
        return False
    return _pick_hwin(h, wd, cin, cot, itemsize) is not None


def _windowed_call(x, gw, gb, add, w, cb, *, num_groups, eps, act,
                   interpret):
    b, h, wd, cin = x.shape
    co = w.shape[-1]
    itemsize = jnp.dtype(x.dtype).itemsize
    cot = _pick_cot(cin, co)
    hwin = _pick_hwin(h, wd, cin, cot, itemsize)
    nwin = h // hwin
    scale, shift = _scale_shift(x, gw, gb, add, num_groups=num_groups,
                                eps=eps)
    ss = jnp.stack([scale, shift], axis=1)  # (B, 2, Cin) fp32
    kern = functools.partial(
        _windowed_kernel, hwin=hwin, H=h, W=wd, cin=cin, cot=cot,
        nwin=nwin, act=act,
    )
    return pl.pallas_call(
        kern,
        grid=(b, nwin, co // cot),
        in_specs=[
            pl.BlockSpec((1, 2, cin), lambda bi, wi, ci: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cin, cot), lambda bi, wi, ci: (0, 0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cot), lambda bi, wi, ci: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, hwin, wd, cot), lambda bi, wi, ci: (bi, wi, 0, ci),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((hwin + 2, wd, cin), x.dtype),
            pltpu.VMEM((hwin + 2, wd + 2, cin), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(ss, w.astype(x.dtype), cb.reshape(1, co).astype(x.dtype), x)


def _xla_reference(x, gw, gb, add, w, cb, *, num_groups, eps, act):
    """Unfused path: identical math in plain XLA (also the VJP recompute)."""
    h = _fg._xla_reference(x, gw, gb, add, num_groups=num_groups, eps=eps,
                           act=act)
    y = jax.lax.conv_general_dilated(
        h,
        w.astype(h.dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=h.dtype,
    )
    return y + cb.astype(y.dtype)


@functools.lru_cache(maxsize=None)
def _partitioned(with_add: bool, num_groups: int, eps: float, act: str):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def body(*args):
        if with_add:
            x, gw, gb, add, w, cb = args
        else:
            x, gw, gb, w, cb = args
            add = None
        if jax.default_backend() == "tpu":
            if _windowed_preferred(x, w, num_groups):
                return _windowed_call(x, gw, gb, add, w, cb,
                                      num_groups=num_groups, eps=eps,
                                      act=act, interpret=False)
            if _supported(x, w, num_groups):
                return _fused_call(x, gw, gb, add, w, cb,
                                   num_groups=num_groups, eps=eps, act=act,
                                   interpret=False)
        return _xla_reference(x, gw, gb, add, w, cb, num_groups=num_groups,
                              eps=eps, act=act)

    p = custom_partitioning(body)

    def _b_axis(arg_shapes):
        try:
            spec = arg_shapes[0].sharding.spec
        except AttributeError:
            return None
        return spec[0] if len(spec) > 0 else None

    def partition(mesh, arg_shapes, result_shape):
        b_ax = _b_axis(arg_shapes)
        xs = NamedSharding(mesh, PartitionSpec(b_ax, None, None, None))
        cs = NamedSharding(mesh, PartitionSpec(None))
        ws = NamedSharding(mesh, PartitionSpec(None, None, None, None))
        if with_add:
            args = (xs, cs, cs, NamedSharding(mesh, PartitionSpec(b_ax)),
                    ws, cs)
        else:
            args = (xs, cs, cs, ws, cs)
        return mesh, body, xs, args

    def infer(mesh, arg_shapes, result_shape):
        b_ax = _b_axis(arg_shapes)
        return NamedSharding(mesh, PartitionSpec(b_ax, None, None, None))

    rule = "b h w c, c, c" + (", b c" if with_add else "") \
        + ", kh kw c o, o -> b h w o"
    p.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
    )
    return p


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_gn_silu_conv(x, gw, gb, add, w, cb, num_groups, eps, act):
    """conv3x3_SAME( silu( GroupNorm(x + add[:,None,None,:]) ) ) + cb.

    x: (B, H, W, Cin); gw/gb: (Cin,) GroupNorm affine; add: optional (B, Cin)
    bias (the time embedding); w: (3, 3, Cin, Cout) HWIO; cb: (Cout,).
    """
    if INTERPRET:
        if _windowed_preferred(x, w, num_groups):
            return _windowed_call(x, gw, gb, add, w, cb,
                                  num_groups=num_groups, eps=eps, act=act,
                                  interpret=True)
        if _supported(x, w, num_groups):
            return _fused_call(x, gw, gb, add, w, cb, num_groups=num_groups,
                               eps=eps, act=act, interpret=True)
    if _fg._use_pallas() and (
        _supported(x, w, num_groups) or _windowed_preferred(x, w, num_groups)
    ):
        fn = _partitioned(add is not None, num_groups, eps, act)
        args = (x, gw, gb) + ((add,) if add is not None else ()) + (w, cb)
        return fn(*args)
    return _xla_reference(x, gw, gb, add, w, cb, num_groups=num_groups,
                          eps=eps, act=act)


def _fwd(x, gw, gb, add, w, cb, num_groups, eps, act):
    return fused_gn_silu_conv(x, gw, gb, add, w, cb, num_groups, eps, act), (
        x, gw, gb, add, w, cb,
    )


def _bwd(num_groups, eps, act, res, g):
    x, gw, gb, add, w, cb = res
    if add is None:
        out, vjp = jax.vjp(
            lambda x_, gw_, gb_, w_, cb_: _xla_reference(
                x_, gw_, gb_, None, w_, cb_, num_groups=num_groups, eps=eps,
                act=act,
            ),
            x, gw, gb, w, cb,
        )
        dx, dgw, dgb, dw, dcb = vjp(g)
        return dx, dgw, dgb, None, dw, dcb
    out, vjp = jax.vjp(
        lambda x_, gw_, gb_, a_, w_, cb_: _xla_reference(
            x_, gw_, gb_, a_, w_, cb_, num_groups=num_groups, eps=eps,
            act=act,
        ),
        x, gw, gb, add, w, cb,
    )
    return vjp(g)


fused_gn_silu_conv.defvjp(_fwd, _bwd)


def gn_silu_conv3x3(
    gn_p,    # {"scale": (Cin,), "bias": (Cin,)}
    conv_p,  # {"kernel": (3, 3, Cin, Cout), "bias": (Cout,)}
    x: jnp.ndarray,
    *,
    num_groups: int = 32,
    eps: float = 1e-5,
    act: str = "silu",
    add: Optional[jnp.ndarray] = None,  # (B, Cin)
) -> jnp.ndarray:
    """Model-facing wrapper for the resnet `gn -> silu -> conv3x3` chain.

    Dispatch: the fully-fused Pallas kernel where supported; otherwise the
    fused-GroupNorm kernel (with ITS Pallas/XLA dispatch) + XLA conv — the
    pre-r4 pair — so unsupported geometries never lose the GN kernel.
    """
    cb = conv_p.get("bias")
    if cb is None:
        cb = jnp.zeros((conv_p["kernel"].shape[-1],), x.dtype)
    supported = _supported(x, conv_p["kernel"], num_groups) or \
        _windowed_preferred(x, conv_p["kernel"], num_groups)
    if supported and (INTERPRET or _fg._use_pallas()):
        return fused_gn_silu_conv(
            x, gn_p["scale"], gn_p["bias"], add, conv_p["kernel"], cb,
            num_groups, eps, act,
        )
    h = _fg.group_norm_act(gn_p, x, num_groups=num_groups, eps=eps, act=act,
                           add=add)
    y = jax.lax.conv_general_dilated(
        h,
        conv_p["kernel"].astype(h.dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=h.dtype,
    )
    return y + cb.astype(y.dtype)
