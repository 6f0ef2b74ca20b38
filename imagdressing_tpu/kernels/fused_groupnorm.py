"""Fused GroupNorm(+bias)+activation Pallas kernel — one HBM read, one write.

The UNet's resnet blocks (reference diffusers ResnetBlock2D,
/root/reference training stack's SD1.5 UNet) spend their non-matmul time in
`group_norm -> silu` (and `h + time_emb` before norm2). Under plain XLA that
is at least two full passes over the activation (stats, then normalize) plus
the bias add. This kernel keeps one batch row's activation resident in VMEM:

  1. fp32 channel sums s1/s2 accumulated in row chunks (x stays bf16);
  2. group aggregation as a (C,G) one-hot matmul (no lane-dim reshapes);
  3. an optional per-(B,C) bias `add` (the time embedding) folds into the
     stats algebraically: s1' = s1 + M*t, s2' = s2 + 2*t*s1 + M*t^2 — the
     whole `h + temb -> groupnorm -> silu` chain is ONE memory pass;
  4. normalize + affine + activation written back chunk by chunk.

Backward: jax.custom_vjp that recomputes the reference XLA forward and uses
its VJP — exact gradients, no extra residuals (pairs with the block remat
used in training).

Shapes too large to sit in VMEM (the VAE decoder's 640x512 activations) fall
back to the unfused XLA path automatically.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Set True (tests) to run through the Pallas interpreter on CPU.
INTERPRET = False

# Per-row VMEM budget for input+output residency (bytes).
_VMEM_LIMIT = 8 * 1024 * 1024


def _use_pallas() -> bool:
    if os.environ.get("IMAGDRESSING_DISABLE_PALLAS", "0") == "1":
        return False
    dd = jax.config.jax_default_device
    if dd is not None and getattr(dd, "platform", "tpu") != "tpu":
        return False
    return jax.default_backend() == "tpu"


def _apply_act(y, act: str):
    if act == "silu":
        return y * jax.nn.sigmoid(y)
    return y


def _gn_kernel(
    x_ref,  # (1, M, C) one batch row, VMEM-resident
    w_ref,  # (C,)
    b_ref,  # (C,)
    add_ref,  # (1, C) per-row bias or None
    o_ref,  # (1, M, C)
    *,
    num_groups: int,
    eps: float,
    act: str,
    chunk: int,
):
    m, c = x_ref.shape[1], x_ref.shape[2]
    g = num_groups

    # chunked fp32 channel sums (x stays bf16 in VMEM; fp32 temp is 1 chunk)
    def body(i, carry):
        s1, s2 = carry
        xc = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        return s1 + jnp.sum(xc, axis=0), s2 + jnp.sum(xc * xc, axis=0)

    s1 = jnp.zeros((c,), jnp.float32)
    s2 = jnp.zeros((c,), jnp.float32)
    s1, s2 = jax.lax.fori_loop(0, m // chunk, body, (s1, s2))

    if add_ref is not None:
        t = add_ref[0, 0].astype(jnp.float32)  # (C,)
        s2 = s2 + 2.0 * t * s1 + m * t * t
        s1 = s1 + m * t

    # group aggregation via one-hot matmul (C,) -> (G,) -> (C,)
    cpg = c // g
    col_group = jax.lax.broadcasted_iota(jnp.int32, (c, g), 0) // cpg
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, g), 1)
    onehot = (col_group == grp).astype(jnp.float32)  # (C, G)
    n = jnp.float32(m * cpg)
    gs1 = jnp.dot(s1[None, :], onehot, preferred_element_type=jnp.float32)
    gs2 = jnp.dot(s2[None, :], onehot, preferred_element_type=jnp.float32)
    mean_g = gs1 / n  # (1, G)
    var_g = gs2 / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean = jnp.dot(mean_g, onehot.T, preferred_element_type=jnp.float32)
    inv = jnp.dot(inv_g, onehot.T, preferred_element_type=jnp.float32)

    w = w_ref[...].astype(jnp.float32)[None, :]
    bb = b_ref[...].astype(jnp.float32)[None, :]
    scale = inv * w  # (1, C)
    shift = bb - mean * scale
    if add_ref is not None:
        shift = shift + add_ref[0, 0].astype(jnp.float32)[None, :] * scale

    def write(i, _):
        xc = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        y = xc * scale + shift
        o_ref[0, pl.ds(i * chunk, chunk), :] = _apply_act(y, act).astype(
            o_ref.dtype
        )
        return 0

    jax.lax.fori_loop(0, m // chunk, write, 0)


def _pick_chunk(m: int) -> int:
    """Largest divisor of m that is a multiple of 8 and <= 512 (bounds the
    fp32 chunk temporaries in VMEM)."""
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if m % cand == 0:
            return cand
    return m


def _pallas_supported(m: int, c: int, itemsize: int) -> bool:
    if m % 8 != 0:
        return False
    if 2 * m * c * itemsize > _VMEM_LIMIT:
        return False
    return True


def _gn_call(x3, w, b, add, *, num_groups, eps, act, interpret):
    bsz, m, c = x3.shape
    chunk = _pick_chunk(m)
    kernel = functools.partial(
        _gn_kernel, num_groups=num_groups, eps=eps, act=act, chunk=chunk
    )
    in_specs = [
        pl.BlockSpec((1, m, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
    ]
    args = [x3, w, b]
    if add is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(add.reshape(bsz, 1, c))
    else:
        kernel = functools.partial(kernel)

        def kernel_noadd(x_ref, w_ref, b_ref, o_ref, k=kernel):
            return k(x_ref, w_ref, b_ref, None, o_ref)

        kernel = kernel_noadd
    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, m, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        # in-place: the stats pass reads every chunk before the write pass
        # touches it, so x and out share one VMEM block (halves residency)
        input_output_aliases={0: 0},
        # double-buffered in+out blocks at the top UNet level (~13 MB) can
        # exceed XLA's default 16 MB *scoped* vmem when the surrounding
        # program overlaps async copies; the physical budget is 128 MB
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(*args)


def _xla_reference(x, w, b, add, *, num_groups, eps, act):
    """Unfused path: identical math in plain XLA (also the VJP recompute)."""
    from imagdressing_tpu.ops import nn

    if add is not None:
        shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
        x = x + add.reshape(shape).astype(x.dtype)
    out = nn.group_norm({"scale": w, "bias": b}, x,
                        num_groups=num_groups, eps=eps)
    return _apply_act(out.astype(jnp.float32), act).astype(x.dtype)


# ---------------------------------------------------------------------------
# SPMD partitioning (custom_partitioning): GroupNorm reduces over spatial and
# within-group channels per SAMPLE, so the op is trivially parallel over the
# batch dim only. Declaring that lets multi-device pjit programs (the
# tensor-parallel serving path) keep the Pallas kernel instead of GSPMD
# replicating an opaque custom call. The per-shard body re-dispatches:
# compiled Pallas on TPU (when the shard's row fits VMEM), reference XLA
# elsewhere — the CPU-mesh tests validate the rules against single-device
# bit-exactly. Interpret mode bypasses this wrapper (io-callback effects
# cannot lower through custom_partitioning).


@functools.lru_cache(maxsize=None)
def _gn_partitioned(ndim: int, with_add: bool, num_groups: int, eps: float,
                    act: str):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def body(*args):
        x, w, b = args[:3]
        add = args[3] if with_add else None
        c = x.shape[-1]
        m = 1
        for d in x.shape[1:-1]:
            m *= d
        if (
            jax.default_backend() == "tpu"
            and _pallas_supported(m, c, x.dtype.itemsize)
        ):
            x3 = x.reshape(x.shape[0], m, c)
            return _gn_call(
                x3, w, b, add, num_groups=num_groups, eps=eps, act=act,
                interpret=False,
            ).reshape(x.shape)
        return _xla_reference(x, w, b, add, num_groups=num_groups, eps=eps,
                              act=act)

    p = custom_partitioning(body)

    def _b_axis(arg_shapes):
        try:
            spec = arg_shapes[0].sharding.spec
        except AttributeError:
            return None
        return spec[0] if len(spec) > 0 else None

    def partition(mesh, arg_shapes, result_shape):
        b_ax = _b_axis(arg_shapes)
        xs = NamedSharding(
            mesh, PartitionSpec(b_ax, *([None] * (ndim - 1)))
        )
        cs = NamedSharding(mesh, PartitionSpec(None))
        args = (xs, cs, cs)
        if with_add:
            args = args + (NamedSharding(mesh, PartitionSpec(b_ax, None)),)
        return mesh, body, xs, args

    def infer(mesh, arg_shapes, result_shape):
        b_ax = _b_axis(arg_shapes)
        return NamedSharding(
            mesh, PartitionSpec(b_ax, *([None] * (ndim - 1)))
        )

    dims = " ".join(f"m{i}" for i in range(ndim - 2))
    xs_rule = f"b {dims} c".replace("  ", " ")
    rule = f"{xs_rule}, c, c" + (", b c" if with_add else "") \
        + f" -> {xs_rule}"
    p.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
    )
    return p


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_group_norm_act(x, w, b, add, num_groups, eps, act):
    """silu/none( GroupNorm(x + add[:,None,None,:]) ) in one memory pass.

    x: (B, ..., C); w/b: (C,) affine; add: optional (B, C) bias folded in.
    """
    orig_shape = x.shape
    c = x.shape[-1]
    m = 1
    for d in x.shape[1:-1]:
        m *= d
    if INTERPRET and _pallas_supported(m, c, x.dtype.itemsize):
        x3 = x.reshape(x.shape[0], m, c)
        out = _gn_call(
            x3, w, b, add, num_groups=num_groups, eps=eps, act=act,
            interpret=True,
        )
        return out.reshape(orig_shape)
    if _use_pallas() and _pallas_supported(m, c, x.dtype.itemsize):
        fn = _gn_partitioned(x.ndim, add is not None, num_groups, eps, act)
        args = (x, w, b) + ((add,) if add is not None else ())
        return fn(*args)
    return _xla_reference(x, w, b, add, num_groups=num_groups, eps=eps,
                          act=act)


def _fwd(x, w, b, add, num_groups, eps, act):
    return fused_group_norm_act(x, w, b, add, num_groups, eps, act), (
        x, w, b, add,
    )


def _bwd(num_groups, eps, act, res, g):
    x, w, b, add = res
    if add is None:
        out, vjp = jax.vjp(
            lambda x_, w_, b_: _xla_reference(
                x_, w_, b_, None, num_groups=num_groups, eps=eps, act=act
            ),
            x, w, b,
        )
        dx, dw, db = vjp(g)
        return dx, dw, db, None
    out, vjp = jax.vjp(
        lambda x_, w_, b_, a_: _xla_reference(
            x_, w_, b_, a_, num_groups=num_groups, eps=eps, act=act
        ),
        x, w, b, add,
    )
    return vjp(g)


fused_group_norm_act.defvjp(_fwd, _bwd)


def group_norm_act(
    p,  # {"scale": (C,), "bias": (C,)}
    x: jnp.ndarray,
    *,
    num_groups: int = 32,
    eps: float = 1e-5,
    act: str = "silu",
    add: Optional[jnp.ndarray] = None,  # (B, C)
) -> jnp.ndarray:
    """Model-facing wrapper (mirrors ops.nn.group_norm's signature)."""
    return fused_group_norm_act(x, p["scale"], p["bias"], add,
                                num_groups, eps, act)
