"""SD1.5-class UNet2DConditionModel, functional JAX, NHWC.

ONE definition serves both roles of the reference (which instantiates the
same diffusers architecture twice — main at /root/reference/train.py:320,
garment/"reference" UNet at train.py:367):

  * main role:    `apply(..., cond=Conditioning(ref_kv=..., ...))` — hybrid
                  reference attention, IP tokens, ControlNet residuals.
  * garment role: `apply(..., capture=True)` — returns the per-layer
                  self-attention input hidden states, the functional
                  equivalent of CacheAttnProcessor2_0's dict mutation
                  (/root/reference/adapter/attention_processor.py:34).

Parity notes vs diffusers UNet2DConditionModel (SD1.5 config):
  - attention layer names reuse the diffusers processor keys so checkpoint
    conversion and the ref_kv cache are 1:1 auditable against the reference
    (/root/reference/inference_IMAGdressing.py:69-85).
  - timestep embedding: flip_sin_to_cos=True, freq_shift=0.
  - transformer blocks: LN -> attn1(self) -> LN -> attn2(cross) -> LN -> GEGLU.
  - proj_in/proj_out are 1x1 convs stored as linears (use_linear_projection
    is False in SD1.5; a 1x1 conv over NHWC == a linear over the C axis).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from imagdressing_tpu.core.config import UNetConfig
from imagdressing_tpu.models.conditioning import Conditioning
import imagdressing_tpu.ops.attention as attn_ops
from imagdressing_tpu.kernels.fused_gn_conv import gn_silu_conv3x3
from imagdressing_tpu.kernels.fused_groupnorm import group_norm_act
from imagdressing_tpu.ops import nn

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Layer naming — mirrors diffusers' unet.attn_processors keys.
# ---------------------------------------------------------------------------


def attn_layer_names(cfg: UNetConfig, which: str = "attn1") -> List[str]:
    """Ordered names, matching diffusers attn_processors dict ordering
    (down blocks -> up blocks -> mid), which determines the reference's
    `adapter_modules` ModuleList indexing (/root/reference/train.py:364)."""
    names = []
    for i, has in enumerate(cfg.down_block_has_attn):
        if not has:
            continue
        for j in range(cfg.layers_per_block):
            names.append(
                f"down_blocks.{i}.attentions.{j}.transformer_blocks.0.{which}.processor"
            )
    n_up = cfg.layers_per_block + 1
    for i, has in enumerate(cfg.up_block_has_attn):
        if not has:
            continue
        for j in range(n_up):
            names.append(
                f"up_blocks.{i}.attentions.{j}.transformer_blocks.0.{which}.processor"
            )
    names.append(f"mid_block.attentions.0.transformer_blocks.0.{which}.processor")
    return names


def attn_layer_seq_lens(cfg: UNetConfig, h: int, w: int) -> Dict[str, int]:
    """Self-attention token count per layer for latents of (h, w).

    down_blocks.i runs at (h, w) / 2^i; mid at / 2^(n-1); up_blocks.i at
    / 2^(n-1-i).
    """
    n = len(cfg.block_out_channels)
    out = {}
    for name in attn_layer_names(cfg, "attn1"):
        if name.startswith("mid_block"):
            level = n - 1
        elif name.startswith("down_blocks"):
            level = int(name[len("down_blocks.")])
        else:
            level = n - 1 - int(name[len("up_blocks.")])
        # stride-2/pad-1 downsamplers produce ceil(h/2) per level (floor
        # would under-report tokens for odd intermediate sizes); note
        # ceil(ceil(h/2)/2) == ceil(h/4), so one ceil-div per level is exact
        d = 2**level
        out[name] = (-(-h // d)) * (-(-w // d))
    return out


def attn_layer_dims(cfg: UNetConfig) -> Dict[str, int]:
    """hidden_size per attention layer name (reference computes the same at
    inference_IMAGdressing.py:70-80)."""
    dims = {}
    for name in attn_layer_names(cfg, "attn1") + attn_layer_names(cfg, "attn2"):
        if name.startswith("mid_block"):
            dims[name] = cfg.block_out_channels[-1]
        elif name.startswith("up_blocks"):
            block_id = int(name[len("up_blocks.")])
            dims[name] = list(reversed(cfg.block_out_channels))[block_id]
        else:
            block_id = int(name[len("down_blocks.")])
            dims[name] = cfg.block_out_channels[block_id]
    return dims


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _init_attention(rng, query_dim: int, context_dim: Optional[int]) -> Params:
    kq, kk, kv, ko = jax.random.split(rng, 4)
    ctx = context_dim or query_dim
    return {
        "to_q": nn.param_init_linear(kq, query_dim, query_dim, bias=False),
        "to_k": nn.param_init_linear(kk, ctx, query_dim, bias=False),
        "to_v": nn.param_init_linear(kv, ctx, query_dim, bias=False),
        "to_out": nn.param_init_linear(ko, query_dim, query_dim, bias=True),
    }


def _init_transformer_block(rng, dim: int, context_dim: int) -> Params:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    inner = dim * 4
    return {
        "norm1": nn.param_init_norm(dim),
        "attn1": _init_attention(k1, dim, None),
        "norm2": nn.param_init_norm(dim),
        "attn2": _init_attention(k2, dim, context_dim),
        "norm3": nn.param_init_norm(dim),
        "ff": {
            "proj": nn.param_init_linear(k3, dim, inner * 2),
            "out": nn.param_init_linear(k4, inner, dim),
        },
    }


def _init_transformer2d(rng, dim: int, context_dim: int, n_layers: int) -> Params:
    keys = jax.random.split(rng, n_layers + 2)
    return {
        "norm": nn.param_init_norm(dim),
        "proj_in": nn.param_init_linear(keys[0], dim, dim),
        "transformer_blocks": [
            _init_transformer_block(keys[2 + i], dim, context_dim)
            for i in range(n_layers)
        ],
        "proj_out": nn.param_init_linear(keys[1], dim, dim),
    }


def _init_resnet(rng, in_ch: int, out_ch: int, temb_ch: int) -> Params:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    p = {
        "norm1": nn.param_init_norm(in_ch),
        "conv1": nn.param_init_conv(k1, 3, 3, in_ch, out_ch),
        "time_emb_proj": nn.param_init_linear(k2, temb_ch, out_ch),
        "norm2": nn.param_init_norm(out_ch),
        "conv2": nn.param_init_conv(k3, 3, 3, out_ch, out_ch),
    }
    if in_ch != out_ch:
        p["conv_shortcut"] = nn.param_init_conv(k4, 1, 1, in_ch, out_ch)
    return p


def init(rng, cfg: UNetConfig) -> Params:
    """Random init (training from scratch / tests). Checkpoint loads replace
    this tree via convert/torch_sd.py."""
    n_blocks = len(cfg.block_out_channels)
    temb = cfg.time_embed_dim
    keys = iter(jax.random.split(rng, 256))

    params: Params = {
        "conv_in": nn.param_init_conv(next(keys), 3, 3, cfg.in_channels,
                                      cfg.block_out_channels[0]),
        "time_embedding": {
            "linear_1": nn.param_init_linear(next(keys), cfg.block_out_channels[0], temb),
            "linear_2": nn.param_init_linear(next(keys), temb, temb),
        },
    }

    down_blocks = []
    out_ch = cfg.block_out_channels[0]
    for i, ch in enumerate(cfg.block_out_channels):
        in_ch = out_ch
        out_ch = ch
        block: Params = {"resnets": [], "attentions": []}
        for j in range(cfg.layers_per_block):
            block["resnets"].append(
                _init_resnet(next(keys), in_ch if j == 0 else out_ch, out_ch, temb)
            )
            if cfg.down_block_has_attn[i]:
                block["attentions"].append(
                    _init_transformer2d(
                        next(keys), out_ch, cfg.cross_attention_dim,
                        cfg.transformer_layers_per_block,
                    )
                )
        if i != n_blocks - 1:
            block["downsamplers"] = [
                {"conv": nn.param_init_conv(next(keys), 3, 3, out_ch, out_ch)}
            ]
        down_blocks.append(block)
    params["down_blocks"] = down_blocks

    mid_ch = cfg.block_out_channels[-1]
    params["mid_block"] = {
        "resnets": [
            _init_resnet(next(keys), mid_ch, mid_ch, temb),
            _init_resnet(next(keys), mid_ch, mid_ch, temb),
        ],
        "attentions": [
            _init_transformer2d(next(keys), mid_ch, cfg.cross_attention_dim,
                                cfg.transformer_layers_per_block)
        ],
    }

    up_blocks = []
    rev = list(reversed(cfg.block_out_channels))
    out_ch = rev[0]
    for i, ch in enumerate(rev):
        prev_out = out_ch
        out_ch = ch
        in_ch = rev[min(i + 1, n_blocks - 1)]
        block = {"resnets": [], "attentions": []}
        for j in range(cfg.layers_per_block + 1):
            skip_ch = in_ch if j == cfg.layers_per_block else out_ch
            res_in = prev_out if j == 0 else out_ch
            block["resnets"].append(
                _init_resnet(next(keys), res_in + skip_ch, out_ch, temb)
            )
            if cfg.up_block_has_attn[i]:
                block["attentions"].append(
                    _init_transformer2d(
                        next(keys), out_ch, cfg.cross_attention_dim,
                        cfg.transformer_layers_per_block,
                    )
                )
        if i != n_blocks - 1:
            block["upsamplers"] = [
                {"conv": nn.param_init_conv(next(keys), 3, 3, out_ch, out_ch)}
            ]
        up_blocks.append(block)
    params["up_blocks"] = up_blocks

    params["conv_norm_out"] = nn.param_init_norm(cfg.block_out_channels[0])
    params["conv_out"] = nn.param_init_conv(
        next(keys), 3, 3, cfg.block_out_channels[0], cfg.out_channels
    )
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def resolve_remat_policy(name: Optional[str]):
    """Remat-policy knob for training (TrainConfig.remat_policy):

      "full"  (or None) — save nothing inside a block; the whole block
              forward re-runs in backward. Minimum memory, maximum HBM
              traffic (~81% of v5e BW at 512x640 b1, 23.8% MFU).
      "dots"  — save every dot_general output (q/k/v/out projections,
              proj_in/out, both FF matmuls). Convs + the flash kernel
              still re-run.
      "heavy" — "dots" plus the named saves: resnet conv1 outputs and
              pre-projection attention outputs. The backward recompute
              then contains NO conv and NO attention kernel — only
              GroupNorm/LayerNorm/elementwise chains.

    "none" is handled by callers (skip jax.checkpoint entirely).
    """
    if name in (None, "full"):
        return None
    cp = jax.checkpoint_policies
    if name == "dots":
        return cp.dots_saveable
    if name == "names":
        # just the two expensive-op outputs — the memory-lean middle
        # ground when "heavy" overshoots HBM (e.g. 512x640 b4 misses by
        # ~2%); linears re-run in backward but convs/attention do not
        return cp.save_only_these_names("rematsave_conv", "rematsave_attn")
    if name == "heavy":
        return cp.save_from_both_policies(
            cp.dots_saveable,
            cp.save_only_these_names("rematsave_conv", "rematsave_attn"),
        )
    raise ValueError(
        f"unknown remat policy {name!r} (full | dots | names | heavy | none)"
    )


def _resnet(p: Params, x: jnp.ndarray, temb: jnp.ndarray, cfg: UNetConfig) -> jnp.ndarray:
    # Both `gn -> silu -> conv3x3` chains run as ONE fused implicit-GEMM
    # Pallas pass (kernels/fused_gn_conv.py): the normalized activation
    # never round-trips HBM and the conv runs at ~85% MXU utilization vs
    # XLA's 54-69% on these shapes (r4 ledger). Unsupported geometries
    # (mid-block 10x8 rows, VAE-scale spatial dims) fall back to the
    # fused-GroupNorm + XLA-conv pair inside the wrapper.
    # conv1's output is the only intermediate worth saving under selective
    # remat ("rematsave_conv"): gn_silu_conv3x3's custom_vjp recomputes the
    # whole XLA GN+conv chain from its *inputs* in the backward regardless
    # of remat policy, so saving conv1's output means conv2's backward
    # re-derives its GN stats from a saved tensor instead of re-running
    # conv1 first (XLA DCEs the recompute's dead final conv dot). The block
    # output itself is never needed — the residual add's VJP is identity
    # and the block output is a checkpoint boundary.
    h = checkpoint_name(
        gn_silu_conv3x3(p["norm1"], p["conv1"], x,
                        num_groups=cfg.norm_num_groups, eps=cfg.norm_eps),
        "rematsave_conv",
    )
    t = nn.linear(p["time_emb_proj"], nn.silu(temb))
    # +temb, norm2, silu, conv2: the add folds into the fused stats
    h = gn_silu_conv3x3(p["norm2"], p["conv2"], h,
                        num_groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                        add=t)
    if "conv_shortcut" in p:
        x = nn.conv2d(p["conv_shortcut"], x, padding=0)
    return x + h


def _self_attention(
    p: Params,
    x: jnp.ndarray,  # (B, S, C) post-norm hidden
    num_heads: int,
    layer_name: str,
    cond: Conditioning,
) -> jnp.ndarray:
    q = nn.linear(p["to_q"], x)
    k = nn.linear(p["to_k"], x)
    v = nn.linear(p["to_v"], x)
    if cond.ref_kv is not None and layer_name in cond.ref_kv:
        k_ref, v_ref = cond.ref_kv[layer_name]
        if cond.ref_mode == "concat":
            # SAttnProcessor2_0 variant: garment K/V joins the source under
            # ONE softmax (attention_processor.py:155-161). NB in that
            # scheme the cached hidden is projected by the frozen to_k/to_v,
            # so callers precompute ref_kv with the base projections.
            k = jnp.concatenate([k, k_ref.astype(q.dtype)], axis=1)
            v = jnp.concatenate([v, v_ref.astype(q.dtype)], axis=1)
            out = attn_ops.attention(q, k, v, num_heads)
        else:
            out = attn_ops.dual_kv_attention(
                q, k, v, k_ref.astype(q.dtype), v_ref.astype(q.dtype),
                cond.ref_scale, num_heads,
            )
    else:
        out = attn_ops.attention(q, k, v, num_heads)
    # saving the pre-projection attention output ("heavy" remat policy)
    # keeps the flash kernel out of the backward recompute: its custom VJP
    # needs only q/k/v (cheap linears from the saved norm input), and every
    # downstream consumer reads the saved tensor
    return nn.linear(p["to_out"], checkpoint_name(out, "rematsave_attn"))


def _cross_attention(
    p: Params,
    x: jnp.ndarray,  # (B, S, C)
    context: jnp.ndarray,  # (B, L, D_ctx)
    num_heads: int,
    layer_name: str,
    cond: Conditioning,
) -> jnp.ndarray:
    q = nn.linear(p["to_q"], x)
    if cond.cross_kv is not None and layer_name in cond.cross_kv:
        k, v = cond.cross_kv[layer_name]
        k = k.astype(q.dtype)
        v = v.astype(q.dtype)
    else:
        k = nn.linear(p["to_k"], context)
        v = nn.linear(p["to_v"], context)
    out = attn_ops.attention(q, k, v, num_heads)
    if cond.ref_cross_kv is not None and layer_name in cond.ref_cross_kv:
        # RefCAttnProcessor2_0: a parallel garment-attention branch on the
        # cross-attention layers, added with ref_scale.
        k_ref, v_ref = cond.ref_cross_kv[layer_name]
        ref_out = attn_ops.attention(
            q, k_ref.astype(q.dtype), v_ref.astype(q.dtype), num_heads
        )
        scale = jnp.asarray(cond.ref_scale, jnp.float32)
        scale = scale.reshape(-1, 1, 1) if scale.ndim > 0 else scale
        out = (out.astype(jnp.float32) + scale * ref_out.astype(jnp.float32)
               ).astype(out.dtype)
    if cond.ip_kv is not None and layer_name in cond.ip_kv:
        # IP-Adapter branch (reference IPAttnProcessor2_0, attention_processor
        # .py:968-988): separate attention over the 4 face tokens, added with
        # ip_scale. K/V precomputed (timestep-invariant).
        k_ip, v_ip = cond.ip_kv[layer_name]
        ip_out = attn_ops.attention(
            q, k_ip.astype(q.dtype), v_ip.astype(q.dtype), num_heads
        )
        scale = jnp.asarray(cond.ip_scale, jnp.float32)
        scale = scale.reshape(-1, 1, 1) if scale.ndim > 0 else scale
        out = (out.astype(jnp.float32) + scale * ip_out.astype(jnp.float32)).astype(
            out.dtype
        )
    return nn.linear(p["to_out"], checkpoint_name(out, "rematsave_attn"))


def _transformer2d(
    p: Params,
    x: jnp.ndarray,  # (B, H, W, C)
    context: jnp.ndarray,
    cfg: UNetConfig,
    name_prefix: str,
    cond: Conditioning,
    captured: Optional[Dict[str, jnp.ndarray]],
) -> jnp.ndarray:
    b, h, w, c = x.shape
    residual = x
    hidden = group_norm_act(p["norm"], x, num_groups=cfg.norm_num_groups,
                            eps=1e-6, act="none")
    hidden = nn.linear(p["proj_in"], hidden.reshape(b, h * w, c))

    for li, bp in enumerate(p["transformer_blocks"]):
        attn1_name = f"{name_prefix}.transformer_blocks.{li}.attn1.processor"
        attn2_name = f"{name_prefix}.transformer_blocks.{li}.attn2.processor"

        norm_hidden = nn.layer_norm(bp["norm1"], hidden)
        if captured is not None:
            # Functional equivalent of CacheAttnProcessor2_0: the attention
            # layer INPUT (post-norm1) is what the reference caches
            # (attention_processor.py:34) and what to_k_ref/to_v_ref consume.
            captured[attn1_name] = norm_hidden
        hidden = hidden + _self_attention(
            bp["attn1"], norm_hidden, cfg.attention_num_heads, attn1_name, cond
        )
        hidden = hidden + _cross_attention(
            bp["attn2"], nn.layer_norm(bp["norm2"], hidden), context,
            cfg.attention_num_heads, attn2_name, cond,
        )
        ff_in = nn.layer_norm(bp["norm3"], hidden)
        hidden = hidden + nn.linear(bp["ff"]["out"], nn.geglu(bp["ff"]["proj"], ff_in))

    hidden = nn.linear(p["proj_out"], hidden)
    return hidden.reshape(b, h, w, c) + residual


def apply(
    params: Params,
    cfg: UNetConfig,
    sample: jnp.ndarray,  # (B, H, W, C_in) NHWC latents
    timesteps: jnp.ndarray,  # scalar or (B,)
    encoder_hidden_states: jnp.ndarray,  # (B, L, D_ctx)
    cond: Optional[Conditioning] = None,
    *,
    capture: bool = False,
    down_only: bool = False,
    conv_in_extra: Optional[jnp.ndarray] = None,
    remat: bool = False,
    remat_policy: Optional[str] = None,
):
    """Run the UNet. Returns eps prediction (B,H,W,C_out); with capture=True
    returns (eps, {attn1_layer_name: hidden}); with down_only=True returns
    (skip_activations, mid_hidden, temb) for the ControlNet trunk."""
    cond = cond if cond is not None else Conditioning()
    b = sample.shape[0]
    ts = jnp.broadcast_to(jnp.asarray(timesteps), (b,))

    t_emb = nn.timestep_embedding(
        ts, cfg.block_out_channels[0],
        flip_sin_to_cos=cfg.flip_sin_to_cos, freq_shift=cfg.freq_shift,
    )
    temb = nn.linear(params["time_embedding"]["linear_1"], t_emb.astype(sample.dtype))
    temb = nn.linear(params["time_embedding"]["linear_2"], nn.silu(temb))

    captured: Optional[Dict[str, jnp.ndarray]] = {} if capture else None
    context = encoder_hidden_states.astype(sample.dtype)

    # Block-level rematerialization for training: residual/transformer block
    # activations are recomputed in the backward pass instead of living
    # across the whole forward (jax.checkpoint — the HBM-for-FLOPs trade,
    # needed to fit batched 512x640 training on one chip). Capture mode is
    # incompatible (the captured dict is a side output). `remat_policy`
    # selects SELECTIVE remat (resolve_remat_policy): full block remat is
    # bandwidth-bound at ~24% MFU (the whole forward re-runs in backward);
    # the "heavy" policy saves matmul/attention/conv1 outputs so the
    # recompute contains only GroupNorm/LayerNorm/elementwise chains.
    if remat and not capture:
        ckpt_kwargs = {}
        policy = resolve_remat_policy(remat_policy)
        if policy is not None:
            ckpt_kwargs["policy"] = policy
        resnet_fn = jax.checkpoint(_resnet, static_argnums=(3,), **ckpt_kwargs)
        transformer_fn = jax.checkpoint(
            lambda p, x, ctx, c, name, cnd: _transformer2d(
                p, x, ctx, c, name, cnd, None
            ),
            static_argnums=(3, 4),
            **ckpt_kwargs,
        )
    else:
        resnet_fn = _resnet
        transformer_fn = lambda p, x, ctx, c, name, cnd: _transformer2d(  # noqa: E731
            p, x, ctx, c, name, cnd, captured
        )

    h = nn.conv2d(params["conv_in"], sample, padding=1)
    if conv_in_extra is not None:
        # ControlNet conditioning embedding joins the trunk here.
        h = h + conv_in_extra.astype(h.dtype)
    skips = [h]

    for i, block in enumerate(params["down_blocks"]):
        has_attn = cfg.down_block_has_attn[i]
        for j, rp in enumerate(block["resnets"]):
            h = resnet_fn(rp, h, temb, cfg)
            if has_attn:
                h = transformer_fn(
                    block["attentions"][j], h, context, cfg,
                    f"down_blocks.{i}.attentions.{j}", cond,
                )
            skips.append(h)
        if "downsamplers" in block:
            h = nn.conv2d(block["downsamplers"][0]["conv"], h, stride=2, padding=1)
            skips.append(h)

    mid = params["mid_block"]
    h = resnet_fn(mid["resnets"][0], h, temb, cfg)
    h = transformer_fn(
        mid["attentions"][0], h, context, cfg, "mid_block.attentions.0", cond
    )
    h = resnet_fn(mid["resnets"][1], h, temb, cfg)

    if down_only:
        return skips, h, temb

    # ControlNet residual injection (reference adds these inside diffusers'
    # UNet forward; see dressing pipelines' down/mid residual plumbing).
    if cond.down_block_residuals is not None:
        skips = [s + r.astype(s.dtype) for s, r in zip(skips, cond.down_block_residuals)]
    if cond.mid_block_residual is not None:
        h = h + cond.mid_block_residual.astype(h.dtype)

    for i, block in enumerate(params["up_blocks"]):
        has_attn = cfg.up_block_has_attn[i]
        for j, rp in enumerate(block["resnets"]):
            skip = skips.pop()
            h = jnp.concatenate([h, skip], axis=-1)
            h = resnet_fn(rp, h, temb, cfg)
            if has_attn:
                h = transformer_fn(
                    block["attentions"][j], h, context, cfg,
                    f"up_blocks.{i}.attentions.{j}", cond,
                )
        if "upsamplers" in block:
            # fused subpixel conv == upsample_nearest_2x + conv3x3 (2.25x
            # fewer MXU FLOPs; the 4x-sized intermediate never hits HBM)
            h = nn.upsample2x_conv(block["upsamplers"][0]["conv"], h)

    h = group_norm_act(params["conv_norm_out"], h,
                       num_groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                       act="silu")
    h = nn.conv2d(params["conv_out"], h, padding=1)

    if capture:
        return h, captured
    return h


# ---------------------------------------------------------------------------
# Garment ("reference") K/V precompute — the hoisted CacheAttnProcessor path.
# ---------------------------------------------------------------------------


def init_ref_adapters(rng, cfg: UNetConfig) -> Params:
    """Trainable to_k_ref/to_v_ref per self-attn layer (reference
    RefSAttnProcessor2_0.__init__, attention_processor.py:518-529; init'd
    from the base UNet's to_k/to_v at train.py:339-359 — conversion handles
    that; random init here for tests/training-from-scratch)."""
    dims = attn_layer_dims(cfg)
    out = {}
    for name in attn_layer_names(cfg, "attn1"):
        rng, k1, k2 = jax.random.split(rng, 3)
        d = dims[name]
        out[name] = {
            "to_k_ref": nn.param_init_linear(k1, d, d, bias=False),
            "to_v_ref": nn.param_init_linear(k2, d, d, bias=False),
        }
    return out


def init_ref_adapters_from_unet(unet_params: Params, cfg: UNetConfig) -> Params:
    """Initialize adapters from the UNet's own to_k/to_v — exactly the
    training init of the reference (train.py:339-359)."""
    out = {}
    for name in attn_layer_names(cfg, "attn1"):
        parts = name.split(".")
        if parts[0] == "mid_block":
            tp = unet_params["mid_block"]["attentions"][0]
        else:
            blocks = unet_params[parts[0]]
            tp = blocks[int(parts[1])]["attentions"][int(parts[3])]
        attn1 = tp["transformer_blocks"][0]["attn1"]
        # Materialize copies: the adapters are TRAINED while the UNet stays
        # frozen, and sharing buffers would alias donated/non-donated args in
        # the jitted train step.
        out[name] = {
            "to_k_ref": {"kernel": jnp.array(attn1["to_k"]["kernel"])},
            "to_v_ref": {"kernel": jnp.array(attn1["to_v"]["kernel"])},
        }
    return out


def precompute_ref_kv(
    adapter_params: Params,
    captured: Dict[str, jnp.ndarray],
) -> Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Project captured garment hidden states to per-layer K/V once.

    The reference recomputes these two matmuls inside every sampling step
    (attention_processor.py:598-599); they depend only on the garment image.
    """
    out = {}
    for name, hidden in captured.items():
        ap = adapter_params[name]
        out[name] = (
            nn.linear(ap["to_k_ref"], hidden),
            nn.linear(ap["to_v_ref"], hidden),
        )
    return out


def precompute_ip_kv(
    ip_adapter_params: Params,
    ip_tokens: jnp.ndarray,  # (B, num_tokens, D_ctx)
    cfg: UNetConfig,
) -> Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Per-cross-attn-layer IP K/V (reference to_k_ip/to_v_ip)."""
    out = {}
    for name in attn_layer_names(cfg, "attn2"):
        ap = ip_adapter_params[name]
        out[name] = (
            nn.linear(ap["to_k_ip"], ip_tokens),
            nn.linear(ap["to_v_ip"], ip_tokens),
        )
    return out


def precompute_cross_kv(
    unet_params: Params,
    cfg: UNetConfig,
    encoder_hidden_states: jnp.ndarray,  # (B, L, D_ctx)
) -> Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Text K/V per cross-attn layer — constant across the sampling scan."""
    out = {}
    for name in attn_layer_names(cfg, "attn2"):
        parts = name.split(".")
        if parts[0] == "mid_block":
            tp = unet_params["mid_block"]["attentions"][0]
        else:
            tp = unet_params[parts[0]][int(parts[1])]["attentions"][int(parts[3])]
        attn2 = tp["transformer_blocks"][0]["attn2"]
        out[name] = (
            nn.linear(attn2["to_k"], encoder_hidden_states),
            nn.linear(attn2["to_v"], encoder_hidden_states),
        )
    return out


def init_ip_adapters(rng, cfg: UNetConfig) -> Params:
    dims = attn_layer_dims(cfg)
    out = {}
    for name in attn_layer_names(cfg, "attn2"):
        rng, k1, k2 = jax.random.split(rng, 3)
        d = dims[name]
        out[name] = {
            "to_k_ip": nn.param_init_linear(k1, cfg.cross_attention_dim, d, bias=False),
            "to_v_ip": nn.param_init_linear(k2, cfg.cross_attention_dim, d, bias=False),
        }
    return out
