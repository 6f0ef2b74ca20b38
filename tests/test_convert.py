"""Checkpoint-conversion tests with synthetic torch state dicts shaped like
the real artifacts (diffusers/transformers key naming + the reference's
monolithic `"module"` checkpoint and ip-adapter bin)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from imagdressing_tpu.core.config import (  # noqa: E402
    ProjPlusConfig,
    ResamplerConfig,
    UNetConfig,
)
from imagdressing_tpu.convert import (  # noqa: E402
    adapter_module_index_map,
    convert_imagdressing_checkpoint,
    convert_ip_adapter_faceid,
    convert_resampler,
    convert_unet,
    convert_vae,
)
from imagdressing_tpu.models import unet as unet_lib  # noqa: E402
from imagdressing_tpu.models.conditioning import fold_lora  # noqa: E402
from imagdressing_tpu.ops import nn  # noqa: E402

SMALL = UNetConfig(
    block_out_channels=(16, 32, 64, 64),
    cross_attention_dim=32,
    attention_num_heads=4,
    norm_num_groups=8,
)


def _torch_unet_sd(cfg: UNetConfig, seed=0):
    """Synthetic diffusers-style UNet state dict with correct shapes/names."""
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def add_conv(name, i, o, k=3):
        sd[f"{name}.weight"] = torch.randn(o, i, k, k, generator=g) * 0.05
        sd[f"{name}.bias"] = torch.randn(o, generator=g) * 0.05

    def add_lin(name, i, o, bias=True):
        sd[f"{name}.weight"] = torch.randn(o, i, generator=g) * 0.05
        if bias:
            sd[f"{name}.bias"] = torch.randn(o, generator=g) * 0.05

    def add_norm(name, c):
        sd[f"{name}.weight"] = torch.randn(c, generator=g) * 0.05 + 1
        sd[f"{name}.bias"] = torch.randn(c, generator=g) * 0.05

    def add_resnet(pre, i, o, temb):
        add_norm(f"{pre}.norm1", i)
        add_conv(f"{pre}.conv1", i, o)
        add_lin(f"{pre}.time_emb_proj", temb, o)
        add_norm(f"{pre}.norm2", o)
        add_conv(f"{pre}.conv2", o, o)
        if i != o:
            add_conv(f"{pre}.conv_shortcut", i, o, k=1)

    def add_attn(pre, dim, ctx):
        add_lin(f"{pre}.to_q", dim, dim, bias=False)
        add_lin(f"{pre}.to_k", ctx or dim, dim, bias=False)
        add_lin(f"{pre}.to_v", ctx or dim, dim, bias=False)
        add_lin(f"{pre}.to_out.0", dim, dim)

    def add_tblock(pre, dim, ctx):
        add_norm(f"{pre}.norm1", dim)
        add_attn(f"{pre}.attn1", dim, None)
        add_norm(f"{pre}.norm2", dim)
        add_attn(f"{pre}.attn2", dim, ctx)
        add_norm(f"{pre}.norm3", dim)
        add_lin(f"{pre}.ff.net.0.proj", dim, dim * 8)
        add_lin(f"{pre}.ff.net.2", dim * 4, dim)

    def add_t2d(pre, dim, ctx):
        add_norm(f"{pre}.norm", dim)
        sd[f"{pre}.proj_in.weight"] = torch.randn(dim, dim, 1, 1, generator=g) * 0.05
        sd[f"{pre}.proj_in.bias"] = torch.randn(dim, generator=g) * 0.05
        add_tblock(f"{pre}.transformer_blocks.0", dim, ctx)
        sd[f"{pre}.proj_out.weight"] = torch.randn(dim, dim, 1, 1, generator=g) * 0.05
        sd[f"{pre}.proj_out.bias"] = torch.randn(dim, generator=g) * 0.05

    chs = cfg.block_out_channels
    temb = cfg.time_embed_dim
    ctx = cfg.cross_attention_dim
    add_conv("conv_in", cfg.in_channels, chs[0])
    add_lin("time_embedding.linear_1", chs[0], temb)
    add_lin("time_embedding.linear_2", temb, temb)
    out_ch = chs[0]
    for i, ch in enumerate(chs):
        in_ch, out_ch = out_ch, ch
        for j in range(cfg.layers_per_block):
            add_resnet(f"down_blocks.{i}.resnets.{j}", in_ch if j == 0 else out_ch,
                       out_ch, temb)
            if cfg.down_block_has_attn[i]:
                add_t2d(f"down_blocks.{i}.attentions.{j}", out_ch, ctx)
        if i != len(chs) - 1:
            add_conv(f"down_blocks.{i}.downsamplers.0.conv", out_ch, out_ch)
    add_resnet("mid_block.resnets.0", chs[-1], chs[-1], temb)
    add_t2d("mid_block.attentions.0", chs[-1], ctx)
    add_resnet("mid_block.resnets.1", chs[-1], chs[-1], temb)
    rev = list(reversed(chs))
    out_ch = rev[0]
    for i, ch in enumerate(rev):
        prev, out_ch = out_ch, ch
        in_ch = rev[min(i + 1, len(chs) - 1)]
        for j in range(cfg.layers_per_block + 1):
            skip = in_ch if j == cfg.layers_per_block else out_ch
            add_resnet(f"up_blocks.{i}.resnets.{j}",
                       (prev if j == 0 else out_ch) + skip, out_ch, temb)
            if cfg.up_block_has_attn[i]:
                add_t2d(f"up_blocks.{i}.attentions.{j}", out_ch, ctx)
        if i != len(chs) - 1:
            add_conv(f"up_blocks.{i}.upsamplers.0.conv", out_ch, out_ch)
    add_norm("conv_norm_out", chs[0])
    add_conv("conv_out", chs[0], cfg.out_channels)
    return sd


def test_convert_unet_runs_and_linear_semantics():
    sd = _torch_unet_sd(SMALL)
    params = convert_unet(sd, SMALL)
    # structure usable by the forward pass
    out = unet_lib.apply(
        params, SMALL, jnp.zeros((1, 16, 16, 4)), jnp.array([3]),
        jnp.zeros((1, 77, 32)),
    )
    assert out.shape == (1, 16, 16, 4)
    # torch Linear y = x W^T + b  <->  ours y = x kernel + b
    w = sd["time_embedding.linear_1.weight"].numpy()
    x = np.random.default_rng(0).standard_normal((2, w.shape[1])).astype(np.float32)
    got = nn.linear(params["time_embedding"]["linear_1"], jnp.asarray(x))
    want = x @ w.T + sd["time_embedding.linear_1.bias"].numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_adapter_index_map_interleaving():
    m = dict(adapter_module_index_map(UNetConfig()))
    # 32 processors: even = attn1 (RefS), odd = attn2 (CAttn)
    assert len(m) == 32
    assert m[0] == "down_blocks.0.attentions.0.transformer_blocks.0.attn1.processor"
    assert m[1] == "down_blocks.0.attentions.0.transformer_blocks.0.attn2.processor"
    assert m[30] == "mid_block.attentions.0.transformer_blocks.0.attn1.processor"
    assert m[31] == "mid_block.attentions.0.transformer_blocks.0.attn2.processor"
    # up blocks come before mid (diffusers registration order)
    assert "up_blocks" in m[12]


def test_convert_imagdressing_checkpoint_split():
    cfg = SMALL
    rcfg = ResamplerConfig(dim=32, depth=1, dim_head=8, heads=4, num_queries=8,
                           embedding_dim=48, output_dim=32)
    g = torch.Generator().manual_seed(1)
    module_sd = {}
    for k, v in _torch_unet_sd(cfg, seed=2).items():
        module_sd[f"ref_unet.{k}"] = v
        module_sd[f"unet.{k}"] = v  # present but must be ignored by default
    # resampler (reference naming)
    module_sd["proj.latents"] = torch.randn(1, 8, 32, generator=g)
    module_sd["proj.proj_in.weight"] = torch.randn(32, 48, generator=g)
    module_sd["proj.proj_in.bias"] = torch.randn(32, generator=g)
    module_sd["proj.proj_out.weight"] = torch.randn(32, 32, generator=g)
    module_sd["proj.proj_out.bias"] = torch.randn(32, generator=g)
    module_sd["proj.norm_out.weight"] = torch.randn(32, generator=g)
    module_sd["proj.norm_out.bias"] = torch.randn(32, generator=g)
    for part in ("0.0.norm1", "0.0.norm2"):
        module_sd[f"proj.layers.{part}.weight"] = torch.randn(32, generator=g)
        module_sd[f"proj.layers.{part}.bias"] = torch.randn(32, generator=g)
    module_sd["proj.layers.0.0.to_q.weight"] = torch.randn(32, 32, generator=g)
    module_sd["proj.layers.0.0.to_kv.weight"] = torch.randn(64, 32, generator=g)
    module_sd["proj.layers.0.0.to_out.weight"] = torch.randn(32, 32, generator=g)
    module_sd["proj.layers.0.1.0.weight"] = torch.randn(32, generator=g)
    module_sd["proj.layers.0.1.0.bias"] = torch.randn(32, generator=g)
    module_sd["proj.layers.0.1.1.weight"] = torch.randn(128, 32, generator=g)
    module_sd["proj.layers.0.1.3.weight"] = torch.randn(32, 128, generator=g)
    # adapters at even indices only (RefS)
    dims = unet_lib.attn_layer_dims(cfg)
    for idx, name in adapter_module_index_map(cfg):
        if ".attn1." in name:
            d = dims[name]
            module_sd[f"adapter_modules.{idx}.to_k_ref.weight"] = torch.randn(
                d, d, generator=g
            )
            module_sd[f"adapter_modules.{idx}.to_v_ref.weight"] = torch.randn(
                d, d, generator=g
            )

    out = convert_imagdressing_checkpoint(module_sd, cfg, rcfg)
    assert "unet" not in out  # quirk parity: unet_dict never loaded
    assert set(out["ref_adapters"].keys()) == set(
        unet_lib.attn_layer_names(cfg, "attn1")
    )
    # adapters consumable by precompute_ref_kv
    name = unet_lib.attn_layer_names(cfg, "attn1")[0]
    hidden = jnp.zeros((1, 10, dims[name]))
    kv = unet_lib.precompute_ref_kv(out["ref_adapters"], {name: hidden})
    assert kv[name][0].shape == (1, 10, dims[name])
    # resampler tree usable
    from imagdressing_tpu.models import resampler as rl

    tokens = rl.apply(out["resampler"], rcfg, jnp.zeros((1, 5, 48)))
    assert tokens.shape == (1, 8, 32)


def test_ip_adapter_conversion_and_lora_fold():
    cfg = SMALL
    dims = unet_lib.attn_layer_dims(cfg)
    g = torch.Generator().manual_seed(3)
    ip_sd = {}
    rank = 4
    for idx, name in adapter_module_index_map(cfg):
        d = dims[name]
        ctx_in = d if ".attn1." in name else cfg.cross_attention_dim
        if ".attn2." in name:
            ip_sd[f"{idx}.to_k_ip.weight"] = torch.randn(d, ctx_in, generator=g)
            ip_sd[f"{idx}.to_v_ip.weight"] = torch.randn(d, ctx_in, generator=g)
        for proj, pin in (("to_q", d), ("to_k", ctx_in), ("to_v", ctx_in),
                          ("to_out", d)):
            ip_sd[f"{idx}.{proj}_lora.down.weight"] = torch.randn(
                rank, pin, generator=g
            )
            ip_sd[f"{idx}.{proj}_lora.up.weight"] = torch.randn(
                d, rank, generator=g
            )

    # minimal image_proj (ProjPlus) dict
    pcfg = ProjPlusConfig(cross_attention_dim=32, id_embeddings_dim=16,
                          clip_embeddings_dim=48, num_tokens=4, depth=1,
                          dim_head=8)
    pp = {}
    pp["proj.0.weight"] = torch.randn(32, 16, generator=g)
    pp["proj.0.bias"] = torch.randn(32, generator=g)
    pp["proj.2.weight"] = torch.randn(128, 32, generator=g)
    pp["proj.2.bias"] = torch.randn(128, generator=g)
    pp["norm.weight"] = torch.randn(32, generator=g)
    pp["norm.bias"] = torch.randn(32, generator=g)
    pr = "perceiver_resampler"
    pp[f"{pr}.proj_in.weight"] = torch.randn(32, 48, generator=g)
    pp[f"{pr}.proj_in.bias"] = torch.randn(32, generator=g)
    pp[f"{pr}.proj_out.weight"] = torch.randn(32, 32, generator=g)
    pp[f"{pr}.proj_out.bias"] = torch.randn(32, generator=g)
    pp[f"{pr}.norm_out.weight"] = torch.randn(32, generator=g)
    pp[f"{pr}.norm_out.bias"] = torch.randn(32, generator=g)
    pp[f"{pr}.layers.0.0.norm1.weight"] = torch.randn(32, generator=g)
    pp[f"{pr}.layers.0.0.norm1.bias"] = torch.randn(32, generator=g)
    pp[f"{pr}.layers.0.0.norm2.weight"] = torch.randn(32, generator=g)
    pp[f"{pr}.layers.0.0.norm2.bias"] = torch.randn(32, generator=g)
    pp[f"{pr}.layers.0.0.to_q.weight"] = torch.randn(32, 32, generator=g)
    pp[f"{pr}.layers.0.0.to_kv.weight"] = torch.randn(64, 32, generator=g)
    pp[f"{pr}.layers.0.0.to_out.weight"] = torch.randn(32, 32, generator=g)
    pp[f"{pr}.layers.0.1.0.weight"] = torch.randn(32, generator=g)
    pp[f"{pr}.layers.0.1.0.bias"] = torch.randn(32, generator=g)
    pp[f"{pr}.layers.0.1.1.weight"] = torch.randn(128, 32, generator=g)
    pp[f"{pr}.layers.0.1.3.weight"] = torch.randn(32, 128, generator=g)

    out = convert_ip_adapter_faceid({"image_proj": pp, "ip_adapter": ip_sd},
                                    cfg, pcfg)
    a2 = unet_lib.attn_layer_names(cfg, "attn2")
    assert set(out["ip_adapters"].keys()) == set(a2)
    assert set(out["lora_attn1"].keys()) == set(unet_lib.attn_layer_names(cfg))
    assert set(out["lora_attn2"].keys()) == set(a2)

    # fold_lora == torch LoRALinearLayer semantics: y = xW^T + s*up(down(x))
    name = a2[0]
    idx = [i for i, n in adapter_module_index_map(cfg) if n == name][0]
    d = dims[name]
    base_w = torch.randn(d, cfg.cross_attention_dim, generator=g)
    attn_params = {"to_k": {"kernel": jnp.asarray(base_w.numpy().T)}}
    folded = fold_lora(attn_params, {"to_k": out["lora_attn2"][name]["to_k"]}, 0.5)
    x = np.random.default_rng(1).standard_normal(
        (3, cfg.cross_attention_dim)
    ).astype(np.float32)
    down = ip_sd[f"{idx}.to_k_lora.down.weight"].numpy()
    up = ip_sd[f"{idx}.to_k_lora.up.weight"].numpy()
    want = x @ base_w.numpy().T + 0.5 * ((x @ down.T) @ up.T)
    got = np.asarray(jnp.asarray(x) @ folded["to_k"]["kernel"])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_resampler_conversion_matches_param_count():
    rcfg = ResamplerConfig()
    # full-size param count sanity: the reference prints ~X M params for the
    # shipped config; just check the tree builds with real shapes
    g = torch.Generator().manual_seed(4)
    sd = {}
    dim, ed, od, inner = rcfg.dim, rcfg.embedding_dim, rcfg.output_dim, rcfg.dim * rcfg.ff_mult
    hd = rcfg.dim_head * rcfg.heads
    sd["latents"] = torch.randn(1, rcfg.num_queries, dim, generator=g)
    sd["proj_in.weight"] = torch.randn(dim, ed, generator=g)
    sd["proj_in.bias"] = torch.randn(dim, generator=g)
    sd["proj_out.weight"] = torch.randn(od, dim, generator=g)
    sd["proj_out.bias"] = torch.randn(od, generator=g)
    sd["norm_out.weight"] = torch.randn(od, generator=g)
    sd["norm_out.bias"] = torch.randn(od, generator=g)
    for i in range(rcfg.depth):
        sd[f"layers.{i}.0.norm1.weight"] = torch.randn(dim, generator=g)
        sd[f"layers.{i}.0.norm1.bias"] = torch.randn(dim, generator=g)
        sd[f"layers.{i}.0.norm2.weight"] = torch.randn(dim, generator=g)
        sd[f"layers.{i}.0.norm2.bias"] = torch.randn(dim, generator=g)
        sd[f"layers.{i}.0.to_q.weight"] = torch.randn(hd, dim, generator=g)
        sd[f"layers.{i}.0.to_kv.weight"] = torch.randn(hd * 2, dim, generator=g)
        sd[f"layers.{i}.0.to_out.weight"] = torch.randn(dim, hd, generator=g)
        sd[f"layers.{i}.1.0.weight"] = torch.randn(dim, generator=g)
        sd[f"layers.{i}.1.0.bias"] = torch.randn(dim, generator=g)
        sd[f"layers.{i}.1.1.weight"] = torch.randn(inner, dim, generator=g)
        sd[f"layers.{i}.1.3.weight"] = torch.randn(dim, inner, generator=g)
    params = convert_resampler(sd, rcfg)
    from imagdressing_tpu.models import resampler as rl

    out = rl.apply(params, rcfg, jnp.zeros((1, 257, ed)))
    assert out.shape == (1, rcfg.num_queries, od)


def test_convert_controlnet():
    from imagdressing_tpu.convert import convert_controlnet
    from imagdressing_tpu.core.config import ControlNetConfig
    from imagdressing_tpu.models import controlnet as cn_lib

    cn_cfg = ControlNetConfig(
        unet=SMALL, conditioning_embedding_channels=(8, 16, 24, 32)
    )
    g = torch.Generator().manual_seed(5)
    sd = _torch_unet_sd(SMALL, seed=6)
    # drop the UNet-decoder keys a controlnet doesn't have
    sd = {k: v for k, v in sd.items()
          if not (k.startswith("up_blocks") or k.startswith("conv_norm_out")
                  or k.startswith("conv_out"))}
    ch = cn_cfg.conditioning_embedding_channels
    sd["controlnet_cond_embedding.conv_in.weight"] = torch.randn(
        ch[0], 3, 3, 3, generator=g)
    sd["controlnet_cond_embedding.conv_in.bias"] = torch.randn(ch[0], generator=g)
    bi = 0
    for i in range(len(ch) - 1):
        for ci, co in ((ch[i], ch[i]), (ch[i], ch[i + 1])):
            sd[f"controlnet_cond_embedding.blocks.{bi}.weight"] = torch.randn(
                co, ci, 3, 3, generator=g)
            sd[f"controlnet_cond_embedding.blocks.{bi}.bias"] = torch.randn(
                co, generator=g)
            bi += 1
    sd["controlnet_cond_embedding.conv_out.weight"] = torch.zeros(
        SMALL.block_out_channels[0], ch[-1], 3, 3)
    sd["controlnet_cond_embedding.conv_out.bias"] = torch.zeros(
        SMALL.block_out_channels[0])
    from imagdressing_tpu.models.controlnet import _skip_channels

    for i, c in enumerate(_skip_channels(SMALL)):
        sd[f"controlnet_down_blocks.{i}.weight"] = torch.zeros(c, c, 1, 1)
        sd[f"controlnet_down_blocks.{i}.bias"] = torch.zeros(c)
    mid = SMALL.block_out_channels[-1]
    sd["controlnet_mid_block.weight"] = torch.zeros(mid, mid, 1, 1)
    sd["controlnet_mid_block.bias"] = torch.zeros(mid)

    params = convert_controlnet(sd, cn_cfg)
    down, mid_res = cn_lib.apply(
        params, cn_cfg, jnp.ones((1, 8, 8, 4)), jnp.array([3]),
        jnp.zeros((1, 77, 32)), jnp.ones((1, 64, 64, 3)),
    )
    assert len(down) == 12
    # zero output convs in the synthetic dict -> zero residuals
    np.testing.assert_allclose(np.asarray(mid_res), 0.0)


def _torch_vae_sd_from_params(params, cfg):
    """Inverse-map our VAE param tree into a diffusers-layout state dict —
    the round-trip oracle for convert_vae (AutoencoderKL key naming)."""
    sd = {}

    def put_conv(name, p):
        sd[f"{name}.weight"] = torch.tensor(
            np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1)).copy()
        )
        sd[f"{name}.bias"] = torch.tensor(np.asarray(p["bias"]).copy())

    def put_lin(name, p):
        sd[f"{name}.weight"] = torch.tensor(
            np.asarray(p["kernel"]).T.copy()
        )
        sd[f"{name}.bias"] = torch.tensor(np.asarray(p["bias"]).copy())

    def put_norm(name, p):
        sd[f"{name}.weight"] = torch.tensor(np.asarray(p["scale"]).copy())
        sd[f"{name}.bias"] = torch.tensor(np.asarray(p["bias"]).copy())

    def put_resnet(pre, p):
        put_norm(f"{pre}.norm1", p["norm1"])
        put_conv(f"{pre}.conv1", p["conv1"])
        put_norm(f"{pre}.norm2", p["norm2"])
        put_conv(f"{pre}.conv2", p["conv2"])
        if "conv_shortcut" in p:
            put_conv(f"{pre}.conv_shortcut", p["conv_shortcut"])

    def put_attn(pre, p):
        put_norm(f"{pre}.group_norm", p["group_norm"])
        for k, tgt in (("to_q", "to_q"), ("to_k", "to_k"),
                       ("to_v", "to_v"), ("to_out", "to_out.0")):
            put_lin(f"{pre}.{tgt}", p[k])

    def put_half(side, tree, blocks_key, samplers_key):
        put_conv(f"{side}.conv_in", tree["conv_in"])
        for i, block in enumerate(tree[blocks_key]):
            for j, r in enumerate(block["resnets"]):
                put_resnet(f"{side}.{blocks_key}.{i}.resnets.{j}", r)
            if samplers_key in block:
                put_conv(
                    f"{side}.{blocks_key}.{i}.{samplers_key}.0.conv",
                    block[samplers_key][0]["conv"],
                )
        put_resnet(f"{side}.mid_block.resnets.0",
                   tree["mid_block"]["resnets"][0])
        put_resnet(f"{side}.mid_block.resnets.1",
                   tree["mid_block"]["resnets"][1])
        put_attn(f"{side}.mid_block.attentions.0",
                 tree["mid_block"]["attentions"][0])
        put_norm(f"{side}.conv_norm_out", tree["conv_norm_out"])
        put_conv(f"{side}.conv_out", tree["conv_out"])

    put_half("encoder", params["encoder"], "down_blocks", "downsamplers")
    put_half("decoder", params["decoder"], "up_blocks", "upsamplers")
    put_conv("quant_conv", params["quant_conv"])
    put_conv("post_quant_conv", params["post_quant_conv"])
    return sd


def test_convert_vae_roundtrip():
    """init -> diffusers layout -> convert_vae must reproduce the tree
    exactly, and the converted params must drive encode/decode."""
    import jax

    from imagdressing_tpu.core.config import VAEConfig
    from imagdressing_tpu.models import vae as vae_lib

    cfg = VAEConfig(block_out_channels=(16, 16, 32, 32), norm_num_groups=8)
    params = vae_lib.init(jax.random.PRNGKey(0), cfg)
    sd = _torch_vae_sd_from_params(params, cfg)
    converted = convert_vae(sd, cfg)

    flat1, tree1 = jax.tree.flatten(params)
    flat2, tree2 = jax.tree.flatten(converted)
    assert tree1 == tree2
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 64, 64, 3)),
        jnp.float32,
    )
    lat = vae_lib.encode_mean(converted, cfg, x)
    img = vae_lib.decode(converted, cfg, lat)
    assert lat.shape == (1, 8, 8, 4) and img.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(img)).all()
