"""End-to-end pipeline tests (tiny configs, CPU): determinism, conditioning
liveness, preset coverage, tokenizer + data pipeline."""

import dataclasses
import json

import jax
import numpy as np
import pytest

from imagdressing_tpu.core.config import PRESETS
from imagdressing_tpu.pipelines.dressing import DressingModels, DressingPipeline


@pytest.fixture(scope="module")
def small_models():
    return DressingModels.init_random(
        jax.random.PRNGKey(0), small=True, with_controlnet=True, with_ipa=True
    )


@pytest.fixture(scope="module")
def basic_pipe(small_models):
    preset = dataclasses.replace(
        PRESETS["basic"], height=64, width=64, num_inference_steps=3
    )
    return DressingPipeline(small_models, preset)


def _inputs(b=1):
    rng = np.random.default_rng(0)
    return dict(
        prompt_ids=rng.integers(0, 255, (b, 77)),
        negative_prompt_ids=rng.integers(0, 255, (b, 77)),
        ref_image=rng.standard_normal((b, 64, 64, 3)).astype(np.float32).clip(-1, 1),
        ref_clip_image=rng.standard_normal((b, 56, 56, 3)).astype(np.float32),
    )


def test_basic_deterministic_and_conditioned(basic_pipe):
    kw = _inputs()
    a = basic_pipe(**kw, seed=7)
    b = basic_pipe(**kw, seed=7)
    c = basic_pipe(**kw, seed=8)
    assert a.shape == (1, 64, 64, 3)
    assert a.min() >= 0.0 and a.max() <= 1.0
    np.testing.assert_array_equal(a, b)  # bitwise deterministic
    assert np.abs(a - c).max() > 1e-3  # seed matters
    # garment-attention scale is live
    d0 = basic_pipe(**kw, seed=7, image_scale=0.0)
    d2 = basic_pipe(**kw, seed=7, image_scale=2.0)
    assert np.abs(d0 - d2).max() > 1e-3


def test_batched_generation(basic_pipe):
    """Device batching (the *_folder.py replacement): batch-2 output rows
    must match two independent batch-1 runs given identical latents."""
    rng = np.random.default_rng(5)
    kw = _inputs(b=2)
    lat = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    out2 = basic_pipe(**kw, latents=lat)
    assert out2.shape == (2, 64, 64, 3)
    one = {k: v[:1] for k, v in kw.items()}
    out1 = basic_pipe(**one, latents=lat[:1])
    np.testing.assert_allclose(out2[0], out1[0], atol=2e-3)


def test_ipa_pose_preset(small_models):
    preset = dataclasses.replace(
        PRESETS["ipa_pose"], height=64, width=64, num_inference_steps=2
    )
    pipe = DressingPipeline(small_models, preset)
    rng = np.random.default_rng(1)
    out = pipe(
        **_inputs(),
        pose_image=rng.random((1, 64, 64, 3)).astype(np.float32),
        faceid_embeds=rng.standard_normal((1, 16)).astype(np.float32),
        face_clip_image=rng.standard_normal((1, 56, 56, 3)).astype(np.float32),
    )
    assert out.shape == (1, 64, 64, 3)


def test_inpaint_preset_preserves_unmasked(small_models):
    preset = dataclasses.replace(
        PRESETS["inpaint"], height=64, width=64, num_inference_steps=3,
        strength=0.99,
    )
    pipe = DressingPipeline(small_models, preset)
    rng = np.random.default_rng(2)
    person = rng.standard_normal((1, 64, 64, 3)).astype(np.float32).clip(-1, 1)
    mask = np.zeros((1, 64, 64, 1), np.float32)
    mask[:, :32] = 1.0  # inpaint top half only
    out = pipe(
        **_inputs(),
        pose_image=rng.random((1, 64, 64, 3)).astype(np.float32),
        person_image=person,
        mask_image=mask,
    )
    assert out.shape == (1, 64, 64, 3)
    # the unmasked bottom half must track the person's VAE roundtrip, not the
    # garment/noise: correlate out vs decode(encode(person)) on that region
    import jax.numpy as jnp
    from imagdressing_tpu.models import vae as vae_lib

    m = small_models
    lat = vae_lib.encode_mean(m.params["vae"], m.vae_cfg, jnp.asarray(person))
    recon = np.asarray(vae_lib.decode(m.params["vae"], m.vae_cfg, lat))
    recon01 = np.clip(recon * 0.5 + 0.5, 0, 1)
    err_unmasked = np.abs(out[0, 40:] - recon01[0, 40:]).mean()
    err_masked = np.abs(out[0, :24] - recon01[0, :24]).mean()
    assert err_unmasked < err_masked


@pytest.mark.parametrize("sampler", ["dpm2m", "unipc"])
def test_inpaint_multistep_samplers(small_models, sampler):
    """Inpaint presets must honor dpm2m/unipc (round 1 silently fell back to
    DDIM): same mask-preservation property as DDIM, different trajectory."""
    def build(s):
        preset = dataclasses.replace(
            PRESETS["inpaint"], height=64, width=64, num_inference_steps=4,
            strength=0.75, sampler=s,
        )
        return DressingPipeline(small_models, preset)

    rng = np.random.default_rng(3)
    person = rng.standard_normal((1, 64, 64, 3)).astype(np.float32).clip(-1, 1)
    mask = np.zeros((1, 64, 64, 1), np.float32)
    mask[:, :32] = 1.0
    kw = dict(
        **_inputs(),
        pose_image=rng.random((1, 64, 64, 3)).astype(np.float32),
        person_image=person,
        mask_image=mask,
    )
    out = build(sampler)(**kw)
    out_ddim = build("ddim")(**kw)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(out).all()
    # not a silent DDIM fallback: masked region follows a different trajectory
    assert np.abs(out[0, :24] - out_ddim[0, :24]).max() > 1e-4

    import jax.numpy as jnp
    from imagdressing_tpu.models import vae as vae_lib

    m = small_models
    lat = vae_lib.encode_mean(m.params["vae"], m.vae_cfg, jnp.asarray(person))
    recon = np.asarray(vae_lib.decode(m.params["vae"], m.vae_cfg, lat))
    recon01 = np.clip(recon * 0.5 + 0.5, 0, 1)
    err_unmasked = np.abs(out[0, 40:] - recon01[0, 40:]).mean()
    err_masked = np.abs(out[0, :24] - recon01[0, :24]).mean()
    assert err_unmasked < err_masked


def test_unknown_sampler_raises(small_models):
    preset = dataclasses.replace(PRESETS["basic"], sampler="euler")
    with pytest.raises(ValueError, match="unknown sampler"):
        DressingPipeline(small_models, preset)


def test_tokenizer_hash_fallback():
    from imagdressing_tpu.apps.tokenizer import HashTokenizer, load_tokenizer

    tok = load_tokenizer("/nonexistent")
    assert isinstance(tok, HashTokenizer)
    ids = tok("a beautiful woman")
    assert ids.shape == (77,) and ids.dtype == np.int32
    np.testing.assert_array_equal(ids, tok("a beautiful woman"))
    assert not np.array_equal(ids, tok("something else"))


def test_clip_bpe_tokenizer(tmp_path):
    """Tiny vocab: check BOS/EOS framing, padding, merges."""
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for i, tok in enumerate(["l", "o", "w", "lo", "low", "e", "r", "er",
                             "lower</w>", "low</w>", "er</w>", "o</w>",
                             "w</w>", "l</w>", "e</w>", "r</w>"]):
        vocab[tok] = i + 2
    merges = "#version: 0.2\nl o\nlo w\ne r</w>\nlow er</w>\n"
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(merges)
    from imagdressing_tpu.apps.tokenizer import CLIPTokenizer

    tok = CLIPTokenizer.from_dir(str(tmp_path))
    ids = tok("lower")
    assert ids[0] == 0  # BOS
    assert ids[1] == vocab["lower</w>"]
    assert ids[2] == 1  # EOS
    assert (ids[3:] == 1).all()  # EOS padding


def test_igpair_dataset(tmp_path):
    from PIL import Image

    from imagdressing_tpu.apps.tokenizer import HashTokenizer
    from imagdressing_tpu.train.data import IGPairDataset, data_iterator

    rng = np.random.default_rng(0)
    for name in ("person.jpg", "cloth.jpg"):
        Image.fromarray(
            rng.integers(0, 255, (600, 480, 3), dtype=np.uint8)
        ).save(tmp_path / name)
    manifest = [
        {
            "image_file": str(tmp_path / "person.jpg"),
            "cloth_file": str(tmp_path / "cloth.jpg"),
            "text": ["a red dress", "red dress photo"],
        }
    ] * 4
    ds = IGPairDataset(manifest, HashTokenizer(), crop_h=128, crop_w=96,
                       size=128)
    sample = ds.get(0)
    assert sample["person_image"].shape == (128, 96, 3)
    assert sample["cloth_clip"].shape == (224, 224, 3)
    assert sample["text_ids"].shape == (77,)
    assert -1.0 <= sample["person_image"].min() <= sample["person_image"].max() <= 1.0
    # deterministic per (seed, epoch, idx)
    np.testing.assert_array_equal(
        ds.get(1, epoch=3)["person_image"], ds.get(1, epoch=3)["person_image"]
    )

    it = data_iterator(ds, batch_size=2, num_workers=2, seed=0)
    batch = next(it)
    assert batch["person_image"].shape == (2, 128, 96, 3)
    assert batch["text_ids"].shape == (2, 77)


def test_shard_epoch_indices_equal_batches_per_rank():
    """Every rank yields the SAME number of batches per epoch even when
    len(dataset) % process_count crosses a batch boundary (ADVICE r2:
    N=13, pc=4, bs=1 used to give 4/3/3/3 and drift ranks across epochs)."""
    from imagdressing_tpu.train.data import shard_epoch_indices

    for n, pc, bs in [(13, 4, 1), (13, 4, 2), (7, 3, 4), (2, 4, 1),
                      (16, 4, 2), (5, 8, 3)]:
        order = np.arange(n)
        shards = [shard_epoch_indices(order, r, pc, bs) for r in range(pc)]
        lens = {len(s) for s in shards}
        assert len(lens) == 1, (n, pc, bs, [len(s) for s in shards])
        (length,) = lens
        assert length % bs == 0
        # full-epoch coverage: every index appears on exactly one rank
        own = np.concatenate(
            [np.unique(s) for s in shards]
        )
        assert set(own) == set(range(n)) if n >= pc else set(own) <= set(
            range(n)
        )
        # wrap-padding only repeats a rank's own indices
        for r, s in enumerate(shards):
            base = set(order[r::pc]) or {order[0]}
            assert set(s) <= base


def test_cfg_dropout_statistics(tmp_path):
    from PIL import Image

    from imagdressing_tpu.apps.tokenizer import HashTokenizer
    from imagdressing_tpu.train.data import IGPairDataset

    rng = np.random.default_rng(1)
    for name in ("p.jpg", "c.jpg"):
        Image.fromarray(
            rng.integers(0, 255, (256, 200, 3), dtype=np.uint8)
        ).save(tmp_path / name)
    manifest = [
        {"image_file": str(tmp_path / "p.jpg"),
         "cloth_file": str(tmp_path / "c.jpg"), "text": ["x"]}
    ] * 400
    tok = HashTokenizer()
    ds = IGPairDataset(manifest, tok, crop_h=64, crop_w=48, size=64)
    null_ids = tok("")
    n_img_drop = n_txt_drop = 0
    for i in range(400):
        s = ds.get(i)
        if (s["cloth_clip"] == 0).all():
            n_img_drop += 1
        if (s["text_ids"] == null_ids).all():
            n_txt_drop += 1
    # ~5% image-only + ~5% both = ~10% zeroed clip; ~5%+5% = ~10% empty text
    assert 15 <= n_img_drop <= 70
    assert 15 <= n_txt_drop <= 70


def test_output_uint8_matches_float(basic_pipe):
    kw = _inputs()
    f = basic_pipe(**kw, seed=3)
    u = basic_pipe(**kw, seed=3, output_uint8=True)
    assert u.dtype == np.uint8
    np.testing.assert_array_equal(u, np.round(f * 255.0).astype(np.uint8))


def test_controlnet_guidance_window(small_models):
    """diffusers controlnet_keep windowing (reference
    ..._controlnet.py:384-401,518-525): step i keeps residuals iff
    start <= i/N and (i+1)/N <= end. All windows share one compiled program
    (the bounds are traced scalars)."""
    preset = dataclasses.replace(
        PRESETS["pose"], height=64, width=64, num_inference_steps=4
    )
    # a freshly-initialized ControlNet emits exactly-zero residuals (its
    # output convs are zero-init per the ControlNet paper) — perturb its
    # params so the residual path is observable
    leaves, treedef = jax.tree.flatten(small_models.params["controlnet"])
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    params = dict(
        small_models.params,
        controlnet=jax.tree.unflatten(
            treedef,
            [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
             for l, k in zip(leaves, keys)],
        ),
    )
    models = dataclasses.replace(small_models, params=params)
    pipe = DressingPipeline(models, preset)
    rng = np.random.default_rng(2)
    kw = dict(
        _inputs(), pose_image=rng.random((1, 64, 64, 3)).astype(np.float32)
    )
    base = pipe(**kw, seed=3)
    # defaults == the explicit full window (the no-op every script ships)
    full = pipe(**kw, seed=3, control_guidance_start=0.0,
                control_guidance_end=1.0)
    np.testing.assert_array_equal(base, full)
    # window (0, 0): every step's residuals scaled to 0 == scale-0 run
    off = pipe(**kw, seed=3, control_guidance_end=0.0)
    zero = pipe(**kw, seed=3, controlnet_scale=0.0)
    np.testing.assert_allclose(off, zero, atol=1e-6)
    assert np.abs(base - off).max() > 1e-4  # ControlNet is live at all
    # half windows really gate per step (first half on != all on != all off)
    early = pipe(**kw, seed=3, control_guidance_end=0.5)
    late = pipe(**kw, seed=3, control_guidance_start=0.5)
    for windowed in (early, late):
        assert np.abs(windowed - base).max() > 1e-4
        assert np.abs(windowed - off).max() > 1e-4
    assert np.abs(early - late).max() > 1e-4


def test_ddim_eta_stochastic(basic_pipe):
    """eta > 0 injects the DDIM variance noise: deterministic under a fixed
    seed, different from eta=0, keyed by the seed (reference surfaces eta
    via prepare_extra_step_kwargs, IMAGDressing_v1_pipeline.py:102-113)."""
    kw = _inputs()
    e0 = basic_pipe(**kw, seed=7)
    e1a = basic_pipe(**kw, seed=7, eta=1.0)
    e1b = basic_pipe(**kw, seed=7, eta=1.0)
    np.testing.assert_array_equal(e1a, e1b)
    assert np.abs(e1a - e0).max() > 1e-3
    e1c = basic_pipe(**kw, seed=8, eta=1.0)
    assert np.abs(e1a - e1c).max() > 1e-3
