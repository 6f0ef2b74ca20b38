"""The train->serve artifact loop, both directions (VERDICT r2 missing #1).

Reference chain: train.py -> DeepSpeed checkpoint (train.py:179-196) ->
consolidated monolithic `.pt` {"module": {ref_unet./unet./proj./
adapter_modules.N...}} -> inference prefix-split load
(inference_IMAGdressing.py:96-117).

Here: train_cli -> orbax checkpoint -> (a) dress CLI serves it directly via
--trained_ckpt, and (b) convert.export_torch writes the reference's `.pt`
layout, which convert_imagdressing_checkpoint round-trips bit-exactly.
"""

import json

import jax
import numpy as np
import pytest
from PIL import Image

from imagdressing_tpu.convert import export_torch as ex
from imagdressing_tpu.convert import torch_sd as cv
from imagdressing_tpu.pipelines.dressing import DressingModels


def _small_models():
    return DressingModels.init_random(jax.random.PRNGKey(3), small=True)


def _tree_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    return all(
        np.array_equal(np.asarray(x, np.float32), np.asarray(y, np.float32))
        for x, y in zip(la, lb)
    )


def test_export_module_roundtrips_bit_exact():
    """export_imagdressing_module -> convert_imagdressing_checkpoint is the
    identity on {ref_unet, ref_adapters, resampler} (and the frozen unet
    under load_main_unet=True)."""
    models = _small_models()
    module = ex.export_imagdressing_module(
        models.params, models.unet_cfg, models.resampler_cfg
    )
    # reference layout facts: prefixes + interleaved adapter indices
    assert any(k.startswith("ref_unet.") for k in module)
    assert any(k.startswith("unet.") for k in module)
    assert any(k.startswith("proj.") for k in module)
    idx_map = cv.adapter_module_index_map(models.unet_cfg)
    even = [i for i, name in idx_map if ".attn1." in name]
    assert f"adapter_modules.{even[0]}.to_k_ref.weight" in module
    # odd (CAttn) indices are paramless in the reference ModuleList
    odd = [i for i, name in idx_map if ".attn2." in name]
    assert not any(k.startswith(f"adapter_modules.{odd[0]}.") for k in module)

    back = cv.convert_imagdressing_checkpoint(
        module, models.unet_cfg, models.resampler_cfg, load_main_unet=True
    )
    assert _tree_equal(back["ref_unet"], models.params["ref_unet"])
    assert _tree_equal(back["unet"], models.params["unet"])
    assert _tree_equal(back["resampler"], models.params["resampler"])
    assert set(back["ref_adapters"]) == set(models.params["ref_adapters"])
    assert _tree_equal(back["ref_adapters"], models.params["ref_adapters"])


def test_export_saves_reference_loadable_pt(tmp_path):
    """save_checkpoint writes a `.pt` that load_torch_file -> ["module"] ->
    convert_imagdressing_checkpoint consumes — i.e. the exact artifact the
    reference stack expects."""
    pytest.importorskip("torch")
    models = _small_models()
    module = ex.export_imagdressing_module(
        models.params, models.unet_cfg, models.resampler_cfg
    )
    path = str(tmp_path / "IMAGDressing-export.pt")
    ex.save_checkpoint(path, module)
    loaded = cv.load_torch_file(path)
    assert set(loaded) == {"module"}
    back = cv.convert_imagdressing_checkpoint(
        loaded["module"], models.unet_cfg, models.resampler_cfg
    )
    assert _tree_equal(back["ref_unet"], models.params["ref_unet"])
    assert _tree_equal(back["resampler"], models.params["resampler"])


@pytest.fixture()
def stubbed(monkeypatch):
    import imagdressing_tpu.apps.loader as loader_mod
    import imagdressing_tpu.apps.tokenizer as tok_mod
    from imagdressing_tpu.apps.tokenizer import HashTokenizer

    models = DressingModels.init_random(jax.random.PRNGKey(0), small=True)
    monkeypatch.setattr(loader_mod, "load_dressing_models",
                        lambda **kwargs: models)
    monkeypatch.setattr(tok_mod, "load_tokenizer",
                        lambda path, max_length=77: HashTokenizer())
    return models


def _train_two_steps(tmp_path, out):
    import imagdressing_tpu.apps.train_cli as train_cli

    rng = np.random.default_rng(0)
    items = []
    for i in range(4):
        for kind in ("person", "cloth"):
            Image.fromarray(
                rng.integers(0, 255, (96, 80, 3), dtype=np.uint8)
            ).save(tmp_path / f"{kind}{i}.jpg")
        items.append({
            "image_file": f"person{i}.jpg",
            "cloth_file": f"cloth{i}.jpg",
            "text": ["a red dress"],
        })
    mf = tmp_path / "manifest.json"
    mf.write_text(json.dumps(items))
    train_cli.main([
        "--data_json_file", str(mf),
        "--data_root_path", str(tmp_path),
        "--output_dir", str(out),
        "--train_batch_size", "1",
        "--num_train_steps", "2",
        "--checkpointing_steps", "2",
        "--logging_steps", "1",
        "--lr_warmup_steps", "1",
        "--resize_shorter", "64",
        "--crop_height", "64", "--crop_width", "64",
        "--dataloader_num_workers", "1",
    ])
    return out / "checkpoints"


def test_train_checkpoint_then_dress_cli(stubbed, tmp_path):
    """2 train steps -> orbax checkpoint -> dress --trained_ckpt generates:
    the loop a reference user gets from train.py -> inference script."""
    import imagdressing_tpu.apps.dress as dress
    from imagdressing_tpu.apps.loader import merge_trained_checkpoint

    ckpt_dir = _train_two_steps(tmp_path, tmp_path / "run")

    # the overlay really changes the trainables (the optimizer moved them)
    merged = merge_trained_checkpoint(stubbed, str(ckpt_dir))
    base_leaf = np.asarray(
        jax.tree.leaves(stubbed.params["ref_unet"])[0], np.float32
    )
    new_leaf = np.asarray(
        jax.tree.leaves(merged.params["ref_unet"])[0], np.float32
    )
    assert not np.array_equal(base_leaf, new_leaf)
    # frozen graphs keep base weights
    assert _tree_equal(merged.params["vae"], stubbed.params["vae"])

    cloth = tmp_path / "shirt.jpg"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (600, 460, 3),
                                          dtype=np.uint8)
    ).save(cloth)
    out_dir = tmp_path / "served"
    dress.main([
        "--preset", "basic",
        "--cloth_path", str(cloth),
        "--trained_ckpt", str(ckpt_dir),
        "--output_path", str(out_dir),
        "--height", "64", "--width", "64",
        "--num_inference_steps", "2",
    ])
    assert Image.open(out_dir / "shirt.jpg").size == (128, 64)


def test_orbax_to_reference_pt_chain(stubbed, tmp_path):
    """Full outbound chain: orbax checkpoint -> restore_trained_params ->
    export -> `.pt` -> convert round-trip equals the restored params."""
    pytest.importorskip("torch")
    from imagdressing_tpu.apps.loader import restore_trained_params

    ckpt_dir = _train_two_steps(tmp_path, tmp_path / "run2")
    trained = restore_trained_params(str(ckpt_dir))
    module = ex.export_imagdressing_module(
        trained, stubbed.unet_cfg, stubbed.resampler_cfg
    )
    path = str(tmp_path / "trained.pt")
    ex.save_checkpoint(path, module)
    back = cv.convert_imagdressing_checkpoint(
        cv.load_torch_file(path)["module"],
        stubbed.unet_cfg, stubbed.resampler_cfg,
    )
    assert _tree_equal(back["ref_unet"], trained["ref_unet"])
    assert _tree_equal(back["ref_adapters"], trained["ref_adapters"])
    assert _tree_equal(back["resampler"], trained["resampler"])
