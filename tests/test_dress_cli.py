"""End-to-end dress CLI test: real argv -> garment prep -> pipeline ->
collage on disk (model loading stubbed with the small random stack; the
converters have their own synthetic-checkpoint tests)."""

import os

import jax
import numpy as np
import pytest
from PIL import Image

import imagdressing_tpu.apps.dress as dress
from imagdressing_tpu.apps.tokenizer import HashTokenizer
from imagdressing_tpu.pipelines.dressing import DressingModels


@pytest.fixture()
def stubbed(monkeypatch):
    # dress.main imports these lazily — patch them at their source modules
    import imagdressing_tpu.apps.loader as loader_mod
    import imagdressing_tpu.apps.tokenizer as tok_mod

    models = DressingModels.init_random(jax.random.PRNGKey(0), small=True)
    monkeypatch.setattr(loader_mod, "load_dressing_models",
                        lambda **kwargs: models)
    monkeypatch.setattr(tok_mod, "load_tokenizer",
                        lambda path, max_length=77: HashTokenizer())
    return models


def _write_cloth(path):
    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.integers(0, 255, (600, 460, 3), dtype=np.uint8)
    ).save(path)


def test_basic_cli_end_to_end(stubbed, tmp_path):
    cloth = tmp_path / "shirt.jpg"
    _write_cloth(cloth)
    out_dir = tmp_path / "out"
    dress.main([
        "--preset", "basic",
        "--cloth_path", str(cloth),
        "--output_path", str(out_dir),
        "--height", "64", "--width", "64",
        "--num_inference_steps", "2",
        "--seed", "3",
    ])
    saved = Image.open(out_dir / "shirt.jpg")
    # collage = [garment | result] side by side
    assert saved.size == (128, 64)


def test_folder_batching_cli(stubbed, tmp_path):
    cloth_dir = tmp_path / "garments"
    cloth_dir.mkdir()
    for name in ("a.jpg", "b.jpg", "c.jpg"):
        _write_cloth(cloth_dir / name)
    out_dir = tmp_path / "out"
    dress.main([
        "--preset", "basic",
        "--cloth_dir", str(cloth_dir),
        "--batch_size", "2",
        "--output_path", str(out_dir),
        "--height", "64", "--width", "64",
        "--num_inference_steps", "2",
    ])
    assert sorted(os.listdir(out_dir)) == ["a.jpg", "b.jpg", "c.jpg"]


def test_folder_cli_data_parallel(stubbed, tmp_path):
    """--data_parallel 2: the folder loop runs mesh-sharded generation (the
    reference *_folder.py loops serially on one GPU)."""
    cloth_dir = tmp_path / "garments"
    cloth_dir.mkdir()
    for name in ("a.jpg", "b.jpg", "c.jpg"):
        _write_cloth(cloth_dir / name)
    out_dir = tmp_path / "out"
    dress.main([
        "--preset", "basic",
        "--cloth_dir", str(cloth_dir),
        "--data_parallel", "2",
        "--allow_cpu_mesh",
        "--output_path", str(out_dir),
        "--height", "64", "--width", "64",
        "--num_inference_steps", "2",
    ])
    # 3 garments on a 2-way mesh: batch of 2 + ragged batch of 1 (padded)
    assert sorted(os.listdir(out_dir)) == ["a.jpg", "b.jpg", "c.jpg"]


def test_folder_cross_product_cli(monkeypatch, tmp_path):
    """--pose_dir x --cloth_dir: the reference *_folder.py nested loops
    (factor outer, cloth inner — inference_IMAGdressing_ipa_controlnetpose_
    folder.py:200-253) with the reference's f"{factor}_{cloth}.png" output
    naming, batched through the device batch dim instead of looping
    serially."""
    import imagdressing_tpu.apps.loader as loader_mod
    import imagdressing_tpu.apps.tokenizer as tok_mod

    models = DressingModels.init_random(
        jax.random.PRNGKey(0), small=True, with_controlnet=True
    )
    monkeypatch.setattr(loader_mod, "load_dressing_models",
                        lambda **kwargs: models)
    monkeypatch.setattr(tok_mod, "load_tokenizer",
                        lambda path, max_length=77: HashTokenizer())

    cloth_dir = tmp_path / "garments"
    cloth_dir.mkdir()
    for name in ("a.jpg", "b.jpg"):
        _write_cloth(cloth_dir / name)
    pose_dir = tmp_path / "poses"
    pose_dir.mkdir()
    for name in ("p1.png", "p2.png"):
        _write_cloth(pose_dir / name)
    out_dir = tmp_path / "out"
    dress.main([
        "--preset", "pose",
        "--cloth_dir", str(cloth_dir),
        "--pose_dir", str(pose_dir),
        "--batch_size", "2",
        "--output_path", str(out_dir),
        "--height", "64", "--width", "64",
        "--num_inference_steps", "2",
    ])
    assert sorted(os.listdir(out_dir)) == [
        "p1_a.png", "p1_b.png", "p2_a.png", "p2_b.png"
    ]
    assert Image.open(out_dir / "p1_a.png").size == (128, 64)


def test_data_parallel_refuses_silent_cpu_mesh(stubbed, tmp_path):
    """Requesting more chips than the accelerator backend has must error
    loudly instead of silently meshing over glacial host CPUs (the
    --allow_cpu_mesh opt-out covers dev runs)."""
    if len(jax.devices()) >= 64:
        pytest.skip("backend actually has 64 devices")
    cloth = tmp_path / "shirt.jpg"
    _write_cloth(cloth)
    with pytest.raises(SystemExit, match="allow_cpu_mesh"):
        dress.main([
            "--preset", "basic",
            "--cloth_path", str(cloth),
            "--data_parallel", "64",
            "--output_path", str(tmp_path / "out"),
            "--height", "64", "--width", "64",
            "--num_inference_steps", "2",
        ])


def test_cli_tensor_parallel(stubbed, tmp_path):
    """--tensor_parallel 2: UNet weights split over the model axis."""
    cloth = tmp_path / "shirt.jpg"
    _write_cloth(cloth)
    out_dir = tmp_path / "out"
    dress.main([
        "--preset", "basic",
        "--cloth_path", str(cloth),
        "--tensor_parallel", "2",
        "--allow_cpu_mesh",
        "--output_path", str(out_dir),
        "--height", "64", "--width", "64",
        "--num_inference_steps", "2",
        "--seed", "3",
    ])
    assert Image.open(out_dir / "shirt.jpg").size == (128, 64)
