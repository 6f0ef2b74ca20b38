"""End-to-end training CLI: manifest + images on disk -> jitted mesh-sharded
steps -> metrics.jsonl + orbax checkpoint (model loading stubbed with the
small random stack; reference flow: run.sh -> accelerate launch train.py)."""

import json

import jax
import numpy as np
import pytest
from PIL import Image

import imagdressing_tpu.apps.train_cli as train_cli
from imagdressing_tpu.apps.tokenizer import HashTokenizer
from imagdressing_tpu.pipelines.dressing import DressingModels


@pytest.fixture()
def stubbed(monkeypatch):
    import imagdressing_tpu.apps.loader as loader_mod
    import imagdressing_tpu.apps.tokenizer as tok_mod

    models = DressingModels.init_random(jax.random.PRNGKey(0), small=True)
    monkeypatch.setattr(loader_mod, "load_dressing_models",
                        lambda **kwargs: models)
    monkeypatch.setattr(tok_mod, "load_tokenizer",
                        lambda path, max_length=77: HashTokenizer())
    return models


def _write_manifest(tmp_path, n=8):
    rng = np.random.default_rng(0)
    items = []
    for i in range(n):
        for kind in ("person", "cloth"):
            Image.fromarray(
                rng.integers(0, 255, (96, 80, 3), dtype=np.uint8)
            ).save(tmp_path / f"{kind}{i}.jpg")
        items.append({
            "image_file": f"person{i}.jpg",
            "cloth_file": f"cloth{i}.jpg",
            "text": ["a red dress", "red summer dress"],
        })
    mf = tmp_path / "manifest.json"
    mf.write_text(json.dumps(items))
    return mf


def _common_args(mf, tmp_path, out):
    return [
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
    ]


def test_train_cli_end_to_end(stubbed, tmp_path):
    mf = _write_manifest(tmp_path)
    out = tmp_path / "run"
    train_cli.main(_common_args(mf, tmp_path, out))
    lines = [json.loads(ln) for ln in
             (out / "metrics.jsonl").read_text().splitlines()]
    assert lines and np.isfinite(lines[-1]["loss"])
    assert (out / "checkpoints").exists()


def test_train_cli_resume(stubbed, tmp_path):
    """--resume_from_checkpoint restores step/params/moments and continues
    from where the first run checkpointed (reference train.py:199-207)."""
    mf = _write_manifest(tmp_path)
    out = tmp_path / "run"
    args = _common_args(mf, tmp_path, out)
    train_cli.main(args)
    # second invocation: restored at step 2, runs exactly step 3
    args3 = list(args)
    idx = args3.index("--num_train_steps") + 1
    args3[idx] = "3"
    train_cli.main(args3 + ["--resume_from_checkpoint"])
    lines = [json.loads(ln) for ln in
             (out / "metrics.jsonl").read_text().splitlines()]
    assert [ln["step"] for ln in lines] == [1, 2, 3]


def test_train_cli_tensor_parallel(stubbed, tmp_path):
    """--tensor_parallel 2 routes through tp_train_step on a (data, model)
    mesh (the reference has no TP at all; SURVEY §2.3)."""
    mf = _write_manifest(tmp_path)
    out = tmp_path / "run_tp"
    train_cli.main(_common_args(mf, tmp_path, out)
                   + ["--tensor_parallel", "2"])
    lines = [json.loads(ln) for ln in
             (out / "metrics.jsonl").read_text().splitlines()]
    assert lines and np.isfinite(lines[-1]["loss"])


def test_train_cli_report_to_tensorboard(stubbed, tmp_path):
    """--report_to tensorboard writes an events file next to the jsonl
    (reference --report_to seat, train.py:146-155,485)."""
    import os

    mf = _write_manifest(tmp_path)
    out = tmp_path / "run_tb"
    train_cli.main(
        _common_args(mf, tmp_path, out) + ["--report_to", "tensorboard"]
    )
    events = [f for f in os.listdir(out / "logs")
              if f.startswith("events.out.tfevents.")]
    assert len(events) == 1
    # jsonl stays on as the always-available sink
    lines = (out / "metrics.jsonl").read_text().splitlines()
    assert len(lines) == 2
