"""SCHP fine-tune loop: loss decreases on synthetic data, BN running stats
move, the 8-device sync-BN sharded step matches the replicated step, and the
dataset adapter emits the right shapes (reference humanparsing training
stack: AugmentCE2P + InPlaceABNSync + CE/Lovász)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagdressing_tpu.core import mesh as mesh_lib
from imagdressing_tpu.preprocess.parsing import model as schp
from imagdressing_tpu.train.parsing_train import (
    ParsingTrainConfig,
    edges_from_labels,
    make_optimizer,
    make_parsing_train_step,
    shard_parsing_train_step,
)

NUM_CLASSES = 6


@pytest.fixture(scope="module")
def setup():
    params = schp.init(jax.random.PRNGKey(0), num_classes=NUM_CLASSES)
    rng = np.random.default_rng(0)
    b, h, w = 2, 64, 64
    batch = {
        "image": jnp.asarray(
            rng.standard_normal((b, h, w, 3)).astype(np.float32)
        ),
        "label": jnp.asarray(
            rng.integers(0, NUM_CLASSES, (b, h, w)), jnp.int32
        ),
    }
    batch["edge"] = jnp.asarray(edges_from_labels(np.asarray(batch["label"])))
    return params, batch


def test_replicated_step_loss_decreases_and_stats_move(setup):
    params, batch = setup
    cfg = ParsingTrainConfig(
        num_classes=NUM_CLASSES, learning_rate=2e-2, total_steps=100
    )
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    step = jax.jit(make_parsing_train_step(cfg, tx))

    rm0 = np.asarray(params["bn1"]["running_mean"])
    losses = []
    p = params
    for i in range(4):
        p, opt_state, m = step(p, opt_state, jnp.int32(i), batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # frozen-in-optimizer running stats still get their EMA update
    rm1 = np.asarray(p["bn1"]["running_mean"])
    assert np.abs(rm1 - rm0).max() > 1e-6
    # trainable weights moved
    assert np.abs(
        np.asarray(p["fushion"]["conv2"]["kernel"])
        - np.asarray(params["fushion"]["conv2"]["kernel"])
    ).max() > 0


def test_sharded_step_matches_replicated(setup, cpu_devices):
    """8-device shard_map step with synced BN == single-device full-batch
    step (Lovász off: it sorts errors globally and is not shard-decomposable
    — the reference's per-GPU loss has the same property)."""
    params, _ = setup
    if len(cpu_devices) < 8:
        pytest.skip("needs 8 cpu devices")
    mesh = mesh_lib.make_mesh(devices=cpu_devices[:8])
    cfg = ParsingTrainConfig(
        num_classes=NUM_CLASSES, learning_rate=1e-2, lovasz_weight=0.0,
        total_steps=100,
    )

    rng = np.random.default_rng(1)
    b, h, w = 8, 64, 64
    batch = {
        "image": jnp.asarray(
            rng.standard_normal((b, h, w, 3)).astype(np.float32)
        ),
        "label": jnp.asarray(
            rng.integers(0, NUM_CLASSES, (b, h, w)), jnp.int32
        ),
    }
    batch["edge"] = jnp.asarray(edges_from_labels(np.asarray(batch["label"])))

    # replicated reference
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    step = jax.jit(make_parsing_train_step(cfg, tx))
    p1, _, m1 = step(params, opt_state, jnp.int32(0), batch)

    # sharded
    jitted, s_params, s_opt, _ = shard_parsing_train_step(cfg, mesh, params)
    from jax.sharding import NamedSharding, PartitionSpec as P

    s_batch = jax.device_put(
        batch, NamedSharding(mesh, P(mesh_lib.DATA_AXIS))
    )
    zero = jax.device_put(jnp.int32(0), NamedSharding(mesh, P()))
    p2, _, m2 = jitted(s_params, s_opt, zero, s_batch)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(p1["bn1"]["running_mean"]),
        np.asarray(p2["bn1"]["running_mean"]), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(p1["fushion"]["conv2"]["kernel"]),
        np.asarray(p2["fushion"]["conv2"]["kernel"]), atol=1e-5,
    )


def test_dataset_adapter(tmp_path):
    import cv2

    from imagdressing_tpu.train.parsing_train import ParsingDataset

    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(
            str(tmp_path / "images" / f"s{i}.jpg"),
            rng.integers(0, 255, (100, 80, 3), dtype=np.uint8),
        )
        cv2.imwrite(
            str(tmp_path / "labels" / f"s{i}.png"),
            rng.integers(0, NUM_CLASSES, (100, 80), dtype=np.uint8),
        )
    ds = ParsingDataset(
        str(tmp_path / "images"), str(tmp_path / "labels"), h=64, w=48
    )
    assert len(ds) == 3
    batch = ds.batch([0, 1])
    assert batch["image"].shape == (2, 64, 48, 3)
    assert batch["label"].shape == (2, 64, 48)
    assert batch["edge"].shape == (2, 64, 48)
    assert set(np.unique(batch["edge"])) <= {0, 1}
    assert batch["label"].max() < NUM_CLASSES


def test_edges_from_labels():
    lab = np.zeros((4, 4), np.int32)
    lab[2:, :] = 3
    e = edges_from_labels(lab)
    assert e[2].sum() == 4 and e[1].sum() == 0 and e[3].sum() == 0


def test_parsing_cli_train_and_eval(tmp_path):
    """End-to-end CLI smoke on a tiny synthetic dataset: 2 train steps save
    params, eval restores them and reports a finite mIoU (with flip +
    multi-scale averaging) and writes prediction PNGs."""
    import cv2

    from imagdressing_tpu.apps.parsing_cli import main as parsing_main

    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        cv2.imwrite(
            str(tmp_path / "images" / f"s{i}.jpg"),
            rng.integers(0, 255, (80, 64, 3), dtype=np.uint8),
        )
        cv2.imwrite(
            str(tmp_path / "labels" / f"s{i}.png"),
            rng.integers(0, NUM_CLASSES, (80, 64), dtype=np.uint8),
        )
    out = tmp_path / "log"
    parsing_main([
        "train", "--image_dir", str(tmp_path / "images"),
        "--label_dir", str(tmp_path / "labels"),
        "--out_dir", str(out), "--num_classes", str(NUM_CLASSES),
        "--input_size", "64", "--steps", "2", "--log_every", "1",
    ])
    assert (out / "params.npz").exists()
    pred_dir = tmp_path / "preds"
    miou = None
    from imagdressing_tpu.apps import parsing_cli

    args = parsing_cli.build_argparser().parse_args([
        "eval", "--image_dir", str(tmp_path / "images"),
        "--label_dir", str(tmp_path / "labels"),
        "--restore", str(out / "params.npz"),
        "--num_classes", str(NUM_CLASSES), "--input_size", "64",
        "--flip", "--scales", "0.75,1.0",
        "--save_dir", str(pred_dir),
    ])
    miou = parsing_cli.run_eval(args)
    assert 0.0 <= miou <= 1.0
    assert sorted(p.name for p in pred_dir.iterdir()) == ["s0.png", "s1.png"]
