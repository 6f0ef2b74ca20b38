"""Training CLI — replaces `accelerate launch train.py` + run.sh.

  python -m imagdressing_tpu.apps.train_cli --data_json_file manifest.json \
      --base_dir ckpt/... --vae_path ... --image_encoder_path ... \
      --output_dir runs/exp1

Flag names track /root/reference/train.py:31-176 + run.sh:4-19. The mesh
replaces `--num_processes`; ZeRO-2 is always on (optimizer-state sharding
over the data axis).
"""

from __future__ import annotations

import argparse
import logging
import os
import time


def build_argparser():
    p = argparse.ArgumentParser(description="IMAGDressing-TPU training")
    p.add_argument("--data_json_file", required=True)
    p.add_argument("--data_root_path", default="")
    p.add_argument("--base_dir", default="ckpt/Realistic_Vision_V4.0_noVAE")
    p.add_argument("--vae_path", default="ckpt/sd-vae-ft-mse")
    p.add_argument("--image_encoder_path", default="ckpt/image_encoder")
    p.add_argument("--output_dir", default="output")
    p.add_argument("--learning_rate", type=float, default=5e-5)
    p.add_argument("--weight_decay", type=float, default=1e-2)
    p.add_argument("--lr_warmup_steps", type=int, default=2000)
    p.add_argument("--train_batch_size", type=int, default=5,
                   help="per-device batch (run.sh uses 5)")
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--noise_offset", type=float, default=0.05)
    p.add_argument("--snr_gamma", type=float, default=None)
    p.add_argument("--num_train_steps", type=int, default=200_000)
    p.add_argument("--checkpointing_steps", type=int, default=2000)
    p.add_argument("--resume_from_checkpoint", action="store_true")
    p.add_argument("--resize_shorter", type=int, default=512,
                   help="dataset resize shorter-side (IGPair.py Resize(512))")
    p.add_argument("--crop_height", type=int, default=640)
    p.add_argument("--crop_width", type=int, default=512)
    p.add_argument("--dataloader_num_workers", type=int, default=4)
    p.add_argument("--logging_steps", type=int, default=10)
    p.add_argument("--report_to", default="jsonl",
                   choices=["jsonl", "tensorboard", "all", "wandb"],
                   help="metric sink(s): jsonl (default, always on), "
                        "tensorboard (adds an offline event file under "
                        "output_dir/logs), all (reference train.py:146-155)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument(
        "--tensor_parallel", type=int, default=1,
        help="model-axis size: shard both UNets' attention/FF projections "
        "over this many chips (train.step.tp_train_step); 1 = ZeRO-2 "
        "data-parallel only",
    )
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagdressing_tpu.apps.loader import load_dressing_models
    from imagdressing_tpu.apps.tokenizer import load_tokenizer
    from imagdressing_tpu.core import mesh as mesh_lib
    from imagdressing_tpu.core.config import TrainConfig
    from imagdressing_tpu.train.checkpoint import CheckpointManager
    from imagdressing_tpu.train.data import IGPairDataset, data_iterator
    from imagdressing_tpu.train.step import (
        init_train_state,
        shard_train_step,
        tp_train_step,
    )

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    log = logging.getLogger("train")

    cfg = TrainConfig(
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        warmup_steps=args.lr_warmup_steps,
        train_batch_size=args.train_batch_size,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        max_grad_norm=args.max_grad_norm,
        noise_offset=args.noise_offset,
        snr_gamma=args.snr_gamma,
        num_train_steps=args.num_train_steps,
        checkpointing_steps=args.checkpointing_steps,
        seed=args.seed,
    )

    # Models: train starts from base SD weights (train.py:318-336); the
    # monolithic ckpt is only for inference, so build from base + fresh
    # adapters. We reuse the loader with model_ckpt optional in a follow-up;
    # here adapters/resampler initialize from the UNet per train.py:339-359.
    models = load_dressing_models(
        base_dir=args.base_dir,
        vae_path=args.vae_path,
        image_encoder_path=args.image_encoder_path,
        model_ckpt=None,
        dtype=jnp.bfloat16,
    )

    tp = max(1, args.tensor_parallel)
    if tp > 1:
        n = len(jax.devices())
        mesh = mesh_lib.make_mesh(data=n // tp, model=tp)
    else:
        mesh = mesh_lib.make_mesh()
    n_dev = mesh.shape[mesh_lib.DATA_AXIS]
    global_batch = cfg.train_batch_size * n_dev
    log.info("mesh: %s, global batch %d", dict(mesh.shape), global_batch)

    state, frozen, tx = init_train_state(models, cfg)
    if tp > 1:
        jitted, state, frozen = tp_train_step(
            models, cfg, tx, mesh, state, frozen
        )
    else:
        jitted, state, frozen = shard_train_step(
            models, cfg, tx, mesh, state, frozen
        )

    ckpt = CheckpointManager(os.path.join(args.output_dir, "checkpoints"))
    if args.resume_from_checkpoint:
        restored, _ = ckpt.restore(state)
        if restored is not None:
            state = restored
            log.info("resumed at step %d", int(jax.device_get(state.step)))

    tokenizer = load_tokenizer(os.path.join(args.base_dir, "tokenizer"))
    dataset = IGPairDataset(
        args.data_json_file,
        tokenizer,
        size=args.resize_shorter,
        crop_h=args.crop_height,
        crop_w=args.crop_width,
        clip_size=models.vision_cfg.image_size,
        image_root=args.data_root_path,
        seed=cfg.seed,
    )
    # each process loads its 1/process_count of the global batch; the local
    # arrays are assembled into mesh-sharded global jax.Arrays below
    it = data_iterator(
        dataset, global_batch // jax.process_count(),
        num_workers=args.dataloader_num_workers, seed=cfg.seed,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )

    from jax.sharding import NamedSharding, PartitionSpec as P

    from imagdressing_tpu.train.data import shard_host_batch

    rng = jax.device_put(jax.random.PRNGKey(cfg.seed), NamedSharding(mesh, P()))

    # metrics sink(s): jsonl always; --report_to tensorboard adds a
    # dependency-free TensorBoard event file (train/trackers.py replaces the
    # reference's accelerate trackers, train.py:146-155,484-485)
    from imagdressing_tpu.train.trackers import make_tracker

    os.makedirs(args.output_dir, exist_ok=True)
    tracker = make_tracker(args.report_to, args.output_dir)

    start = int(jax.device_get(state.step))
    t_data = t_step = 0.0
    t0 = time.perf_counter()
    for step in range(start, cfg.num_train_steps):
        batch = shard_host_batch(mesh, next(it))
        t1 = time.perf_counter()
        with mesh:
            state, metrics = jitted(state, frozen, batch, rng)
        if (step + 1) % args.logging_steps == 0:
            metrics = jax.device_get(metrics)
            t2 = time.perf_counter()
            log.info(
                "step %d loss %.4f gnorm %.3f step_time %.3fs data_time %.3fs",
                step + 1, metrics["loss"], metrics["grad_norm"],
                (t2 - t1), (t1 - t0),
            )
            tracker.log(step + 1, {
                "loss": float(metrics["loss"]),
                "grad_norm": float(metrics["grad_norm"]),
                "step_time_s": t2 - t1,
                "data_time_s": t1 - t0,
                "images_per_sec": global_batch / max(t2 - t1, 1e-9),
            })
            t0 = t2
        else:
            t0 = time.perf_counter()
        if (step + 1) % cfg.checkpointing_steps == 0:
            ckpt.save(state, {"step": step + 1})
            log.info("checkpoint saved at %d", step + 1)

    ckpt.save(state, {"step": cfg.num_train_steps})
    ckpt.wait()
    tracker.close()
    log.info("training done")


if __name__ == "__main__":
    main()
