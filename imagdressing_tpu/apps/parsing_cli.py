"""Human-parsing train/eval CLI — the SCHP & global_local_parsing drivers.

Mirrors /root/reference/preprocess/humanparsing/mhp_extension/
global_local_parsing/{global_local_train.py,global_local_evaluate.py} (the
SCHP training/eval loops the reference runs offline on its parsing data):

  python -m imagdressing_tpu.apps.parsing_cli train \
      --image_dir data/Images --label_dir data/Category_ids --out_dir log/
  python -m imagdressing_tpu.apps.parsing_cli eval \
      --image_dir data/Images --label_dir data/Category_ids \
      --restore log/params.npz [--flip] [--scales 0.75,1.0,1.25]

Train: AugmentCE2P with sync batch-stat ABN, CE+Lovász+edge criterion, SGD
poly schedule, data-parallel over all devices (train/parsing_train.py).
Eval: averaged logits over optional horizontal flip and multiple scales
(global_local_evaluate.py's multi_scales/flip options), mean IoU.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="SCHP parsing train/eval")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train")
    t.add_argument("--image_dir", required=True)
    t.add_argument("--label_dir", required=True)
    t.add_argument("--out_dir", required=True)
    t.add_argument("--num_classes", type=int, default=18)
    t.add_argument("--input_size", type=int, default=473)
    t.add_argument("--batch_size", type=int, default=1,
                   help="per-device batch")
    t.add_argument("--steps", type=int, default=1000)
    t.add_argument("--learning_rate", type=float, default=7e-3)
    t.add_argument("--restore", default=None,
                   help="torch SCHP .pth to fine-tune from (else random)")
    t.add_argument("--log_every", type=int, default=10)

    e = sub.add_parser("eval")
    e.add_argument("--image_dir", required=True)
    e.add_argument("--label_dir", required=True)
    e.add_argument("--restore", required=True,
                   help="params .npz (from train) or torch SCHP .pth")
    e.add_argument("--num_classes", type=int, default=18)
    e.add_argument("--input_size", type=int, default=473)
    e.add_argument("--flip", action="store_true")
    e.add_argument("--scales", default="1.0",
                   help="comma list, e.g. 0.75,1.0,1.25")
    e.add_argument("--save_dir", default=None,
                   help="write predicted label PNGs here")
    return p


def _load_params(path: str, num_classes: int):
    from imagdressing_tpu.preprocess.parsing import model as schp

    if path.endswith(".npz"):
        import jax

        flat = np.load(path)
        template = schp.init(jax.random.PRNGKey(0), num_classes=num_classes)
        leaves, tree = jax.tree.flatten(template)
        return jax.tree.unflatten(
            tree, [flat[f"p{i}"] for i in range(len(leaves))]
        )
    from imagdressing_tpu.convert.torch_sd import load_torch_file

    return schp.convert_torch(load_torch_file(path), num_classes=num_classes)


def _save_params(path: str, params):
    import jax

    leaves = jax.tree.leaves(params)
    np.savez_compressed(
        path, **{f"p{i}": np.asarray(v) for i, v in enumerate(leaves)}
    )


def run_train(args) -> None:
    import jax

    from imagdressing_tpu.core import mesh as mesh_lib
    from imagdressing_tpu.preprocess.parsing import model as schp
    from imagdressing_tpu.train.parsing_train import (
        ParsingDataset,
        ParsingTrainConfig,
        shard_parsing_train_step,
    )

    cfg = ParsingTrainConfig(
        num_classes=args.num_classes,
        learning_rate=args.learning_rate,
        total_steps=args.steps,
    )
    if args.restore:
        params = _load_params(args.restore, args.num_classes)
    else:
        params = schp.init(jax.random.PRNGKey(0),
                           num_classes=args.num_classes)

    mesh = mesh_lib.make_mesh()
    n = mesh.shape[mesh_lib.DATA_AXIS]
    jitted, params, opt_state, _ = shard_parsing_train_step(cfg, mesh, params)

    ds = ParsingDataset(args.image_dir, args.label_dir,
                        h=args.input_size, w=args.input_size)
    os.makedirs(args.out_dir, exist_ok=True)
    global_b = args.batch_size * n
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    bsh = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))
    t0 = time.perf_counter()
    for step in range(args.steps):
        idxs = [(step * global_b + i) % len(ds) for i in range(global_b)]
        batch = jax.device_put(
            {k: jnp.asarray(v) for k, v in ds.batch(idxs).items()}, bsh
        )
        params, opt_state, m = jitted(
            params, opt_state, jnp.int32(step), batch
        )
        if (step + 1) % args.log_every == 0:
            print(f"step {step + 1} loss {float(m['loss']):.4f} "
                  f"({(time.perf_counter() - t0) / (step + 1):.2f}s/step)")
    out = os.path.join(args.out_dir, "params.npz")
    _save_params(out, jax.device_get(params))
    print("saved", out)


def run_eval(args) -> float:
    import cv2
    import jax
    import jax.numpy as jnp

    from imagdressing_tpu.preprocess.parsing import model as schp
    from imagdressing_tpu.train.parsing_losses import mean_iou
    from imagdressing_tpu.train.parsing_train import ParsingDataset

    params = _load_params(args.restore, args.num_classes)
    scales = [float(s) for s in args.scales.split(",")]
    size = args.input_size

    import functools

    @functools.partial(jax.jit, static_argnames=("h", "w"))
    def logits_at(params, image, h, w):
        fusion, _ = schp.apply(params, image, args.num_classes)
        return jax.image.resize(
            fusion.astype(jnp.float32),
            (image.shape[0], h, w, args.num_classes), "bilinear",
        )

    ds = ParsingDataset(args.image_dir, args.label_dir, h=size, w=size)
    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)
    ious = []
    for i in range(len(ds)):
        s = ds.get(i)
        acc = np.zeros((size, size, args.num_classes), np.float32)
        for sc in scales:
            sh = sw = max(32, int(round(size * sc)))
            img = cv2.resize(s["image"], (sw, sh),
                             interpolation=cv2.INTER_LINEAR)[None]
            acc += np.asarray(logits_at(params, jnp.asarray(img), size,
                                        size))[0]
            if args.flip:
                acc += np.asarray(
                    logits_at(params, jnp.asarray(img[:, :, ::-1]), size,
                              size)
                )[0, :, ::-1]
        pred = np.argmax(acc, axis=-1).astype(np.int32)
        ious.append(
            float(mean_iou(jnp.asarray(pred), jnp.asarray(s["label"]),
                           args.num_classes))
        )
        if args.save_dir:
            cv2.imwrite(
                os.path.join(args.save_dir, f"{ds.ids[i]}.png"),
                pred.astype(np.uint8),
            )
    miou = float(np.mean(ious)) if ious else 0.0
    print(f"mean IoU over {len(ious)} images: {miou:.4f}")
    return miou


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.cmd == "train":
        run_train(args)
    else:
        run_eval(args)


if __name__ == "__main__":
    main()
