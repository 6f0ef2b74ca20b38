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


def _leaf_key(path) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", p))) for p in path
    )


def _load_params(path: str, num_classes: int):
    import jax

    from imagdressing_tpu.preprocess.parsing import model as schp

    if path.endswith(".npz"):
        flat = np.load(path)
        template = schp.init(jax.random.PRNGKey(0), num_classes=num_classes)
        if "p0" in flat.files:  # legacy index-keyed format
            leaves, tree = jax.tree.flatten(template)
            return jax.tree.unflatten(
                tree, [flat[f"p{i}"] for i in range(len(leaves))]
            )
        # key-path format: robust to tree-order changes, and a wrong
        # --num_classes fails loudly instead of mis-binding leaves
        return jax.tree_util.tree_map_with_path(
            lambda p, leaf: flat[_leaf_key(p)], template
        )
    from imagdressing_tpu.convert.torch_sd import load_torch_file

    return schp.convert_torch(load_torch_file(path), num_classes=num_classes)


def _save_params(path: str, params):
    import jax

    named = {}
    jax.tree_util.tree_map_with_path(
        lambda p, leaf: named.__setitem__(_leaf_key(p), np.asarray(leaf)),
        params,
    )
    np.savez_compressed(path, **named)


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
    from imagdressing_tpu.train.parsing_train import ParsingDataset

    params = _load_params(args.restore, args.num_classes)
    scales = [float(s) for s in args.scales.split(",")]
    size = args.input_size

    import functools

    from imagdressing_tpu.preprocess.parsing.infer import (
        upsample_align_corners,
    )

    @functools.partial(jax.jit, static_argnames=("h", "w"))
    def logits_at(params, image, h, w):
        fusion, _ = schp.apply(params, image, args.num_classes)
        # align_corners=True grid like the reference eval (nn.Upsample) —
        # jax.image.resize's half-pixel grid shifts boundaries ~1.5 px
        return upsample_align_corners(fusion.astype(jnp.float32), h, w)

    # left/right class pairs swapped for the flipped pass (reference
    # global_local_evaluate.py multi_scale_testing): LIP/CIHP-20 swaps
    # arms/legs/shoes 14..19; ATR-18 swaps shoes/legs/arms 9..15
    if args.num_classes == 20:
        flip_pairs = [(14, 15), (16, 17), (18, 19)]
    elif args.num_classes == 18:
        flip_pairs = [(9, 10), (12, 13), (14, 15)]
    else:
        flip_pairs = []
    flip_perm = np.arange(args.num_classes)
    for a_cls, b_cls in flip_pairs:
        flip_perm[a_cls], flip_perm[b_cls] = b_cls, a_cls

    ds = ParsingDataset(args.image_dir, args.label_dir, h=size, w=size)
    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)
    # one dataset-wide confusion matrix (reference utils/miou.py
    # compute_mean_ioU) — per-image mIoU means are not comparable
    confusion = np.zeros((args.num_classes, args.num_classes), np.int64)
    n_img = 0
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
                flipped = np.asarray(
                    logits_at(params, jnp.asarray(img[:, :, ::-1]), size,
                              size)
                )[0, :, ::-1]
                acc += flipped[:, :, flip_perm]
        pred = np.argmax(acc, axis=-1).astype(np.int32)
        label = np.asarray(s["label"])
        valid = label != 255
        confusion += np.bincount(
            (label[valid].astype(np.int64) * args.num_classes
             + pred[valid]),
            minlength=args.num_classes * args.num_classes,
        ).reshape(args.num_classes, args.num_classes)
        n_img += 1
        if args.save_dir:
            cv2.imwrite(
                os.path.join(args.save_dir, f"{ds.ids[i]}.png"),
                pred.astype(np.uint8),
            )
    tp = np.diag(confusion).astype(np.float64)
    denom = confusion.sum(0) + confusion.sum(1) - np.diag(confusion)
    present = denom > 0
    miou = float(
        np.mean(tp[present] / denom[present])
    ) if present.any() else 0.0
    print(f"mean IoU over {n_img} images: {miou:.4f}")
    return miou


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.cmd == "train":
        run_train(args)
    else:
        run_eval(args)


if __name__ == "__main__":
    main()
