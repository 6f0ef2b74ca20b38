"""Person-detector train/infer CLI — the mhp_extension detectron2 drivers.

Reference equivalents:
  train: /root/reference/preprocess/humanparsing/mhp_extension/detectron2/
         tools/finetune_net.py + configs/Misc/parsing_finetune_cihp.yaml
         (1-class person Mask R-CNN fine-tune on COCO-style CIHP json)
  infer: same tools with parsing_inference.yaml, producing
         instances_predictions consumed by make_crop_and_mask_w_mask_nms.py
         (here: tools/make_crop.py reads the instances.npy we write).

Usage:
  python -m imagdressing_tpu.apps.detect_cli train \
      --annotations CIHP_train.json --img_dir Images/ --out detector.npz \
      --steps 200 [--tiny] [--data_parallel 8]
  python -m imagdressing_tpu.apps.detect_cli infer \
      --annotations CIHP_val.json --img_dir Images/ --params detector.npz \
      --out instances.npy [--tiny]
"""

from __future__ import annotations

import argparse
from typing import Any, Dict

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="person Mask R-CNN train/infer")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train")
    t.add_argument("--annotations", required=True)
    t.add_argument("--img_dir", required=True)
    t.add_argument("--out", required=True)
    t.add_argument("--resume", default=None, help="warm-start .npz")
    t.add_argument("--steps", type=int, default=200)
    t.add_argument("--batch_size", type=int, default=2)
    t.add_argument("--image_size", type=int, default=512)
    t.add_argument("--learning_rate", type=float, default=1e-3)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--tiny", action="store_true",
                   help="tiny test config instead of the full model")
    t.add_argument("--data_parallel", type=int, default=1,
                   help="shard the batch over this many devices")
    t.add_argument("--log_every", type=int, default=20)

    i = sub.add_parser("infer")
    i.add_argument("--annotations", required=True,
                   help="COCO json (images list; annotations optional)")
    i.add_argument("--img_dir", required=True)
    i.add_argument("--params", required=True)
    i.add_argument("--out", required=True, help="instances .npy to write")
    i.add_argument("--image_size", type=int, default=512)
    i.add_argument("--score_threshold", type=float, default=0.5)
    i.add_argument("--nms_threshold", type=float, default=0.95)
    i.add_argument("--max_detections", type=int, default=20)
    i.add_argument("--tiny", action="store_true")
    return p


def _config(tiny: bool):
    from imagdressing_tpu.detect import maskrcnn

    return maskrcnn.tiny_config() if tiny else maskrcnn.MaskRCNNConfig()


def _save_params(path: str, params) -> None:
    import jax

    leaves = jax.tree.leaves(params)
    np.savez_compressed(
        path, **{f"p{i}": np.asarray(v) for i, v in enumerate(leaves)})


def _load_params(path: str, cfg):
    import jax

    from imagdressing_tpu.detect import maskrcnn

    flat = np.load(path)
    template = maskrcnn.init(jax.random.PRNGKey(0), cfg)
    leaves, tree = jax.tree.flatten(template)
    return jax.tree.unflatten(
        tree, [flat[f"p{i}"] for i in range(len(leaves))])


def run_train(args) -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from imagdressing_tpu.detect import maskrcnn
    from imagdressing_tpu.detect.data import CocoDetectionData
    from imagdressing_tpu.detect.train import make_train_step

    cfg = _config(args.tiny)
    data = CocoDetectionData(args.annotations, args.img_dir,
                             max_gt=cfg.max_gt, image_size=args.image_size)
    params = (_load_params(args.resume, cfg) if args.resume
              else maskrcnn.init(jax.random.PRNGKey(args.seed), cfg))
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adam(args.learning_rate))
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(cfg, tx))

    shardings = None
    if args.data_parallel != 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from imagdressing_tpu.core import mesh as mesh_lib

        devices = jax.devices()
        n = args.data_parallel if args.data_parallel > 0 else len(devices)
        if n > len(devices):
            devices = jax.devices("cpu")
        mesh = mesh_lib.make_mesh(data=n, model=1, devices=devices[:n])
        shardings = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))

    rng = np.random.default_rng(args.seed)
    it = data.batches(args.batch_size, rng=rng)
    for s in range(args.steps):
        batch = {k: v for k, v in next(it).items()
                 if k in ("image", "gt_boxes", "gt_valid", "gt_masks")}
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if shardings is not None:
            batch = jax.device_put(batch, shardings)
        params, opt_state, metrics = step(
            params, opt_state, batch, jax.random.PRNGKey(args.seed * 100003 + s))
        if s % args.log_every == 0 or s == args.steps - 1:
            print(f"step {s}: " + " ".join(
                f"{k}={float(v):.4f}" for k, v in sorted(metrics.items())))
    _save_params(args.out, jax.device_get(params))
    print("saved", args.out)


def run_infer(args) -> Dict[str, Any]:
    import jax

    from imagdressing_tpu.detect import infer as det_infer
    from imagdressing_tpu.detect.data import CocoDetectionData

    cfg = _config(args.tiny)
    params = _load_params(args.params, cfg)
    data = CocoDetectionData(args.annotations, args.img_dir,
                             max_gt=cfg.max_gt, image_size=args.image_size)
    out: Dict[str, Any] = {}
    for image_id in data.ids:
        info = data.images[image_id]
        ex = data.load_example(image_id)
        det = det_infer.detect_instances(
            params, cfg, ex["image"][None],
            max_detections=args.max_detections,
            score_threshold=args.score_threshold,
            nms_threshold=args.nms_threshold)
        det = jax.tree.map(np.asarray, det)
        # undo the letterbox scale before pasting into the original frame
        h0, w0 = info["height"], info["width"]
        det["boxes"] = det["boxes"] / float(ex["scale"])
        out[info["file_name"]] = det_infer.to_instances(det, 0, h0, w0)
    np.save(args.out, out, allow_pickle=True)
    print("wrote", args.out, f"({len(out)} images)")
    return out


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.cmd == "train":
        run_train(args)
    else:
        run_infer(args)


if __name__ == "__main__":
    main()
