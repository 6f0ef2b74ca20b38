"""Evaluation CLIs — mirror /root/reference/metric/eval.py (CAMI-U) and
eval_s.py (CAMI-S).

  python -m imagdressing_tpu.eval.cli cami-u --cloth_path A --cloth_mask_path B
  python -m imagdressing_tpu.eval.cli cami-s --pose_path ... --face_embeds ...
  python -m imagdressing_tpu.eval.cli cami-s-grid --cloth_path ... \
      --model_path ... --clip_model ...   (the self-contained grid driver,
      eval_s.py:145-181 — see eval/grid.py)

Deviations from the reference (documented quirks, SURVEY.md §2.4): our CLI
joins generated paths relative to the given directory (eval.py:74 joins an
absolute path, which silently always misses) and loads the generated image
for keypointing instead of passing the array where a path is expected
(eval.py:85 crash).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def cami_u_folder(cloth_dir: str, generated_dir: str) -> float:
    import cv2

    from imagdressing_tpu.eval.cami import cami_u

    scores = []
    for name in sorted(os.listdir(cloth_dir)):
        ref_path = os.path.join(cloth_dir, name)
        gen_path = os.path.join(generated_dir, name)
        if not os.path.exists(gen_path):
            scores.append(0.0)
            continue
        ref = cv2.imread(ref_path)
        gen = cv2.imread(gen_path)
        scores.append(cami_u(ref, gen))
    return float(np.mean(scores)) if scores else 0.0


def main(argv=None):
    p = argparse.ArgumentParser(description="CAMI metrics")
    sub = p.add_subparsers(dest="cmd", required=True)
    pu = sub.add_parser("cami-u")
    pu.add_argument("--cloth_path", required=True)
    pu.add_argument("--cloth_mask_path", required=True,
                    help="directory of generated garment crops")
    ps = sub.add_parser("cami-s")
    ps.add_argument("--pose_path", required=True,
                    help="reference pose render (png)")
    ps.add_argument("--gen_pose_path", required=True,
                    help="generated-image pose render (png)")
    ps.add_argument("--face_embeds", required=True,
                    help=".npy with two rows: [ref_embed, gen_embed]")
    ps.add_argument("--clip_similarity", type=float, required=True,
                    help="precomputed CLIP text-image similarity")
    from imagdressing_tpu.eval import grid as grid_lib

    grid_lib.add_parser(sub)
    args = p.parse_args(argv)

    if args.cmd == "cami-u":
        print("cami_us_score:", cami_u_folder(args.cloth_path,
                                              args.cloth_mask_path))
    elif args.cmd == "cami-s-grid":
        result = grid_lib.run(args)
        print("cami_s_score:", result["cami_s_score"],
              f"({result['num_cells']} cells,",
              f"{result['num_missing']} missing)")
    else:
        from PIL import Image

        from imagdressing_tpu.eval.cami import cami_s

        pose1 = np.asarray(Image.open(args.pose_path).convert("RGB"))
        pose2 = np.asarray(Image.open(args.gen_pose_path).convert("RGB"))
        embeds = np.load(args.face_embeds)
        print(
            "cami_s_score:",
            cami_s(pose1, pose2, embeds[0], embeds[1], args.clip_similarity),
        )


if __name__ == "__main__":
    main()
