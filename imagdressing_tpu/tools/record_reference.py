"""Golden-activation recording + comparison harness.

Seed-fixed numerical parity against the reference pipelines (SURVEY.md §4)
needs the reference's torch/diffusers stack and its checkpoints — neither
exists in the build image. This tool splits the workflow so parity can be
executed wherever those artifacts live:

  1. `record` (run in a diffusers environment, e.g. alongside
     /root/reference): capture deterministic intermediate tensors into an
     .npz — text-encoder outputs, CLIP-vision penultimate states, Resampler
     tokens, garment-UNet attn1 caches, per-step UNet eps, final latents.
  2. `compare` (run here): load the same converted checkpoints with our
     stack, replay the identical inputs, and diff each tensor at fp32
     tolerance.

tests/ consume any goldens dropped under tests/goldens/*.npz automatically
(skipped when absent).
"""

from __future__ import annotations

import argparse
import json
from typing import Dict

import numpy as np

RECORD_SPEC = {
    # name: (description, producing call in the reference)
    "text_embeds": "CLIPTextModel(prompt_ids).last_hidden_state",
    "clip_vision_penult": "image_encoder(pixel, output_hidden_states=True).hidden_states[-2]",
    "cloth_tokens": "Resampler(clip_vision_penult)",
    "ref_latents": "vae.encode(ref_image).latent_dist.mean * 0.18215",
    "sa_hidden::<layer>": "CacheAttnProcessor caches per attn1 layer (cond half)",
    "eps_step0": "unet(latents, t0, ...) first-step noise prediction",
    "final_latents": "latents after the full DDIM loop",
}


def compare(golden_path: str, computed: Dict[str, np.ndarray],
            *, atol: float = 5e-3, rtol: float = 1e-3) -> Dict[str, float]:
    """Diff computed tensors against a golden .npz; returns max abs errors
    and raises AssertionError listing failures."""
    golden = np.load(golden_path)
    errors = {}
    failures = []
    for name in golden.files:
        if name not in computed:
            failures.append(f"{name}: not computed")
            continue
        want = golden[name]
        got = np.asarray(computed[name], np.float32)
        if got.shape != want.shape:
            failures.append(f"{name}: shape {got.shape} vs {want.shape}")
            continue
        err = float(np.max(np.abs(got - want)))
        errors[name] = err
        tol = atol + rtol * float(np.max(np.abs(want)))
        if err > tol:
            failures.append(f"{name}: max err {err:.2e} > tol {tol:.2e}")
    if failures:
        raise AssertionError("golden mismatches:\n  " + "\n  ".join(failures))
    return errors


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    ps = sub.add_parser("spec", help="print the tensors a recorder must dump")
    pc = sub.add_parser("compare")
    pc.add_argument("--golden", required=True)
    pc.add_argument("--computed", required=True,
                    help=".npz produced by our pipeline with matching keys")
    args = p.parse_args(argv)
    if args.cmd == "spec":
        print(json.dumps(RECORD_SPEC, indent=2))
    else:
        computed = dict(np.load(args.computed))
        errors = compare(args.golden, computed)
        print(json.dumps({k: round(v, 8) for k, v in errors.items()},
                         indent=2))
        print("PARITY OK")


if __name__ == "__main__":
    main()
