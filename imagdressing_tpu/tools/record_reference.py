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
    # a narrow golden must not read as full parity: call out every
    # RECORD_SPEC surface the file does not cover
    for spec in RECORD_SPEC:
        prefix = spec.split("::")[0]
        if not any(g == spec or g.startswith(prefix) for g in golden.files):
            print(f"WARNING: golden lacks RECORD_SPEC surface {spec!r} — "
                  "parity is NOT checked for it", flush=True)
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


def record(args) -> None:
    """Runs in a torch/diffusers environment (NOT this build image) with the
    reference checkpoints; dumps the RECORD_SPEC tensors to --out. Name
    goldens ref_*.npz so tests/test_goldens.py picks them up."""
    try:
        import torch
        from diffusers import AutoencoderKL, DDIMScheduler, UNet2DConditionModel
        from transformers import CLIPTextModel, CLIPTokenizer, CLIPVisionModelWithProjection
    except ImportError as e:  # pragma: no cover - other-environment tool
        raise SystemExit(
            "record needs torch + diffusers + transformers with the "
            "reference checkpoints; run it next to /root/reference, then "
            "copy the .npz here as tests/goldens/ref_<name>.npz"
        ) from e

    torch.manual_seed(args.seed)
    dtype = torch.float32
    unet = UNet2DConditionModel.from_pretrained(
        args.base_dir, subfolder="unet", torch_dtype=dtype
    ).eval()
    vae = AutoencoderKL.from_pretrained(args.vae_path, torch_dtype=dtype).eval()
    text_encoder = CLIPTextModel.from_pretrained(
        args.base_dir, subfolder="text_encoder", torch_dtype=dtype
    ).eval()
    tokenizer = CLIPTokenizer.from_pretrained(args.base_dir,
                                              subfolder="tokenizer")
    image_encoder = CLIPVisionModelWithProjection.from_pretrained(
        args.image_encoder_path, torch_dtype=dtype
    ).eval()

    g = torch.Generator().manual_seed(args.seed)
    prompt_ids = tokenizer(
        args.prompt, padding="max_length", max_length=77, truncation=True,
        return_tensors="pt",
    ).input_ids
    ref_image = torch.randn(1, 3, args.size, args.size, generator=g).clamp(-1, 1)
    clip_pixels = torch.randn(1, 3, 224, 224, generator=g)
    latents = torch.randn(1, 4, args.size // 8, args.size // 8, generator=g)

    out: Dict[str, np.ndarray] = {
        "prompt_ids": prompt_ids.numpy(),
        "ref_image_nhwc": ref_image.permute(0, 2, 3, 1).numpy(),
        "clip_pixels_nhwc": clip_pixels.permute(0, 2, 3, 1).numpy(),
        "init_latents_nhwc": latents.permute(0, 2, 3, 1).numpy(),
    }
    with torch.no_grad():
        out["text_embeds"] = text_encoder(prompt_ids)[0].numpy()
        out["clip_vision_penult"] = image_encoder(
            clip_pixels, output_hidden_states=True
        ).hidden_states[-2].numpy()
        ref_latents = vae.encode(ref_image).latent_dist.mean * vae.config.scaling_factor
        out["ref_latents_nhwc"] = ref_latents.permute(0, 2, 3, 1).numpy()
        sched = DDIMScheduler(
            num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
            beta_schedule="scaled_linear", clip_sample=False,
            set_alpha_to_one=False, steps_offset=1,
        )
        sched.set_timesteps(args.steps)
        text_embeds = torch.from_numpy(out["text_embeds"])
        t0 = sched.timesteps[0]
        eps = unet(
            latents, t0, encoder_hidden_states=text_embeds
        ).sample
        out["eps_step0_nhwc"] = eps.permute(0, 2, 3, 1).numpy()
        # full DDIM loop on the base UNet -> final_latents (the adapter
        # surfaces — cloth_tokens, sa_hidden caches — additionally need the
        # reference repo's adapter modules + a converted IMAGDressing
        # checkpoint; compare() warns when a golden lacks them)
        x = latents
        for t in sched.timesteps:
            e = unet(x, t, encoder_hidden_states=text_embeds).sample
            x = sched.step(e, t, x).prev_sample
        out["final_latents_nhwc"] = x.permute(0, 2, 3, 1).numpy()

    np.savez_compressed(args.out, **out)
    print("recorded", sorted(out), "->", args.out)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("spec", help="print the tensors a recorder must dump")
    pr = sub.add_parser("record", help="dump goldens (diffusers env)")
    pr.add_argument("--base_dir", default="ckpt/Realistic_Vision_V4.0_noVAE")
    pr.add_argument("--vae_path", default="ckpt/sd-vae-ft-mse")
    pr.add_argument("--image_encoder_path", default="ckpt/image_encoder")
    pr.add_argument("--prompt", default="A beautiful woman")
    pr.add_argument("--size", type=int, default=512)
    pr.add_argument("--steps", type=int, default=30)
    pr.add_argument("--seed", type=int, default=42)
    pr.add_argument("--out", default="ref_base.npz")
    pc = sub.add_parser("compare")
    pc.add_argument("--golden", required=True)
    pc.add_argument("--computed", required=True,
                    help=".npz produced by our pipeline with matching keys")
    args = p.parse_args(argv)
    if args.cmd == "spec":
        print(json.dumps(RECORD_SPEC, indent=2))
    elif args.cmd == "record":
        record(args)
    else:
        computed = dict(np.load(args.computed))
        errors = compare(args.golden, computed)
        print(json.dumps({k: round(v, 8) for k, v in errors.items()},
                         indent=2))
        print("PARITY OK")


if __name__ == "__main__":
    main()
