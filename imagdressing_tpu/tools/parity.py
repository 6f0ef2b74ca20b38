"""Weights-day parity runbook — ONE command that takes a machine from "has
the reference checkpoints" to "seed-fixed fp32 parity verified".

This build image has no diffusers/torch-weights (zero egress), so full
image-level parity vs the REAL reference (BASELINE.md target 3) cannot be
*measured* here — but the entire harness can be *executed*: `--dry-run`
drives the identical record → manifest → replay → gate → image sequence on
the synthetic small stack (PARITY.md "known gaps").

On a weights-provisioned machine (checkpoints laid out as the reference
README's ckpt/ tree: Realistic_Vision_V4.0_noVAE, sd-vae-ft-mse,
image_encoder, IMAGDressing-v1_512.pt):

  1. In a diffusers env (can be a different venv/host than this repo's):
       python -m imagdressing_tpu.tools.record_reference record \\
           --base_dir ckpt/Realistic_Vision_V4.0_noVAE \\
           --vae_path ckpt/sd-vae-ft-mse \\
           --image_encoder_path ckpt/image_encoder \\
           --seed 42 --steps 30 --out tests/goldens/ref_base.npz
  2. Back here (or in the same checkout):
       python -m imagdressing_tpu.tools.parity \\
           --golden tests/goldens/ref_base.npz \\
           --base_dir ckpt/Realistic_Vision_V4.0_noVAE \\
           --vae_path ckpt/sd-vae-ft-mse \\
           --image_encoder_path ckpt/image_encoder \\
           --model_ckpt ckpt/IMAGDressing-v1_512.pt
     which writes the torch manifest beside the golden, replays every
     recorded tensor through our stack at fp32 tolerance, arms the pytest
     gate (tests/test_goldens.py picks the golden up from then on), and
     renders the seed-42 image for a visual diff against the reference's
     assets (e.g. /root/reference/assets/compare_magic2.png style output).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _step(n: int, msg: str) -> None:
    print(f"[parity {n}] {msg}", flush=True)


def run_dry(out_dir: str) -> None:
    """Synthetic end-to-end: executes every stage of the weights-day flow
    with the deterministic small random stack (no weights blob needed) for
    ALL FOUR reference pipelines (VERDICT r4 next #2)."""
    import numpy as np

    from imagdressing_tpu.tools import record_reference as rr

    os.makedirs(out_dir, exist_ok=True)

    per_preset = {}
    worst = 0.0
    n_tensors = 0
    for i, preset_name in enumerate(("basic", "pose", "ipa_pose", "inpaint")):
        golden = os.path.join(out_dir, f"ref_dryrun_{preset_name}.npz")
        _step(1, f"record {preset_name} golden (synthetic stack stands in "
                 "for diffusers)")
        rr.record_synthetic(golden, seed=42, steps=4, preset=preset_name)

        _step(2, f"replay {preset_name} golden through our stack + "
                 "fp32-tolerance compare")
        errors = rr.replay(golden)
        w = max(errors.values())
        print(f"  {len(errors)} tensors compared, worst max-err {w:.2e}")
        per_preset[preset_name] = {
            "golden": golden,
            "tensors_compared": sorted(errors),
            "worst_max_err": w,
        }
        worst = max(worst, w)
        n_tensors += len(errors)
    golden = per_preset["basic"]["golden"]

    _step(3, "render the seed-42 image (basic preset)")
    import dataclasses

    import jax

    from imagdressing_tpu.core.config import PRESETS
    from imagdressing_tpu.pipelines.dressing import (
        DressingModels,
        DressingPipeline,
    )

    models = DressingModels.init_random(jax.random.PRNGKey(42), small=True)
    preset = dataclasses.replace(
        PRESETS["basic"], height=64, width=64, num_inference_steps=2
    )
    pipe = DressingPipeline(models, preset)
    rng = np.random.default_rng(42)
    img = pipe(
        prompt_ids=rng.integers(0, 255, (1, 77)),
        negative_prompt_ids=rng.integers(0, 255, (1, 77)),
        ref_image=rng.standard_normal((1, 64, 64, 3))
        .astype(np.float32).clip(-1, 1),
        ref_clip_image=rng.standard_normal(
            (1, models.vision_cfg.image_size, models.vision_cfg.image_size, 3)
        ).astype(np.float32),
        seed=42,
        output_uint8=True,
    )
    img_path = os.path.join(out_dir, "seed42.png")
    try:
        from PIL import Image

        Image.fromarray(np.asarray(img[0])).save(img_path)
    except ImportError:  # pragma: no cover
        np.save(img_path + ".npy", np.asarray(img))

    report = {
        "mode": "dry-run",
        "presets": per_preset,
        "tensors_compared_total": n_tensors,
        "worst_max_err": worst,
        "image": img_path,
        "ok": True,
    }
    rp = os.path.join(out_dir, "parity_report.json")
    with open(rp, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=2)
    _step(4, f"PARITY DRY-RUN OK -> {rp}")


def _golden_path(template: str, preset: str) -> str:
    return (template if preset == "basic"
            else template.replace(".npz", f"_{preset}.npz"))


def run_real(args) -> None:
    """The weights-day flow, per preset (all four reference pipelines by
    default). Each stage prints exactly what is missing when its
    prerequisite is absent, so the runbook is self-guiding."""
    from imagdressing_tpu.tools import record_reference as rr

    presets = [s.strip() for s in args.presets.split(",") if s.strip()]
    goldens = {pr: _golden_path(args.golden, pr) for pr in presets}
    missing = {pr: g for pr, g in goldens.items() if not os.path.exists(g)}
    if missing:
        _step(1, "goldens missing — record them in a diffusers environment:")
        for pr, g in missing.items():
            print(
                "  python -m imagdressing_tpu.tools.record_reference record"
                " \\\n"
                f"      --preset {pr} \\\n"
                f"      --base_dir {args.base_dir} --vae_path"
                f" {args.vae_path} \\\n"
                f"      --image_encoder_path {args.image_encoder_path} \\\n"
                f"      --controlnet_path {args.controlnet_path} \\\n"
                f"      --seed {args.seed} --steps {args.steps} "
                f"--out {g}",
            )
        print("  then re-run this command.")
        sys.exit(2)
    _step(1, f"goldens present: {', '.join(goldens.values())}")

    for path in (args.base_dir, args.vae_path, args.image_encoder_path):
        if not os.path.exists(path):
            print(f"  checkpoint path missing: {path} (reference README "
                  "ckpt/ layout)")
            sys.exit(2)

    _step(2, "write the torch weights manifest beside each golden")
    manifest = {
        "kind": "torch",
        "base_dir": args.base_dir,
        "vae_path": args.vae_path,
        "image_encoder_path": args.image_encoder_path,
        "model_ckpt": args.model_ckpt,
    }
    for g in goldens.values():
        with open(rr.manifest_path_for(g), "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=2)
    mpath = rr.manifest_path_for(goldens[presets[0]])

    _step(3, "replay goldens through the converted weights (fp32 parity)")
    errors = {}
    for pr, g in goldens.items():
        e = rr.replay(g)
        print(f"  [{pr}] {len(e)} tensors compared, worst max-err "
              f"{max(e.values()):.2e}")
        errors.update({f"{pr}::{k}": v for k, v in e.items()})
    worst = max(errors.values())
    golden = goldens[presets[0]]

    _step(4, "the pytest gate is now armed — run it")
    print("  python -m pytest tests/test_goldens.py -q")

    _step(5, "render the seed-42 image for the visual diff")
    print(
        "  python -m imagdressing_tpu.apps.dress --preset basic \\\n"
        f"      --base_dir {args.base_dir} --vae_path {args.vae_path} \\\n"
        f"      --image_encoder_path {args.image_encoder_path} \\\n"
        f"      --model_ckpt {args.model_ckpt} \\\n"
        "      --cloth_path <garment.jpg> --seed 42 --output_path parity_out\n"
        "  and compare against the reference's published outputs "
        "(assets/compare_magic2.png style)."
    )

    report = {
        "mode": "weights",
        "golden": golden,
        "manifest": mpath,
        "tensors_compared": sorted(errors),
        "worst_max_err": worst,
        "ok": True,
    }
    rp = os.path.join(os.path.dirname(golden) or ".", "parity_report.json")
    with open(rp, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=2)
    _step(6, f"PARITY OK -> {rp}")


def main(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    p.add_argument("--dry-run", action="store_true",
                   help="execute the full flow on the synthetic stack "
                        "(works in this weights-less image)")
    p.add_argument("--out_dir", default="parity_out",
                   help="dry-run artifact directory")
    p.add_argument("--golden", default="tests/goldens/ref_base.npz",
                   help="basic-preset golden path; other presets use "
                        "<stem>_<preset>.npz beside it")
    p.add_argument("--presets", default="basic,pose,ipa_pose,inpaint",
                   help="comma list of reference pipelines to verify")
    p.add_argument("--controlnet_path",
                   default="ckpt/control_v11p_sd15_openpose")
    p.add_argument("--base_dir", default="ckpt/Realistic_Vision_V4.0_noVAE")
    p.add_argument("--vae_path", default="ckpt/sd-vae-ft-mse")
    p.add_argument("--image_encoder_path", default="ckpt/image_encoder")
    p.add_argument("--model_ckpt", default="ckpt/IMAGDressing-v1_512.pt")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--steps", type=int, default=30)
    args = p.parse_args(argv)
    if args.dry_run:
        run_dry(args.out_dir)
    else:
        run_real(args)


if __name__ == "__main__":
    main()
