"""Unified inference CLI — replaces all seven reference entry scripts.

  python -m imagdressing_tpu.apps.dress --preset basic    --cloth_path X
  python -m imagdressing_tpu.apps.dress --preset cartoon  --cloth_path X
  python -m imagdressing_tpu.apps.dress --preset pose     --cloth_path X --pose_path P
  python -m imagdressing_tpu.apps.dress --preset ipa_pose --cloth_path X --pose_path P --face_path F
  python -m imagdressing_tpu.apps.dress --preset inpaint  --cloth_path X --model_path M

Argument names track the reference CLIs (--cloth_path/--model_ckpt/
--output_path, inference_IMAGdressing.py:139-146). Folder batch mode
(--cloth_dir etc.) replaces the *_folder.py scripts — and actually batches
on device instead of looping serially.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="IMAGDressing-TPU")
    p.add_argument("--preset", default="basic",
                   choices=["basic", "cartoon", "pose", "ipa_pose", "inpaint"])
    p.add_argument("--model_ckpt", default="ckpt/IMAGDressing-v1_512.pt")
    p.add_argument("--base_dir", default="ckpt/Realistic_Vision_V4.0_noVAE",
                   help="SD1.5 checkpoint dir (unet/, text_encoder/, tokenizer/)")
    p.add_argument("--vae_path", default="ckpt/sd-vae-ft-mse")
    p.add_argument("--image_encoder_path", default="ckpt/image_encoder")
    p.add_argument("--controlnet_path", default=None)
    p.add_argument("--ip_ckpt", default=None)
    p.add_argument("--cloth_path", type=str, default=None)
    p.add_argument("--cloth_dir", type=str, default=None)
    p.add_argument("--pose_path", type=str, default=None)
    p.add_argument("--face_path", type=str, default=None)
    p.add_argument("--model_path", type=str, default=None,
                   help="person photo for outfit-swap inpainting")
    p.add_argument("--prompt", type=str, default=None)
    p.add_argument("--negative_prompt", type=str, default=None)
    p.add_argument("--output_path", type=str, default="./output_sd_base")
    p.add_argument("--num_inference_steps", type=int, default=None)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--guidance_scale", type=float, default=None)
    p.add_argument("--image_scale", type=float, default=None)
    p.add_argument("--lora_scale", type=float, default=0.2)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--batch_size", type=int, default=1,
                   help="garments per device batch in --cloth_dir mode (the "
                        "reference's *_folder.py scripts loop serially)")
    p.add_argument("--data_parallel", type=int, default=1,
                   help="shard the batch across this many chips (-1 = all "
                        "devices); one garment per chip on a v5e-8 pod slice")
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="split the UNet weights across this many chips "
                        "(core/tp.py specs) — batch-1 latency scaling")
    p.add_argument("--sampler", default=None,
                   choices=[None, "ddim", "unipc", "dpm2m"])
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    from PIL import Image

    from imagdressing_tpu.apps import image_utils as iu
    from imagdressing_tpu.apps.loader import load_dressing_models
    from imagdressing_tpu.apps.tokenizer import load_tokenizer
    from imagdressing_tpu.core.config import PRESETS
    from imagdressing_tpu.pipelines.dressing import DressingPipeline

    import dataclasses

    preset = PRESETS[args.preset]
    if args.sampler:
        preset = dataclasses.replace(preset, sampler=args.sampler)
    if args.height:
        preset = dataclasses.replace(preset, height=args.height)
    if args.width:
        preset = dataclasses.replace(preset, width=args.width)
    models = load_dressing_models(
        base_dir=args.base_dir,
        vae_path=args.vae_path,
        image_encoder_path=args.image_encoder_path,
        model_ckpt=args.model_ckpt,
        controlnet_path=args.controlnet_path,
        ip_ckpt=args.ip_ckpt,
        lora_scale=args.lora_scale if preset.use_ipa else 0.0,
    )
    tokenizer = load_tokenizer(os.path.join(args.base_dir, "tokenizer"))
    mesh = None
    if args.data_parallel != 1 or args.tensor_parallel != 1:
        import jax

        from imagdressing_tpu.core import mesh as mesh_lib

        devices = jax.devices()
        tp_n = max(args.tensor_parallel, 1)
        need = max(args.data_parallel, 1) * tp_n
        if need > len(devices):
            # virtual-device dev runs (8 CPU devices); real pods have chips
            devices = jax.devices("cpu")
        dp = (args.data_parallel if args.data_parallel > 0
              else len(devices) // tp_n)
        mesh = mesh_lib.make_mesh(data=dp, model=tp_n,
                                  devices=devices[: dp * tp_n])
        args.batch_size = max(args.batch_size, mesh.shape[mesh_lib.DATA_AXIS])
    pipe = DressingPipeline(models, preset, mesh=mesh)

    prompt = args.prompt or (
        "A beautiful woman, confident smile expression, best quality, high quality"
        if args.preset == "cartoon"
        else iu.DEFAULT_PROMPT
    )
    negative = args.negative_prompt or iu.DEFAULT_NEGATIVE

    if not args.cloth_dir and not args.cloth_path:
        raise SystemExit("one of --cloth_path / --cloth_dir is required")
    _img_exts = (".jpg", ".jpeg", ".png", ".bmp", ".webp")
    cloths = (
        sorted(
            os.path.join(args.cloth_dir, f)
            for f in os.listdir(args.cloth_dir)
            if f.lower().endswith(_img_exts)
        )
        if args.cloth_dir
        else [args.cloth_path]
    )
    if not cloths:
        raise SystemExit(f"no images found in {args.cloth_dir}")
    os.makedirs(args.output_path, exist_ok=True)

    extra = {}
    if args.pose_path:
        pose = Image.open(args.pose_path).convert("RGB").resize(
            (preset.width, preset.height), Image.BILINEAR
        )
        extra["pose_image"] = (np.asarray(pose, np.float32) / 255.0)[None]
    if args.face_path:
        from imagdressing_tpu.preprocess.face import face_embeds_from_image

        fid, fclip = face_embeds_from_image(args.face_path)
        extra["faceid_embeds"], extra["face_clip_image"] = fid, fclip
    if args.model_path:
        extra["person_image"] = iu.prepare_person(
            args.model_path, preset.height, preset.width
        )
        from imagdressing_tpu.preprocess.mask import person_upper_body_mask

        extra["mask_image"] = person_upper_body_mask(
            args.model_path, preset.height, preset.width
        )
        # inpaint-ControlNet conditioning: person in [0,1] with masked
        # pixels = -1 (reference make_inpaint_condition,
        # inference_IMAGdressing_controlnetinpainting.py:48-59)
        from imagdressing_tpu.preprocess.mask import make_inpaint_condition

        person01 = (extra["person_image"][0] + 1.0) / 2.0
        extra["pose_image"] = make_inpaint_condition(
            person01, extra["mask_image"][0, ..., 0]
        )

    bs = max(1, args.batch_size)
    for start in range(0, len(cloths), bs):
        chunk = cloths[start : start + bs]
        n_real = len(chunk)
        # pad the ragged final chunk by repeating its last garment: a
        # different batch size would re-trace/compile the whole pipeline
        # (minutes over a remote-compile link) for one leftover shape
        if n_real < bs and start > 0:
            chunk = chunk + [chunk[-1]] * (bs - n_real)
        prepped = [
            iu.prepare_garment(
                cp, preset.height, preset.width,
                clip_size=models.vision_cfg.image_size,
            )
            for cp in chunk
        ]
        b = len(chunk)
        batched_extra = {
            k: (np.repeat(v, b, axis=0) if v is not None and b > 1 else v)
            for k, v in extra.items()
        }
        out = pipe(
            prompt_ids=np.repeat(tokenizer(prompt)[None], b, axis=0),
            negative_prompt_ids=np.repeat(tokenizer(negative)[None], b, axis=0),
            ref_image=np.concatenate([p[0] for p in prepped]),
            ref_clip_image=np.concatenate([p[1] for p in prepped]),
            seed=args.seed,
            num_inference_steps=args.num_inference_steps,
            guidance_scale=args.guidance_scale,
            image_scale=args.image_scale,
            **batched_extra,
        )
        for i, cloth_path in enumerate(chunk[:n_real]):
            img = iu.to_pil(out[i : i + 1])
            collage = iu.image_grid(
                [prepped[i][2].resize((preset.width, preset.height),
                                      Image.BICUBIC)] + img,
                1, 2,
            )
            collage.save(
                os.path.join(args.output_path, os.path.basename(cloth_path))
            )
            print("saved", os.path.basename(cloth_path))


if __name__ == "__main__":
    main()
