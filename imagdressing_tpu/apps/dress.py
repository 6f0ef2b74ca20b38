"""Unified inference CLI — replaces all seven reference entry scripts.

  python -m imagdressing_tpu.apps.dress --preset basic    --cloth_path X
  python -m imagdressing_tpu.apps.dress --preset cartoon  --cloth_path X
  python -m imagdressing_tpu.apps.dress --preset pose     --cloth_path X --pose_path P
  python -m imagdressing_tpu.apps.dress --preset ipa_pose --cloth_path X --pose_path P --face_path F
  python -m imagdressing_tpu.apps.dress --preset inpaint  --cloth_path X --model_path M

Argument names track the reference CLIs (--cloth_path/--model_ckpt/
--output_path, inference_IMAGdressing.py:139-146). Folder batch mode
(--cloth_dir etc.) replaces the *_folder.py scripts — and actually batches
on device instead of looping serially. --pose_dir/--face_dir/--model_dir
reproduce those scripts' nested cross-product loops (pose x face x cloth,
model x cloth) with the reference's f"{factor}_{cloth}.png" output naming.
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
    p.add_argument("--trained_ckpt", default=None,
                   help="orbax checkpoint dir from train_cli: overlays the "
                        "trained {ref_unet, adapters, resampler} onto the "
                        "base stack (train->serve loop)")
    p.add_argument("--cloth_path", type=str, default=None)
    p.add_argument("--cloth_dir", type=str, default=None)
    p.add_argument("--pose_path", type=str, default=None)
    p.add_argument("--pose_dir", type=str, default=None,
                   help="cross-product over pose images (reference "
                        "*_folder.py nested loops)")
    p.add_argument("--face_path", type=str, default=None)
    p.add_argument("--face_dir", type=str, default=None,
                   help="cross-product over face photos "
                        "(inference_IMAGdressing_ipa_controlnetpose_folder"
                        ".py:196-253 face x cloth loop)")
    p.add_argument("--model_path", type=str, default=None,
                   help="person photo for outfit-swap inpainting")
    p.add_argument("--model_dir", type=str, default=None,
                   help="cross-product over person photos "
                        "(inference_IMAGdressing_controlnetinpainting_folder"
                        ".py:197-243 model x cloth loop)")
    p.add_argument("--prompt", type=str, default=None)
    p.add_argument("--negative_prompt", type=str, default=None)
    p.add_argument("--output_path", type=str, default="./output_sd_base")
    p.add_argument("--num_inference_steps", type=int, default=None)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--guidance_scale", type=float, default=None)
    p.add_argument("--image_scale", type=float, default=None)
    p.add_argument("--controlnet_scale", type=float, default=None)
    p.add_argument("--control_guidance_start", type=float, default=None,
                   help="ControlNet step window lower bound in [0,1] "
                        "(diffusers controlnet_keep; default 0 = from the "
                        "first step)")
    p.add_argument("--control_guidance_end", type=float, default=None,
                   help="ControlNet step window upper bound in [0,1] "
                        "(default 1 = through the last step)")
    p.add_argument("--eta", type=float, default=None,
                   help="DDIM stochasticity in [0,1] (diffusers eta; "
                        "0 = deterministic, ddim sampler only)")
    p.add_argument("--clip_skip", type=int, default=None,
                   help="drop the last k CLIP text layers (diffusers "
                        "clip_skip; anime checkpoints conventionally use 2)")
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
    p.add_argument("--allow_cpu_mesh", action="store_true",
                   help="permit falling back to host-CPU virtual devices "
                        "when fewer accelerator chips than requested exist "
                        "(dev/testing only: diffusion on CPU is glacial)")
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
    if args.clip_skip is not None:
        preset = dataclasses.replace(preset, clip_skip=args.clip_skip)
    models = load_dressing_models(
        base_dir=args.base_dir,
        vae_path=args.vae_path,
        image_encoder_path=args.image_encoder_path,
        model_ckpt=args.model_ckpt,
        controlnet_path=args.controlnet_path,
        ip_ckpt=args.ip_ckpt,
        lora_scale=args.lora_scale if preset.use_ipa else 0.0,
    )
    if args.trained_ckpt:
        from imagdressing_tpu.apps.loader import merge_trained_checkpoint

        models = merge_trained_checkpoint(models, args.trained_ckpt)
    tokenizer = load_tokenizer(os.path.join(args.base_dir, "tokenizer"))
    mesh = None
    if args.data_parallel != 1 or args.tensor_parallel != 1:
        import jax

        from imagdressing_tpu.core import mesh as mesh_lib

        devices = jax.devices()
        tp_n = max(args.tensor_parallel, 1)
        need = max(args.data_parallel, 1) * tp_n
        if need > len(devices):
            # Requesting more chips than the accelerator backend has must be
            # LOUD: silently meshing over host CPUs would run the whole
            # diffusion glacially on exactly the pod user this flag targets.
            if not args.allow_cpu_mesh:
                raise SystemExit(
                    f"--data_parallel {args.data_parallel} x "
                    f"--tensor_parallel {tp_n} needs {need} devices but the "
                    f"{devices[0].platform} backend has {len(devices)}; "
                    "pass --allow_cpu_mesh to run on virtual CPU devices "
                    "(dev/testing only)"
                )
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

    def _list_images(d):
        files = sorted(
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.lower().endswith(_img_exts)
        )
        if not files:
            raise SystemExit(f"no images found in {d}")
        return files

    cloths = _list_images(args.cloth_dir) if args.cloth_dir else [args.cloth_path]
    # cross-product factors (reference *_folder.py nested loops: outer
    # factor file, inner cloth file — inference_IMAGdressing_ipa_
    # controlnetpose_folder.py:200-253, ..._controlnetinpainting_folder
    # .py:200-243); a plain --xxx_path is the degenerate one-element factor
    poses = _list_images(args.pose_dir) if args.pose_dir else [args.pose_path]
    faces = _list_images(args.face_dir) if args.face_dir else [args.face_path]
    persons = (_list_images(args.model_dir) if args.model_dir
               else [args.model_path])
    os.makedirs(args.output_path, exist_ok=True)

    # per-path preprocessing caches: a factor image is prepared once no
    # matter how many grid rows reuse it
    pose_cache, face_cache, person_cache = {}, {}, {}

    def _extras_for(pose_path, face_path, person_path):
        ex = {}
        if pose_path:
            if pose_path not in pose_cache:
                pose = Image.open(pose_path).convert("RGB").resize(
                    (preset.width, preset.height), Image.BILINEAR
                )
                pose_cache[pose_path] = (
                    np.asarray(pose, np.float32) / 255.0
                )[None]
            ex["pose_image"] = pose_cache[pose_path]
        if face_path:
            if face_path not in face_cache:
                from imagdressing_tpu.preprocess.face import (
                    face_embeds_from_image,
                )

                face_cache[face_path] = face_embeds_from_image(face_path)
            ex["faceid_embeds"], ex["face_clip_image"] = face_cache[face_path]
        if person_path:
            if person_path not in person_cache:
                from imagdressing_tpu.preprocess.mask import (
                    make_inpaint_condition,
                    person_upper_body_mask,
                )

                person = iu.prepare_person(
                    person_path, preset.height, preset.width
                )
                mask = person_upper_body_mask(
                    person_path, preset.height, preset.width
                )
                # inpaint-ControlNet conditioning: person in [0,1] with
                # masked pixels = -1 (reference make_inpaint_condition,
                # inference_IMAGdressing_controlnetinpainting.py:48-59)
                person01 = (person[0] + 1.0) / 2.0
                cond = make_inpaint_condition(person01, mask[0, ..., 0])
                person_cache[person_path] = {
                    "person_image": person,
                    "mask_image": mask,
                    "pose_image": cond,
                }
            ex.update(person_cache[person_path])
        return ex

    def _out_name(item):
        cloth_path, pose_path, face_path, person_path = item
        stems = [
            os.path.splitext(os.path.basename(p))[0]
            for p, is_dir in (
                (pose_path, args.pose_dir),
                (face_path, args.face_dir),
                (person_path, args.model_dir),
            )
            if is_dir and p
        ]
        cloth_name = os.path.basename(cloth_path)
        if not stems:
            return cloth_name  # single-factor mode keeps the garment name
        # reference naming: f"{factor}_{cloth}.png" (..._folder.py:251-253)
        return "_".join(stems + [os.path.splitext(cloth_name)[0]]) + ".png"

    # factor-major order like the reference's nested loops; the device batch
    # dim then chews through the flat grid instead of looping serially
    items = [
        (c, pp, fp, mp)
        for pp in poses for fp in faces for mp in persons for c in cloths
    ]

    bs = max(1, args.batch_size)
    for start in range(0, len(items), bs):
        chunk = items[start : start + bs]
        n_real = len(chunk)
        # pad the ragged final chunk by repeating its last row: a different
        # batch size would re-trace/compile the whole pipeline (minutes over
        # a remote-compile link) for one leftover shape
        if n_real < bs and start > 0:
            chunk = chunk + [chunk[-1]] * (bs - n_real)
        prepped = [
            iu.prepare_garment(
                item[0], preset.height, preset.width,
                clip_size=models.vision_cfg.image_size,
            )
            for item in chunk
        ]
        extras = [_extras_for(pp, fp, mp) for (_c, pp, fp, mp) in chunk]
        b = len(chunk)
        # every row carries the same factor kinds (the lists are homogeneous)
        batched_extra = {
            k: np.concatenate([e[k] for e in extras])
            for k in (extras[0] if extras else {})
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
            controlnet_scale=args.controlnet_scale,
            control_guidance_start=args.control_guidance_start,
            control_guidance_end=args.control_guidance_end,
            eta=args.eta,
            **batched_extra,
        )
        for i, item in enumerate(chunk[:n_real]):
            img = iu.to_pil(out[i : i + 1])
            collage = iu.image_grid(
                [prepped[i][2].resize((preset.width, preset.height),
                                      Image.BICUBIC)] + img,
                1, 2,
            )
            name = _out_name(item)
            collage.save(os.path.join(args.output_path, name))
            print("saved", name)


if __name__ == "__main__":
    main()
