"""Serving app — the TPU-native replacement for the reference's gradio UI.

The reference (/root/reference/app.py:170-253) rebuilds the diffusers
pipeline AND a modelscope face-fusion pipeline on every HTTP request and
serializes everything through gradio's queue. Here:

  * models load once; the jitted program is compiled once per shape config;
  * requests flow through a queue into a single device worker that
    micro-batches compatible requests (same preset/steps) up to
    `max_batch`;
  * a stdlib ThreadingHTTPServer exposes POST /dress (JSON or multipart) and
    a minimal HTML form at / — no web-framework dependency (gradio is used
    instead when installed: `--ui gradio`).

API:
  POST /dress  {"prompt": str, "negative_prompt": str, "steps": int,
                "guidance_scale": float, "image_scale": float, "seed": int,
                "cloth_image": base64-png}
  -> {"image": base64-png, "latency_s": float}
"""

from __future__ import annotations

import base64
import io
import json
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional

import numpy as np

_FORM = """<!doctype html><title>IMAGDressing-TPU</title>
<h2>IMAGDressing-TPU</h2>
<form method=post action=/dress_form enctype=multipart/form-data>
Garment image: <input type=file name=cloth><br>
Prompt: <input name=prompt size=60 value="A beautiful woman, best quality"><br>
Steps: <input name=steps value=30 size=4>
Guidance: <input name=guidance_scale value=7.5 size=4>
Cloth scale: <input name=image_scale value=1.0 size=4>
Seed: <input name=seed value=42 size=8><br>
<input type=submit value=Dress>
</form>"""


@dataclass
class _Request:
    payload: Dict[str, Any]
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[Dict[str, Any]] = None


class InferenceWorker:
    """Single device-owner thread; micro-batches queued requests.

    `post_process(img01, payload) -> img01` runs on every decoded image —
    the seam for the reference's modelscope face-fusion step
    (/root/reference/app.py:172,244-252): plug a face-swap/blend callable
    here without touching the device worker. The hook always sees float32
    [0, 1] (the worker converts around the uint8 device transport); the
    worker's `result["image"]` is uint8 HxWx3 in [0, 255].
    """

    def __init__(self, pipe, tokenizer, *, max_batch: int = 4,
                 post_process=None):
        self.pipe = pipe
        self.tokenizer = tokenizer
        self.max_batch = max_batch
        self.post_process = post_process
        self.queue: "queue.Queue[_Request]" = queue.Queue()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, payload: Dict[str, Any]) -> Dict[str, Any]:
        req = _Request(payload)
        self.queue.put(req)
        req.event.wait()
        assert req.result is not None
        return req.result

    def _collect(self) -> List[_Request]:
        batch = [self.queue.get()]
        key = self._batch_key(batch[0])
        while len(batch) < self.max_batch:
            try:
                nxt = self.queue.get_nowait()
            except queue.Empty:
                break
            if self._batch_key(nxt) == key:
                batch.append(nxt)
            else:
                # different config — run it in its own round
                self.queue.put(nxt)
                break
        return batch

    @staticmethod
    def _batch_key(req: _Request):
        # every per-CALL (not per-sample) pipeline argument must be in the
        # key — requests only share a batch when the whole call config
        # matches, otherwise later requests would silently inherit the
        # first request's seed / scales
        p = req.payload
        return (p.get("steps"), p.get("guidance_scale"),
                p.get("seed", 42), p.get("image_scale"))

    def _loop(self):
        from imagdressing_tpu.apps import image_utils as iu

        while True:
            batch = self._collect()
            t0 = time.perf_counter()
            try:
                prompts = np.stack(
                    [self.tokenizer(r.payload["prompt"]) for r in batch]
                )
                negatives = np.stack(
                    [
                        self.tokenizer(
                            r.payload.get("negative_prompt", iu.DEFAULT_NEGATIVE)
                        )
                        for r in batch
                    ]
                )
                refs = np.concatenate(
                    [r.payload["ref_image"] for r in batch]
                )
                clips = np.concatenate(
                    [r.payload["ref_clip_image"] for r in batch]
                )
                first = batch[0].payload
                out = self.pipe(
                    prompt_ids=prompts,
                    negative_prompt_ids=negatives,
                    ref_image=refs,
                    ref_clip_image=clips,
                    seed=int(first.get("seed", 42)),
                    num_inference_steps=int(first.get("steps") or 0) or None,
                    guidance_scale=first.get("guidance_scale"),
                    image_scale=first.get("image_scale"),
                    # serving contract (perf ledger): uint8 readback is 4x
                    # less tunnel/PCIe traffic; _png_b64 consumes it as-is
                    output_uint8=True,
                )
                dt = time.perf_counter() - t0
                for i, r in enumerate(batch):
                    img = out[i]
                    if self.post_process is not None:
                        # the hook contract is float [0,1] regardless of the
                        # device-transport dtype (uint8 readback above)
                        img01 = (img.astype(np.float32) / 255.0
                                 if img.dtype == np.uint8 else img)
                        img01 = self.post_process(img01, r.payload)
                        img = np.clip(
                            np.asarray(img01, np.float32) * 255.0, 0, 255
                        ).round().astype(np.uint8)
                    r.result = {"image": img, "latency_s": dt}
                    r.event.set()
            except Exception as e:  # noqa: BLE001 — report errors per request
                for r in batch:
                    if r.event.is_set():
                        continue  # already answered (e.g. post_process
                        # failed on a LATER batch member) — don't clobber
                    r.result = {"error": f"{type(e).__name__}: {e}"}
                    r.event.set()


def _png_b64(img: np.ndarray) -> str:
    from PIL import Image

    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def make_handler(worker: InferenceWorker, preset):
    from imagdressing_tpu.apps import image_utils as iu
    from PIL import Image

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            self._send(200, _FORM.encode(), "text/html")

        def do_POST(self):
            length = int(self.headers.get("Content-Length", "0"))
            raw = self.rfile.read(length)
            try:
                if self.path == "/dress":
                    payload = json.loads(raw)
                    cloth = Image.open(
                        io.BytesIO(base64.b64decode(payload.pop("cloth_image")))
                    ).convert("RGB")
                elif self.path == "/dress_form":
                    payload, cloth = _parse_multipart(
                        raw, self.headers.get("Content-Type", "")
                    )
                else:
                    self._send(404, b"not found", "text/plain")
                    return
                cloth = iu.resize_img(cloth)
                ref = (
                    np.asarray(
                        cloth.resize((preset.width, preset.height)), np.float32
                    ) / 127.5 - 1.0
                )[None]
                from imagdressing_tpu.train.data import clip_preprocess_np

                vision_size = worker.pipe.models.vision_cfg.image_size
                clip_view = clip_preprocess_np(
                    np.asarray(cloth), size=vision_size
                )[None]
                payload["ref_image"] = ref
                payload["ref_clip_image"] = clip_view
                payload.setdefault("prompt", iu.DEFAULT_PROMPT)
                result = worker.submit(payload)
                if "error" in result:
                    self._send(
                        500, json.dumps(result).encode(), "application/json"
                    )
                    return
                b64 = _png_b64(result["image"])
                if self.path == "/dress_form":
                    html = (
                        f"<img src='data:image/png;base64,{b64}'>"
                        f"<p>{result['latency_s']:.2f}s</p>"
                    )
                    self._send(200, html.encode(), "text/html")
                else:
                    self._send(
                        200,
                        json.dumps(
                            {"image": b64, "latency_s": result["latency_s"]}
                        ).encode(),
                        "application/json",
                    )
            except Exception as e:  # noqa: BLE001
                self._send(
                    400,
                    json.dumps({"error": f"{type(e).__name__}: {e}"}).encode(),
                    "application/json",
                )

    return Handler


def _parse_multipart(raw: bytes, content_type: str):
    import email
    import email.policy

    msg = email.message_from_bytes(
        b"Content-Type: " + content_type.encode() + b"\r\n\r\n" + raw,
        policy=email.policy.HTTP,
    )
    payload: Dict[str, Any] = {}
    cloth = None
    from PIL import Image

    for part in msg.iter_parts():
        name = part.get_param("name", header="content-disposition")
        data = part.get_payload(decode=True)
        if name == "cloth":
            cloth = Image.open(io.BytesIO(data)).convert("RGB")
        elif name in ("steps", "seed"):
            payload[name] = int(data.decode() or 0)
        elif name in ("guidance_scale", "image_scale"):
            payload[name] = float(data.decode() or 0)
        elif name:
            payload[name] = data.decode()
    if cloth is None:
        raise ValueError("no cloth image uploaded")
    return payload, cloth


def load_post_process(spec: str):
    """Resolve a post-process spec to a `(img01, payload) -> img01` callable.

    Accepted forms:
      * ``module:function`` — any importable callable;
      * ``face_fusion:<facenet.pth>`` — the built-in native face fusion
        (imagdressing_tpu.postprocess.face_fusion) with the OpenPose FaceNet
        landmark model at that path; requests carrying a ``fusion_face``
        image (base64 PNG in the JSON API) get the user's face fused into
        the result — the reference's modelscope image_face_fusion behavior
        (/root/reference/app.py:244-252).
    """
    import importlib

    head, _, rest = spec.partition(":")
    if head == "face_fusion":
        if not rest:
            raise ValueError(
                "--post_process face_fusion needs the FaceNet weight path: "
                "face_fusion:<body_pose-style facenet .pth>"
            )
        from imagdressing_tpu.postprocess.face_fusion import (
            make_post_process, openpose_landmark_fn)
        from imagdressing_tpu.preprocess.openpose.face import Face

        face = Face.from_torch(rest)
        return make_post_process(openpose_landmark_fn(face.params))
    if not rest:
        raise ValueError(
            f"--post_process expects 'module:function', got {spec!r}"
        )
    return getattr(importlib.import_module(head), rest)


def run_gradio(worker: InferenceWorker, preset, port: int):
    """Gradio UI over the same worker (the reference app.py's surface).

    gradio is an optional dependency; the stdlib HTTP UI (`--ui http`) is the
    default and needs nothing.
    """
    try:
        import gradio as gr
    except ImportError as e:  # pragma: no cover - exercised via test
        raise RuntimeError(
            "--ui gradio requires the 'gradio' package (pip install gradio); "
            "use --ui http for the dependency-free built-in UI"
        ) from e

    from imagdressing_tpu.apps import image_utils as iu
    from imagdressing_tpu.train.data import clip_preprocess_np

    def dress(cloth, prompt, steps, guidance_scale, image_scale, seed):
        cloth = iu.resize_img(cloth.convert("RGB"))
        ref = (
            np.asarray(
                cloth.resize((preset.width, preset.height)), np.float32
            ) / 127.5 - 1.0
        )[None]
        vision_size = worker.pipe.models.vision_cfg.image_size
        payload = {
            "prompt": prompt or iu.DEFAULT_PROMPT,
            "steps": int(steps),
            "guidance_scale": float(guidance_scale),
            "image_scale": float(image_scale),
            "seed": int(seed),
            "ref_image": ref,
            "ref_clip_image": clip_preprocess_np(
                np.asarray(cloth), size=vision_size
            )[None],
        }
        result = worker.submit(payload)
        if "error" in result:
            raise RuntimeError(result["error"])
        img = result["image"]  # uint8 HxWx3 (worker contract)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        return img

    demo = gr.Interface(
        fn=dress,
        inputs=[
            gr.Image(type="pil", label="Garment"),
            gr.Textbox(value=iu.DEFAULT_PROMPT, label="Prompt"),
            gr.Slider(1, 100, value=30, step=1, label="Steps"),
            gr.Slider(1.0, 15.0, value=7.5, label="Guidance"),
            gr.Slider(0.0, 2.0, value=1.0, label="Cloth scale"),
            gr.Number(value=42, label="Seed"),
        ],
        outputs=gr.Image(label="Result"),
        title="IMAGDressing-TPU",
    )
    demo.launch(server_name="0.0.0.0", server_port=port)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="IMAGDressing-TPU server")
    p.add_argument("--server_port", type=int, default=7860)
    p.add_argument("--ui", default="http", choices=["http", "gradio"],
                   help="'http' = dependency-free built-in form; 'gradio' "
                        "needs the optional gradio package")
    p.add_argument("--post_process", default=None,
                   help="'module:function' applied to each decoded image "
                        "(the face-fusion hook, reference app.py:244-252)")
    p.add_argument("--preset", default="basic")
    p.add_argument("--model_ckpt", default="ckpt/IMAGDressing-v1_512.pt")
    p.add_argument("--base_dir", default="ckpt/Realistic_Vision_V4.0_noVAE")
    p.add_argument("--vae_path", default="ckpt/sd-vae-ft-mse")
    p.add_argument("--image_encoder_path", default="ckpt/image_encoder")
    p.add_argument("--max_batch", type=int, default=4)
    p.add_argument("--data_parallel", type=int, default=1,
                   help="shard request batches across this many chips "
                        "(-1 = all devices)")
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="split the UNet weights across this many chips "
                        "(batch-1 latency scaling)")
    args = p.parse_args(argv)

    import os

    from imagdressing_tpu.apps.loader import load_dressing_models
    from imagdressing_tpu.apps.tokenizer import load_tokenizer
    from imagdressing_tpu.core.config import PRESETS
    from imagdressing_tpu.pipelines.dressing import DressingPipeline

    preset = PRESETS[args.preset]
    models = load_dressing_models(
        base_dir=args.base_dir, vae_path=args.vae_path,
        image_encoder_path=args.image_encoder_path,
        model_ckpt=args.model_ckpt,
    )
    mesh = None
    if args.data_parallel != 1 or args.tensor_parallel != 1:
        import jax

        from imagdressing_tpu.core import mesh as mesh_lib

        devices = jax.devices()
        tp_n = max(args.tensor_parallel, 1)
        if max(args.data_parallel, 1) * tp_n > len(devices):
            # dev/test convenience: virtual CPU devices stand in for the
            # missing chips — warn loudly, this is NOT a serving setup
            devices = jax.devices("cpu")
            print(
                f"WARNING: requested {args.data_parallel}x{tp_n} mesh "
                f"exceeds the {jax.default_backend()} device count; "
                f"falling back to {len(devices)} CPU devices (slow)",
                flush=True,
            )
        dp = (args.data_parallel if args.data_parallel > 0
              else len(devices) // tp_n)
        mesh = mesh_lib.make_mesh(
            data=dp, model=tp_n, devices=devices[: dp * tp_n],
        )
    pipe = DressingPipeline(models, preset, mesh=mesh)
    tokenizer = load_tokenizer(os.path.join(args.base_dir, "tokenizer"))
    post = load_post_process(args.post_process) if args.post_process else None
    worker = InferenceWorker(
        pipe, tokenizer, max_batch=args.max_batch, post_process=post
    )

    if args.ui == "gradio":
        run_gradio(worker, preset, args.server_port)
        return

    server = ThreadingHTTPServer(
        ("0.0.0.0", args.server_port), make_handler(worker, preset)
    )
    print(f"serving on :{args.server_port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
