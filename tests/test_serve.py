"""HTTP serving end-to-end: spin the real server with a tiny pipeline and
POST through the wire (the reference's app.py surface, minus gradio)."""

import base64
import dataclasses
import io
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import jax
import numpy as np
import pytest

from imagdressing_tpu.apps.serve import InferenceWorker, make_handler
from imagdressing_tpu.apps.tokenizer import HashTokenizer
from imagdressing_tpu.core.config import PRESETS
from imagdressing_tpu.pipelines.dressing import DressingModels, DressingPipeline


@pytest.fixture(scope="module")
def server():
    models = DressingModels.init_random(jax.random.PRNGKey(0), small=True)
    preset = dataclasses.replace(
        PRESETS["basic"], height=64, width=64, num_inference_steps=2
    )
    pipe = DressingPipeline(models, preset)
    worker = InferenceWorker(pipe, HashTokenizer(), max_batch=2)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(worker, preset))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield port
    httpd.shutdown()


def _png_bytes():
    from PIL import Image

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (96, 72, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def test_dress_endpoint(server):
    payload = {
        "prompt": "a beautiful dress",
        "steps": 2,
        "seed": 1,
        "cloth_image": base64.b64encode(_png_bytes()).decode(),
    }
    req = urllib.request.Request(
        f"http://127.0.0.1:{server}/dress",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as resp:
        body = json.loads(resp.read())
    assert "image" in body and body["latency_s"] > 0
    from PIL import Image

    img = Image.open(io.BytesIO(base64.b64decode(body["image"])))
    assert img.size == (64, 64)


def test_index_form(server):
    with urllib.request.urlopen(f"http://127.0.0.1:{server}/", timeout=30) as r:
        html = r.read().decode()
    assert "IMAGDressing-TPU" in html


def test_bad_request_is_4xx(server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server}/dress",
        data=b"not json",
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400


def _invert(img01, payload):
    """Toy post-process standing in for the face-fusion hook."""
    return 1.0 - img01


def test_post_process_hook():
    """The hook (face-fusion seam) must run on every decoded image."""
    models = DressingModels.init_random(jax.random.PRNGKey(0), small=True)
    preset = dataclasses.replace(
        PRESETS["basic"], height=64, width=64, num_inference_steps=2
    )
    pipe = DressingPipeline(models, preset)
    plain = InferenceWorker(pipe, HashTokenizer(), max_batch=1)
    hooked = InferenceWorker(
        pipe, HashTokenizer(), max_batch=1, post_process=_invert
    )
    rng = np.random.default_rng(0)
    payload = {
        "prompt": "x",
        "seed": 1,
        "ref_image": rng.standard_normal((1, 64, 64, 3))
        .astype(np.float32).clip(-1, 1),
        "ref_clip_image": rng.standard_normal((1, 56, 56, 3))
        .astype(np.float32),
    }
    a = plain.submit(dict(payload))
    b = hooked.submit(dict(payload))
    assert "error" not in a and "error" not in b
    # worker images are uint8; the hook saw float01 (contract) and inverted
    assert a["image"].dtype == np.uint8 and b["image"].dtype == np.uint8
    np.testing.assert_array_equal(b["image"], 255 - a["image"])


def test_load_post_process_spec():
    from imagdressing_tpu.apps.serve import load_post_process

    fn = load_post_process("os.path:join")
    assert fn("a", "b").endswith("b")
    with pytest.raises(ValueError, match="module:function"):
        load_post_process("os.path.join")


def test_load_post_process_face_fusion_builtin():
    from imagdressing_tpu.apps.serve import load_post_process

    with pytest.raises(ValueError, match="FaceNet weight path"):
        load_post_process("face_fusion")


def test_worker_face_fusion_end_to_end():
    """The built-in face-fusion post-process fuses payload['fusion_face']
    into the served image (reference app.py:244-252 capability)."""
    from imagdressing_tpu.postprocess.face_fusion import make_post_process

    models = DressingModels.init_random(jax.random.PRNGKey(0), small=True)
    preset = dataclasses.replace(
        PRESETS["basic"], height=64, width=64, num_inference_steps=2
    )
    pipe = DressingPipeline(models, preset)
    lm = np.array([[24, 24], [40, 24], [40, 40], [24, 40], [32, 20]],
                  np.float32)
    post = make_post_process(lambda img: lm, color_match=False)
    plain = InferenceWorker(pipe, HashTokenizer(), max_batch=1)
    hooked = InferenceWorker(
        pipe, HashTokenizer(), max_batch=1, post_process=post
    )
    rng = np.random.default_rng(0)
    payload = {
        "prompt": "p",
        "seed": 1,
        "ref_image": rng.standard_normal((1, 64, 64, 3))
        .astype(np.float32).clip(-1, 1),
        "ref_clip_image": rng.standard_normal((1, 56, 56, 3))
        .astype(np.float32),
        "fusion_face": np.full((48, 48, 3), 1.0, np.float32),
    }
    a = plain.submit(dict(payload))
    b = hooked.submit(dict(payload))
    assert "error" not in a and "error" not in b
    # worker contract: uint8 [0,255] images
    assert a["image"].dtype == np.uint8 and b["image"].dtype == np.uint8
    # center comes from the (white) fused face and must differ from the
    # plain render; corners untouched
    assert b["image"][32, 32].mean() > 0.8 * 255
    assert b["image"][32, 32].mean() > a["image"][32, 32].mean() or (
        a["image"][32, 32].mean() > 0.8 * 255
    )
    np.testing.assert_allclose(
        b["image"][2, 2].astype(np.int32),
        a["image"][2, 2].astype(np.int32), atol=1,
    )


def test_gradio_ui_clear_error_when_missing():
    from imagdressing_tpu.apps.serve import run_gradio

    try:
        import gradio  # noqa: F401

        pytest.skip("gradio installed; error path not reachable")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="gradio"):
        run_gradio(None, None, 7860)
