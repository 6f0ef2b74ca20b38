"""IGPair input pipeline (host-side, feeding the jitted train step).

Manifest format matches the reference's VDDataset (/root/reference/IGPair.py):
a JSON list of {"image_file", "cloth_file", "text": [captions...]}.

Per-sample processing (parity with IGPair.py:40-99):
  * Resize shorter side to 512 (bilinear) -> RandomCrop (640, 512)
  * Normalize to [-1, 1]
  * cloth -> CLIPImageProcessor (224x224 bicubic + CLIP mean/std)
  * random caption choice
  * CFG dropout: rand < .05 -> drop image; < .10 -> drop text; < .15 -> both
    (drop image == zero the CLIP pixels, reference train.py:546-552;
     drop text == tokenize "")

TPU notes: the loader is a plain Python generator with a thread pool —
decode/augment on host CPU while the previous step runs on device. For
multi-host training, shard the manifest by process index and assemble global
arrays with jax.make_array_from_process_local_data.
"""

from __future__ import annotations

import json
import threading
import queue as queue_lib
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, List

import numpy as np

from imagdressing_tpu.models.clip import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD


def load_manifest(json_files) -> List[Dict]:
    if isinstance(json_files, str):
        json_files = [json_files]
    data: List[Dict] = []
    for path in json_files:
        with open(path, "r", encoding="utf-8") as f:
            data.extend(json.load(f))
    return data


def _resize_shorter(img: np.ndarray, size: int) -> np.ndarray:
    """Bilinear resize so the shorter side == size. img: (H,W,3) uint8."""
    from PIL import Image

    h, w = img.shape[:2]
    if h < w:
        nh, nw = size, max(1, round(w * size / h))
    else:
        nh, nw = max(1, round(h * size / w)), size
    return np.asarray(
        Image.fromarray(img).resize((nw, nh), Image.BILINEAR)
    )


def _random_crop(img: np.ndarray, ch: int, cw: int, rng: np.random.Generator):
    h, w = img.shape[:2]
    if h < ch or w < cw:  # pad-reflect when the resize leaves it short
        ph, pw = max(0, ch - h), max(0, cw - w)
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="reflect")
        h, w = img.shape[:2]
    top = int(rng.integers(0, h - ch + 1))
    left = int(rng.integers(0, w - cw + 1))
    return img[top : top + ch, left : left + cw]


def clip_preprocess_np(img: np.ndarray, size: int = 224) -> np.ndarray:
    """CLIPImageProcessor equivalent: shortest-side bicubic resize to 224,
    center crop, rescale, normalize. img: (H,W,3) uint8 -> (224,224,3) f32."""
    from PIL import Image

    h, w = img.shape[:2]
    if h < w:
        nh, nw = size, max(size, round(w * size / h))
    else:
        nh, nw = max(size, round(h * size / w)), size
    x = np.asarray(Image.fromarray(img).resize((nw, nh), Image.BICUBIC))
    top = (x.shape[0] - size) // 2
    left = (x.shape[1] - size) // 2
    x = x[top : top + size, left : left + size].astype(np.float32) / 255.0
    return (x - np.asarray(CLIP_IMAGE_MEAN, np.float32)) / np.asarray(
        CLIP_IMAGE_STD, np.float32
    )


class IGPairDataset:
    """Indexable IGPair dataset producing train-step-ready numpy dicts."""

    def __init__(
        self,
        manifest,
        tokenize: Callable[[str], np.ndarray],  # text -> (77,) int32 ids
        *,
        size: int = 512,
        crop_h: int = 640,
        crop_w: int = 512,
        drop_image_prob: float = 0.05,
        drop_text_prob: float = 0.05,
        drop_both_prob: float = 0.05,
        clip_size: int = 224,
        image_root: str = "",
        seed: int = 0,
    ):
        self.data = manifest if isinstance(manifest, list) else load_manifest(manifest)
        self.tokenize = tokenize
        self.size = size
        self.crop_h, self.crop_w = crop_h, crop_w
        self.clip_size = clip_size
        self.probs = (drop_image_prob, drop_text_prob, drop_both_prob)
        self.image_root = image_root
        self.seed = seed
        self._null_ids = tokenize("")

    def __len__(self):
        return len(self.data)

    def _load_image(self, path: str) -> np.ndarray:
        import os

        full = os.path.join(self.image_root, path)
        if full.lower().endswith((".jpg", ".jpeg")):
            # native C++ decode (runtime/csrc/image_ops.cpp) — bit-identical
            # to PIL's libjpeg path, without the Python-object overhead
            from imagdressing_tpu.runtime import native

            with open(full, "rb") as f:
                data = f.read()
            img = native.jpeg_decode(data)
            if img is not None:
                return img
        from PIL import Image

        return np.asarray(Image.open(full).convert("RGB"))

    def get(self, idx: int, epoch: int = 0) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, idx])
        )
        item = self.data[idx]
        person = self._load_image(item["image_file"])
        cloth = self._load_image(item["cloth_file"])

        text = item["text"][int(rng.integers(0, len(item["text"])))]
        p_img, p_txt, p_both = self.probs
        r = float(rng.random())
        drop_image = False
        if r < p_img:
            drop_image = True
        elif r < p_img + p_txt:
            text = ""
        elif r < p_img + p_txt + p_both:
            text = ""
            drop_image = True

        def vae_view(img):
            from imagdressing_tpu.runtime import native

            h, w = img.shape[:2]
            rh, rw = native.resized_dims(h, w, self.size)
            if rh >= self.crop_h and rw >= self.crop_w:
                top = int(rng.integers(0, rh - self.crop_h + 1))
                left = int(rng.integers(0, rw - self.crop_w + 1))
                out = native.resize_crop_normalize(
                    img, self.size, top, left, self.crop_h, self.crop_w
                )
                if out is not None:
                    return out
            img = _resize_shorter(img, self.size)
            img = _random_crop(img, self.crop_h, self.crop_w, rng)
            return img.astype(np.float32) / 127.5 - 1.0

        from imagdressing_tpu.runtime import native as _native

        clip_img = (_native.clip_preprocess(cloth)
                    if self.clip_size == 224 else None)
        if clip_img is None:
            clip_img = clip_preprocess_np(cloth, self.clip_size)
        if drop_image:
            clip_img = np.zeros_like(clip_img)

        return {
            "person_image": vae_view(person),
            "cloth_image": vae_view(cloth),
            "cloth_clip": clip_img,
            "text_ids": self.tokenize(text).astype(np.int32),
        }


def shard_epoch_indices(
    order: np.ndarray,
    process_index: int,
    process_count: int,
    batch_size: int,
) -> np.ndarray:
    """Per-rank epoch indices, padded so EVERY rank yields the SAME number of
    batches (DistributedSampler semantics; reference train.py:416-421).

    The pad target is computed from the LONGEST rank's shard — not the local
    one — otherwise len(order) % process_count crossing a batch boundary
    (e.g. N=13, pc=4, bs=1 -> 4/3/3/3) lets short ranks slip into the next
    epoch's permutation and an epoch-synchronized consumer deadlocks. Short
    shards wrap-tile their own indices.
    """
    local = order[process_index::process_count]
    max_len = max(1, -(-len(order) // process_count))  # longest rank's shard
    need = max(1, -(-max_len // batch_size)) * batch_size
    if len(local) == 0:
        local = order[:1] if len(order) else np.zeros((1,), np.int64)
    if need > len(local):
        local = np.tile(local, -(-need // len(local)))[:need]
    return local


def data_iterator(
    dataset: IGPairDataset,
    batch_size: int,
    *,
    shuffle: bool = True,
    num_workers: int = 4,
    prefetch: int = 2,
    seed: int = 0,
    process_index: int = 0,
    process_count: int = 1,
) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite batched iterator; shards the index space per process
    (replacing the reference's DistributedSampler, train.py:416-421)."""
    pool = ThreadPoolExecutor(max_workers=num_workers)
    out: "queue_lib.Queue" = queue_lib.Queue(maxsize=prefetch)

    def producer():
        epoch = 0
        n = len(dataset)
        while True:
            order = np.arange(n)
            if shuffle:
                np.random.default_rng(seed + epoch).shuffle(order)
            local = shard_epoch_indices(
                order, process_index, process_count, batch_size
            )
            for start in range(0, len(local) - batch_size + 1, batch_size):
                idxs = local[start : start + batch_size]
                futs = [pool.submit(dataset.get, int(i), epoch) for i in idxs]
                samples = [f.result() for f in futs]
                batch = {
                    k: np.stack([s[k] for s in samples]) for k in samples[0]
                }
                out.put(batch)
            epoch += 1

    def guarded_producer():
        try:
            producer()
        except BaseException as e:  # noqa: BLE001 — surface to the consumer
            out.put(e)  # a dead silent producer would hang next(it) forever

    threading.Thread(target=guarded_producer, daemon=True).start()
    while True:
        item = out.get()
        if isinstance(item, BaseException):
            raise item
        yield item


def shard_host_batch(mesh, host_batch: Dict[str, np.ndarray]):
    """Assemble each process's local batch into global, mesh-sharded arrays.

    Multi-host input path: every process feeds its own `data_iterator`
    (sharded by process_index above) and this maps the local arrays onto the
    global (data,)-sharded jax.Arrays via
    jax.make_array_from_process_local_data — the TPU equivalent of the
    reference's per-rank DataLoader + DeepSpeed gradient averaging. On a
    single host it reduces to a plain device_put with the batch sharding.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from imagdressing_tpu.core import mesh as mesh_lib

    sharding = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))
    import jax

    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in host_batch.items()
    }
