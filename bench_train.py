"""Training-step benchmark (single chip; informational, not driver-run).

Reference training setup (BASELINE.md): 200k steps, batch 5/GPU on 10x
RTX 3090 (global 50), 512x640, fp16 ZeRO-2. This measures our jitted train
step (VAE encode x2 + CLIP text/vision + garment capture + UNet + backward +
AdamW) at the same per-device resolution in bf16.

CAVEAT for the axon-tunneled dev chip: measured step times carry a large
RESOLUTION-INDEPENDENT overhead (~30 s/step at both 640x512 and 320x256 —
the ~8 GB train state appears to round-trip through the relay per call).
Treat numbers from this environment as an upper bound; on directly attached
TPUs the step is compute-bound (UNet fwd+bwd+remat ≈ 4-5x the 37.8 ms
inference step → ~0.2 s/step expected).

Prints one JSON line: {"metric": f"train_step_{width}x{height}", "value": seconds,
"unit": "s/step", "images_per_sec_per_chip": ...}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main(batch_size: int = 1, steps: int = 5, height: int = 640,
         width: int = 512):
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".xla_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from imagdressing_tpu.core.config import TrainConfig
    from imagdressing_tpu.pipelines.dressing import DressingModels
    from imagdressing_tpu.train.step import make_train_step

    import gc

    # Build on host, place carefully: frozen stacks in bf16, trainable
    # (garment UNet + adapters + resampler) fp32, AdamW moments fp32.
    with jax.default_device(jax.devices("cpu")[0]):
        models = DressingModels.init_random(jax.random.PRNGKey(0))
    cfg = TrainConfig(train_batch_size=batch_size, warmup_steps=10)
    from imagdressing_tpu.train.step import split_params

    trainable_host, frozen_host = split_params(models.params)
    dev = jax.devices()[0]
    def to_bf16(tree):
        return jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            tree,
        )

    frozen = jax.device_put(to_bf16(frozen_host), dev)
    # Single-chip bench runs pure-bf16 trainables: fp32 masters + AdamW
    # state for the ~1B trainable params exceed one v5e's 16 GB — the
    # multi-chip path shards them (ZeRO-2, train.shard_train_step).
    trainable = jax.device_put(to_bf16(trainable_host), dev)
    models.params.clear()
    del trainable_host, frozen_host
    gc.collect()

    from imagdressing_tpu.train.step import TrainState, make_optimizer

    tx = make_optimizer(cfg)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=trainable,
        opt_state=tx.init(trainable),
    )
    # donate the state: without it every step allocates a fresh ~multi-GB
    # param+moment set (and the tunnel relay appears to round-trip it)
    step_fn = jax.jit(make_train_step(models, cfg, tx), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    batch = {
        "person_image": jnp.asarray(
            rng.standard_normal((batch_size, height, width, 3)).astype(np.float32)
            .clip(-1, 1)),
        "cloth_image": jnp.asarray(
            rng.standard_normal((batch_size, height, width, 3)).astype(np.float32)
            .clip(-1, 1)),
        "cloth_clip": jnp.asarray(
            rng.standard_normal((batch_size, 224, 224, 3)).astype(np.float32)),
        "text_ids": jnp.asarray(rng.integers(0, 49407, (batch_size, 77)),
                                jnp.int32),
    }
    key = jax.random.PRNGKey(0)

    state, metrics = step_fn(state, frozen, batch, key)  # compile
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, frozen, batch, key)
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / steps
    print(json.dumps({
        "metric": f"train_step_{width}x{height}",
        "value": round(dt, 4),
        "unit": "s/step",
        "batch_per_chip": batch_size,
        "images_per_sec_per_chip": round(batch_size / dt, 3),
        "loss": float(metrics["loss"]),
    }))


if __name__ == "__main__":
    import sys

    kwargs = {}
    if len(sys.argv) > 1:
        kwargs["height"] = int(sys.argv[1])
    if len(sys.argv) > 2:
        kwargs["width"] = int(sys.argv[2])
    if len(sys.argv) > 3:
        kwargs["batch_size"] = int(sys.argv[3])
    main(**kwargs)
