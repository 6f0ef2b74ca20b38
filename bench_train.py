"""Training-step benchmark (single chip; informational, not driver-run).

Reference training setup (BASELINE.md): 200k steps, batch 5/GPU on 10x
RTX 3090 (global 50), 512x640, fp16 ZeRO-2. This measures our jitted train
step (VAE encode x2 + CLIP text/vision + garment capture + UNet + backward +
AdamW) at the same per-device resolution in bf16.

The axon-tunneled dev chip adds a large RESOLUTION-INDEPENDENT per-call
overhead (~30 s/step naive loop — the relay appears to round-trip state
buffers per call). The headline number therefore comes from CHAINED timing:
K optimizer steps inside one jitted lax.scan, per-step cost =
(t_scanK - t_scan1)/(K-1), which cancels the per-call transport entirely
and measures pure on-chip compute. The naive per-call figure is kept in
the JSON as `percall_s_per_step` for transparency.

Prints one JSON line: {"metric": f"train_step_{width}x{height}", "value": seconds,
"unit": "s/step", "images_per_sec_per_chip": ..., "chained_onchip_s_per_step": ...}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main(batch_size: int = 1, steps: int = 5, height: int = 640,
         width: int = 512, chain: int = 31, small: bool = False):
    # NB: `steps` only feeds the informational per-call loop (each call
    # pays the full output-transfer constant); keep it small.
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
        models = DressingModels.init_random(jax.random.PRNGKey(0),
                                            small=small)
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
            rng.standard_normal(
                (batch_size, models.vision_cfg.image_size,
                 models.vision_cfg.image_size, 3)
            ).astype(np.float32)),
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

    # ---- chained mode: `chain` steps inside ONE jitted lax.scan. A single
    # dispatch/readback per K optimizer steps removes the per-call tunnel
    # overhead that dominates the naive loop above, so (tK - t1)/(K - 1)
    # is the true on-chip step time (the CLAUDE.md chained-timing rule).
    base_step = make_train_step(models, cfg, tx)

    def make_chained(k: int):
        def chained(state, frozen, batch, rng):
            def body(carry, _):
                st, ky = carry
                ky, sub = jax.random.split(ky)
                st, m = base_step(st, frozen, batch, sub)
                return (st, ky), m["loss"]

            (state, _), losses = jax.lax.scan(
                body, (state, rng), None, length=k
            )
            return state, losses

        return jax.jit(chained, donate_argnums=(0,))

    # The relay returns every program output (the multi-GB state) to the
    # host per call — a ~60 s resolution-independent constant. To resolve
    # the on-chip step time above that transfer's jitter, K must be large
    # (default 31 -> ~6 s of compute against ~1 s of noise) and each K
    # timed as a median of reps.
    chain_dt = None
    if chain and chain > 1:
        times = {}
        for k in (1, chain):
            fn = make_chained(k)
            state, losses = fn(state, frozen, batch, key)  # compile
            jax.block_until_ready(losses)
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                state, losses = fn(state, frozen, batch, key)
                jax.block_until_ready(losses)
                reps.append(time.perf_counter() - t0)
            times[k] = float(np.median(reps))
        chain_dt = (times[chain] - times[1]) / (chain - 1)

    out = {
        "metric": f"train_step_{width}x{height}",
        "value": round(chain_dt if chain_dt else dt, 4),
        "unit": "s/step",
        "batch_per_chip": batch_size,
        "images_per_sec_per_chip": round(
            batch_size / (chain_dt if chain_dt else dt), 3),
        "loss": float(np.asarray(losses)[-1] if chain_dt else metrics["loss"]),
        "percall_s_per_step": round(dt, 4),
    }
    if chain_dt is not None:
        out["chained_onchip_s_per_step"] = round(chain_dt, 4)
        out["chain_k"] = chain
    print(json.dumps(out))


if __name__ == "__main__":
    import sys

    kwargs = {}
    if len(sys.argv) > 1:
        kwargs["height"] = int(sys.argv[1])
    if len(sys.argv) > 2:
        kwargs["width"] = int(sys.argv[2])
    if len(sys.argv) > 3:
        kwargs["batch_size"] = int(sys.argv[3])
    if len(sys.argv) > 4:
        kwargs["chain"] = int(sys.argv[4])
    main(**kwargs)
