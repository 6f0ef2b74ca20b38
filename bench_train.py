"""Training-step benchmark (single chip; informational, not driver-run).

Reference training setup (BASELINE.md): 200k steps, batch 5/GPU on 10x
RTX 3090 (global 50), 512x640, fp16 ZeRO-2. This measures our jitted train
step (VAE encode x2 + CLIP text/vision + garment capture + UNet + backward +
AdamW) at the same per-device resolution in bf16.

The axon-tunneled dev chip adds a large RESOLUTION-INDEPENDENT per-call
overhead (~60 s — the relay round-trips the multi-GB state per call, with
seconds of jitter, so even 30 steps of compute vanish inside it). The
headline number therefore comes from the DEVICE TIMELINE: K optimizer steps
run inside one jitted lax.scan under jax.profiler, and the program's own
on-chip duration (transfer-immune) divided by K is reported as
`chained_onchip_s_per_step`. The naive per-call wall figure is kept as
`percall_s_per_step` for transparency.

Prints one JSON line: {"metric": f"train_step_{width}x{height}", "value": seconds,
"unit": "s/step", "images_per_sec_per_chip": ..., "chained_onchip_s_per_step": ...}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _profile_device_seconds(run_once, program_prefix: str):
    """Run `run_once()` under jax.profiler and return the device-timeline
    duration (seconds) of the longest program whose name starts with
    `program_prefix`, or None if the trace lacks device events."""
    import contextlib
    import glob
    import gzip
    import json as js
    import tempfile

    import jax

    # BENCH_TRAIN_TRACE_DIR keeps the trace on disk for
    # tools/profile_summary breakdowns instead of a throwaway tempdir.
    keep = os.environ.get("BENCH_TRAIN_TRACE_DIR")
    ctx = contextlib.nullcontext(keep) if keep \
        else tempfile.TemporaryDirectory()
    with ctx as td:
        os.makedirs(td, exist_ok=True)
        jax.profiler.start_trace(td)
        run_once()
        jax.profiler.stop_trace()
        paths = glob.glob(os.path.join(td, "**", "*.trace.json.gz"),
                          recursive=True)
        if not paths:
            return None
        with gzip.open(paths[0]) as f:
            events = js.load(f)["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    matched = [e for e in events
               if e.get("ph") == "X"
               and str(pids.get(e.get("pid"), "")).startswith("/device:")
               and e["name"].startswith(program_prefix)]
    if os.environ.get("BENCH_TRAIN_TRACE_DEBUG"):
        for e in matched:
            print("TRACE match:", pids.get(e["pid"]), e["name"][:60],
                  "dur_us=", e.get("dur"))
        top = sorted((e for e in events if e.get("ph") == "X"
                      and str(pids.get(e.get("pid"), "")).startswith("/device:")),
                     key=lambda e: -abs(e.get("dur", 0)))[:10]
        for e in top:
            print("TRACE top-dur:", e["name"][:60], "dur_us=", e.get("dur"))
    durs = [e["dur"] for e in matched if e.get("dur", 0) > 0]
    if not durs:
        # the relay's trace export occasionally corrupts the program
        # envelope's dur; the longest well-formed device event (the scan's
        # `while` loop) is the program body to within a few percent
        durs = [e.get("dur", 0) for e in events
                if e.get("ph") == "X"
                and str(pids.get(e.get("pid"), "")).startswith("/device:")
                and e.get("dur", 0) > 0]
    return max(durs) / 1e6 if durs else None


def main(batch_size: int = 1, steps: int = 2, height: int = 640,
         width: int = 512, chain: int = 31, small: bool = False,
         remat_policy: str = "full"):
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
    cfg = TrainConfig(train_batch_size=batch_size, warmup_steps=10,
                      remat_policy=remat_policy)
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

    # The relay moves a ~60 s resolution-independent constant per call, with
    # seconds of jitter — wall-clock deltas cannot resolve the ~0.1 s step.
    # Instead: run K steps inside ONE jitted lax.scan under jax.profiler and
    # read the device program's own duration from the trace (transfer-
    # immune; the device timeline works over the axon tunnel).
    chain_dt = None
    mfu = None
    hbm_gbps = None
    if chain and chain > 1:
        fn = make_chained(chain)
        state, losses = fn(state, frozen, batch, key)  # compile + warm
        jax.block_until_ready(losses)
        holder = {"state": state}

        def run_once():
            holder["state"], ls = fn(holder["state"], frozen, batch, key)
            jax.block_until_ready(ls)

        chain_dt = _profile_device_seconds(run_once, "jit_chained")
        if chain_dt is not None:
            chain_dt /= chain
            try:
                # cost analysis of the SINGLE-step program (the scan-body
                # count inside jit_chained is unreliable: XLA reports the
                # while body once, not xK). Includes remat recompute, so
                # this is hardware FLOP utilization.
                #
                # FLOPs basis: XLA's cost_analysis cannot see inside Pallas
                # custom calls, so the step is re-lowered with every kernel
                # switched to its XLA-equivalent math (pallas_disabled +
                # flash_bwd_xla) purely for counting — identical model
                # FLOPs, zero custom calls. (r3's number came from the
                # mixed program, which already hid the flash FLOPs; r4
                # moved convs into kernels too, making the mixed count
                # meaninglessly low.) Bytes come from the REAL program —
                # the fused kernels' reduced traffic is the thing measured.
                from imagdressing_tpu import kernels as kernels_pkg

                args = (holder["state"], frozen, batch, key)
                # A FRESH jit object is required inside the context:
                # `step_fn.lower()` reuses the cached trace from the timed
                # calls above, and the kernel switches are read at trace
                # time — lowering the existing jit would silently count the
                # mixed program again.
                count_fn = jax.jit(make_train_step(models, cfg, tx),
                                   donate_argnums=(0,))
                with kernels_pkg.pallas_disabled(), \
                        kernels_pkg.flash_bwd_xla():
                    lowered = count_fn.lower(*args)
                try:
                    # client-side analysis of the unoptimized HLO (no
                    # multi-minute XLA compile of the counting twin); the
                    # train step has no dead code so flops match
                    ca_flops = lowered.cost_analysis()
                except Exception:
                    ca_flops = None
                if not ca_flops:  # axon backend returns None: compile instead
                    ca_flops = lowered.compile().cost_analysis()
                ca_real = step_fn.lower(*args).compile().cost_analysis()
                if isinstance(ca_flops, (list, tuple)):
                    ca_flops = ca_flops[0]
                if isinstance(ca_real, (list, tuple)):
                    ca_real = ca_real[0]
                flops_per_step = float(ca_flops.get("flops", 0.0))
                if flops_per_step > 0:
                    # v5e bf16 peak 197 TFLOP/s (XLA's flop count treats an
                    # MXU multiply-add as 2 flops, same convention)
                    mfu = flops_per_step / chain_dt / 197e12
                    hbm_gbps = float(ca_real.get("bytes accessed", 0.0)) \
                        / chain_dt / 1e9
            except Exception:
                if os.environ.get("BENCH_TRAIN_DEBUG"):
                    import traceback
                    traceback.print_exc()
                mfu = None

    out = {
        "metric": f"train_step_{width}x{height}",
        "value": round(chain_dt if chain_dt else dt, 4),
        "unit": "s/step",
        "batch_per_chip": batch_size,
        "remat_policy": remat_policy,
        "images_per_sec_per_chip": round(
            batch_size / (chain_dt if chain_dt else dt), 3),
        "loss": float(np.asarray(losses)[-1] if chain_dt else metrics["loss"]),
        "percall_s_per_step": round(dt, 4),
    }
    if chain_dt is not None:
        out["chained_onchip_s_per_step"] = round(chain_dt, 4)
        out["chain_k"] = chain
    if mfu is not None:
        out["mfu_vs_v5e_bf16_peak"] = round(mfu, 3)
    if hbm_gbps is not None:
        out["hbm_gb_per_s"] = round(hbm_gbps, 1)
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
    if len(sys.argv) > 5:
        kwargs["remat_policy"] = sys.argv[5]
    main(**kwargs)
