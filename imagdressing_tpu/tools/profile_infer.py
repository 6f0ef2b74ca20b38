"""One-shot serving-trace driver: run a jitted try-on under jax.profiler and
print the op-class breakdown (tools/profile_summary) — the workflow behind
the perf-ledger device-time splits in CLAUDE.md, automated.

Random bf16 weights (identical FLOPs/traffic to converted checkpoints),
basic preset. Keeps the trace directory so the raw *.trace.json.gz can be
re-analyzed.

Usage:
    python -m imagdressing_tpu.tools.profile_infer [trace_dir] [WxH] [steps]
"""

from __future__ import annotations

import dataclasses
import os
import sys

import numpy as np


def main(trace_dir: str = "/tmp/imagdressing_trace", size: str = "512x640",
         steps: int = 30) -> None:
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".xla_cache")
    if os.path.isdir(cache_dir):
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from imagdressing_tpu.core.config import PRESETS
    from imagdressing_tpu.pipelines.dressing import (
        DressingModels,
        DressingPipeline,
    )

    w, h = (int(t) for t in size.split("x"))
    models = DressingModels.init_random(jax.random.PRNGKey(0)).cast(
        jnp.bfloat16)
    preset = dataclasses.replace(
        PRESETS["basic"], height=h, width=w, num_inference_steps=steps
    )
    pipe = DressingPipeline(models, preset)
    rng = np.random.default_rng(0)
    kw = dict(
        prompt_ids=jnp.asarray(rng.integers(0, 49407, (1, 77))),
        negative_prompt_ids=jnp.asarray(rng.integers(0, 49407, (1, 77))),
        ref_image=jnp.asarray(
            rng.standard_normal((1, h, w, 3)).astype(np.float32).clip(-1, 1)
        ),
        ref_clip_image=jnp.asarray(
            rng.standard_normal((1, 224, 224, 3)).astype(np.float32)
        ),
    )
    jax.block_until_ready(list(kw.values()))
    pipe(**kw, output_uint8=True)  # compile + warm

    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    pipe(**kw, seed=1, output_uint8=True)
    jax.profiler.stop_trace()
    print(f"trace written under {trace_dir}", file=sys.stderr)

    from imagdressing_tpu.tools.profile_summary import main as summarize

    summarize([trace_dir])


if __name__ == "__main__":
    kwargs = {}
    if len(sys.argv) > 1:
        kwargs["trace_dir"] = sys.argv[1]
    if len(sys.argv) > 2:
        kwargs["size"] = sys.argv[2]
    if len(sys.argv) > 3:
        kwargs["steps"] = int(sys.argv[3])
    main(**kwargs)
