"""Microbenchmark: XLA conv efficiency vs MXU roofline on the UNet's shapes.

Decision tool for the implicit-GEMM Pallas conv question (VERDICT r3 next
#8): if XLA's `conv_general_dilated` already runs near the v5e MXU roofline
at the step's conv shapes, a hand-written kernel cannot win and the serving
profile's conv slice is irreducible.

Methodology (CLAUDE.md): K-iteration `lax.scan` chaining output->input so
the axon tunnel's dispatch latency amortizes; device time is wall-clock of
the blocked scan minus a measured 0-iteration floor, cross-checked with a
2K run (the K vs 2K delta isolates per-iteration cost exactly).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python -m \
    imagdressing_tpu.tools.bench_conv
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# v5e bf16 peak
PEAK_FLOPS = 197e12
HBM_BW = 819e9

# (B, H, W, Cin, Cout) — SD1.5 UNet resnet convs at 512x640 with the CFG
# pair fused (B=2), plus the up-block concat shapes (Cin > Cout).
SHAPES = [
    (2, 80, 64, 320, 320),
    (2, 40, 32, 640, 640),
    (2, 20, 16, 1280, 1280),
    (2, 10, 8, 1280, 1280),
    (2, 80, 64, 640, 320),    # up concat
    (2, 40, 32, 1280, 640),
    (2, 20, 16, 2560, 1280),
    (1, 640, 512, 128, 128),  # VAE decoder top level (B=1)
]


def _timed_scan(step, x0, k: int) -> float:
    """Seconds per iteration of `step`, from the K vs 2K wall-time delta."""

    def body(c, _):
        return step(c), ()

    @jax.jit
    def run_k(x, n):
        del n
        return jax.lax.scan(body, x, None, length=k)[0]

    @jax.jit
    def run_2k(x, n):
        del n
        return jax.lax.scan(body, x, None, length=2 * k)[0]

    for f in (run_k, run_2k):
        jax.block_until_ready(f(x0, 0))  # compile
    t = {}
    for name, f in (("k", run_k), ("2k", run_2k)):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x0, 0))
            best = min(best, time.perf_counter() - t0)
        t[name] = best
    return (t["2k"] - t["k"]) / k


def bench_conv(b, h, w, cin, cout, dtype=jnp.bfloat16, k=64):
    """mxu_util_pct is the 3x3 conv's OWN efficiency: channel-changing
    shapes chain output->input via a channel `tile` (every UNet up-concat
    shape here is exactly cin == 2*cout), a pure copy orders of magnitude
    cheaper than the 1x1 projection conv the tool used to blend into the
    number (ADVICE r4 #4)."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, h, w, cin), dtype)
    kern = jax.random.normal(key, (3, 3, cin, cout), dtype) * 0.02
    if cin != cout:
        assert cin % cout == 0, (cin, cout)

    def step(xc):
        y = jax.lax.conv_general_dilated(
            xc, kern, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dtype,
        )
        if cin != cout:
            y = jnp.tile(y, (1, 1, 1, cin // cout))
        return jnp.tanh(y)  # keep values bounded across 2K iterations

    sec = _timed_scan(step, x, k)
    flops = 2 * b * h * w * 9 * cin * cout  # the 3x3 conv alone
    mem = (b * h * w * (cin + cout) + 9 * cin * cout) * jnp.dtype(dtype).itemsize
    return {
        "shape": f"({b},{h},{w},{cin})->{cout}",
        "us_per_call": round(sec * 1e6, 1),
        "sol_mxu_us": round(flops / PEAK_FLOPS * 1e6, 1),
        "sol_hbm_us": round(mem / HBM_BW * 1e6, 1),
        "mxu_util_pct": round(100 * flops / PEAK_FLOPS / sec, 1),
    }


# VAE/pixel-resolution GroupNorm+SiLU+conv3x3 chains: the row-windowed
# Pallas variant (fused_gn_conv._windowed_call) vs the production unfused
# pair. Documents the r5 negative result (the windowed kernel is not
# dispatched — see the MEASURED NEGATIVE RESULT note in fused_gn_conv.py).
VAE_SHAPES = [
    (1, 512, 640, 128, 128),
    (1, 256, 320, 512, 512),
    (1, 512, 640, 256, 128),
    (1, 128, 160, 512, 512),
    (2, 96, 128, 640, 320),
]


def bench_gnconv_variants(b, h, w, cin, cout, dtype=jnp.bfloat16, k=24):
    import imagdressing_tpu.kernels.fused_gn_conv as fgc
    from imagdressing_tpu.kernels import fused_groupnorm as _fg

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, h, w, cin), dtype) * 0.5
    kern = jax.random.normal(key, (3, 3, cin, cout), dtype) * 0.02
    gw = jnp.ones((cin,), jnp.float32)
    gb = jnp.zeros((cin,), jnp.float32)
    cb = jnp.zeros((cout,), jnp.float32)
    if cin != cout:
        assert cin % cout == 0, (cin, cout)

    def rechain(y):
        y = jnp.tile(y, (1, 1, 1, cin // cout)) if cin != cout else y
        return jnp.tanh(y)

    def pair_step(xc):
        hdd = _fg.group_norm_act({"scale": gw, "bias": gb}, xc,
                                 num_groups=32, eps=1e-5, act="silu")
        y = jax.lax.conv_general_dilated(
            hdd, kern.astype(hdd.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=hdd.dtype,
        ) + cb.astype(hdd.dtype)
        return rechain(y)

    def win_step(xc):
        return rechain(fgc._windowed_call(
            xc, gw, gb, None, kern, cb, num_groups=32, eps=1e-5, act="silu",
            interpret=False,
        ))

    def full_step(xc):
        return rechain(fgc._fused_call(
            xc, gw, gb, None, kern, cb, num_groups=32, eps=1e-5, act="silu",
            interpret=False,
        ))

    flops = 2 * b * h * w * 9 * cin * cout
    row = {"shape": f"({b},{h},{w},{cin})->{cout}"}
    variants = [("pair_us", pair_step)]
    if fgc._windowed_supported(x, kern, 32):
        variants.append(("windowed_us", win_step))
    if fgc._supported(x, kern, 32):
        variants.append(("fullplane_us", full_step))
    for name, step in variants:
        sec = _timed_scan(step, x, k)
        row[name] = round(sec * 1e6, 1)
        row[name.replace("_us", "_mxu_pct")] = round(
            100 * flops / PEAK_FLOPS / sec, 1
        )
    return row


def main(vae: bool = False):
    assert jax.default_backend() == "tpu", jax.default_backend()
    out = []
    for shp in (VAE_SHAPES if vae else SHAPES):
        r = bench_gnconv_variants(*shp) if vae else bench_conv(*shp)
        print(json.dumps(r), flush=True)
        out.append(r)
    return out


if __name__ == "__main__":
    import sys
    main(vae="--vae" in sys.argv)
