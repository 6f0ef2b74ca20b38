"""On-hardware gradient parity harness for the Pallas flash-attention
backward.

The CPU test suite exercises the backward kernels through the Pallas
interpreter (tests/test_attention.py); this tool runs the COMPILED kernels
on the attached TPU and reports per-argument max relative error against a
HIGHEST-precision XLA reference, for both input dtypes and for the
IMAGDRESSING_FLASH_BWD=xla fallback. Expected magnitudes (v5e, 1024 tokens,
D=40): fp32 Pallas <= ~5e-5, bf16 Pallas ~1e-2, fp32 XLA fallback ~1e-2
(the fallback's einsums run at default MXU precision).

Usage:
    python -m imagdressing_tpu.tools.check_flash_grad [S] [D]
"""

from __future__ import annotations

import os
import sys

import numpy as np


def main(seq: int = 1024, head_dim: int = 40) -> int:
    import jax
    import jax.numpy as jnp

    import imagdressing_tpu.kernels.flash_attention as fa

    rng = np.random.default_rng(3)
    B, S, H, D = 2, seq, 4, head_dim
    args_np = [
        rng.standard_normal((B, S, H, D)).astype(np.float32) for _ in range(5)
    ]
    scale = jnp.asarray([0.0, 0.7], jnp.float32)  # includes a scale-0 row
    tgt = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))

    def naive(q, k, v, kr, vr, sc):
        hp = jax.lax.Precision.HIGHEST

        def sdpa(k_, v_):
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k_, precision=hp
            ) / np.sqrt(D)
            return jnp.einsum(
                "bhqk,bkhd->bqhd", jax.nn.softmax(logits, -1), v_,
                precision=hp,
            )

        out = sdpa(k, v) + sc.reshape(-1, 1, 1, 1) * sdpa(kr, vr)
        return jnp.sum((out - tgt) ** 2)

    def ours(q, k, v, kr, vr, sc):
        out = fa.flash_attention(q, k, v, kr, vr, sc)
        return jnp.sum((out.astype(jnp.float32) - tgt) ** 2)

    grad_n = jax.jit(jax.grad(naive, argnums=(0, 1, 2, 3, 4, 5)))(
        *[jnp.asarray(a) for a in args_np], scale
    )

    names = ["dq", "dk", "dv", "dk_ref", "dv_ref", "dscale"]
    worst = {}

    def report(tag, grad_o):
        for name, a, b in zip(names, grad_n, grad_o):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            rel = float(np.abs(a - b).max() / (np.abs(a).max() + 1e-9))
            print(f"{tag:14s} {name:8s} rel_max_err={rel:.2e}")
            worst[tag] = max(worst.get(tag, 0.0), rel)

    for dt, tag in ((jnp.float32, "pallas-fp32"), (jnp.bfloat16, "pallas-bf16")):
        g = jax.jit(jax.grad(ours, argnums=(0, 1, 2, 3, 4, 5)))(
            *[jnp.asarray(a, dt) for a in args_np], scale
        )
        report(tag, g)

    os.environ["IMAGDRESSING_FLASH_BWD"] = "xla"
    g = jax.jit(jax.grad(ours, argnums=(0, 1, 2, 3, 4, 5)))(
        *[jnp.asarray(a) for a in args_np], scale
    )
    report("xla-fp32", g)
    os.environ.pop("IMAGDRESSING_FLASH_BWD", None)

    ok = worst.get("pallas-fp32", 1.0) < 1e-3 and worst.get(
        "pallas-bf16", 1.0
    ) < 5e-2
    print("OK" if ok else "FAIL", {k: f"{v:.2e}" for k, v in worst.items()})
    return 0 if ok else 1


if __name__ == "__main__":
    kw = {}
    if len(sys.argv) > 1:
        kw["seq"] = int(sys.argv[1])
    if len(sys.argv) > 2:
        kw["head_dim"] = int(sys.argv[2])
    raise SystemExit(main(**kw))
