"""profile_summary: device-trace parsing on a synthetic trace + a real
jax.profiler capture (CPU traces carry host events only — the tool must
gracefully report no device programs there)."""

import gzip
import json

from imagdressing_tpu.tools.profile_summary import (
    load_trace_events,
    summarize_trace,
)


def _synthetic_events():
    # device pid 3, host pid 7 (shape follows real axon traces: program
    # envelope jit_f(...), inner while + op events)
    return [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "X", "pid": 3, "name": "jit_f(123)", "ts": 100.0,
         "dur": 1000.0},
        {"ph": "X", "pid": 3, "name": "while.1", "ts": 110.0, "dur": 900.0},
        {"ph": "X", "pid": 3, "name": "fusion.8", "ts": 120.0, "dur": 300.0},
        {"ph": "X", "pid": 3, "name": "convolution.2", "ts": 430.0,
         "dur": 400.0},
        {"ph": "X", "pid": 3, "name": "custom-call.5", "ts": 840.0,
         "dur": 100.0},
        {"ph": "X", "pid": 3, "name": "copy.11", "ts": 950.0, "dur": 50.0},
        # corrupt dur (the relay occasionally emits these) — must be ignored
        {"ph": "X", "pid": 3, "name": "fusion.9", "ts": 960.0, "dur": -5.0},
        # host event named like a program — must not be counted
        {"ph": "X", "pid": 7, "name": "jit_f(123)", "ts": 100.0,
         "dur": 99999.0},
    ]


def test_summarize_synthetic():
    s = summarize_trace(_synthetic_events())
    assert set(s) == {"jit_f"}
    rec = s["jit_f"]
    assert rec["total_s"] == 0.001  # 1000 us, device event not the host one
    assert rec["by_class"]["convolution"] == 4e-4
    assert rec["by_class"]["pallas/custom"] == 1e-4
    assert rec["by_class"]["fusion"] == 3e-4  # the -5us event ignored
    assert rec["by_class"]["copy"] == 5e-5


def test_load_trace_roundtrip(tmp_path):
    d = tmp_path / "plugins" / "profile" / "2026_01_01"
    d.mkdir(parents=True)
    payload = {"traceEvents": _synthetic_events()}
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump(payload, f)
    events = load_trace_events(str(tmp_path))
    # 5 device events inside the envelope (corrupt-dur one dropped,
    # the envelope itself and host events excluded)
    assert summarize_trace(events)["jit_f"]["events"] == 5


def test_real_cpu_trace_has_no_device_programs(tmp_path):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x):
        return x @ x

    x = jnp.eye(64)
    f(x).block_until_ready()
    jax.profiler.start_trace(str(tmp_path))
    f(x).block_until_ready()
    jax.profiler.stop_trace()
    events = load_trace_events(str(tmp_path))
    assert summarize_trace(events) == {}  # host-only trace: no device pids
