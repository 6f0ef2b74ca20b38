"""Device-trace summarizer: op-class time breakdown from a jax.profiler trace.

The reference has no profiler integration at all (SURVEY.md §5 — manual
perf_counter timing in train.py:516-518,615-620). Here, `jax.profiler`
traces work even over the axon dev tunnel, and this tool turns the raw
`*.trace.json.gz` into the numbers that drive optimization:

  * per-program device time (the transfer-immune ground truth — wall-clock
    deltas are meaningless through a relay that round-trips buffers);
  * an op-class breakdown (pallas kernels / convolutions / other fusions /
    copies) per program, the split quoted in the perf ledger.

Usage:
  python -m imagdressing_tpu.tools.profile_summary /path/to/trace_dir_or_file
  # or in code:
  from imagdressing_tpu.tools.profile_summary import summarize_trace
"""

from __future__ import annotations

import glob
import gzip
import json
import os
from typing import Dict, List


def load_trace_events(path: str) -> List[dict]:
    """`path`: a trace.json(.gz) file or a directory jax.profiler wrote into
    (the newest trace inside is used)."""
    if os.path.isdir(path):
        cands = sorted(
            glob.glob(os.path.join(path, "**", "*.trace.json.gz"),
                      recursive=True),
            key=os.path.getmtime,
        )
        if not cands:
            raise FileNotFoundError(f"no *.trace.json.gz under {path}")
        path = cands[-1]
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        return json.load(f)["traceEvents"]


def _classify(name: str) -> str:
    low = name.lower()
    if "custom-call" in low or "custom_call" in low or "pallas" in low:
        return "pallas/custom"
    # mosaic kernels keep the jitted fn name; the flash/groupnorm kernels
    # carry these markers in their HLO op names
    if "flash" in low or "group_norm" in low or "gn_kernel" in low:
        return "pallas/custom"
    if low.startswith("%convolution") or "conv" in low.split(".")[0]:
        return "convolution"
    if low.startswith("copy") or "copy-start" in low or "copy-done" in low:
        return "copy"
    if low.startswith(("fusion", "loop_", "input_", "output_")):
        return "fusion"
    if low.startswith(("all-reduce", "all-gather", "reduce-scatter",
                       "collective")):
        return "collective"
    return "other"


def summarize_trace(events: List[dict]) -> Dict[str, dict]:
    """-> {program_name: {"total_s", "by_class": {cls: seconds}, "events"}}
    using only device-timeline events (pids whose process_name starts with
    "/device:")."""
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_events = [e for e in events
                  if e.get("ph") == "X" and e.get("dur", 0) > 0
                  and str(pids.get(e.get("pid"), "")).startswith("/device:")]

    # program envelopes: jit_<fn>(fingerprint) events
    programs = [e for e in dev_events if e["name"].startswith("jit_")]
    out: Dict[str, dict] = {}
    for prog in programs:
        p0, p1 = prog["ts"], prog["ts"] + prog["dur"]
        name = prog["name"].split("(")[0]
        inner = [e for e in dev_events
                 if e is not prog and e["pid"] == prog["pid"]
                 and e["ts"] >= p0 and e["ts"] < p1]
        by_class: Dict[str, float] = {}
        for e in inner:
            # only leaf-ish op events: skip nested control-flow envelopes
            if e["name"].startswith(("while", "cond", "jit_")):
                continue
            cls = _classify(e["name"])
            by_class[cls] = by_class.get(cls, 0.0) + e["dur"] / 1e6
        rec = {
            "total_s": round(prog["dur"] / 1e6, 6),
            "by_class": {k: round(v, 6)
                         for k, v in sorted(by_class.items(),
                                            key=lambda kv: -kv[1])},
            "events": len(inner),
        }
        # keep the longest instance of each program
        if name not in out or rec["total_s"] > out[name]["total_s"]:
            out[name] = rec
    return out


def main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("path", help="trace.json(.gz) file or profiler log dir")
    args = ap.parse_args(argv)
    summary = summarize_trace(load_trace_events(args.path))
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
