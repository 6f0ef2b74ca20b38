"""Metric trackers: the hand-rolled TensorBoard event writer must emit
byte-valid TFRecords (masked CRC32C framing) containing Event/Summary
protos a TensorBoard reader decodes back to the logged scalars."""

import struct

import numpy as np
import pytest

from imagdressing_tpu.train import trackers


def test_crc32c_known_answer():
    # RFC 3720 Castagnoli check value
    assert trackers.crc32c(b"123456789") == 0xE3069283
    assert trackers.crc32c(b"") == 0


def _read_tfrecords(path):
    """Minimal TFRecord reader validating both masked checksums."""
    out = []
    with open(path, "rb") as f:
        while True:
            head = f.read(8)
            if not head:
                return out
            (length,) = struct.unpack("<Q", head)
            (len_crc,) = struct.unpack("<I", f.read(4))
            assert len_crc == trackers._masked_crc(head)
            payload = f.read(length)
            (data_crc,) = struct.unpack("<I", f.read(4))
            assert data_crc == trackers._masked_crc(payload)
            out.append(payload)


def _decode_fields(buf):
    """Generic proto wire decoder -> [(field, wire, value)]."""
    fields = []
    i = 0
    while i < len(buf):
        key = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            v = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 1:  # 64-bit
            v = struct.unpack("<d", buf[i:i + 8])[0]
            i += 8
        elif wire == 2:  # length-delimited
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            v = buf[i:i + ln]
            i += ln
        elif wire == 5:  # 32-bit
            v = struct.unpack("<f", buf[i:i + 4])[0]
            i += 4
        else:
            raise AssertionError(f"wire type {wire}")
        fields.append((field, wire, v))
    return fields


def _decode_event(buf):
    step, version, scalars = None, None, {}
    for field, _, v in _decode_fields(buf):
        if field == 2:
            step = v
        elif field == 3:
            version = v.decode()
        elif field == 5:
            for f2, _, value_msg in _decode_fields(v):
                assert f2 == 1
                tag, val = None, None
                for f3, _, v3 in _decode_fields(value_msg):
                    if f3 == 1:
                        tag = v3.decode()
                    elif f3 == 2:
                        val = v3
                scalars[tag] = val
    return step, version, scalars


def test_tensorboard_event_file_roundtrip(tmp_path):
    tb = trackers.TensorBoardTracker(str(tmp_path))
    tb.log(3, {"loss": 0.5, "grad_norm": 1.25, "note": "skip-me"})
    tb.log(4, {"loss": 0.25})
    tb.close()

    records = _read_tfrecords(tb.path)
    assert len(records) == 3  # version header + 2 scalar events
    _, version, _ = _decode_event(records[0])
    assert version == "brain.Event:2"
    step1, _, scal1 = _decode_event(records[1])
    assert step1 == 3
    np.testing.assert_allclose(scal1["loss"], 0.5)
    np.testing.assert_allclose(scal1["grad_norm"], 1.25)
    assert "note" not in scal1  # non-numeric values skipped
    step2, _, scal2 = _decode_event(records[2])
    assert step2 == 4 and abs(scal2["loss"] - 0.25) < 1e-7


def test_make_tracker_jsonl_and_tensorboard(tmp_path):
    import json
    import os

    t = trackers.make_tracker("tensorboard", str(tmp_path))
    t.log(1, {"loss": 2.0})
    t.close()
    lines = [
        json.loads(ln)
        for ln in (tmp_path / "metrics.jsonl").read_text().splitlines()
    ]
    assert lines[0] == {"loss": 2.0, "step": 1}
    events = [f for f in os.listdir(tmp_path / "logs")
              if f.startswith("events.out.tfevents.")]
    assert len(events) == 1


def test_make_tracker_wandb_raises_pointing_at_parity(tmp_path):
    """Without the package the error must point at the PARITY.md decision
    (VERDICT r4 missing #3)."""
    with pytest.raises(ValueError, match="PARITY.md"):
        trackers.make_tracker("wandb", str(tmp_path))
    with pytest.raises(ValueError, match="PARITY.md"):
        trackers.make_tracker("comet", str(tmp_path))


def test_wandb_adapter_uses_offline_mode(tmp_path, monkeypatch):
    """With the package importable, --report_to wandb returns a working
    offline adapter (thin wrapper over wandb.init/log/finish)."""
    import sys
    import types

    calls = {"log": [], "finish": 0}

    class FakeRun:
        def log(self, scalars, step=None):
            calls["log"].append((step, scalars))

        def finish(self):
            calls["finish"] += 1

    fake = types.ModuleType("wandb")

    def init(project=None, dir=None, mode=None):
        calls["init"] = {"project": project, "dir": dir, "mode": mode}
        return FakeRun()

    fake.init = init
    monkeypatch.setitem(sys.modules, "wandb", fake)
    monkeypatch.delenv("WANDB_MODE", raising=False)

    t = trackers.make_tracker("wandb", str(tmp_path))
    t.log(7, {"loss": 0.5, "note": "skip-me", "step": 7})
    t.close()
    assert calls["init"]["mode"] == "offline"
    assert calls["log"] == [(7, {"loss": 0.5})]
    assert calls["finish"] == 1
    # the jsonl sink still runs alongside
    assert (tmp_path / "metrics.jsonl").exists()


def test_comet_adapter_offline(tmp_path, monkeypatch):
    import sys
    import types

    calls = {"metrics": [], "end": 0}

    class FakeExp:
        def __init__(self, project_name=None, offline_directory=None):
            calls["ctor"] = {"project_name": project_name,
                             "offline_directory": offline_directory}

        def log_metrics(self, scalars, step=None):
            calls["metrics"].append((step, scalars))

        def end(self):
            calls["end"] += 1

    fake = types.ModuleType("comet_ml")
    fake.OfflineExperiment = FakeExp
    monkeypatch.setitem(sys.modules, "comet_ml", fake)

    t = trackers.make_tracker("comet", str(tmp_path))
    t.log(2, {"lr": 1e-4})
    t.close()
    assert calls["ctor"]["offline_directory"] == str(tmp_path)
    assert calls["metrics"] == [(2, {"lr": 0.0001})]
    assert calls["end"] == 1
