"""ONNX initializer reader round-trip tests."""

import numpy as np

from imagdressing_tpu.convert.onnx_reader import (
    read_onnx_initializers,
    write_minimal_onnx,
)


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "conv1.weight": rng.standard_normal((8, 3, 3, 3)).astype(np.float32),
        "bn1.running_mean": rng.standard_normal(8).astype(np.float32),
        "fc.bias": rng.standard_normal(16).astype(np.float64),
        "indices": rng.integers(0, 100, (5,)).astype(np.int64),
        "half": rng.standard_normal((4, 4)).astype(np.float16),
    }
    path = str(tmp_path / "m.onnx")
    write_minimal_onnx(path, tensors)
    got = read_onnx_initializers(path)
    assert set(got) == set(tensors)
    for k in tensors:
        assert got[k].dtype == tensors[k].dtype, k
        np.testing.assert_array_equal(got[k], tensors[k])


def test_non_onnx_raises(tmp_path):
    import pytest

    p = tmp_path / "junk.onnx"
    # a file whose outer message has no field-7 graph
    p.write_bytes(b"\x0a\x03abc")
    with pytest.raises(ValueError):
        read_onnx_initializers(str(p))
