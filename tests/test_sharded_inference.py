"""Multi-chip inference: the full sampling program batch-sharded over the
`data` mesh axis (SURVEY §2.3 — TPU equivalent of the reference's serial
folder loops, inference_IMAGdressing_ipa_controlnetpose_folder.py:196-253).

Runs on 8 virtual CPU devices (conftest). The contract: a sharded batch-8 run
is bitwise-equivalent (up to reduction order) to eight independent batch-1
runs, and ragged batches pad+slice transparently.
"""

import dataclasses

import jax
import numpy as np
import pytest

from imagdressing_tpu.core import mesh as mesh_lib
from imagdressing_tpu.core.config import PRESETS
from imagdressing_tpu.pipelines.dressing import DressingModels, DressingPipeline


@pytest.fixture(scope="module")
def setup():
    cpus = jax.devices("cpu")
    if len(cpus) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    mesh = mesh_lib.make_mesh(data=8, model=1, devices=cpus[:8])
    models = DressingModels.init_random(jax.random.PRNGKey(0), small=True)
    preset = dataclasses.replace(
        PRESETS["basic"], height=64, width=64, num_inference_steps=2
    )
    return mesh, models, preset


def _inputs(b):
    rng = np.random.default_rng(0)
    return dict(
        prompt_ids=rng.integers(0, 255, (b, 77)),
        negative_prompt_ids=rng.integers(0, 255, (b, 77)),
        ref_image=rng.standard_normal((b, 64, 64, 3))
        .astype(np.float32).clip(-1, 1),
        ref_clip_image=rng.standard_normal((b, 56, 56, 3)).astype(np.float32),
    )


def test_sharded_batch_matches_single_runs(setup):
    mesh, models, preset = setup
    sharded = DressingPipeline(models, preset, mesh=mesh)
    plain = DressingPipeline(models, preset)
    kw = _inputs(8)
    lat = np.random.default_rng(1).standard_normal((8, 8, 8, 4)).astype(
        np.float32
    )
    out8 = sharded(**kw, latents=lat)
    assert out8.shape == (8, 64, 64, 3)
    for i in (0, 3, 7):
        one = {k: v[i : i + 1] for k, v in kw.items()}
        ref = plain(**one, latents=lat[i : i + 1])
        np.testing.assert_allclose(out8[i], ref[0], atol=2e-3)


def test_sharded_ragged_batch_pads(setup):
    """batch=5 on an 8-way mesh: padded to 8 internally, sliced back."""
    mesh, models, preset = setup
    sharded = DressingPipeline(models, preset, mesh=mesh)
    kw8 = _inputs(8)
    lat = np.random.default_rng(1).standard_normal((8, 8, 8, 4)).astype(
        np.float32
    )
    out8 = sharded(**kw8, latents=lat)
    kw5 = {k: v[:5] for k, v in kw8.items()}
    out5 = sharded(**kw5, latents=lat[:5])
    assert out5.shape == (5, 64, 64, 3)
    np.testing.assert_allclose(out5, out8[:5], atol=2e-3)
