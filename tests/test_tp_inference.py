"""Tensor-parallel inference: the sampling program with UNet weights
column/row-split over the model mesh axis must reproduce the single-device
output (the TP capability goes beyond the reference, which has no TP —
SURVEY.md §2.3)."""

import dataclasses

import jax
import numpy as np
import pytest

from imagdressing_tpu.core import mesh as mesh_lib
from imagdressing_tpu.core.config import PRESETS
from imagdressing_tpu.pipelines.dressing import DressingModels, DressingPipeline


@pytest.mark.parametrize("shape", [(1, 2), (2, 2)])
def test_tp_sharded_generation_matches_replicated(shape):
    data, model = shape
    models = DressingModels.init_random(jax.random.PRNGKey(0), small=True)
    preset = dataclasses.replace(
        PRESETS["basic"], height=64, width=64, num_inference_steps=2
    )
    rng = np.random.default_rng(0)
    b = max(2, data)
    kwargs = dict(
        prompt_ids=rng.integers(0, 255, (b, 77)),
        negative_prompt_ids=rng.integers(0, 255, (b, 77)),
        ref_image=rng.standard_normal((b, 64, 64, 3))
        .astype(np.float32).clip(-1, 1),
        ref_clip_image=rng.standard_normal((b, 56, 56, 3))
        .astype(np.float32),
    )

    base = DressingPipeline(models, preset)(**kwargs, seed=3)

    mesh = mesh_lib.make_mesh(
        data=data, model=model,
        devices=jax.devices("cpu")[: data * model])
    sharded = DressingPipeline(models, preset, mesh=mesh)(**kwargs, seed=3)

    assert sharded.shape == base.shape
    np.testing.assert_allclose(sharded, base, atol=2e-4, rtol=2e-4)
