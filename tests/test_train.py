"""Train-step semantics: loss decreases, frozen params untouched, grads only
on the trainable split, ZeRO-2 sharded step == replicated step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagdressing_tpu.core import mesh as mesh_lib
from imagdressing_tpu.core.config import TrainConfig
from imagdressing_tpu.pipelines.dressing import DressingModels
from imagdressing_tpu.train.step import (
    TRAINABLE_KEYS,
    init_train_state,
    make_train_step,
    shard_train_step,
    split_params,
)


@pytest.fixture(scope="module")
def setup():
    models = DressingModels.init_random(jax.random.PRNGKey(0), small=True)
    cfg = TrainConfig(train_batch_size=2, warmup_steps=2, learning_rate=1e-3)
    state, frozen, tx = init_train_state(models, cfg)
    step = make_train_step(models, cfg, tx)
    rng = np.random.default_rng(0)
    batch = {
        "person_image": jnp.asarray(
            rng.standard_normal((2, 64, 64, 3)).astype(np.float32).clip(-1, 1)),
        "cloth_image": jnp.asarray(
            rng.standard_normal((2, 64, 64, 3)).astype(np.float32).clip(-1, 1)),
        "cloth_clip": jnp.asarray(
            rng.standard_normal((2, 56, 56, 3)).astype(np.float32)),
        "text_ids": jnp.asarray(rng.integers(0, 255, (2, 77)), jnp.int32),
    }
    return models, cfg, state, frozen, tx, step, batch


def test_split_covers_reference_trainables(setup):
    models = setup[0]
    trainable, frozen = split_params(models.params)
    assert set(trainable) == set(TRAINABLE_KEYS)
    assert "unet" in frozen and "vae" in frozen


def test_step_runs_and_loss_finite(setup):
    _, _, state, frozen, _, step, batch = setup
    jitted = jax.jit(step)
    new_state, metrics = jitted(state, frozen, batch, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])
    assert np.isfinite(loss) and loss > 0
    assert int(new_state.step) == 1
    # warmup starts at lr=0 (constant-with-warmup, reference run.sh) so the
    # FIRST update is a no-op; the second must move the params
    new_state, _ = jitted(new_state, frozen, batch, jax.random.PRNGKey(1))
    delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).sum()),
            state.params, new_state.params,
        ),
    )
    assert delta > 0


def test_loss_decreases_over_steps(setup):
    _, _, state, frozen, _, step, batch = setup
    jitted = jax.jit(step)
    rng = jax.random.PRNGKey(2)
    losses = []
    for i in range(8):
        # fixed noise/timesteps per step via the same rng -> should overfit
        state, metrics = jitted(state, frozen, batch, rng)
        losses.append(float(metrics["loss"]))
    # fold_in(state.step) varies the noise; compare medians of halves
    assert np.isfinite(losses).all()
    assert np.median(losses[4:]) < np.median(losses[:4]) * 1.5


def test_sharded_step_matches_single_device(setup, cpu_devices):
    models, cfg, state, frozen, tx, step, batch = setup
    # single-device result
    s1, m1 = jax.jit(step)(state, frozen, batch, jax.random.PRNGKey(3))

    mesh = mesh_lib.make_mesh(devices=cpu_devices[:2])
    jitted, s_state, s_frozen = shard_train_step(
        models, cfg, tx, mesh, state, frozen
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    s_batch = jax.device_put(batch, NamedSharding(mesh, P(mesh_lib.DATA_AXIS)))
    rng = jax.device_put(jax.random.PRNGKey(3), NamedSharding(mesh, P()))
    with mesh:
        s2, m2 = jitted(s_state, s_frozen, s_batch, rng)
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-4
    )
    # updated params agree
    l1 = jax.tree.leaves(s1.params)[0]
    l2 = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_zero2_nonfinite_step_is_global_noop(setup, cpu_devices):
    """A NaN arising on ONE device's shard must skip the update GLOBALLY
    (DeepSpeed semantics) — not per-device, which would leave the replicated
    params divergent across the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    models, cfg, state, frozen, tx, step, batch = setup
    mesh = mesh_lib.make_mesh(devices=cpu_devices[:2])
    jitted, s_state, s_frozen = shard_train_step(
        models, cfg, tx, mesh, state, frozen
    )
    bad = dict(batch)
    img = np.asarray(batch["person_image"]).copy()
    img[0, 0, 0, 0] = np.nan  # poisons only device 0's shard
    bad["person_image"] = jnp.asarray(img)
    s_batch = jax.device_put(bad, NamedSharding(mesh, P(mesh_lib.DATA_AXIS)))
    rng = jax.device_put(jax.random.PRNGKey(3), NamedSharding(mesh, P()))
    before = jax.tree.map(np.array, jax.device_get(s_state.params))
    with mesh:
        s2, m2 = jitted(s_state, s_frozen, s_batch, rng)
    assert not np.isfinite(float(m2["grad_norm"]))
    for b, a in zip(jax.tree.leaves(before), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(b, np.asarray(a))


def test_tp_train_step_matches_single_device(setup, cpu_devices):
    """Tensor-parallel (data=2, model=2) step == the plain replicated step:
    same loss/grad-norm/updated params, with UNet projection kernels and
    their optimizer moments actually split over the model axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from imagdressing_tpu.train.step import tp_train_step

    models, cfg, state, frozen, tx, step, batch = setup
    s1, m1 = jax.jit(step)(state, frozen, batch, jax.random.PRNGKey(3))

    mesh = mesh_lib.make_mesh(data=2, model=2, devices=cpu_devices[:4])
    jitted, s_state, s_frozen = tp_train_step(
        models, cfg, tx, mesh, state, frozen
    )
    # the attention projections really are model-split (params AND moments)
    def find_sharded(tree):
        return [l for l in jax.tree.leaves(tree)
                if mesh_lib.MODEL_AXIS
                in tuple(getattr(l.sharding, "spec", ()))]

    assert find_sharded(s_state.params["ref_unet"])
    assert find_sharded(s_state.opt_state)

    s_batch = jax.device_put(batch, NamedSharding(mesh, P(mesh_lib.DATA_AXIS)))
    rng = jax.device_put(jax.random.PRNGKey(3), NamedSharding(mesh, P()))
    with mesh:
        s2, m2 = jitted(s_state, s_frozen, s_batch, rng)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m1["grad_norm"]),
                               float(m2["grad_norm"]), rtol=1e-3)
    for l1, l2 in zip(jax.tree.leaves(s1.params),
                      jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   atol=5e-5)


def test_zero2_emits_reduce_scatter_and_shards_opt_state(setup, cpu_devices):
    """The ZeRO-2 contract, verified on the compiled program: gradient
    reduction is a reduce-scatter (NOT all-reduce + slice), and each device
    holds ~1/n of the optimizer state (zero_stage2_config.json:12-20)."""
    import re

    import jax.numpy as jnp

    models, cfg, state, frozen, tx, step, batch = setup
    mesh = mesh_lib.make_mesh(devices=cpu_devices)  # 8 devices
    n = mesh.shape[mesh_lib.DATA_AXIS]
    jitted, s_state, s_frozen = shard_train_step(
        models, cfg, tx, mesh, state, frozen
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch8 = jax.tree.map(lambda x: jnp.repeat(x, n // 2, axis=0), batch)
    s_batch = jax.device_put(
        batch8, NamedSharding(mesh, P(mesh_lib.DATA_AXIS))
    )
    rng = jax.device_put(jax.random.PRNGKey(3), NamedSharding(mesh, P()))
    hlo = jitted.lower(s_state, s_frozen, s_batch, rng).compile().as_text()
    n_rs = len(re.findall(r" reduce-scatter\(", hlo))
    assert n_rs > 0, "gradient reduction must lower to reduce-scatter"

    # per-device optimizer-state bytes ~ 1/n of the total
    dev0 = jax.devices("cpu")[0]
    total = shard0 = 0
    for leaf in jax.tree.leaves(s_state.opt_state):
        total += leaf.size * leaf.dtype.itemsize
        for s in leaf.addressable_shards:
            if s.device == dev0:
                shard0 += s.data.size * s.data.dtype.itemsize
    assert shard0 < 1.5 * total / n, (shard0, total)


def test_zero2_sharding_specs(cpu_devices):
    mesh = mesh_lib.make_mesh(devices=cpu_devices)
    tree = {
        "a": jnp.zeros((16, 3)),  # dim0 divisible by 8 -> sharded on dim0
        "b": jnp.zeros((3, 5)),  # nothing divisible -> replicated
        "c": jnp.zeros(()),  # scalar -> replicated
    }
    specs = mesh_lib.zero2_param_sharding(mesh, tree)
    assert tuple(specs["a"].spec) in ((("data",)), ("data", None))
    assert specs["a"].spec[0] == "data"
    assert all(s is None for s in specs["b"].spec)
    assert all(s is None for s in specs["c"].spec)


def test_shard_host_batch_single_host(setup, cpu_devices):
    """shard_host_batch must produce (data,)-sharded global arrays whose
    content round-trips the host batch (single-host degenerate case of the
    multi-host jax.make_array_from_process_local_data path)."""
    from imagdressing_tpu.train.data import shard_host_batch

    mesh = mesh_lib.make_mesh(devices=cpu_devices)
    rng = np.random.default_rng(0)
    host = {
        "person_image": rng.standard_normal((8, 16, 16, 3)).astype(np.float32),
        "text_ids": rng.integers(0, 255, (8, 77)).astype(np.int32),
    }
    global_batch = shard_host_batch(mesh, host)
    for k, v in global_batch.items():
        assert v.shape == host[k].shape
        assert v.sharding.spec[0] == mesh_lib.DATA_AXIS
        np.testing.assert_array_equal(np.asarray(v), host[k])
        assert len(v.addressable_shards) == 8
        assert v.addressable_shards[0].data.shape[0] == 1
