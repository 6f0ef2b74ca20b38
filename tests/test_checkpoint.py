"""Orbax checkpoint save/restore round-trip (the DeepSpeed
save_checkpoint/load_checkpoint replacement, reference train.py:179-207)."""

import jax
import jax.numpy as jnp
import numpy as np

from imagdressing_tpu.core.config import TrainConfig
from imagdressing_tpu.pipelines.dressing import DressingModels
from imagdressing_tpu.train.checkpoint import CheckpointManager
from imagdressing_tpu.train.step import TrainState, init_train_state


def test_save_restore_roundtrip(tmp_path):
    models = DressingModels.init_random(jax.random.PRNGKey(0), small=True)
    cfg = TrainConfig(train_batch_size=1, warmup_steps=2)
    state, frozen, tx = init_train_state(models, cfg)
    state = TrainState(
        step=jnp.asarray(123, jnp.int32),
        params=jax.tree.map(lambda a: a + 1.0, state.params),
        opt_state=state.opt_state,
    )

    mgr = CheckpointManager(str(tmp_path / "ckpts"), async_save=False)
    mgr.save(state, extra={"epoch": 7})
    mgr.wait()

    template, _, _ = init_train_state(models, cfg)
    restored, _ = mgr.restore(template)
    assert restored is not None
    assert int(jax.device_get(restored.step)) == 123
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    mgr.close()


def test_restore_empty_returns_none(tmp_path):
    models = DressingModels.init_random(jax.random.PRNGKey(1), small=True)
    cfg = TrainConfig(train_batch_size=1)
    state, _, _ = init_train_state(models, cfg)
    mgr = CheckpointManager(str(tmp_path / "none"), async_save=False)
    restored, _ = mgr.restore(state)
    assert restored is None
    mgr.close()


def test_latest_wins(tmp_path):
    models = DressingModels.init_random(jax.random.PRNGKey(2), small=True)
    cfg = TrainConfig(train_batch_size=1)
    state, _, _ = init_train_state(models, cfg)
    mgr = CheckpointManager(str(tmp_path / "multi"), async_save=False,
                            max_to_keep=2)
    for s in (1, 2, 3):
        mgr.save(TrainState(step=jnp.asarray(s, jnp.int32),
                            params=state.params, opt_state=state.opt_state))
    mgr.wait()
    restored, _ = mgr.restore(state)
    assert int(jax.device_get(restored.step)) == 3
    mgr.close()
