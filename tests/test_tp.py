"""Tensor-parallel sharding: a (data=2, model=4) mesh must reproduce the
replicated forward bit-for-tolerance, with XLA inserting the collectives."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from imagdressing_tpu.core import mesh as mesh_lib
from imagdressing_tpu.core.tp import unet_param_specs
from imagdressing_tpu.core.config import UNetConfig
from imagdressing_tpu.models import unet as unet_lib


def test_tp_forward_matches_replicated(cpu_devices):
    cfg = UNetConfig(
        block_out_channels=(16, 32, 64, 64),
        cross_attention_dim=32,
        attention_num_heads=4,
        norm_num_groups=8,
    )
    params = unet_lib.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)).astype(np.float32))
    t = jnp.array([5, 5])
    ctx = jnp.asarray(rng.standard_normal((2, 77, 32)).astype(np.float32))

    want = unet_lib.apply(params, cfg, x, t, ctx)

    mesh = mesh_lib.make_mesh(data=2, model=4, devices=cpu_devices)
    specs = unet_param_specs(params, mesh)
    # sanity: at least one kernel actually got a model-axis spec
    leaves = jax.tree.leaves(specs, is_leaf=lambda s: isinstance(s, NamedSharding))
    assert any(s.spec == P(None, "model") for s in leaves)
    assert any(s.spec == P("model", None) for s in leaves)

    sharded = jax.device_put(params, specs)
    batch_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    fn = jax.jit(
        lambda p, x, t, c: unet_lib.apply(p, cfg, x, t, c),
        in_shardings=(specs, batch_sh, batch_sh, batch_sh),
        out_shardings=batch_sh,
    )
    with mesh:
        got = fn(sharded, jax.device_put(x, batch_sh),
                 jax.device_put(t, batch_sh), jax.device_put(ctx, batch_sh))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
