"""Fused ABN (InPlaceABN equivalent): forward vs torch BatchNorm+leaky-relu,
inverse-recompute backward vs autodiff of the plain implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagdressing_tpu.kernels import fused_bn_act as abn


def test_inference_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 4, 16)).astype(np.float32)
    w = rng.standard_normal(16).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    mean = rng.standard_normal(16).astype(np.float32)
    var = rng.random(16).astype(np.float32) + 0.5

    got = abn.abn_inference(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
        jnp.asarray(mean), jnp.asarray(var),
    )
    bn = torch.nn.BatchNorm2d(16).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(w))
        bn.bias.copy_(torch.from_numpy(b))
        bn.running_mean.copy_(torch.from_numpy(mean))
        bn.running_var.copy_(torch.from_numpy(var))
        want = torch.nn.functional.leaky_relu(
            bn(torch.from_numpy(x.transpose(0, 3, 1, 2))), 0.01
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def _plain_abn(x, w, b, activation="leaky_relu", slope=0.01, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.mean(xf * xf, axis=(0, 1, 2)) - mean**2
    xhat = (xf - mean) * jax.lax.rsqrt(var + eps)
    z = xhat * w + b
    return jnp.where(z >= 0, z, slope * z)


@pytest.mark.parametrize("activation", ["leaky_relu", "elu", "none"])
def test_train_forward_matches_plain(activation):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    got = abn.abn_train(x, w, b, 1e-5, activation, 0.01, None)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.mean(xf * xf, axis=(0, 1, 2)) - mean**2
    z = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * w + b
    want = abn._act(z, activation, 0.01)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("activation", ["leaky_relu", "elu"])
def test_inverse_recompute_gradients(activation):
    """The memory-free backward (reconstructing pre-activations from the
    output) must match plain autodiff."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 3, 3, 8)).astype(np.float32))
    w = jnp.asarray(rng.random(8).astype(np.float32) + 0.5)
    b = jnp.asarray(rng.standard_normal(8).astype(np.float32))

    def loss_custom(x, w, b):
        return jnp.sum(abn.abn_train(x, w, b, 1e-5, activation, 0.01, None) ** 2)

    def loss_plain(x, w, b):
        return jnp.sum(_plain_abn_act(x, w, b, activation) ** 2)

    def _plain_abn_act(x, w, b, activation):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.mean(xf * xf, axis=(0, 1, 2)) - mean**2
        z = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * w + b
        return abn._act(z, activation, 0.01)

    g1 = jax.grad(loss_custom, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(loss_plain, argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-3)


def test_sync_abn_matches_global_batch(cpu_devices):
    """InPlaceABNSync semantics: per-device ABN with pmean'd stats over the
    data axis == single-device ABN over the concatenated batch."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 2, 2, 8)).astype(np.float32))
    w = jnp.ones(8)
    b = jnp.zeros(8)

    mesh = Mesh(np.asarray(cpu_devices[:2]), ("data",))
    fn = shard_map(
        lambda xs: abn.abn_train(xs, w, b, 1e-5, "leaky_relu", 0.01, "data"),
        mesh=mesh,
        in_specs=P("data"),
        out_specs=P("data"),
    )
    got = fn(x)
    want = abn.abn_train(x, w, b, 1e-5, "leaky_relu", 0.01, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
