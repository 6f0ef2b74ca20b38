"""SCHP criterion stack tests: hand-computed small-tensor goldens."""

import jax
import jax.numpy as jnp
import numpy as np

from imagdressing_tpu.train.parsing_losses import (
    cross_entropy_2d,
    kl_consistency,
    lovasz_softmax,
    mean_iou,
    schp_criterion,
    soft_dice_loss,
)


def test_cross_entropy_perfect_prediction():
    labels = jnp.asarray([[[0, 1], [1, 0]]])
    logits = jax.nn.one_hot(labels, 2) * 100.0
    assert float(cross_entropy_2d(logits, labels)) < 1e-5


def test_cross_entropy_ignore_index():
    labels = jnp.asarray([[[0, 255], [255, 255]]])
    logits = jnp.zeros((1, 2, 2, 3))
    # only one valid pixel with uniform probs: loss = ln(3)
    np.testing.assert_allclose(
        float(cross_entropy_2d(logits, labels)), np.log(3), rtol=1e-5
    )


def test_lovasz_perfect_and_worst():
    labels = jnp.asarray([[[0, 1], [1, 0]]])
    perfect = jax.nn.one_hot(labels, 2) * 100.0
    assert float(lovasz_softmax(perfect, labels)) < 1e-5
    worst = jax.nn.one_hot(1 - labels, 2) * 100.0
    # total misprediction -> IoU error 1 for both classes
    np.testing.assert_allclose(float(lovasz_softmax(worst, labels)), 1.0,
                               atol=1e-5)


def test_soft_dice_range():
    labels = jnp.asarray([[[0, 1], [1, 0]]])
    perfect = jax.nn.one_hot(labels, 2) * 100.0
    assert float(soft_dice_loss(perfect, labels)) < 1e-3
    worst = jax.nn.one_hot(1 - labels, 2) * 100.0
    assert float(soft_dice_loss(worst, labels)) > 0.7  # eps smoothing on tiny tensors


def test_kl_zero_for_identical():
    logits = jnp.asarray(np.random.default_rng(0).standard_normal((1, 2, 2, 5)))
    assert abs(float(kl_consistency(logits, logits))) < 1e-6
    other = logits + 1.0  # uniform shift -> same softmax -> KL 0
    assert abs(float(kl_consistency(logits, other))) < 1e-6
    diff = logits.at[..., 0].add(3.0)
    assert float(kl_consistency(diff, logits)) > 0.01


def test_mean_iou():
    labels = jnp.asarray([[0, 0, 1, 1, 255]])
    pred = jnp.asarray([[0, 1, 1, 1, 0]])
    # class 0: inter 1, union 2 -> 0.5 ; class 1: inter 2, union 3 -> 2/3
    want = (0.5 + 2 / 3) / 2
    np.testing.assert_allclose(float(mean_iou(pred, labels, 2)), want, rtol=1e-5)


def test_schp_criterion_composes():
    rng = np.random.default_rng(1)
    fusion = jnp.asarray(rng.standard_normal((1, 4, 4, 3)).astype(np.float32))
    edge = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, (1, 4, 4)))
    edge_labels = jnp.asarray(rng.integers(0, 2, (1, 4, 4)))
    base = schp_criterion(fusion, edge, labels, edge_labels)
    with_cycle = schp_criterion(
        fusion, edge, labels, edge_labels,
        prev_fusion_logits=fusion + 1.0, cycle_weight=1.0,
    )
    assert np.isfinite(float(base)) and float(base) > 0
    # identical-softmax prev logits add ~0 KL
    np.testing.assert_allclose(float(with_cycle), float(base), rtol=1e-4)
    # gradient flows
    g = jax.grad(
        lambda f: schp_criterion(f, edge, labels, edge_labels)
    )(fusion)
    assert np.abs(np.asarray(g)).sum() > 0
