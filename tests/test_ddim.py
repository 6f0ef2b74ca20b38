"""DDIM schedule golden tests against the diffusers formulas the reference
configures (inference_IMAGdressing.py:119-127, train.py:403-407)."""

import jax.numpy as jnp
import numpy as np

from imagdressing_tpu.core.config import SchedulerConfig
from imagdressing_tpu.samplers import ddim


def test_scaled_linear_alphas():
    sched = ddim.make_schedule(SchedulerConfig())
    # betas = linspace(sqrt(85e-5), sqrt(0.012), 1000)^2
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
    want = np.cumprod(1 - betas)
    np.testing.assert_allclose(sched.alphas_cumprod, want, rtol=1e-5)
    # set_alpha_to_one=False -> final alpha = alphas_cumprod[0]
    assert abs(sched.final_alpha_cumprod - want[0]) < 1e-8


def test_leading_timesteps_with_offset():
    sched = ddim.make_schedule(SchedulerConfig())
    ts = ddim.timesteps(sched, 50)
    assert ts[0] == 981 and ts[-1] == 1  # (49*20)+1 ... 0*20+1
    assert len(ts) == 50
    assert np.all(np.diff(ts) == -20)


def test_trailing_timesteps():
    cfg = SchedulerConfig(timestep_spacing="trailing", rescale_betas_zero_snr=True)
    sched = ddim.make_schedule(cfg)
    ts = ddim.timesteps(sched, 50)
    assert ts[0] == 999 and len(ts) == 50
    # zero-SNR rescale makes the terminal alpha-bar ~0
    assert sched.alphas_cumprod[-1] < 1e-8


def test_step_reconstructs_x0_at_final_step():
    """If the model predicts the exact noise, the final DDIM step (t=1 ->
    prev_t<0, alpha_prev=final_alpha) must return ~x0 scaled by
    sqrt(final_alpha) + residual noise term."""
    sched = ddim.make_schedule(SchedulerConfig())
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    eps = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    t = jnp.asarray(981)
    a = sched.alphas_cumprod[981]
    xt = np.sqrt(a) * x0 + np.sqrt(1 - a) * eps
    prev = ddim.step(sched, jnp.asarray(eps), t, jnp.asarray(xt), 50)
    a_prev = sched.alphas_cumprod[961]
    want = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps
    np.testing.assert_allclose(np.asarray(prev), want, atol=1e-4)


def test_add_noise_roundtrip():
    sched = ddim.make_schedule(SchedulerConfig())
    x0 = jnp.ones((2, 2, 2, 4))
    noise = jnp.zeros_like(x0)
    t = jnp.asarray([0, 500])
    noisy = ddim.add_noise(sched, x0, noise, t)
    np.testing.assert_allclose(
        np.asarray(noisy[0]), np.sqrt(sched.alphas_cumprod[0]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(noisy[1]), np.sqrt(sched.alphas_cumprod[500]), rtol=1e-5
    )


def test_sample_loop_scan_matches_python_loop():
    sched = ddim.make_schedule(SchedulerConfig())
    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.standard_normal((1, 4, 4, 4)).astype(np.float32))

    def eps_fn(x, t):
        return 0.1 * x  # arbitrary deterministic model

    got = ddim.sample_loop(sched, eps_fn, lat, 10)
    want = lat
    for t in ddim.timesteps(sched, 10):
        want = ddim.step(sched, eps_fn(want, t), jnp.asarray(t), want, 10)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_min_snr_weights():
    sched = ddim.make_schedule(SchedulerConfig())
    snr = ddim.compute_snr(sched, jnp.asarray([0, 500, 999]))
    a = sched.alphas_cumprod
    want = np.array([a[0] / (1 - a[0]), a[500] / (1 - a[500]), a[999] / (1 - a[999])])
    np.testing.assert_allclose(np.asarray(snr), want, rtol=1e-4)


def test_step_eta_variance_matches_diffusers_formula():
    """eta>0: sigma = eta*sqrt((1-a_prev)/(1-a_t)*(1-a_t/a_prev)) and the
    eps direction shrinks to sqrt(1-a_prev-sigma^2) (diffusers
    DDIMScheduler._get_variance + step); eta=0 is bit-identical to the
    historical deterministic update."""
    sched = ddim.make_schedule()
    rng = np.random.default_rng(0)
    sample = jnp.asarray(rng.standard_normal((1, 4, 4, 4)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal((1, 4, 4, 4)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((1, 4, 4, 4)).astype(np.float32))
    t, n_steps, eta = 981, 50, 0.7

    got = ddim.step(sched, eps, jnp.asarray(t), sample, n_steps,
                    eta=eta, noise=noise)

    ac = sched.alphas_cumprod
    a_t = ac[t]
    a_prev = ac[t - 1000 // n_steps]
    x0 = (np.asarray(sample) - np.sqrt(1 - a_t) * np.asarray(eps)) / np.sqrt(a_t)
    var = (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev)
    sigma = eta * np.sqrt(var)
    want = (
        np.sqrt(a_prev) * x0
        + np.sqrt(1 - a_prev - sigma**2) * np.asarray(eps)
        + sigma * np.asarray(noise)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    got0 = ddim.step(sched, eps, jnp.asarray(t), sample, n_steps)
    want0 = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(got0), want0, rtol=1e-5, atol=1e-6)
