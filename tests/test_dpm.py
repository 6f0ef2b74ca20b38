"""DPM-Solver++(2M) correctness: on an analytically trackable linear model
it must converge to the same fixed point as DDIM and beat its accuracy at
equal step counts (second order vs first order)."""

import jax.numpy as jnp
import numpy as np

from imagdressing_tpu.core.config import SchedulerConfig
from imagdressing_tpu.samplers import ddim, dpm


def _linear_eps(x, t):
    # eps_theta(x, t) = 0.3 * x: the probability-flow ODE is linear and both
    # samplers integrate the same ODE exactly in the many-step limit.
    return 0.3 * x


def test_converges_to_same_limit_as_ddim():
    """Both samplers integrate the same probability-flow ODE: with many steps
    they must agree (the fixed target both approach as h -> 0)."""
    sched = ddim.make_schedule(SchedulerConfig())
    x = jnp.ones((1, 4, 4, 4))
    ddim_500 = ddim.sample_loop(sched, _linear_eps, x, 500)
    dpm_500 = dpm.sample_loop(sched, _linear_eps, x, 500)
    np.testing.assert_allclose(
        np.asarray(dpm_500), np.asarray(ddim_500), rtol=5e-3
    )


def test_order_of_convergence():
    sched = ddim.make_schedule(SchedulerConfig())
    x = jnp.ones((1, 2, 2, 4))
    ref = ddim.sample_loop(sched, _linear_eps, x, 1000)
    errs = []
    for steps in (10, 20, 40):
        out = dpm.sample_loop(sched, _linear_eps, x, steps)
        errs.append(float(jnp.abs(out - ref).max()))
    # halving h should shrink the error superlinearly (order ~2)
    assert errs[1] < errs[0] * 0.6
    assert errs[2] < errs[1] * 0.6


def test_shapes_and_finiteness():
    sched = ddim.make_schedule(SchedulerConfig())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    out = dpm.sample_loop(sched, _linear_eps, x, 15)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_unipc_matches_multistep_family():
    """UniPC (paper sampler) must converge to the same ODE limit; its
    order-2 accuracy tracks DPM2M on the linear model."""
    from imagdressing_tpu.samplers import unipc

    sched = ddim.make_schedule(SchedulerConfig())
    x = jnp.ones((1, 2, 2, 4))
    ref = ddim.sample_loop(sched, _linear_eps, x, 1000)
    errs = []
    for steps in (10, 20, 40):
        u = unipc.sample_loop(sched, _linear_eps, x, steps)
        errs.append(float(jnp.abs(u - ref).max()))
        d = dpm.sample_loop(sched, _linear_eps, x, steps)
        err_d = float(jnp.abs(d - ref).max())
        assert errs[-1] < err_d * 1.2  # same accuracy class
    assert errs[1] < errs[0] * 0.6 and errs[2] < errs[1] * 0.6
    # corrector off still converges
    u_nc = unipc.sample_loop(sched, _linear_eps, x, 40, use_corrector=False)
    assert float(jnp.abs(u_nc - ref).max()) < errs[0]


def test_lambda_tables_follow_actual_timesteps():
    """The next-point tables must be evaluated at ts[i+1] — under 'trailing'
    spacing the gaps alternate (33/34 at T=1000, steps=30), so the uniform
    `t - T//steps` approximation tabulates points the sampler never visits
    and every multistep ratio r = h_prev/h is wrong."""
    for spacing in ("leading", "trailing"):
        sched = ddim.make_schedule(SchedulerConfig(timestep_spacing=spacing))
        ts, _, _, lam, _, _, lam_n = dpm._lambda_tables(sched, 30)
        np.testing.assert_allclose(lam_n[:-1], lam[1:], rtol=0, atol=1e-12)
