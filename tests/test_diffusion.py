"""Diffusion machinery tests: constants vs numpy, scan-sampler parity vs a
step-by-step numpy loop with the reference update rules, VPSDE math via
finite differences (the reference's own self-check pattern,
diffusion_continuous.py:813-846), and the RK45 integrator."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lion_tpu.config import get_default_cfg
from lion_tpu.diffusion import (DiffusionDiscretized, DiffusionVPSDE, dopri45,
                                make_beta_schedule)


def small_cfg(num_steps=20, mode="linear"):
    cfg = get_default_cfg()
    cfg.ddpm.num_steps = num_steps
    cfg.ddpm.sched_mode = mode
    return cfg


def test_beta_schedules_shapes_and_monotone():
    for mode in ["linear", "quad", "warmup10", "warmup50", "const", "jsd",
                 "cust"]:
        betas = make_beta_schedule(mode, 1e-4, 2e-2, 100)
        assert betas.shape == (100,)
        assert (betas > 0).all() and (betas <= 1).all()
    lin = make_beta_schedule("linear", 1e-4, 2e-2, 1000)
    np.testing.assert_allclose(lin[0], 1e-4)
    np.testing.assert_allclose(lin[-1], 2e-2)


def test_discrete_constants():
    diff = DiffusionDiscretized(small_cfg(100))
    betas = np.asarray(diff.betas)
    ab = np.asarray(diff.alpha_bars)
    # recompute in float64 (the class computes in f64 then stores fp32)
    np.testing.assert_allclose(ab, np.cumprod(1 - betas.astype(np.float64)),
                               rtol=1e-4)
    snr = np.asarray(diff.snr)
    np.testing.assert_allclose(
        snr, 1 / (1 - ab.astype(np.float64)) - 1, rtol=1e-3)


def test_sample_q():
    diff = DiffusionDiscretized(small_cfg(10))
    x = jnp.ones((2, 4))
    noise = jnp.ones((2, 4)) * 2.0
    t = jnp.asarray([1, 10], jnp.int32)
    _, var_t, m_t, _ = diff.iw_quantities_t(t)
    out = np.asarray(diff.sample_q(x, noise, var_t, m_t))
    ab = np.asarray(diff.alpha_bars)
    for i, ti in enumerate([1, 10]):
        want = np.sqrt(ab[ti - 1]) * 1.0 + np.sqrt(1 - ab[ti - 1]) * 2.0
        np.testing.assert_allclose(out[i], want, rtol=1e-5)


def ddpm_numpy(model, x0, noises, betas, temp=1.0):
    """Step-by-step reference loop (diffusion_pvd.py:252-298 semantics)."""
    alphas = 1 - betas
    ab = np.cumprod(alphas)
    x = x0.copy()
    T = len(betas)
    for t in reversed(range(T)):
        pred = model(x, np.full((x.shape[0],), t + 1))
        if t == 0:
            mean = (x - np.sqrt(1 - ab[0]) * pred) / np.sqrt(ab[0])
            x = mean
        else:
            mean = (x - betas[t] * pred / np.sqrt(1 - ab[t])) / np.sqrt(alphas[t])
            x = mean + np.sqrt(betas[t]) * noises[t] * temp
    return x


def test_ddpm_scan_matches_numpy_loop():
    T, b, d = 20, 2, 8
    diff = DiffusionDiscretized(small_cfg(T))
    rng = np.random.RandomState(0)
    x0 = rng.randn(b, d).astype(np.float32)
    noises = rng.randn(T, b, d).astype(np.float32)

    w = rng.randn(d, d).astype(np.float32) * 0.05

    def model_np(x, t):
        return x @ w + 0.01 * t[:, None]

    def model_jnp(x, t):
        return x @ jnp.asarray(w) + 0.01 * t.astype(jnp.float32)[:, None]

    got = np.asarray(diff.run_denoising_diffusion(
        model_jnp, jax.random.PRNGKey(0), b, (d,), x_noisy=jnp.asarray(x0),
        given_noise=jnp.asarray(noises)))
    want = ddpm_numpy(model_np, x0, noises, np.asarray(diff.betas))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ddim_tau_schedule():
    diff = DiffusionDiscretized(small_cfg(1000))
    taus = diff.ddim_tau_schedule(100, "uniform")
    assert len(taus) == 100
    assert taus[0] == 999 and taus[-1] == 0
    assert taus == sorted(taus, reverse=True)
    quad = diff.ddim_tau_schedule(50, "quad")
    assert quad[-1] == 0 and len(quad) == 50


def test_ddim_deterministic_when_kappa0():
    T, b, d = 50, 2, 4
    diff = DiffusionDiscretized(small_cfg(T))

    def model(x, t):
        return 0.1 * x

    x0 = jnp.asarray(np.random.RandomState(1).randn(b, d), jnp.float32)
    out1 = diff.run_ddim(model, jax.random.PRNGKey(1), b, (d,), 10,
                         kappa=0.0, x_noisy=x0)
    out2 = diff.run_ddim(model, jax.random.PRNGKey(2), b, (d,), 10,
                         kappa=0.0, x_noisy=x0)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6)


def test_mixed_prediction():
    from lion_tpu.diffusion import get_mixed_prediction
    pred = jnp.ones((2, 4))
    mix = jnp.zeros((2, 4))
    logit = jnp.zeros((4,))  # sigmoid=0.5
    out = np.asarray(get_mixed_prediction(pred, logit, mix))
    np.testing.assert_allclose(out, 0.5)


# ---------------------------------------------------------------- VPSDE
def vpsde():
    cfg = get_default_cfg()
    return DiffusionVPSDE(cfg.sde)


def test_vpsde_finite_difference_e2int_f():
    d = vpsde()
    t = jnp.linspace(0.1, 0.9, 9)
    h = 1e-4
    fd = (d.e2int_f(t + h) - d.e2int_f(t - h)) / (2 * h)
    analytic = d.f(t) * d.e2int_f(t)
    np.testing.assert_allclose(np.asarray(fd), np.asarray(analytic),
                               rtol=1e-2)


def test_vpsde_finite_difference_var():
    """d/dt log(1 - var(t)) == -g2(t) (well-conditioned form of
    var' = g2 * (1 - var); direct fp32 FD of var cancels catastrophically
    near t=1)."""
    d = vpsde()
    t = jnp.linspace(0.1, 0.9, 9)
    h = 1e-3
    fd = (jnp.log1p(-d.var(t + h)) - jnp.log1p(-d.var(t - h))) / (2 * h)
    np.testing.assert_allclose(np.asarray(fd), np.asarray(-d.g2(t)),
                               rtol=1e-2)


def test_vpsde_inv_var_roundtrip():
    d = vpsde()
    t = jnp.linspace(0.05, 0.95, 10)
    t2 = d.inv_var(d.var(t))
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t), rtol=1e-4,
                               atol=1e-5)


def test_vpsde_iw_quantities_modes():
    d = vpsde()
    for mode in ["ll_uniform", "ll_iw", "drop_all_uniform", "drop_all_iw",
                 "drop_sigma2t_iw", "drop_sigma2t_uniform", "rescale_iw"]:
        t, var_t, m_t, op, oq, g2 = d.iw_quantities(
            jax.random.PRNGKey(0), 16, 1e-2, mode)
        assert t.shape == (16,)
        tv = np.asarray(t)
        assert (tv > 0).all() and (tv <= 1.0 + 1e-5).all(), mode
        assert np.isfinite(np.asarray(op)).all(), mode
        assert np.isfinite(np.asarray(oq)).all(), mode


def test_dopri45_exponential_decay():
    """dy/dt = -2y from t=0..1 -> y(1) = y0 * exp(-2)."""
    y0 = jnp.ones((4,))
    y1, nfe = dopri45(lambda t, y: -2.0 * y, y0, 0.0, 1.0, rtol=1e-6,
                      atol=1e-8)
    np.testing.assert_allclose(np.asarray(y1), np.exp(-2.0), rtol=1e-4)
    assert int(nfe) > 0


def test_dopri45_backward_integration():
    """Integrating backward (t0=1 -> t1=0.01) like the reverse ODE."""
    y0 = jnp.ones((2,))
    y1, _ = dopri45(lambda t, y: -y / jnp.maximum(t, 1e-3), y0, 1.0, 0.01,
                    rtol=1e-6, atol=1e-8)
    # dy/dt = -y/t -> y = C/t... backward from y(1)=1: y(t) = 1/t
    np.testing.assert_allclose(np.asarray(y1), 1.0 / 0.01, rtol=1e-2)


def test_vpsde_ode_gaussian_model():
    """With eps(x,t) = x/sqrt(var + (1-var)) == optimal for x0~N(0,I), the
    probability-flow ODE should approximately preserve a standard normal;
    check the output stays finite and roughly unit-scale."""
    d = vpsde()

    def model_fn(x, t):
        # optimal eps for N(0, I) data: x * sqrt(var)/sqrt(var + m^2)
        var = d.var(t[0])
        m = d.e2int_f(t[0])
        return x * jnp.sqrt(var) / (var + m ** 2)

    samples, nfe = d.sample_model_ode(model_fn, jax.random.PRNGKey(0), 8,
                                      (16,), ode_eps=1e-3,
                                      ode_solver_tol=1e-4)
    s = np.asarray(samples)
    assert np.isfinite(s).all()
    assert 0.3 < s.std() < 3.0
    assert int(nfe) > 20


def test_fixed_grid_solvers_convergence_and_orders():
    """torchdiffeq fixed_grid family (euler/midpoint/heun2/rk4 as one
    lax.scan each): all converge on dy/dt = -y, and rk4's error is orders
    below euler's at the same step count."""
    from lion_tpu.diffusion.continuous import odeint_fixed

    f = lambda t, y: -y
    y0 = jnp.ones((4,))
    want = float(np.exp(-1.0))
    errs = {}
    for method, stages in [("euler", 1), ("midpoint", 2), ("heun2", 2),
                           ("rk4", 4)]:
        y, nfe = odeint_fixed(f, y0, 0.0, 1.0, 64, method)
        assert int(nfe) == 64 * stages
        errs[method] = abs(float(y[0]) - want)
        np.testing.assert_allclose(np.asarray(y), want,
                                   rtol=2e-2 if method == "euler" else 1e-3)
    assert errs["rk4"] < errs["midpoint"] < errs["euler"]
    assert errs["rk4"] < 1e-6  # fp32 accumulation floor


def test_adams_bashforth4_convergence():
    """Explicit AB4 (torchdiffeq explicit Adams family): converges on
    dy/dt = -y with one eval per step after the RK4 bootstrap, error
    far below euler's at the same step count."""
    from lion_tpu.diffusion.continuous import (odeint_adams_bashforth4,
                                               odeint_fixed)
    f = lambda t, y: -y
    y0 = jnp.ones((4,))
    want = float(np.exp(-1.0))
    y, nfe = odeint_adams_bashforth4(f, y0, 0.0, 1.0, 64)
    assert int(nfe) == 1 + 15 + 61
    err_ab = abs(float(y[0]) - want)
    ye, _ = odeint_fixed(f, y0, 0.0, 1.0, 64, "euler")
    assert err_ab < abs(float(ye[0]) - want) / 100
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5)


def test_vpsde_ode_fixed_grid_matches_adaptive():
    """sample_model_ode(method='rk4') agrees with the adaptive dopri45
    default on the same noise (the two solver families integrate the same
    probability-flow ODE)."""
    d = vpsde()

    def model_fn(x, t):
        var = d.var(t[0])
        m = d.e2int_f(t[0])
        return x * jnp.sqrt(var) / (var + m ** 2)

    noise = jax.random.normal(jax.random.PRNGKey(1), (4, 16))
    ref, _ = d.sample_model_ode(model_fn, jax.random.PRNGKey(0), 4, (16,),
                                ode_eps=1e-3, ode_solver_tol=1e-5,
                                noise=noise)
    out, nfe = d.sample_model_ode(model_fn, jax.random.PRNGKey(0), 4, (16,),
                                  ode_eps=1e-3, noise=noise,
                                  method="rk4", fixed_steps=200)
    assert int(nfe) == 800
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-3, atol=5e-3)


def test_ddim_kappa0_matches_numpy_loop():
    """Deterministic DDIM (kappa=0) vs a step-by-step numpy loop with the
    reference update rule (diffusion_pvd.py:428-468)."""
    T, b, d, S = 50, 2, 6, 10
    diff = DiffusionDiscretized(small_cfg(T))
    rng = np.random.RandomState(3)
    x0 = rng.randn(b, d).astype(np.float32)
    w = rng.randn(d, d).astype(np.float32) * 0.05

    def model_np(x, t):
        return x @ w + 0.01 * t[:, None]

    def model_jnp(x, t):
        return x @ jnp.asarray(w) + 0.01 * t.astype(jnp.float32)[:, None]

    got = np.asarray(diff.run_ddim(model_jnp, jax.random.PRNGKey(0), b,
                                   (d,), S, kappa=0.0,
                                   x_noisy=jnp.asarray(x0)))

    ab = np.asarray(diff.alpha_bars)
    taus = diff.ddim_tau_schedule(S, "uniform")
    x = x0.copy()
    for i, t in enumerate(taus):
        if i == len(taus) - 1:
            a_next, sigma = 1.0, 0.0
        else:
            a_next = ab[taus[i + 1]]
            sigma = 0.0
        eps = model_np(x, np.full((b,), t + 1, np.float32))
        scale = np.sqrt(a_next / ab[t])
        c = np.sqrt(max(1 - a_next - sigma ** 2, 0.0)) \
            - np.sqrt(1 - ab[t]) * scale
        x = scale * x + c * eps
    np.testing.assert_allclose(got, x, rtol=1e-4, atol=1e-5)


def test_adaptive_solver_family():
    """The shared embedded-RK engine (torchdiffeq adaptive family:
    dopri5/dopri8/bosh3/fehlberg2/adaptive_heun, _impl/ tableaus): every
    solver converges on dy/dt = -2y at tol 1e-6, and the higher-order
    tableaus spend fewer function evaluations than the 2nd-order ones."""
    from lion_tpu.diffusion.continuous import odeint_adaptive

    f = lambda t, y: -2.0 * y
    y0 = jnp.ones((8,))
    want = float(np.exp(-2.0))
    nfes = {}
    for method in ("dopri5", "dopri8", "bosh3", "fehlberg2",
                   "adaptive_heun"):
        y, nfe = odeint_adaptive(f, y0, 0.0, 1.0, method,
                                 rtol=1e-6, atol=1e-6)
        # the 2nd-order tableaus carry much weaker error estimates
        # (fehlberg2's c_error is [-1/512, 0, 1/512]); hold them to a
        # looser realized accuracy than the 3rd+/8th-order ones
        rtol = 1e-3 if method in ("fehlberg2", "adaptive_heun") else 1e-4
        np.testing.assert_allclose(np.asarray(y), want, rtol=rtol,
                                   err_msg=method)
        nfes[method] = int(nfe)
    assert nfes["dopri5"] < nfes["adaptive_heun"]
    assert nfes["bosh3"] < nfes["adaptive_heun"]


def test_adaptive_solver_backward_and_dispatch():
    """Backward integration (t1 < t0, the PF-ODE direction) works for
    every adaptive tableau; sample_model_ode validates unknown names with
    a ValueError and routes 'explicit_adams' to the AB4 integrator."""
    from lion_tpu.diffusion.continuous import (odeint_adaptive,
                                               odeint_adams_bashforth4)

    f = lambda t, y: -y / jnp.maximum(t, 1e-3)
    y0 = jnp.ones((4,))
    for method in ("dopri8", "bosh3", "fehlberg2", "adaptive_heun"):
        y, _ = odeint_adaptive(f, y0, 1.0, 0.1, method,
                               rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(y), 10.0, rtol=1e-3,
                                   err_msg=method)

    sde = vpsde()
    model_fn = lambda x, t: jnp.zeros_like(x)
    rng = jax.random.PRNGKey(0)
    with pytest.raises(ValueError, match="unknown ODE method"):
        sde.sample_model_ode(model_fn, rng, 2, (4,), method="nope")
    with pytest.raises(ValueError, match="num_steps >= 4"):
        odeint_adams_bashforth4(f, y0, 1.0, 0.1, 2)
    x, nfe = sde.sample_model_ode(model_fn, rng, 2, (4,),
                                  method="explicit_adams", fixed_steps=8)
    assert x.shape == (2, 4) and bool(jnp.all(jnp.isfinite(x)))


def test_dopri8_beats_dopri5_accuracy_per_step():
    """On a stiff-ish nonlinear problem at loose tolerance, dopri8's
    8th-order error estimate yields an accurate solution (sanity that the
    13-stage tableau is transcribed correctly: wrong coefficients would
    destroy the order and the error estimate)."""
    from lion_tpu.diffusion.continuous import odeint_adaptive

    f = lambda t, y: y * jnp.cos(t)          # y(t) = exp(sin t)
    y0 = jnp.ones((2,))
    want = float(np.exp(np.sin(1.0)))
    y8, _ = odeint_adaptive(f, y0, 0.0, 1.0, "dopri8",
                            rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y8), want, rtol=1e-5)
