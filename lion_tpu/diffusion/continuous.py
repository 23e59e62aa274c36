"""Continuous-time VPSDE + probability-flow ODE sampling (TPU-native).

Reference: utils/diffusion_continuous.py -- DiffusionBase/DiffusionVPSDE
(:571-621) with importance-sampled t (`_iw_quantities_vpsdelike`:309-380) and
`sample_model_ode`:178-255 (torchdiffeq/scipy RK45).

The ODE solver here is an adaptive Dormand-Prince RK45 written as a
`lax.while_loop` so the whole reverse ODE jits into a single XLA program
(no host round-trips per step, unlike torchdiffeq's scipy path); the NFE
counter is carried in the loop state.
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax


def make_diffusion(sde_cfg):
    """Factory (diffusion_continuous.py:20-36); only vpsde is live in the
    reference (other variants are commented out there)."""
    if sde_cfg.sde_type == "vpsde":
        return DiffusionVPSDE(sde_cfg)
    raise ValueError(f"Unrecognized sde type: {sde_cfg.sde_type}")


class DiffusionVPSDE:
    """VPSDE with linear beta(t), t in [0, 1]."""

    def __init__(self, sde_cfg):
        self.sigma2_0 = float(sde_cfg.sigma2_0)
        self.beta_start = float(sde_cfg.beta_start)
        self.beta_end = float(sde_cfg.beta_end)
        self.time_eps = float(sde_cfg.time_eps)
        self.sde_type = "vpsde"
        # constants for 'drop_all_iw' importance sampling
        delta_beta_half = 0.5 * (self.beta_end - self.beta_start)
        beta_frac = self.beta_start / (self.beta_end - self.beta_start)
        self.delta_beta_half = delta_beta_half
        self.beta_frac = beta_frac
        self.const_aq = ((1.0 - self.sigma2_0) * math.exp(0.5 * beta_frac)
                         * math.sqrt(0.25 * math.pi / delta_beta_half))
        self.const_erf = math.erf(math.sqrt(delta_beta_half)
                                  * (self.time_eps + beta_frac))
        self.const_norm_2 = (math.erf(math.sqrt(delta_beta_half)
                                      * (1.0 + beta_frac)) - self.const_erf)
        self.const_norm = self.const_aq * self.const_norm_2

    # -- SDE coefficients -------------------------------------------------
    def f(self, t):
        return -0.5 * self.g2(t)

    def g2(self, t):
        return self.beta_start + (self.beta_end - self.beta_start) * t

    def var(self, t):
        return 1.0 - (1.0 - self.sigma2_0) * jnp.exp(
            -self.beta_start * t
            - 0.5 * (self.beta_end - self.beta_start) * t * t)

    def e2int_f(self, t):
        return jnp.exp(-0.5 * self.beta_start * t
                       - 0.25 * (self.beta_end - self.beta_start) * t * t)

    def inv_var(self, var):
        c = jnp.log((1.0 - var) / (1.0 - self.sigma2_0))
        a = self.beta_end - self.beta_start
        return (-self.beta_start
                + jnp.sqrt(self.beta_start ** 2 - 2.0 * a * c)) / a

    def mixing_component(self, x_noisy, var_t, t):
        return jnp.sqrt(var_t) * x_noisy

    @staticmethod
    def sample_q(x_init, noise, var_t, m_t):
        return m_t * x_init + jnp.sqrt(var_t) * noise

    def cross_entropy_const(self, ode_eps):
        return 0.5 * (1.0 + jnp.log(2.0 * jnp.pi * self.var(jnp.float32(ode_eps))))

    # -- importance-sampled training quantities ---------------------------
    def iw_quantities(self, rng, size, time_eps, iw_sample_mode):
        """Returns (t, var_t, m_t, obj_weight_t_p, obj_weight_t_q, g2_t);
        the (B, 1)-shaped weights broadcast over flat latents."""
        rho = jax.random.uniform(rng, (size,))
        if iw_sample_mode == "ll_uniform":
            t = rho * (1.0 - time_eps) + time_eps
            var_t, m_t, g2_t = self.var(t), self.e2int_f(t), self.g2(t)
            obj_p = obj_q = g2_t / (2.0 * var_t)
        elif iw_sample_mode == "ll_iw":
            ones = jnp.ones_like(rho)
            sigma2_1, sigma2_eps = self.var(ones), self.var(time_eps * ones)
            log_s1, log_se = jnp.log(sigma2_1), jnp.log(sigma2_eps)
            var_t = jnp.exp(rho * log_s1 + (1.0 - rho) * log_se)
            t = self.inv_var(var_t)
            m_t, g2_t = self.e2int_f(t), self.g2(t)
            obj_p = obj_q = 0.5 * (log_s1 - log_se) / (1.0 - var_t)
        elif iw_sample_mode == "drop_all_uniform":
            t = rho * (1.0 - time_eps) + time_eps
            var_t, m_t, g2_t = self.var(t), self.e2int_f(t), self.g2(t)
            obj_p = jnp.ones_like(t)
            obj_q = g2_t / (2.0 * var_t)
        elif iw_sample_mode == "drop_all_iw":
            t = (jnp.sqrt(1.0 / self.delta_beta_half)
                 * jax.scipy.special.erfinv(
                     rho * self.const_norm_2 + self.const_erf)
                 - self.beta_frac)
            var_t, m_t, g2_t = self.var(t), self.e2int_f(t), self.g2(t)
            obj_p = self.const_norm / (1.0 - var_t)
            obj_q = obj_p * g2_t / (2.0 * var_t)
        elif iw_sample_mode == "drop_sigma2t_iw":
            ones = jnp.ones_like(rho)
            sigma2_1, sigma2_eps = self.var(ones), self.var(time_eps * ones)
            var_t = rho * sigma2_1 + (1.0 - rho) * sigma2_eps
            t = self.inv_var(var_t)
            m_t, g2_t = self.e2int_f(t), self.g2(t)
            obj_p = 0.5 * (sigma2_1 - sigma2_eps) / (1.0 - var_t)
            obj_q = obj_p / var_t
        elif iw_sample_mode == "drop_sigma2t_uniform":
            t = rho * (1.0 - time_eps) + time_eps
            var_t, m_t, g2_t = self.var(t), self.e2int_f(t), self.g2(t)
            obj_p = g2_t / 2.0
            obj_q = g2_t / (2.0 * var_t)
        elif iw_sample_mode == "rescale_iw":
            t = rho * (1.0 - time_eps) + time_eps
            var_t, m_t, g2_t = self.var(t), self.e2int_f(t), self.g2(t)
            obj_p = 0.5 / (1.0 - var_t)
            obj_q = g2_t / (2.0 * var_t)
        else:
            raise ValueError(
                f"Unrecognized importance sampling type: {iw_sample_mode}")
        col = lambda a: a[:, None]
        return t, col(var_t), col(m_t), col(obj_p), col(obj_q), col(g2_t)

    # -- probability-flow ODE sampling ------------------------------------
    def sample_model_ode(self, model_fn: Callable, rng, num_samples, shape,
                         ode_eps: float = 1e-5, ode_solver_tol: float = 1e-5,
                         temp: float = 1.0, noise=None,
                         mixing_logit=None, method: str = "dopri45",
                         fixed_steps: int = 100):
        """Integrate dx/dt = f(t) x + g2(t)/2 * eps(x, t)/sqrt(var(t)) from
        t=1 to t=ode_eps (diffusion_continuous.py:178-255). Returns
        (samples, nfe). `method` selects the solver: adaptive "dopri45"
        (default, the reference's live scipy-RK45 path) or a fixed-grid
        name from _FIXED_STAGES with `fixed_steps` steps (the vendored
        torchdiffeq fixed_grid family)."""
        x_shape = (num_samples,) + tuple(shape)
        if noise is None:
            rng, init_rng = jax.random.split(rng)
            noise = jax.random.normal(init_rng, x_shape) * temp

        def ode_func(t, x):
            var = self.var(t)
            pred = model_fn(x, jnp.full((num_samples,), t, jnp.float32))
            if mixing_logit is not None:
                from .discrete import get_mixed_prediction
                mix = self.mixing_component(x, var, t)
                pred = get_mixed_prediction(
                    pred, mixing_logit.reshape(x_shape[1:]), mix)
            return self.f(t) * x + 0.5 * self.g2(t) * pred / jnp.sqrt(var)

        return _dispatch_ode(ode_func, noise, 1.0, ode_eps, method,
                             fixed_steps, ode_solver_tol)

    def compute_ode_encode(self, model_fn: Callable, eps,
                           ode_eps: float = 1e-5,
                           ode_solver_tol: float = 1e-5,
                           mixing_logit=None, method: str = "dopri45",
                           fixed_steps: int = 100):
        """Deterministic forward encode: integrate the probability-flow ODE
        from t=ode_eps to t=1, mapping a clean latent to its noise-space
        representation. This is the live behavior of the reference's
        `compute_ode_nll` (diffusion_continuous.py:90-176) — its NLL
        bookkeeping is entirely commented out upstream and it returns only
        the integrated state, used by trainers/encode_interp_interp.py:265-276
        to get interpolation endpoints. Returns (eps_T, nfe)."""
        num_samples = eps.shape[0]
        x_shape = eps.shape

        def ode_func(t, x):
            var = self.var(t)
            pred = model_fn(x, jnp.full((num_samples,), t, jnp.float32))
            if mixing_logit is not None:
                from .discrete import get_mixed_prediction
                mix = self.mixing_component(x, var, t)
                pred = get_mixed_prediction(
                    pred, mixing_logit.reshape(x_shape[1:]), mix)
            return self.f(t) * x + 0.5 * self.g2(t) * pred / jnp.sqrt(var)

        return _dispatch_ode(ode_func, eps, ode_eps, 1.0, method,
                             fixed_steps, ode_solver_tol)


def _dispatch_ode(func, y0, t0, t1, method, fixed_steps, tol):
    """Route an ode-solver name (the reference's sde.ode_solver surface,
    torchdiffeq SOLVERS dict odeint.py:13) to the matching integrator."""
    if method in _ADAPTIVE_TABLEAUS:
        return odeint_adaptive(func, y0, t0, t1, method,
                               rtol=tol, atol=tol)
    if method in _FIXED_STAGES:
        return odeint_fixed(func, y0, t0, t1, fixed_steps, method)
    if method in ("adams", "explicit_adams", "ab4"):
        return odeint_adams_bashforth4(func, y0, t0, t1, fixed_steps)
    raise ValueError(
        f"unknown ODE method {method!r}; choose an adaptive solver "
        f"{sorted(_ADAPTIVE_TABLEAUS)}, a fixed-grid solver "
        f"{sorted(_FIXED_STAGES)}, or 'explicit_adams' "
        "(implicit Adams / adjoint are unported — dead in LION)")


# ------------------------------------------------------- fixed-grid RK
# The reference vendors torchdiffeq with euler/midpoint/rk4/heun fixed-grid
# solvers beside the adaptive ones (third_party/torchdiffeq/_impl/
# fixed_grid.py, SOLVERS dict odeint.py:13). LION's live path only uses
# the adaptive RK45 (scipy), but the fixed-grid family is part of the
# solver surface; here each is one lax.scan (Adams + implicit/adjoint
# remain unported — documented in PARITY.md).

_FIXED_STAGES = {
    # name -> list of (c, [a_ij]) stages + b weights
    "euler": (((0.0, ()),), (1.0,)),
    "midpoint": (((0.0, ()), (0.5, (0.5,))), (0.0, 1.0)),
    "heun2": (((0.0, ()), (1.0, (1.0,))), (0.5, 0.5)),
    "rk4": (((0.0, ()), (0.5, (0.5,)), (0.5, (0.0, 0.5)),
             (1.0, (0.0, 0.0, 1.0))),
            (1 / 6, 1 / 3, 1 / 3, 1 / 6)),
}


def odeint_fixed(func, y0, t0: float, t1: float, num_steps: int,
                 method: str = "rk4"):
    """Fixed-grid explicit RK integration as ONE lax.scan.

    Returns (y(t1), nfe) with nfe = num_steps * n_stages, matching the
    adaptive solvers' (y, nfe) interface."""
    stages, bw = _FIXED_STAGES[method]
    h = (t1 - t0) / num_steps

    def step(y, i):
        t = t0 + i * h
        k = []
        for (c, arow) in stages:
            yi = y
            for a, kj in zip(arow, k):
                if a:
                    yi = yi + h * a * kj
            k.append(func(t + c * h, yi))
        for b, ki in zip(bw, k):
            if b:
                y = y + h * b * ki
        return y, ()

    y, _ = lax.scan(step, y0, jnp.arange(num_steps, dtype=jnp.float32))
    return y, jnp.int32(num_steps * len(stages))


def odeint_adams_bashforth4(func, y0, t0: float, t1: float,
                            num_steps: int):
    """Explicit 4-step Adams-Bashforth as one lax.scan (the reference
    vendors torchdiffeq's explicit Adams family; the implicit/adjoint
    variants remain unported — dead in LION). RK4 bootstraps the first
    three steps; one function evaluation per step after that."""
    if num_steps < 4:
        raise ValueError(
            f"adams-bashforth-4 needs num_steps >= 4 (got {num_steps}): "
            "the 3 RK4 bootstrap steps would integrate past t1")
    stages, bw = _FIXED_STAGES["rk4"]
    h = (t1 - t0) / num_steps

    def rk4_step(y, t):
        k = []
        for (c, arow) in stages:
            yi = y
            for a, kj in zip(arow, k):
                if a:
                    yi = yi + h * a * kj
            k.append(func(t + c * h, yi))
        for b, ki in zip(bw, k):
            y = y + h * b * ki
        return y

    fs = [func(t0, y0)]
    ys = y0
    for i in range(3):                        # bootstrap f-history
        ys = rk4_step(ys, t0 + i * h)
        fs.append(func(t0 + (i + 1) * h, ys))

    def step(carry, i):
        y, f3, f2, f1, f0 = carry             # f3 most recent
        y = y + h / 24.0 * (55.0 * f3 - 59.0 * f2 + 37.0 * f1 - 9.0 * f0)
        fn = func(t0 + (i + 1.0) * h, y)
        return (y, fn, f3, f2, f1), ()

    (y, *_), _ = lax.scan(
        step, (ys, fs[3], fs[2], fs[1], fs[0]),
        jnp.arange(3, num_steps, dtype=jnp.float32))
    # nfe: 1 + 3 bootstrap RK4 steps (4 evals each) + 3 bootstrap f's
    # counted above + one eval per AB step
    return y, jnp.int32(1 + 3 * 5 + (num_steps - 3))


# ------------------------------------------------- adaptive RK family
# One embedded-Runge-Kutta engine covers the reference's vendored
# torchdiffeq adaptive solvers (third_party/torchdiffeq/_impl/{dopri5,
# dopri8,bosh3,fehlberg2,adaptive_heun}.py, SOLVERS dict odeint.py:13).
# A tableau is (c, a_rows, b_sol, b_err, order): stage times, stage
# coupling rows, solution weights, and the HIGHER-minus-lower embedded
# difference used for the error estimate. The Butcher coefficients are
# published mathematical constants (Dormand & Prince 1980/1981,
# Bogacki & Shampine 1989, Fehlberg 1969, Heun-Euler).
_DP5 = (
    (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0),
    (
        (),
        (1 / 5,),
        (3 / 40, 9 / 40),
        (44 / 45, -56 / 15, 32 / 9),
        (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
        (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
        (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
    ),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0),
    (35 / 384 - 5179 / 57600, 0.0, 500 / 1113 - 7571 / 16695,
     125 / 192 - 393 / 640, -2187 / 6784 + 92097 / 339200,
     11 / 84 - 187 / 2100, -1 / 40),
    5,
)
_BOSH3 = (
    (0.0, 1 / 2, 3 / 4, 1.0),
    ((), (1 / 2,), (0.0, 3 / 4), (2 / 9, 1 / 3, 4 / 9)),
    (2 / 9, 1 / 3, 4 / 9, 0.0),
    (2 / 9 - 7 / 24, 1 / 3 - 1 / 4, 4 / 9 - 1 / 3, -1 / 8),
    3,
)
_FEHLBERG2 = (
    (0.0, 1 / 2, 1.0),
    ((), (1 / 2,), (1 / 256, 255 / 256)),
    (1 / 512, 255 / 256, 1 / 512),
    (-1 / 512, 0.0, 1 / 512),
    2,
)
_ADAPTIVE_HEUN = (
    (0.0, 1.0),
    ((), (1.0,)),
    (1 / 2, 1 / 2),
    (1 / 2, -1 / 2),
    2,
)
_DP8_C = (0.0, 1 / 18, 1 / 12, 1 / 8, 5 / 16, 3 / 8, 59 / 400, 93 / 200,
          5490023248 / 9719169821, 13 / 20, 1201146811 / 1299019798,
          1.0, 1.0, 1.0)
_DP8_A = (
    (),
    (1 / 18,),
    (1 / 48, 1 / 16),
    (1 / 32, 0, 3 / 32),
    (5 / 16, 0, -75 / 64, 75 / 64),
    (3 / 80, 0, 0, 3 / 16, 3 / 20),
    (29443841 / 614563906, 0, 0, 77736538 / 692538347,
     -28693883 / 1125000000, 23124283 / 1800000000),
    (16016141 / 946692911, 0, 0, 61564180 / 158732637,
     22789713 / 633445777, 545815736 / 2771057229, -180193667 / 1043307555),
    (39632708 / 573591083, 0, 0, -433636366 / 683701615,
     -421739975 / 2616292301, 100302831 / 723423059, 790204164 / 839813087,
     800635310 / 3783071287),
    (246121993 / 1340847787, 0, 0, -37695042795 / 15268766246,
     -309121744 / 1061227803, -12992083 / 490766935,
     6005943493 / 2108947869, 393006217 / 1396673457,
     123872331 / 1001029789),
    (-1028468189 / 846180014, 0, 0, 8478235783 / 508512852,
     1311729495 / 1432422823, -10304129995 / 1701304382,
     -48777925059 / 3047939560, 15336726248 / 1032824649,
     -45442868181 / 3398467696, 3065993473 / 597172653),
    (185892177 / 718116043, 0, 0, -3185094517 / 667107341,
     -477755414 / 1098053517, -703635378 / 230739211,
     5731566787 / 1027545527, 5232866602 / 850066563,
     -4093664535 / 808688257, 3962137247 / 1805957418, 65686358 / 487910083),
    (403863854 / 491063109, 0, 0, -5068492393 / 434740067,
     -411421997 / 543043805, 652783627 / 914296604,
     11173962825 / 925320556, -13158990841 / 6184727034,
     3936647629 / 1978049680, -160528059 / 685178525,
     248638103 / 1413531060, 0),
)
_DP8_BSOL = (14005451 / 335480064, 0, 0, 0, 0, -59238493 / 1068277825,
             181606767 / 758867731, 561292985 / 797845732,
             -1041891430 / 1371343529, 760417239 / 1151165299,
             118820643 / 751138087, -528747749 / 2220607170, 1 / 4)
_DP8_BLOW = (13451932 / 455176623, 0, 0, 0, 0, -808719846 / 976000145,
             1757004468 / 5645159321, 656045339 / 265891186,
             -3867574721 / 1518517206, 465885868 / 322736535,
             53011238 / 667516719, 2 / 45, 0)
_DP8 = (_DP8_C, _DP8_A, _DP8_BSOL,
        tuple(s - l for s, l in zip(_DP8_BSOL, _DP8_BLOW)), 8)

_ADAPTIVE_TABLEAUS = {
    "dopri45": _DP5, "dopri5": _DP5, "dopri8": _DP8, "bosh3": _BOSH3,
    "fehlberg2": _FEHLBERG2, "adaptive_heun": _ADAPTIVE_HEUN,
}


def odeint_adaptive(func, y0, t0: float, t1: float, method: str = "dopri5",
                    rtol: float = 1e-5, atol: float = 1e-5,
                    max_steps: int = 10000):
    """Adaptive embedded-RK integration from t0 to t1 (t1 < t0 supported)
    as a single lax.while_loop. Returns (y(t1), nfe)."""
    c, a_rows, b_sol, b_err, order = _ADAPTIVE_TABLEAUS[method]
    ns = len(b_sol)
    sign = 1.0 if t1 >= t0 else -1.0
    span = abs(t1 - t0)
    h0 = sign * span * 0.01

    def err_norm(err, y0_, y1_):
        scale = atol + rtol * jnp.maximum(jnp.abs(y0_), jnp.abs(y1_))
        return jnp.sqrt(jnp.mean(jnp.square(err / scale)))

    def cond(state):
        t, y, h, nfe, done = state
        return jnp.logical_and(~done, nfe < max_steps * ns)

    def body(state):
        t, y, h, nfe, done = state
        # clip step to not overshoot t1
        h = jnp.where(sign * (t + h - t1) > 0, t1 - t, h)
        k = []
        for i in range(ns):
            yi = y
            for a, kj in zip(a_rows[i], k):
                if a:
                    yi = yi + h * a * kj
            k.append(func(t + h * c[i], yi))
        y1 = y
        for b, ki in zip(b_sol, k):
            if b:
                y1 = y1 + h * b * ki
        err = jnp.zeros_like(y)
        for b, ki in zip(b_err, k):
            if b:
                err = err + h * b * ki
        en = err_norm(err, y, y1)
        accept = en <= 1.0
        t_new = jnp.where(accept, t + h, t)
        y_new = jnp.where(accept, y1, y)
        factor = jnp.clip(
            0.9 * (1.0 / jnp.maximum(en, 1e-10)) ** (1.0 / order), 0.2, 5.0)
        h_new = h * factor
        done_new = jnp.abs(t_new - t1) < 1e-12
        return (t_new, y_new, h_new, nfe + ns, done_new)

    state = (jnp.float32(t0), y0, jnp.float32(h0), jnp.int32(0),
             jnp.bool_(False))
    t, y, h, nfe, done = lax.while_loop(cond, body, state)
    return y, nfe


def dopri45(func, y0, t0: float, t1: float, rtol: float = 1e-5,
            atol: float = 1e-5, max_steps: int = 10000):
    """Adaptive Dormand-Prince RK45 (the reference's live scipy-RK45-class
    path) via the shared tableau engine. Returns (y(t1), nfe)."""
    return odeint_adaptive(func, y0, t0, t1, "dopri5", rtol, atol, max_steps)
