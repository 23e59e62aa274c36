"""Discrete DDPM / DDIM (reference: utils/diffusion_pvd.py).

The reference's 1000-iteration Python sampling loops (diffusion_pvd.py:252-298
`run_denoising_diffusion`, :428-468 `run_ddim`) become ONE jitted `lax.scan`
over a denoise step -- the single biggest TPU win (SURVEY.md section 7.1).

Conventions preserved:
  * models see timesteps t+1 in [1, T] (diffusion_pvd.py:257-258);
  * fixed 'beta' log-scales: 0.5*log(betas[t]) (get_p_log_scales:155-162);
  * the t==0 posterior mean uses 1/sqrt(alpha_bar[0]) (:475-486);
  * DDIM kappa==eta with uniform/quad skips (:389-473);
  * mixed prediction: eps = (1-sigmoid(logit))*sqrt(1-ab_t)*x + sigmoid*pred
    (utils/utils.py:1299-1305).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .schedules import make_beta_schedule


def get_mixed_prediction(pred, mixing_logit, mixing_component):
    """utils/utils.py:1299-1305 (enabled path)."""
    coeff = jax.nn.sigmoid(mixing_logit)
    return (1.0 - coeff) * mixing_component + coeff * pred


class DiffusionDiscretized:
    """Constants + q/p math + scan-based samplers.

    Constructed from cfg.ddpm (num_steps, beta_1, beta_T, sched_mode, p2_*),
    mirroring diffusion_pvd.py:22-42 and _generate_base_constants:118-142.
    """

    def __init__(self, cfg):
        ddpm = cfg.ddpm
        self.num_steps = int(ddpm.num_steps)
        self.p2_gamma = ddpm.p2_gamma
        self.p2_k = ddpm.p2_k
        self.use_p2_weight = bool(ddpm.use_p2_weight)

        betas = make_beta_schedule(ddpm.sched_mode, ddpm.beta_1, ddpm.beta_T,
                                   self.num_steps)
        alphas = 1.0 - betas
        alpha_bars = np.cumprod(alphas)
        snr = 1.0 / (1.0 - alpha_bars) - 1.0
        betas_post = betas[1:] * (1.0 - alpha_bars[:-1]) / (1.0 - alpha_bars[1:])
        betas_post_init = np.append(betas_post[0], betas_post)

        as_f32 = lambda a: jnp.asarray(a, jnp.float32)
        self.betas = as_f32(betas)
        self.alphas = as_f32(alphas)
        self.alpha_bars = as_f32(alpha_bars)
        self.betas_post_init = as_f32(betas_post_init)
        self.snr = as_f32(snr)

    # ---------------------------------------------------------- training
    def iw_quantities(self, rng, batch_size):
        """t ~ U[1, T]; returns (timestep, var_t, m_t, loss_weight)
        (diffusion_pvd.py:61-80). var_t/m_t are (B, 1, 1, 1)-broadcastable
        as (B, 1)."""
        rho = jax.random.uniform(rng, (batch_size,)) * self.num_steps
        timestep = rho.astype(jnp.int32) + 1  # [1, T]
        return self._quantities_for_t(timestep)

    def iw_quantities_t(self, timestep):
        """Same, for given timesteps in [1, T] (diffusion_pvd.py:44-59)."""
        return self._quantities_for_t(timestep)

    def _quantities_for_t(self, timestep):
        alpha_bars = jnp.take(self.alpha_bars, timestep - 1)
        m_t = jnp.sqrt(alpha_bars)[:, None]
        var_t = (1.0 - alpha_bars)[:, None]
        if self.use_p2_weight:
            loss_weight = jnp.take(
                1.0 / (self.p2_k + self.snr) ** self.p2_gamma, timestep - 1)
        else:
            loss_weight = jnp.ones_like(m_t[:, 0])
        return timestep, var_t, m_t, loss_weight

    @staticmethod
    def sample_q(x_init, noise, var_t, m_t):
        """q(x_t | x_0) sample (diffusion_pvd.py:96-113); x (B, D)."""
        return m_t * x_init + jnp.sqrt(var_t) * noise

    def get_mixing_component(self, x_noisy, timestep):
        alpha_bars = jnp.take(self.alpha_bars, timestep - 1)
        shape = (x_noisy.shape[0],) + (1,) * (x_noisy.ndim - 1)
        return jnp.sqrt(1.0 - alpha_bars).reshape(shape) * x_noisy

    # ---------------------------------------------------------- sampling
    def _ancestral_step(self, model_fn: Callable, x_shape, temp,
                        mixing_logit, given_noise=None):
        """The ONE ancestral p(x_{t-1} | x_t) step body shared by all three
        scan-based samplers (run_denoising_diffusion / denoise_range /
        _denoise_ts); deduplicated per VERDICT r3 weak-7.

        Semantics (diffusion_pvd.py:252-298): model sees t+1 in [1, T];
        'beta' stddev type exp(0.5*log(betas[t])); t == 0 emits the
        posterior mean with the 1/sqrt(alpha_bar[0]) convention
        (get_q_posterior_mean:475-486) and no noise. `given_noise`
        (T, *x_shape) replaces the per-step Gaussian draw, indexed by t
        (reference given_noise[1], :285-289)."""
        num_samples = x_shape[0]
        betas, alphas, alpha_bars = self.betas, self.alphas, self.alpha_bars

        def step(carry, t):
            x, rng = carry
            timestep = jnp.full((num_samples,), t + 1, jnp.int32)
            pred = model_fn(x, timestep)
            if mixing_logit is not None:
                mix = self.get_mixing_component(x, timestep)
                pred = get_mixed_prediction(
                    pred, mixing_logit.reshape(x_shape[1:]), mix)
            mean_t0 = (x - jnp.sqrt(1.0 - alpha_bars[0]) * pred) \
                / jnp.sqrt(alpha_bars[0])
            mean_t = (x - betas[t] * pred / jnp.sqrt(1.0 - alpha_bars[t])) \
                / jnp.sqrt(alphas[t])
            mean = jnp.where(t == 0, mean_t0, mean_t)
            if given_noise is None:
                rng, noise_rng = jax.random.split(rng)
                noise = jax.random.normal(noise_rng, x_shape, jnp.float32)
            else:
                noise = given_noise[t]
            log_scale = 0.5 * jnp.log(betas[t])  # 'beta' stddev type
            x_next = jnp.where(t == 0, mean,
                               mean + jnp.exp(log_scale) * noise * temp)
            return (x_next, rng), ()

        return step

    def run_denoising_diffusion(self, model_fn: Callable, rng, num_samples,
                                shape, temp: float = 1.0,
                                mixing_logit=None, x_noisy=None,
                                given_noise=None):
        """Full T-step ancestral sampler as one lax.scan.

        model_fn(x, timestep) -> eps prediction (caller closes over params
        and conditioning). Returns x_0.
        """
        x_shape = (num_samples,) + tuple(shape)
        rng, init_rng = jax.random.split(rng)
        if x_noisy is None:
            x_noisy = jax.random.normal(init_rng, x_shape, jnp.float32)
        step = self._ancestral_step(model_fn, x_shape, temp, mixing_logit,
                                    given_noise)
        ts = jnp.arange(self.num_steps - 1, -1, -1)
        (x_final, _), _ = lax.scan(step, (x_noisy, rng), ts)
        return x_final

    def denoise_range(self, model_fn: Callable, rng, x_noisy, t_hi: int,
                      t_lo: int, temp: float = 1.0, mixing_logit=None):
        """Scan the reverse chain over t in [t_hi-1 .. t_lo] only.

        Lets callers split the full chain into several jit calls (useful
        when a single >60s device program would trip infrastructure
        watchdogs, and for resume-from-t sampling,
        run_denoising_diffusion_from_t in the reference)."""
        step = self._ancestral_step(model_fn, x_noisy.shape, temp,
                                    mixing_logit)
        ts = jnp.arange(t_hi - 1, t_lo - 1, -1)
        (x_final, rng), _ = lax.scan(step, (x_noisy, rng), ts)
        return x_final, rng

    def _denoise_ts(self, model_fn, rng, x_noisy, ts, temp=1.0,
                    mixing_logit=None):
        """Like denoise_range but over an explicit (dynamic) timestep array,
        so equally-sized chunks share ONE compiled executable."""
        step = self._ancestral_step(model_fn, x_noisy.shape, temp,
                                    mixing_logit)
        (x_final, rng), _ = lax.scan(step, (x_noisy, rng), ts)
        return x_final, rng

    def ddim_tau_schedule(self, ddim_step: int, skip_type: str = "uniform"):
        """Static tau schedule (diffusion_pvd.py:407-419)."""
        s = ddim_step
        if skip_type == "uniform":
            c = (self.num_steps - 1.0) / (s - 1.0)
            taus = [int(np.floor(i * c)) for i in range(s)]
        elif skip_type == "quad":
            seq = np.linspace(0, np.sqrt(self.num_steps * 0.8), s) ** 2
            taus = [int(x) for x in seq]
        else:
            raise NotImplementedError(skip_type)
        return sorted(taus, reverse=True)

    def run_ddim(self, model_fn: Callable, rng, num_samples, shape,
                 ddim_step: int, skip_type: str = "uniform",
                 kappa: float = 1.0, temp: float = 1.0, mixing_logit=None,
                 x_noisy=None):
        """DDIM sampler as one lax.scan over the static tau schedule."""
        x_shape = (num_samples,) + tuple(shape)
        rng, init_rng = jax.random.split(rng)
        if x_noisy is None:
            x_noisy = jax.random.normal(init_rng, x_shape, jnp.float32)

        taus = self.ddim_tau_schedule(ddim_step, skip_type)
        ab = np.asarray(self.alpha_bars)
        alpha_next, sigma = [], []
        for i, t in enumerate(taus):
            if i == len(taus) - 1:
                assert t == 0
                alpha_next.append(1.0)
                sigma.append(0.0)
            else:
                a_next = ab[taus[i + 1]]
                alpha_next.append(a_next)
                sigma.append(kappa * np.sqrt(
                    (1 - a_next) / (1 - ab[t]) * (1 - ab[t] / a_next)))
        consts = jnp.asarray(
            np.stack([np.asarray(taus, np.float32),
                      np.asarray(alpha_next, np.float32),
                      np.asarray(sigma, np.float32)], axis=1))

        def step(carry, const):
            x, rng = carry
            t = const[0].astype(jnp.int32)
            a_next, sig = const[1], const[2]
            a_tau = self.alpha_bars[t]
            timestep = jnp.full((num_samples,), t + 1, jnp.int32)
            pred = model_fn(x, timestep)
            if mixing_logit is not None:
                mix = self.get_mixing_component(x, timestep)
                pred = get_mixed_prediction(
                    pred, mixing_logit.reshape(x_shape[1:]), mix)
            scale = jnp.sqrt(a_next / a_tau)
            c = jnp.sqrt(jnp.maximum(1.0 - a_next - sig ** 2, 0.0)) \
                - jnp.sqrt(1.0 - a_tau) * scale
            rng, noise_rng = jax.random.split(rng)
            noise = jax.random.normal(noise_rng, x_shape, jnp.float32)
            x_next = scale * x + c * pred + sig * noise
            return (x_next, rng), ()

        (x_final, _), _ = lax.scan(step, (x_noisy, rng), consts)
        return x_final
