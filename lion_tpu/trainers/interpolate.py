"""Latent interpolation (eval-only; reference: trainers/interpolate_latent.py
and trainers/encode_interp_interp.py).

Noise-space interpolation between endpoint samples, reverse ODE (or DDPM)
sampling per level, then decode. All three reference interpolation modes
('interpolate' = sqrt-weighted spherical-ish, 'linear_interpolate',
'freeze') are provided, plus posterior interpolation: encode two real
shapes, diffuse their latents forward to time t, interpolate, reverse.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.vae import VAE


def linear_interpolate_noise(noise: jnp.ndarray) -> jnp.ndarray:
    """noise (K, D): rows 1..K-2 linearly blend rows 0 and K-1
    (interpolate_latent.py:24-32)."""
    k = noise.shape[0]
    p = jnp.arange(k, dtype=jnp.float32)[:, None] / k
    mid = p * noise[-1][None] + (1 - p) * noise[0][None]
    mask = (jnp.arange(k) > 0) & (jnp.arange(k) < k - 1)
    return jnp.where(mask[:, None], mid, noise)


def interpolate_noise(noise: jnp.ndarray) -> jnp.ndarray:
    """Variance-preserving sqrt-weighted blend (interpolate_latent.py:34-42)."""
    k = noise.shape[0]
    p = jnp.arange(k, dtype=jnp.float32)[:, None] / k
    mid = jnp.sqrt(p) * noise[-1][None] + jnp.sqrt(1 - p) * noise[0][None]
    mask = (jnp.arange(k) > 0) & (jnp.arange(k) < k - 1)
    return jnp.where(mask[:, None], mid, noise)


def freeze_noise(noise: jnp.ndarray) -> jnp.ndarray:
    """All rows share row 0 (the 'freeze' local mode)."""
    return jnp.broadcast_to(noise[0][None], noise.shape)


_MODES = {
    "interpolate": interpolate_noise,
    "linear_interpolate": linear_interpolate_noise,
    "freeze": freeze_noise,
    "none": lambda n: n,
}


def generate_interpolation(lion, num_samples: int, rng,
                           mode_global: str = "interpolate",
                           mode_local: str = "freeze",
                           use_ode: bool = True,
                           ode_eps: float = 1e-5,
                           ode_solver_tol: float = 1e-5):
    """Sample num_samples shapes whose prior noises interpolate between the
    first and last row (interpolate_latent.py generate_samples:120-173).

    lion: a lion_tpu.models.LION with params loaded.
    """
    cfg = lion.cfg
    params = lion.params
    rng_g, rng_l, rng_d = jax.random.split(rng, 3)
    noise_g = jax.random.normal(rng_g, (num_samples, lion.style_dim))
    noise_l = jax.random.normal(rng_l, (num_samples, lion.local_dim))
    noise_g = _MODES[mode_global](noise_g)
    noise_l = _MODES[mode_local](noise_l)

    def global_fn(x, t):
        return lion.global_prior.apply(
            {"params": params["global_prior"]}, x,
            jnp.asarray(t, jnp.float32).reshape(-1))

    if use_ode:
        from ..diffusion.continuous import make_diffusion
        from ..config.view import as_view
        sde = make_diffusion(as_view(cfg.to_dict()).sde)
        z_global, nfe_g = sde.sample_model_ode(
            global_fn, rng_g, num_samples, (lion.style_dim,),
            ode_eps=ode_eps, ode_solver_tol=ode_solver_tol, noise=noise_g)
    else:
        z_global = lion.diffusion.run_denoising_diffusion(
            global_fn, rng_g, num_samples, (lion.style_dim,),
            x_noisy=noise_g)

    condition = z_global

    def local_fn(x, t):
        return lion.local_prior.apply(
            {"params": params["local_prior"]}, x,
            jnp.asarray(t, jnp.float32).reshape(-1),
            condition_input=condition)

    if use_ode:
        z_local, nfe_l = sde.sample_model_ode(
            local_fn, rng_l, num_samples, (lion.local_dim,),
            ode_eps=ode_eps, ode_solver_tol=ode_solver_tol, noise=noise_l)
    else:
        z_local = lion.diffusion.run_denoising_diffusion(
            local_fn, rng_l, num_samples, (lion.local_dim,),
            x_noisy=noise_l)

    points = lion.vae.apply(
        {"params": params["vae"]}, num_samples,
        decomposed_eps=[z_global, z_local], method=VAE.sample,
        rngs={"sample": rng_d})
    return {"points": points, "z_global": z_global, "z_local": z_local}


def interpolate_posterior(lion, x_a, x_b, num_steps: int, rng,
                          diffuse_t: int = 200):
    """Posterior interpolation (encode_interp_interp.py): encode two real
    shapes, forward-diffuse their latents to time t, interpolate the noisy
    latents, then run the reverse chain from t and decode."""
    cfg = lion.cfg
    params = lion.params
    diffusion = lion.diffusion
    diffuse_t = min(diffuse_t, diffusion.num_steps)
    rng_e, rng_n, rng_d = jax.random.split(rng, 3)

    x = jnp.stack([jnp.asarray(x_a), jnp.asarray(x_b)])
    eps, _, _ = lion.vae.apply({"params": params["vae"]}, x,
                               method=VAE.encode, rngs={"sample": rng_e})
    # forward diffuse both to t
    t_arr = jnp.full((2,), diffuse_t, jnp.int32)
    _, var_t, m_t, _ = diffusion.iw_quantities_t(t_arr)
    noise = jax.random.normal(rng_n, eps.shape)
    eps_t = diffusion.sample_q(eps, noise, var_t, m_t)

    # interpolate between the two diffused latents
    p = jnp.linspace(0.0, 1.0, num_steps)[:, None]
    eps_interp = jnp.sqrt(1 - p) * eps_t[0][None] + jnp.sqrt(p) * eps_t[1][None]
    style_dim = lion.style_dim

    def denoise_from_t(eps_batch, rng):
        """Reverse chain from diffuse_t to 0 for both levels, conditioned
        hierarchically."""
        g, l = eps_batch[:, :style_dim], eps_batch[:, style_dim:]
        n = eps_batch.shape[0]

        def global_fn(xx, tt):
            return lion.global_prior.apply(
                {"params": params["global_prior"]}, xx,
                tt.astype(jnp.float32))

        z_g = _run_from_t(diffusion, global_fn, g, diffuse_t, rng)

        def local_fn(xx, tt):
            return lion.local_prior.apply(
                {"params": params["local_prior"]}, xx,
                tt.astype(jnp.float32), condition_input=z_g)

        z_l = _run_from_t(diffusion, local_fn, l, diffuse_t,
                          jax.random.fold_in(rng, 1))
        return z_g, z_l

    z_g, z_l = denoise_from_t(eps_interp, rng_n)
    points = lion.vae.apply(
        {"params": params["vae"]}, num_steps,
        decomposed_eps=[z_g, z_l], method=VAE.sample,
        rngs={"sample": rng_d})
    return {"points": points}


def interpolate_posterior_ode(lion, x_a, x_b, num_steps: int, rng,
                              ode_eps: float = 1e-5,
                              ode_solver_tol: float = 1e-5):
    """Deterministic posterior interpolation through the probability-flow
    ODE (encode_interp_interp.py:240-295): encode two real shapes with the
    VAE, map each level's latent to noise space with the FORWARD ODE
    (compute_ode_encode == the reference's live compute_ode_nll), slerp the
    noise, integrate the reverse ODE with hierarchical conditioning, decode."""
    from ..diffusion.continuous import make_diffusion
    from ..config.view import as_view
    params = lion.params
    sde = make_diffusion(as_view(lion.cfg.to_dict()
                                 if hasattr(lion.cfg, "to_dict")
                                 else lion.cfg).sde)
    rng_e, rng_d = jax.random.split(rng)

    x = jnp.stack([jnp.asarray(x_a), jnp.asarray(x_b)])
    eps, _, _ = lion.vae.apply({"params": params["vae"]}, x,
                               method=VAE.encode, rngs={"sample": rng_e})
    style_dim = lion.style_dim
    eps_g, eps_l = eps[:, :style_dim], eps[:, style_dim:]

    def global_fn(xx, tt):
        return lion.global_prior.apply(
            {"params": params["global_prior"]}, xx, tt)

    # encode endpoints to noise space (forward ODE), interpolate there
    eps_T_g, nfe_eg = sde.compute_ode_encode(global_fn, eps_g, ode_eps,
                                             ode_solver_tol)
    rows_g = jnp.concatenate(
        [eps_T_g[0][None],
         jnp.zeros((num_steps - 2, eps_T_g.shape[1])),
         eps_T_g[1][None]])
    noise_g = interpolate_noise(rows_g)
    z_global, nfe_g = sde.sample_model_ode(
        global_fn, rng, num_steps, (eps_g.shape[1],),
        ode_eps=ode_eps, ode_solver_tol=ode_solver_tol, noise=noise_g)

    def local_fn_enc(xx, tt):
        # encode conditioned on the ENDPOINT global latents (the reference
        # passes the 2-row eps_global here, encode_interp_interp.py:276-279)
        return lion.local_prior.apply(
            {"params": params["local_prior"]}, xx, tt,
            condition_input=eps_g)

    eps_T_l, nfe_el = sde.compute_ode_encode(local_fn_enc, eps_l, ode_eps,
                                             ode_solver_tol)
    rows_l = jnp.concatenate(
        [eps_T_l[0][None],
         jnp.zeros((num_steps - 2, eps_T_l.shape[1])),
         eps_T_l[1][None]])
    noise_l = interpolate_noise(rows_l)

    def local_fn_dec(xx, tt):
        return lion.local_prior.apply(
            {"params": params["local_prior"]}, xx, tt,
            condition_input=z_global)

    z_local, nfe_l = sde.sample_model_ode(
        local_fn_dec, rng, num_steps, (eps_l.shape[1],),
        ode_eps=ode_eps, ode_solver_tol=ode_solver_tol, noise=noise_l)

    points = lion.vae.apply(
        {"params": params["vae"]}, num_steps,
        decomposed_eps=[z_global, z_local], method=VAE.sample,
        rngs={"sample": rng_d})
    return {"points": points,
            "nfe": {"enc_g": nfe_eg, "enc_l": nfe_el,
                    "dec_g": nfe_g, "dec_l": nfe_l}}


def _run_from_t(diffusion, model_fn, x_noisy, time_start: int, rng):
    """Reverse DDPM from a given timestep (diffusion_pvd.py:503-563
    run_denoising_diffusion_from_t) as a lax.scan."""
    n = x_noisy.shape[0]
    x_shape = x_noisy.shape
    betas, alphas, alpha_bars = (diffusion.betas, diffusion.alphas,
                                 diffusion.alpha_bars)

    def step(carry, t):
        x, rng = carry
        timestep = jnp.full((n,), t + 1, jnp.int32)
        pred = model_fn(x, timestep)
        mean_t0 = (x - jnp.sqrt(1 - alpha_bars[0]) * pred) \
            / jnp.sqrt(alpha_bars[0])
        mean_t = (x - betas[t] * pred / jnp.sqrt(1 - alpha_bars[t])) \
            / jnp.sqrt(alphas[t])
        mean = jnp.where(t == 0, mean_t0, mean_t)
        rng, sub = jax.random.split(rng)
        noise = jax.random.normal(sub, x_shape)
        x_next = jnp.where(t == 0, mean,
                           mean + jnp.exp(0.5 * jnp.log(betas[t])) * noise)
        return (x_next, rng), ()

    ts = jnp.arange(time_start - 1, -1, -1)
    (x_final, _), _ = jax.lax.scan(step, (x_noisy, rng), ts)
    return x_final


# --------------------------------------------------------------------------
# Eval-only trainers honoring the reference cfg strings
# (trainers.interpolate_latent / trainers.encode_interp_interp; invoked via
# `--eval_generation trainer.type trainers.interpolate_latent` exactly as
# script/interpolate.sh does)
# --------------------------------------------------------------------------
from .train_2prior import Trainer as _TwoPriorTrainer  # noqa: E402


class InterpolateLatentTrainer(_TwoPriorTrainer):
    """reference trainers/interpolate_latent.py: sample shapes whose prior
    noises interpolate between the first and last row, ODE or DDPM reverse,
    save per-step shapes."""

    def sample(self, num_samples: int = 16, rng=None, use_ema: bool = True,
               ddim_step: int = 0):
        import jax as _jax
        rng = rng if rng is not None else _jax.random.PRNGKey(0)
        lion = self.as_lion(use_ema)
        out = generate_interpolation(
            lion, num_samples, rng,
            mode_global=self.cfg.tpu.interp_mode_global,
            mode_local=self.cfg.tpu.interp_mode_local,
            use_ode=bool(self.cfg.sde.ode_sample),
            ode_eps=float(self.cfg.sde.ode_eps))
        return out["points"]


class EncodeInterpTrainer(_TwoPriorTrainer):
    """reference trainers/encode_interp_interp.py: encode two real shapes,
    interpolate in the diffused latent space, reverse, decode."""

    def sample(self, num_samples: int = 16, rng=None, use_ema: bool = True,
               ddim_step: int = 0):
        import jax as _jax
        import numpy as _np
        rng = rng if rng is not None else _jax.random.PRNGKey(0)
        lion = self.as_lion(use_ema)
        # endpoints: two validation shapes (reference takes loader batches)
        try:
            batch = next(iter(self.test_loader))
            pts = _np.asarray(batch["tr_points"])
            # loaders may yield device-sharded (ndev, per_dev, N, 3)
            pts = pts.reshape(-1, *pts.shape[-2:])[:2]
        except Exception:
            pts = _np.asarray(_jax.random.normal(
                _jax.random.PRNGKey(1), (2, lion.num_points, 3)))
        # interpolate_posterior* stack the two endpoints into the batch dim
        x_a = jnp.asarray(pts[0])
        x_b = jnp.asarray(pts[1])
        if bool(self.cfg.sde.ode_sample):
            out = interpolate_posterior_ode(lion, x_a, x_b, num_samples,
                                            rng)
        else:
            out = interpolate_posterior(lion, x_a, x_b, num_samples, rng)
        return out["points"]
