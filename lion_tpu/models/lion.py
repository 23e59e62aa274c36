"""LION: the public inference API (reference: models/lion.py).

`LION(cfg)` builds the frozen VAE + two priors; `load_model(path)` reads a
released torch checkpoint ('dae_state_dict' + 'vae_state_dict',
models/lion.py:30-35) through the import shim; `sample(n)` runs the full
hierarchical reverse diffusion + decode as ONE jitted program:

    global prior: T-step scan over the 2048-wide ResNet   (MXU matmuls)
    local prior:  T-step scan over the PVCNN2 U-Net       (point-voxel)
    decode:       one U-Net forward

The reference's 2x1000 sequential Python-loop model calls become two
lax.scans inside a single XLA program -- no host round trips.
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..diffusion.discrete import DiffusionDiscretized
from .registry import build_global_prior, build_local_prior
from .vae import VAE


class LION:
    def __init__(self, cfg):
        self.cfg = cfg
        self.vae = VAE(cfg)
        self.global_prior = build_global_prior(cfg)
        self.local_prior = build_local_prior(cfg)
        self.diffusion = DiffusionDiscretized(cfg)
        self.num_points = cfg.data.tr_max_sample_points
        self.style_dim = cfg.latent_pts.style_dim
        self.local_dim = self.num_points * (cfg.shapelatent.latent_dim
                                            + cfg.ddpm.input_dim)
        self.cond_on_cat = bool(cfg.data.cond_on_cat)
        self.cls_emb_dim = (int(cfg.tpu.cls_emb_dim)
                            if (self.cond_on_cat and "tpu" in cfg) else 0)
        self.cond_dim = self.style_dim + self.cls_emb_dim
        self.params: Optional[dict] = None

    # ------------------------------------------------------------- init
    def init_params(self, rng) -> dict:
        """Random-init all three networks (for tests / training-from-scratch).

        Jitted: eager flax init dispatches thousands of tiny ops, which is
        very slow over a remote-TPU tunnel."""
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        x = jnp.zeros((1, self.num_points, self.cfg.ddpm.input_dim))
        g = jnp.zeros((1, self.style_dim))
        t = jnp.ones((1,))
        l = jnp.zeros((1, self.local_dim))
        cond = jnp.zeros((1, self.cond_dim))
        cls = jnp.zeros((1,), jnp.int32) if self.cond_on_cat else None
        cf = (jnp.zeros((1, self.cfg.clipforge.feat_dim))
              if self.cfg.clipforge.enable else None)

        def init_all():
            vae_params = self.vae.init({"params": k1, "sample": k4}, x,
                                       class_label=cls)
            gp = self.global_prior.init(k2, g, t, clip_feat=cf)
            lp = self.local_prior.init(k3, l, t, condition_input=cond,
                                       clip_feat=cf)
            return {"vae": vae_params["params"],
                    "global_prior": gp["params"],
                    "local_prior": lp["params"]}

        self.params = jax.jit(init_all)()
        return self.params

    def load_model(self, model_path: str):
        """Load a released torch checkpoint (.pt) via the import shim."""
        from ..ckpt.torch_import import load_lion_checkpoint
        self.params = load_lion_checkpoint(model_path, self.cfg)
        return self.params

    # ------------------------------------------------------------- sample
    def sample(self, num_samples: int = 10, rng=None, clip_feat=None,
               ddim_step: int = 0, class_label=None, save_img: bool = False,
               given_noise=None):
        """`given_noise`: optional ((init_g, steps_g), (init_l, steps_l))
        with init (B, D) and steps (T, B, D), replacing every Gaussian
        draw of the two ancestral chains (the reference's given_noise
        path, diffusion_pvd.py:235-239,285-289) — for reproducible
        sampling and torch-parity tests."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        assert self.params is not None, "call init_params or load_model first"
        out = _sample_jit(self, num_samples, ddim_step, self.params, rng,
                          clip_feat, class_label, given_noise)
        return out

    def sample_fn(self, num_samples: int, ddim_step: int = 0):
        """Returns a jittable fn(params, rng, clip_feat) -> dict for
        benchmarking / serving."""
        return functools.partial(_sample_impl, self, num_samples, ddim_step)

    def class_condition(self, class_label):
        """(B,) int class ids -> (cls_emb, decode class_label) using the
        frozen VAE's class embedding (cond_on_cat runs)."""
        cls_emb = self.vae.apply({"params": self.params["vae"]}, class_label,
                                 method=VAE.embed_class)
        return cls_emb

    def _chunked_fns(self, use_clip: bool):
        """Jitted segment/decode functions, built ONCE per LION instance.
        Params/cond/clip ride as arguments so repeated sample_chunked calls
        hit the jit cache instead of retracing (fresh closures cost ~4 s
        per 1000-step run at batch 16)."""
        key = ("chunked", use_clip)
        cached = getattr(self, "_fn_cache", None)
        if cached is None:
            cached = self._fn_cache = {}
        if key in cached:
            return cached[key]

        def seg_g(gp_params, x, rng, clip_feat, ts):
            def fn(xx, timestep):
                return self.global_prior.apply(
                    {"params": gp_params}, xx,
                    timestep.astype(jnp.float32), clip_feat=clip_feat)
            return self.diffusion._denoise_ts(fn, rng, x, ts)

        def seg_l(lp_params, x, rng, cond, clip_feat, ts):
            def fn(xx, timestep):
                return self.local_prior.apply(
                    {"params": lp_params}, xx,
                    timestep.astype(jnp.float32), clip_feat=clip_feat,
                    condition_input=cond)
            return self.diffusion._denoise_ts(fn, rng, x, ts)

        def decode(vae_params, num_samples, zg, zl, class_label, k):
            return self.vae.apply(
                {"params": vae_params}, num_samples,
                decomposed_eps=[zg, zl], class_label=class_label,
                method=VAE.sample, rngs={"sample": k})

        fns = (jax.jit(seg_g), jax.jit(seg_l),
               jax.jit(decode, static_argnums=(1,)))
        cached[key] = fns
        return fns

    def sample_chunked(self, num_samples: int, rng, chunks: int = 4,
                       clip_feat=None, class_label=None, mesh=None):
        """Full hierarchical DDPM sampling split into `chunks` jit calls per
        prior (a single 1000-step device program can exceed execution
        watchdogs on tunneled runtimes; the host hops between segments cost
        ~ms each).

        `mesh`: optional `jax.sharding.Mesh` with a 'data' axis. The latent
        chains are batch-sharded over it (params replicate; XLA propagates
        the sharding through every segment and the decode), so sampling
        scales across chips with no other change — the TPU-native
        counterpart of the reference's per-rank sampling loops
        (trainers/base_trainer.py:484-487 all_gather)."""
        assert self.params is not None
        assert self.diffusion.num_steps % chunks == 0, (
            f"chunks ({chunks}) must divide ddpm.num_steps "
            f"({self.diffusion.num_steps})")
        shard = None
        if mesh is not None:
            from ..parallel.mesh import data_sharding
            assert num_samples % mesh.devices.size == 0, (
                f"num_samples ({num_samples}) must divide the mesh "
                f"({mesh.devices.size} devices)")
            shard = data_sharding(mesh)
        params = self.params
        t = self.diffusion.num_steps
        seg_len = t // chunks
        ts_full = jnp.arange(t - 1, -1, -1)
        ts_chunks = [ts_full[i * seg_len:(i + 1) * seg_len]
                     for i in range(chunks)]
        seg_g, seg_l, decode = self._chunked_fns(clip_feat is not None)

        cls_emb = (self.class_condition(class_label)
                   if self.cond_on_cat else None)

        rng, r_init = jax.random.split(rng)
        x = jax.random.normal(r_init, (num_samples, self.style_dim))
        if shard is not None:
            x = jax.device_put(x, shard)
        for ts in ts_chunks:
            x, rng = seg_g(params["global_prior"], x, rng, clip_feat, ts)
        z_global = x

        condition = (jnp.concatenate([z_global, cls_emb], axis=1)
                     if cls_emb is not None else z_global)
        rng, r_init = jax.random.split(rng)
        # carry the local latent UNFLATTENED through the scan: LocalPrior
        # consumes (B, N, C) and its flat-in/flat-out reshape forced a
        # (8192 lanes <-> 4 lanes) relayout copy every step (~32 us,
        # round-5 step trace); the sampler math is shape-agnostic
        x = jax.random.normal(
            r_init, (num_samples, self.num_points,
                     self.local_dim // self.num_points))
        if shard is not None:
            x = jax.device_put(x, shard)
        for ts in ts_chunks:
            x, rng = seg_l(params["local_prior"], x, rng, condition,
                           clip_feat, ts)
        z_local = x.reshape(num_samples, self.local_dim)

        rng, r_dec = jax.random.split(rng)
        points = decode(params["vae"], num_samples, z_global, z_local,
                        class_label, r_dec)
        return {"z_global": z_global, "z_local": z_local, "points": points}


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _sample_jit(lion, num_samples, ddim_step, params, rng, clip_feat,
                class_label=None, given_noise=None):
    return _sample_impl(lion, num_samples, ddim_step, params, rng, clip_feat,
                        class_label, given_noise)


def _sample_impl(lion: LION, num_samples: int, ddim_step: int, params, rng,
                 clip_feat=None, class_label=None, given_noise=None):
    """Hierarchical sampling: PF-ODE (sde.ode_sample=1, RK45, NFE logged),
    DDIM (ddim_step>0), or ancestral DDPM — the three generation branches
    of the reference's generate_samples_vada_2prior
    (trainers/train_2prior.py:58-127)."""
    cfg = lion.cfg
    diffusion = lion.diffusion
    use_ode = bool(cfg.sde.ode_sample)
    if given_noise is not None:
        assert not use_ode and ddim_step == 0, \
            "given_noise is only defined for the ancestral DDPM branch " \
            "(reference diffusion_pvd.py:235-239)"
    rng_g, rng_l, rng_d = jax.random.split(rng, 3)

    cls_emb = None
    if lion.cond_on_cat:
        assert class_label is not None, "cond_on_cat sampling needs labels"
        cls_emb = lion.vae.apply({"params": params["vae"]}, class_label,
                                 method=VAE.embed_class)

    mixing_logit_g = params["global_prior"].get("mixing_logit") \
        if cfg.sde.mixed_prediction else None
    mixing_logit_l = params["local_prior"].get("mixing_logit") \
        if cfg.sde.mixed_prediction else None

    sde = None
    if use_ode:
        assert ddim_step == 0, "ode_sample and ddim_step are exclusive"
        assert cls_emb is None, "ODE sampling: cls-cond not supported " \
            "(matches the reference assert, train_2prior.py:67)"
        from ..diffusion.continuous import make_diffusion
        from ..config.view import as_view
        sde = make_diffusion(as_view(cfg.to_dict()).sde)

    def global_fn(x, timestep):
        return lion.global_prior.apply(
            {"params": params["global_prior"]}, x,
            timestep.astype(jnp.float32), clip_feat=clip_feat)

    nfe_g = nfe_l = None
    if use_ode:
        z_global, nfe_g = sde.sample_model_ode(
            global_fn, rng_g, num_samples, (lion.style_dim,),
            ode_eps=float(cfg.sde.ode_eps),
            ode_solver_tol=float(cfg.sde.ode_solver_tol),
            mixing_logit=mixing_logit_g)
    elif ddim_step > 0:
        z_global = diffusion.run_ddim(
            global_fn, rng_g, num_samples, (lion.style_dim,), ddim_step,
            skip_type=cfg.sde.ddim_skip_type, kappa=cfg.sde.ddim_kappa,
            mixing_logit=mixing_logit_g)
    else:
        gn = given_noise[0] if given_noise is not None else (None, None)
        z_global = diffusion.run_denoising_diffusion(
            global_fn, rng_g, num_samples, (lion.style_dim,),
            mixing_logit=mixing_logit_g, x_noisy=gn[0], given_noise=gn[1])

    # style conditioning for the local prior (vae.global2style is identity
    # with released configs; kept for parity). Class-conditional runs append
    # the class embedding (train_2prior.py:297-301). The reference's ODE
    # branch conditions on the raw eps (train_2prior.py:66-70).
    condition = z_global
    if cls_emb is not None:
        condition = jnp.concatenate([z_global, cls_emb], axis=1)

    def local_fn(x, timestep):
        return lion.local_prior.apply(
            {"params": params["local_prior"]}, x,
            timestep.astype(jnp.float32), condition_input=condition,
            clip_feat=clip_feat)

    if use_ode:
        z_local, nfe_l = sde.sample_model_ode(
            local_fn, rng_l, num_samples, (lion.local_dim,),
            ode_eps=float(cfg.sde.ode_eps),
            ode_solver_tol=float(cfg.sde.ode_solver_tol),
            mixing_logit=mixing_logit_l)
    elif ddim_step > 0:
        z_local = diffusion.run_ddim(
            local_fn, rng_l, num_samples, (lion.local_dim,), ddim_step,
            skip_type=cfg.sde.ddim_skip_type, kappa=cfg.sde.ddim_kappa,
            mixing_logit=mixing_logit_l)
    else:
        gn = given_noise[1] if given_noise is not None else (None, None)
        z_local = diffusion.run_denoising_diffusion(
            local_fn, rng_l, num_samples, (lion.local_dim,),
            mixing_logit=mixing_logit_l, x_noisy=gn[0], given_noise=gn[1])

    points = lion.vae.apply(
        {"params": params["vae"]}, num_samples,
        decomposed_eps=[z_global, z_local], class_label=class_label,
        method=VAE.sample, rngs={"sample": rng_d})
    out = {"z_global": z_global, "z_local": z_local, "points": points}
    if use_ode:
        out["nfe"] = nfe_g + nfe_l
    return out
