"""Model-layer tests on a tiny config (small N / widths so the CPU suite
stays fast): VAE encode/recont/loss/sample, priors, and the full LION
hierarchical sampling pipeline end-to-end."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lion_tpu.config import get_default_cfg
from lion_tpu.models import LION, VAE, GlobalPrior, LocalPrior
from lion_tpu.models.registry import build_global_prior, build_local_prior


def tiny_cfg():
    cfg = get_default_cfg()
    cfg.data.tr_max_sample_points = 2048
    cfg.shapelatent.latent_dim = 1
    cfg.latent_pts.style_dim = 128
    cfg.shapelatent.encoder_type = "models.latent_points_ada.PointTransPVC"
    cfg.shapelatent.decoder_type = "models.latent_points_ada.LatentPointDecPVC"
    # released VAE hyperparams (script/train_vae.sh): these keep fp32
    # activations finite at init (raw defaults blow up exp(log_sigma))
    cfg.latent_pts.ada_mlp_init_scale = 0.1
    cfg.latent_pts.skip_weight = 0.01
    cfg.shapelatent.log_sigma_offset = 6.0
    cfg.ddpm.loss_type = "l1_sum"
    cfg.ddpm.num_steps = 4  # tiny sampling chains for tests
    cfg.sde.num_channels_dae = 64
    cfg.sde.num_cell_per_scale_dae = 2
    cfg.sde.embedding_dim = 16
    return cfg


@pytest.fixture(scope="module")
def cfg():
    return tiny_cfg()


def test_global_prior_forward(cfg):
    prior = build_global_prior(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 128), jnp.float32)
    t = jnp.asarray([1.0, 500.0])
    params = prior.init(jax.random.PRNGKey(0), x, t)
    out = prior.apply(params, x, t)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_global_prior_4d_shape_passthrough(cfg):
    """(B, C, 1, 1) reference layout must round-trip."""
    prior = build_global_prior(cfg)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 128, 1, 1), jnp.float32)
    t = jnp.asarray([3.0, 3.0])
    params = prior.init(jax.random.PRNGKey(0), x, t)
    out = prior.apply(params, x, t)
    assert out.shape == (2, 128, 1, 1)


def test_mixed_prediction_param_created():
    cfg = tiny_cfg()
    cfg.sde.mixed_prediction = True
    prior = build_global_prior(cfg)
    x = jnp.zeros((1, 128))
    params = prior.init(jax.random.PRNGKey(0), x, jnp.ones((1,)))
    assert "mixing_logit" in params["params"]
    ml = np.asarray(params["params"]["mixing_logit"])
    np.testing.assert_allclose(ml, cfg.sde.mixing_logit_init)


@pytest.mark.slow
def test_local_prior_forward(cfg):
    prior = build_local_prior(cfg)
    local_dim = 2048 * 4
    x = jnp.asarray(np.random.RandomState(2).randn(1, local_dim), jnp.float32)
    t = jnp.asarray([7.0])
    cond = jnp.asarray(np.random.RandomState(3).randn(1, 128), jnp.float32)
    params = prior.init(jax.random.PRNGKey(0), x, t, condition_input=cond)
    out = prior.apply(params, x, t, condition_input=cond)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_vae_recont_and_loss(cfg):
    vae = VAE(cfg)
    x = jnp.asarray(np.random.RandomState(4).randn(1, 2048, 3) * 0.3,
                    jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    params = vae.init(rngs, x)
    out = vae.apply(params, x, method=VAE.get_loss,
                    rngs={"sample": jax.random.PRNGKey(2),
                          "dropout": jax.random.PRNGKey(3)})
    assert out["x_0_pred"].shape == (1, 2048, 3)
    assert np.isfinite(float(out["loss"]))
    assert float(out["msg/kl"]) >= 0
    # eps composition: (B, style + N*(latent+3))
    assert out["all_eps"].shape == (1, 128 + 2048 * 4)


@pytest.mark.slow
def test_vae_sample_decode(cfg):
    vae = VAE(cfg)
    x = jnp.zeros((1, 2048, 3))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    params = vae.init(rngs, x)
    out = vae.apply(params, 2, method=VAE.sample,
                    rngs={"sample": jax.random.PRNGKey(3)})
    assert out.shape == (2, 2048, 3)


def test_vae_latent_decompose(cfg):
    vae = VAE(cfg)
    eps = jnp.arange(2 * (128 + 2048 * 4), dtype=jnp.float32).reshape(2, -1)
    # decompose/compose are pure; bind without params
    bound = vae.bind({"params": {}})
    parts = bound.decompose_eps(eps)
    assert parts[0].shape == (2, 128)
    assert parts[1].shape == (2, 2048 * 4)
    recomposed = bound.compose_eps(parts)
    np.testing.assert_array_equal(np.asarray(recomposed), np.asarray(eps))
    shapes = bound.latent_shape()
    assert shapes == [[128, 1, 1], [2048 * 4, 1, 1]]


@pytest.mark.slow
def test_lion_end_to_end_sampling(cfg):
    lion = LION(cfg)
    lion.init_params(jax.random.PRNGKey(0))
    out = lion.sample(num_samples=1, rng=jax.random.PRNGKey(1))
    assert out["points"].shape == (1, 2048, 3)
    assert out["z_global"].shape == (1, 128)
    assert out["z_local"].shape == (1, 2048 * 4)
    assert np.isfinite(np.asarray(out["points"])).all()


@pytest.mark.slow
def test_lion_ddim_sampling(cfg):
    lion = LION(cfg)
    lion.init_params(jax.random.PRNGKey(0))
    out = lion.sample(num_samples=1, rng=jax.random.PRNGKey(1), ddim_step=2)
    assert out["points"].shape == (1, 2048, 3)
    assert np.isfinite(np.asarray(out["points"])).all()
