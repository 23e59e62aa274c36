"""Conditioning extensions: class-conditional (data.cond_on_cat), CLIP
feature encoders, mitsuba scene export, and the forward ODE encode.

The reference's cond_on_cat path is broken upstream (vae_adain.py:66 uses an
undefined `class_embedding`); these tests pin down the working semantics here:
one-hot embedding, decoder style concat, local-prior condition concat.
"""
import xml.etree.ElementTree as ET

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lion_tpu.config import get_default_cfg
from lion_tpu.models import LION, VAE


def cond_cfg():
    cfg = get_default_cfg()
    cfg.data.tr_max_sample_points = 32
    cfg.data.cond_on_cat = 1
    cfg.data.nclass = 5
    cfg.tpu.cls_emb_dim = 8
    cfg.shapelatent.latent_dim = 1
    cfg.shapelatent.encoder_type = "models.latent_points_ada.PointTransPVC"
    cfg.shapelatent.decoder_type = "models.latent_points_ada.LatentPointDecPVC"
    cfg.latent_pts.ada_mlp_init_scale = 0.1
    cfg.latent_pts.skip_weight = 0.01
    cfg.shapelatent.log_sigma_offset = 6.0
    cfg.latent_pts.pvd_mse_loss = 1
    cfg.ddpm.num_steps = 4
    cfg.ddpm.loss_type = "l1_sum"
    cfg.sde.num_channels_dae = 16
    cfg.sde.num_cell_per_scale_dae = 1
    cfg.sde.embedding_dim = 8
    cfg.tpu.sa_blocks = [
        [[8, 1, 4], [8, 0.2, 4, [8, 16]]],
        [None, [4, 0.4, 4, [16, 16]]],
    ]
    cfg.tpu.fp_blocks = [
        [[16, 16], [16, 1, 4]],
        [[16, 8], [8, 1, 4]],
    ]
    return cfg


@pytest.fixture(scope="module")
def ccfg():
    return cond_cfg()


def test_vae_class_conditional_loss_and_sample(ccfg):
    vae = VAE(ccfg)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 32, 3),
                    jnp.float32) * 0.1  # realistic normalized-cloud scale
    labels = jnp.asarray([0, 1, 2, 4], jnp.int32)
    params = vae.init({"params": jax.random.PRNGKey(0),
                       "sample": jax.random.PRNGKey(1)},
                      x, class_label=labels)["params"]
    assert "class_embedding" in params, sorted(params)
    out = vae.apply({"params": params}, x, class_label=labels,
                    method=VAE.get_loss,
                    rngs={"sample": jax.random.PRNGKey(2),
                          "dropout": jax.random.PRNGKey(5)})
    assert np.isfinite(float(out["loss"]))
    assert out["cls_emb"].shape == (4, 8)

    pts = vae.apply({"params": params}, 4, class_label=labels,
                    method=VAE.sample,
                    rngs={"sample": jax.random.PRNGKey(3)})
    assert pts.shape == (4, 32, 3)
    assert np.isfinite(np.asarray(pts)).all()


def test_vae_embed_class_one_hot_equals_int(ccfg):
    vae = VAE(ccfg)
    x = jnp.zeros((2, 32, 3))
    labels = jnp.asarray([1, 3], jnp.int32)
    params = vae.init({"params": jax.random.PRNGKey(0),
                       "sample": jax.random.PRNGKey(1)},
                      x, class_label=labels)["params"]
    e_int = vae.apply({"params": params}, labels, method=VAE.embed_class)
    one_hot = jax.nn.one_hot(labels, 5)
    e_oh = vae.apply({"params": params}, one_hot, method=VAE.embed_class)
    np.testing.assert_allclose(np.asarray(e_int), np.asarray(e_oh))


def test_lion_class_conditional_sampling(ccfg):
    lion = LION(ccfg)
    lion.init_params(jax.random.PRNGKey(0))
    labels = jnp.asarray([0, 2], jnp.int32)
    out = lion.sample(2, rng=jax.random.PRNGKey(1), class_label=labels)
    pts = np.asarray(out["points"])
    assert pts.shape == (2, 32, 3)
    assert np.isfinite(pts).all()
    # different labels with the same rng must change the output
    out2 = lion.sample(2, rng=jax.random.PRNGKey(1),
                       class_label=jnp.asarray([1, 1], jnp.int32))
    assert not np.allclose(pts, np.asarray(out2["points"]))


def test_prior_train_step_class_conditional(ccfg):
    from lion_tpu.config.view import as_view
    from lion_tpu.diffusion.discrete import DiffusionDiscretized
    from lion_tpu.models.registry import (build_global_prior,
                                          build_local_prior)
    from lion_tpu.trainers.optim import (create_train_state, make_optimizer,
                                         warmup_cosine_schedule)
    from lion_tpu.trainers.steps import make_prior_train_step

    cfg = ccfg
    vae = VAE(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 32, 3),
                    jnp.float32) * 0.1  # realistic normalized-cloud scale
    labels = jnp.asarray([0, 1, 2, 3], jnp.int32)
    vae_params = vae.init({"params": jax.random.PRNGKey(0),
                           "sample": jax.random.PRNGKey(1)},
                          x, class_label=labels)["params"]
    gp = build_global_prior(cfg)
    lp = build_local_prior(cfg)
    local_dim = 32 * (1 + 3)
    gp_params = gp.init(jax.random.PRNGKey(2), jnp.zeros((1, 128)),
                        jnp.ones((1,)))["params"]
    lp_params = lp.init(jax.random.PRNGKey(3), jnp.zeros((1, local_dim)),
                        jnp.ones((1,)),
                        condition_input=jnp.zeros((1, 128 + 8)))["params"]
    opt = make_optimizer(warmup_cosine_schedule(1e-3, 1e-5, 0, 1, 0, 1),
                         0.9, 0.99)
    state = create_train_state({"global_prior": gp_params,
                                "local_prior": lp_params}, opt, 0.99)
    step = jax.jit(make_prior_train_step(
        vae, gp, lp, DiffusionDiscretized(cfg), opt,
        as_view(cfg.to_dict())))
    state, metrics = step(state, vae_params, x, jax.random.PRNGKey(4),
                          class_label=labels)
    assert np.isfinite(float(metrics["loss"]))


# ---------------------------------------------------------------- clip
def test_hash_clip_deterministic():
    from lion_tpu.utils.clip_helper import HashClip
    enc = HashClip()
    f1 = enc.encode_text(["a chair", "an airplane"])
    f2 = enc.encode_text(["a chair", "an airplane"])
    assert f1.shape == (2, 512)
    np.testing.assert_allclose(f1, f2)
    assert not np.allclose(f1[0], f1[1])
    np.testing.assert_allclose(np.linalg.norm(f1, axis=1), 1.0, rtol=1e-5)

    imgs = np.zeros((2, 8, 8, 3), np.uint8)
    imgs[1] += 1
    fi = enc.encode_image(imgs)
    assert fi.shape == (2, 512)
    assert not np.allclose(fi[0], fi[1])


def test_get_clip_encoder_falls_back():
    """No network egress here, so the hub model can't download; the factory
    must fall back to the deterministic stub rather than raise."""
    from lion_tpu.utils.clip_helper import get_clip_encoder
    enc = get_clip_encoder("this-model/does-not-exist")
    assert enc.encode_text(["x"]).shape == (1, enc.feat_dim)


# ---------------------------------------------------------------- mitsuba
def test_mitsuba_scene_xml_wellformed(tmp_path):
    from lion_tpu.utils.render_mitsuba import (point_cloud_scene_xml,
                                               standardize_bbox, write_scenes)
    pts = np.random.RandomState(0).randn(64, 3).astype(np.float32)
    xml = point_cloud_scene_xml(pts, ball_size=0.02)
    root = ET.fromstring(xml)
    assert root.tag == "scene"
    spheres = [s for s in root.iter("shape")
               if s.attrib.get("type") == "sphere"]
    assert len(spheres) == 64
    rects = [s for s in root.iter("shape")
             if s.attrib.get("type") == "rectangle"]
    assert len(rects) == 2  # floor + area light

    std = standardize_bbox(pts)
    assert std.min() >= -0.5 - 1e-6 and std.max() <= 0.5 + 1e-6

    batch = np.stack([pts, pts])
    outs = write_scenes(batch, [str(tmp_path / "a.png"),
                                str(tmp_path / "b.png")])
    assert all(p.endswith(".xml") for p in outs)
    for p in outs:
        ET.parse(p)


# ---------------------------------------------------------------- ODE encode
def test_compute_ode_encode_inverts_sampling():
    """With a zero score model the probability-flow ODE is linear
    (dx/dt = f(t) x), so encode(decode(x)) must recover x."""
    from lion_tpu.diffusion.continuous import DiffusionVPSDE
    d = DiffusionVPSDE(get_default_cfg().sde)

    def model_fn(x, t):
        return jnp.zeros_like(x)

    x0 = jnp.asarray(np.random.RandomState(0).randn(4, 16), jnp.float32)
    x_T, nfe_f = d.compute_ode_encode(model_fn, x0, ode_eps=1e-3,
                                      ode_solver_tol=1e-6)
    # analytic: x(1) = x(eps) * exp(int_f) ratio = e2int_f(1)/e2int_f(eps)
    ratio = d.e2int_f(jnp.float32(1.0)) / d.e2int_f(jnp.float32(1e-3))
    np.testing.assert_allclose(np.asarray(x_T), np.asarray(x0 * ratio),
                               rtol=1e-3, atol=1e-5)
    x_back, nfe_b = d.sample_model_ode(model_fn, jax.random.PRNGKey(0),
                                       4, (16,), ode_eps=1e-3,
                                       ode_solver_tol=1e-6, noise=x_T)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x0),
                               rtol=1e-3, atol=1e-5)
    assert int(nfe_f) > 0 and int(nfe_b) > 0
