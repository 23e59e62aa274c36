"""Multi-chip sharding tests on the virtual 8-device CPU mesh: the pjit'd
train steps must compile and run with batch sharded over 'data' and params
replicated (the reference's DDP path, rebuilt as mesh+psum; SURVEY 2.9)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from lion_tpu.config import get_default_cfg
from lion_tpu.parallel.mesh import data_sharding, make_mesh, replicated, shard_batch


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_places_data():
    mesh = make_mesh()
    batch = jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4)
    sharded = shard_batch(mesh, batch)
    assert sharded.sharding.is_equivalent_to(data_sharding(mesh), 2)


def test_psum_gradient_semantics():
    """A jitted mean-loss grad over a sharded batch equals the full-batch
    grad (what DDP grad-averaging guarantees)."""
    mesh = make_mesh()
    w = jnp.asarray(np.random.RandomState(0).randn(4, 4), jnp.float32)
    x = jnp.asarray(np.random.RandomState(1).randn(16, 4), jnp.float32)

    def loss(w, x):
        return jnp.mean(jnp.square(x @ w))

    g_full = jax.grad(loss)(w, x)
    xs = jax.device_put(x, data_sharding(mesh))
    ws = jax.device_put(w, replicated(mesh))
    g_sharded = jax.jit(jax.grad(loss))(ws, xs)
    np.testing.assert_allclose(np.asarray(g_full), np.asarray(g_sharded),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_two_prior_train_step_sharded():
    """One full stage-2 train step on the 8-device mesh with tiny shapes."""
    from lion_tpu.diffusion import DiffusionDiscretized
    from lion_tpu.models import VAE
    from lion_tpu.models.registry import build_global_prior, build_local_prior
    from lion_tpu.trainers.optim import (create_train_state, make_optimizer,
                                         warmup_cosine_schedule)
    from lion_tpu.trainers.steps import make_prior_train_step

    cfg = get_default_cfg()
    cfg.data.tr_max_sample_points = 128   # tiny latent cloud
    cfg.shapelatent.latent_dim = 1
    cfg.shapelatent.encoder_type = "models.latent_points_ada.PointTransPVC"
    cfg.shapelatent.decoder_type = "models.latent_points_ada.LatentPointDecPVC"
    cfg.latent_pts.ada_mlp_init_scale = 0.1
    cfg.latent_pts.skip_weight = 0.01
    cfg.shapelatent.log_sigma_offset = 6.0
    cfg.sde.num_channels_dae = 32
    cfg.sde.num_cell_per_scale_dae = 1
    cfg.sde.embedding_dim = 16
    cfg.ddpm.num_steps = 10

    mesh = make_mesh()
    vae = VAE(cfg)
    gp = build_global_prior(cfg)
    lp = build_local_prior(cfg)
    diffusion = DiffusionDiscretized(cfg)

    b, n = 8, 128
    x = jnp.asarray(np.random.RandomState(0).randn(b, n, 3) * 0.3,
                    jnp.float32)
    vae_params = vae.init({"params": jax.random.PRNGKey(0),
                           "sample": jax.random.PRNGKey(1)}, x)["params"]
    gp_params = gp.init(jax.random.PRNGKey(2), jnp.zeros((1, 128)),
                        jnp.ones((1,)))["params"]
    lp_params = lp.init(jax.random.PRNGKey(3), jnp.zeros((1, n * 4)),
                        jnp.ones((1,)),
                        condition_input=jnp.zeros((1, 128)))["params"]

    sched = warmup_cosine_schedule(3e-4, 3e-4, 10, 10, 1, 10)
    opt = make_optimizer(sched)
    state = create_train_state({"global_prior": gp_params,
                                "local_prior": lp_params}, opt,
                               ema_decay=0.999)
    step = make_prior_train_step(vae, gp, lp, diffusion, opt, cfg)

    # shard: batch over data axis, everything else replicated
    x_sharded = jax.device_put(x, data_sharding(mesh))
    rep = replicated(mesh)
    state = jax.device_put(state, rep)
    vae_params = jax.device_put(vae_params, rep)

    jit_step = jax.jit(step)
    new_state, metrics = jit_step(state, vae_params, x_sharded,
                                  jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    # EMA params updated and finite
    leaf = jax.tree_util.tree_leaves(new_state.ema_params)[0]
    assert np.isfinite(np.asarray(leaf)).all()
    # second step runs from the cached executable
    new_state2, _ = jit_step(new_state, vae_params, x_sharded,
                             jax.random.PRNGKey(8))
    assert int(new_state2.step) == 2


@pytest.mark.slow
def test_sample_chunked_sharded_matches_unsharded():
    """Hierarchical chunked sampling batch-sharded over the 8-device mesh
    must run and agree with the single-device result (threefry RNG is
    deterministic; only layouts differ)."""
    from lion_tpu.models import LION

    cfg = get_default_cfg()
    cfg.data.tr_max_sample_points = 128
    cfg.shapelatent.latent_dim = 1
    cfg.shapelatent.encoder_type = "models.latent_points_ada.PointTransPVC"
    cfg.shapelatent.decoder_type = "models.latent_points_ada.LatentPointDecPVC"
    cfg.latent_pts.ada_mlp_init_scale = 0.1
    cfg.latent_pts.skip_weight = 0.01
    cfg.shapelatent.log_sigma_offset = 6.0
    cfg.ddpm.num_steps = 4
    cfg.sde.num_channels_dae = 32
    cfg.sde.num_cell_per_scale_dae = 1
    cfg.sde.embedding_dim = 16
    # tiny U-Nets (same overrides as test_cli) keep CPU compile fast
    cfg.tpu.sa_blocks = [[[8, 1, 4], [8, 0.2, 4, [8, 16]]],
                         [None, [4, 0.4, 4, [16, 16]]]]
    cfg.tpu.fp_blocks = [[[16, 16], [16, 1, 4]], [[16, 8], [8, 1, 4]]]

    lion = LION(cfg)
    lion.init_params(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(5)

    ref = lion.sample_chunked(8, rng, chunks=2)
    mesh = make_mesh()
    out = lion.sample_chunked(8, rng, chunks=2, mesh=mesh)

    assert out["points"].shape == (8, 128, 3)
    pts = np.asarray(out["points"])
    assert np.isfinite(pts).all()
    np.testing.assert_allclose(pts, np.asarray(ref["points"]),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_midscale_sharded_step_matches_single_device():
    """RUN (not just compile) one stage-2 train step at mid scale — the
    released 4-SA/4-FP topology with its attention placement, widths
    halved, 512-point clouds — on the 8-device mesh, and assert the
    resulting parameters equal a single-device run of the same batch
    (VERDICT r3 item 3: psum == manual all-reduce, the contract of the
    reference's flattened gradient all_reduce, utils/utils.py:717-748)."""
    from lion_tpu.diffusion import DiffusionDiscretized
    from lion_tpu.models import VAE
    from lion_tpu.models.registry import build_global_prior, build_local_prior
    from lion_tpu.trainers.optim import (create_train_state, make_optimizer,
                                         warmup_cosine_schedule)
    from lion_tpu.trainers.steps import make_prior_train_step

    cfg = get_default_cfg()
    cfg.data.tr_max_sample_points = 512
    cfg.shapelatent.latent_dim = 1
    cfg.shapelatent.encoder_type = "models.latent_points_ada.PointTransPVC"
    cfg.shapelatent.decoder_type = "models.latent_points_ada.LatentPointDecPVC"
    cfg.latent_pts.ada_mlp_init_scale = 0.1
    cfg.latent_pts.skip_weight = 0.01
    cfg.shapelatent.log_sigma_offset = 6.0
    cfg.latent_pts.pvd_mse_loss = 1
    cfg.sde.num_channels_dae = 64
    cfg.sde.num_cell_per_scale_dae = 2
    cfg.sde.embedding_dim = 16
    cfg.ddpm.num_steps = 10
    # released LOCAL_PRIOR_SA_BLOCKS/FP_BLOCKS structure (4 SA + 4 FP,
    # same conv counts, same attention placement rule) at half width,
    # half resolution, quarter centers
    cfg.tpu.sa_blocks = [
        [[16, 2, 16], [256, 0.1, 16, [16, 32]]],
        [[32, 3, 8], [64, 0.2, 16, [32, 64]]],
        [[64, 3, 4], [16, 0.4, 16, [64, 64]]],
        [None, [4, 0.8, 16, [64, 64, 64]]],
    ]
    cfg.tpu.fp_blocks = [
        [[64, 64], [64, 3, 4]],
        [[64, 64], [64, 3, 4]],
        [[64, 64], [64, 2, 8]],
        [[64, 64, 32], [32, 2, 16]],
    ]

    mesh = make_mesh()
    vae = VAE(cfg)
    gp = build_global_prior(cfg)
    lp = build_local_prior(cfg)
    diffusion = DiffusionDiscretized(cfg)

    b, n = 8, cfg.data.tr_max_sample_points
    x = jnp.asarray(np.random.RandomState(0).randn(b, n, 3) * 0.3,
                    jnp.float32)
    vae_params = vae.init({"params": jax.random.PRNGKey(0),
                           "sample": jax.random.PRNGKey(1)}, x)["params"]
    gp_params = gp.init(jax.random.PRNGKey(2), jnp.zeros((1, 128)),
                        jnp.ones((1,)))["params"]
    lp_params = lp.init(jax.random.PRNGKey(3), jnp.zeros((1, n * 4)),
                        jnp.ones((1,)),
                        condition_input=jnp.zeros((1, 128)))["params"]
    opt = make_optimizer(warmup_cosine_schedule(3e-4, 3e-4, 10, 10, 1, 10))
    state = create_train_state({"global_prior": gp_params,
                                "local_prior": lp_params}, opt,
                               ema_decay=0.999)
    step = jax.jit(make_prior_train_step(vae, gp, lp, diffusion, opt, cfg))
    rng = jax.random.PRNGKey(7)

    # single-device run (default placement)
    ref_state, ref_metrics = step(state, vae_params, x, rng)
    assert np.isfinite(float(ref_metrics["loss"]))

    # 8-device run: batch sharded, params replicated
    x_sh = jax.device_put(x, data_sharding(mesh))
    state_sh = jax.device_put(state, replicated(mesh))
    vae_sh = jax.device_put(vae_params, replicated(mesh))
    new_state, metrics = step(state_sh, vae_sh, x_sh, rng)

    # reduction-order noise: the sharded mean sums 8 partials
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]),
                               rtol=1e-4, atol=1e-6)
    flat_ref = jax.tree_util.tree_leaves(ref_state.params)
    flat_new = jax.tree_util.tree_leaves(new_state.params)
    assert len(flat_ref) == len(flat_new)
    for a, c in zip(flat_ref, flat_new):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_full_spec_multichip_aot_compile():
    """AOT lower+compile (no run) of the stage-2 train step at the RELEASED
    architecture scale — 2048-point 4-stage U-Net specs, nf=2048 global
    prior — sharded over the 8-device mesh (VERDICT r2 item 5: the tiny
    dryrun validates runtime; this validates that the real architecture's
    sharded program compiles). Shape-only (jax.eval_shape + ShapeDtypeStruct
    shardings): no full-scale params are materialized. ~4.5 min on a cold
    compile cache, seconds warm."""
    from lion_tpu.diffusion import DiffusionDiscretized
    from lion_tpu.models import VAE
    from lion_tpu.models.registry import (build_global_prior,
                                          build_local_prior)
    from lion_tpu.parallel.mesh import data_sharding, replicated
    from lion_tpu.trainers.optim import (create_train_state, make_optimizer,
                                         warmup_cosine_schedule)
    from lion_tpu.trainers.steps import make_prior_train_step

    cfg = get_default_cfg()
    cfg.data.tr_max_sample_points = 2048
    cfg.shapelatent.latent_dim = 1
    cfg.shapelatent.encoder_type = "models.latent_points_ada.PointTransPVC"
    cfg.shapelatent.decoder_type = "models.latent_points_ada.LatentPointDecPVC"
    cfg.latent_pts.ada_mlp_init_scale = 0.1
    cfg.latent_pts.skip_weight = 0.01
    cfg.shapelatent.log_sigma_offset = 6.0
    cfg.latent_pts.pvd_mse_loss = 1
    # default SA/FP specs and sde.num_channels_dae=2048 = released scale

    vae = VAE(cfg)
    gp = build_global_prior(cfg)
    lp = build_local_prior(cfg)
    diffusion = DiffusionDiscretized(cfg)
    opt = make_optimizer(warmup_cosine_schedule(3e-4, 3e-4, 10, 10, 1, 10))
    step = make_prior_train_step(vae, gp, lp, diffusion, opt, cfg)

    b, n = 8, cfg.data.tr_max_sample_points
    x = jnp.zeros((b, n, 3), jnp.float32)

    def init_state():
        vae_p = vae.init({"params": jax.random.PRNGKey(0),
                          "sample": jax.random.PRNGKey(1)}, x)["params"]
        gp_p = gp.init(jax.random.PRNGKey(2), jnp.zeros((1, 128)),
                       jnp.ones((1,)))["params"]
        lp_p = lp.init(jax.random.PRNGKey(3), jnp.zeros((1, n * 4)),
                       jnp.ones((1,)),
                       condition_input=jnp.zeros((1, 128)))["params"]
        st = create_train_state({"global_prior": gp_p, "local_prior": lp_p},
                                opt, ema_decay=cfg.sde.ema_decay)
        return st, vae_p

    state_sd, vae_sd = jax.eval_shape(init_state)
    mesh = make_mesh(8)
    rep, dsh = replicated(mesh), data_sharding(mesh)

    def with_sharding(sh):
        return lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh)

    state_sd = jax.tree_util.tree_map(with_sharding(rep), state_sd)
    vae_sd = jax.tree_util.tree_map(with_sharding(rep), vae_sd)
    x_sd = jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=dsh)

    compiled = jax.jit(step).lower(state_sd, vae_sd, x_sd,
                                   jax.random.PRNGKey(0)).compile()
    # sanity: the compiled program exists and is the sharded 8-device one
    assert compiled is not None
    txt = compiled.as_text()
    assert "num_partitions=8" in txt or "devices=[8" in txt.replace(" ", ""), \
        "expected an 8-way partitioned program"
