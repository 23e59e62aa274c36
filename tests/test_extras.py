"""Tests for auxiliary subsystems: interpolation, spectral norm, writer,
exp helpers, shape checkers, checkpoint IO."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_noise_interpolation_modes():
    from lion_tpu.trainers.interpolate import (freeze_noise,
                                               interpolate_noise,
                                               linear_interpolate_noise)
    rng = np.random.RandomState(0)
    noise = jnp.asarray(rng.randn(8, 16).astype(np.float32))
    lin = np.asarray(linear_interpolate_noise(noise))
    np.testing.assert_array_equal(lin[0], np.asarray(noise[0]))
    np.testing.assert_array_equal(lin[-1], np.asarray(noise[-1]))
    p = 3 / 8
    np.testing.assert_allclose(
        lin[3], p * np.asarray(noise[-1]) + (1 - p) * np.asarray(noise[0]),
        rtol=1e-5)
    sph = np.asarray(interpolate_noise(noise))
    np.testing.assert_allclose(
        sph[3], np.sqrt(p) * np.asarray(noise[-1])
        + np.sqrt(1 - p) * np.asarray(noise[0]), rtol=1e-5)
    frz = np.asarray(freeze_noise(noise))
    for k in range(8):
        np.testing.assert_array_equal(frz[k], np.asarray(noise[0]))


def test_spectral_norm_loss():
    from lion_tpu.utils.spectral_norm import (init_sn_state, norm_scale_loss,
                                              spectral_norm_loss)
    rng = np.random.RandomState(1)
    w = rng.randn(16, 8).astype(np.float32)
    params = {"layer": {"kernel": jnp.asarray(w), "bias": jnp.zeros(8)},
              "norm": {"scale": jnp.asarray(rng.randn(8).astype(np.float32)),
                       "bias": jnp.zeros(8)}}
    state = init_sn_state(params)
    loss, new_state = spectral_norm_loss(params, state, num_power_iter=20)
    true_sigma = np.linalg.svd(w.T, compute_uv=False)[0]
    np.testing.assert_allclose(float(loss), true_sigma, rtol=1e-3)
    nloss = norm_scale_loss(params)
    np.testing.assert_allclose(float(nloss),
                               np.abs(np.asarray(params["norm"]["scale"]))
                               .max(), rtol=1e-6)


def test_writer_jsonl(tmp_path):
    import json
    from lion_tpu.utils.writer import Writer
    w = Writer(log_dir=str(tmp_path), rank=0)
    w.add_scalar("loss", 1.5, 10)
    w.avg_meter("m", 1.0)
    w.avg_meter("m", 3.0)
    w.upload_meter(20)
    w.close()
    lines = [json.loads(l) for l in
             open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert lines[0]["tag"] == "loss" and lines[0]["value"] == 1.5
    assert lines[1]["tag"] == "m" and lines[1]["value"] == 2.0


def test_writer_tensorboard_sink(tmp_path):
    """USE_TFB-style TensorBoard backend (reference utils/utils.py:319-462):
    scalars + images land in an event file next to the jsonl."""
    import numpy as np
    from lion_tpu.utils.writer import Writer
    w = Writer(log_dir=str(tmp_path), rank=0, use_tensorboard=True)
    assert w._tb is not None, "torch.utils.tensorboard should be available"
    w.add_scalar("loss", 0.5, 1)
    w.add_image("vis/sample", np.zeros((8, 8, 3), np.uint8), 1)
    w.close()
    evs = [f for f in os.listdir(tmp_path) if "tfevents" in f]
    assert evs, f"no event file in {list(os.listdir(tmp_path))}"


def test_mesh_renderer_ply_roundtrip_and_scene(tmp_path):
    """Mitsuba mesh/cube renderer port (reference utils/render_mitsuba_mesh
    .py + render_voxel_cubes.py): PLY I/O roundtrips (ascii + binary),
    reformat_ply lands the mesh in the render frame, cube meshing instances
    12 tris/cube, and the scene XML carries the material table."""
    from lion_tpu.utils.render_mitsuba_mesh import (
        cubes_to_mesh, mesh_scene_xml, read_ply, reformat_ply,
        render_voxel_cubes, standardize_to_same_range, write_ply)
    rng = np.random.RandomState(0)
    verts = rng.randn(20, 3)
    faces = rng.randint(0, 20, (12, 3))
    for asc in (True, False):
        p = str(tmp_path / f"m_{asc}.ply")
        write_ply(p, verts, faces, ascii=asc)
        v2, f2 = read_ply(p)
        np.testing.assert_allclose(v2, verts.astype(np.float32), atol=1e-6)
        np.testing.assert_array_equal(f2, faces)

    # reformat: standardized bbox (longest edge 1), floor at z = -0.475
    src = str(tmp_path / "m_True.ply")
    out = reformat_ply(src, str(tmp_path / "ref.ply"), r=1)
    v3, f3 = read_ply(out)
    assert f3.shape == faces.shape
    ext = v3.max(0) - v3.min(0)
    assert abs(ext.max() - 1.0) < 1e-5
    assert abs(v3[:, 2].min() - (-0.475)) < 1e-5

    # same-range rescale maps src into the reference mesh's per-axis range
    sr = standardize_to_same_range(out, rng.randn(50, 3))
    for i in range(3):
        assert sr[:, i].min() >= v3[:, i].min() - 1e-6
        assert sr[:, i].max() <= v3[:, i].max() + 1e-6

    # cubes: K cubes -> 8K verts / 12K tris, floor-aligned
    centers = np.argwhere(rng.rand(4, 4, 4) > 0.5).astype(np.float64)
    cv, cf, edge = cubes_to_mesh(centers, voxel_size=1.0)
    assert cv.shape == (8 * len(centers), 3)
    assert cf.shape == (12 * len(centers), 3)
    assert edge > 0

    xml = mesh_scene_xml(out, material_id=5, colorm=(93, 64, 211))
    assert 'type="ply"' in xml and 'value="1.7"' in xml \
        and "surfaceMaterial" in xml and "</scene>" in xml

    # full cube-figure flow (no mitsuba binary -> returns the scene xml)
    res = render_voxel_cubes(centers, 1.0, str(tmp_path / "cubes.png"))
    assert res.endswith(".xml") and os.path.exists(res)
    assert os.path.exists(str(tmp_path / "cubes_cubes.ply"))


def test_exp_helpers():
    from lion_tpu.utils.exp_helper import ExpTimer, hash_config
    assert len(hash_config("abc")) == 6
    t = ExpTimer(10)
    t.tic()
    t.toc()
    assert t.hours_left() >= 0


def test_checker():
    from lion_tpu.utils import checker as C
    x = np.zeros((2, 3, 4))
    C.CHECK3D(x)
    C.CHECKDIM(x, 2, 4)
    C.CHECKSIZE(x, (2, 3, [3, 4]))
    with pytest.raises(AssertionError):
        C.CHECK2D(x)
    with pytest.raises(AssertionError):
        C.CHECKSIZE(x, (2, 3, 5))


def test_checkpoint_io_roundtrip(tmp_path):
    from lion_tpu.ckpt.io import (load_checkpoint, save_checkpoint,
                                  save_snapshot, has_snapshot, load_snapshot)
    trees = {"model": {"a": jnp.ones((2, 3)), "b": {"c": jnp.zeros(4)}}}
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, trees, {"step": 7})
    loaded, meta = load_checkpoint(path)
    assert meta["step"] == 7
    np.testing.assert_array_equal(np.asarray(loaded["model"]["a"]),
                                  np.ones((2, 3)))
    np.testing.assert_array_equal(np.asarray(loaded["model"]["b"]["c"]),
                                  np.zeros(4))
    assert not has_snapshot(str(tmp_path))
    save_snapshot(str(tmp_path), trees, {"step": 8})
    assert has_snapshot(str(tmp_path))
    _, meta2 = load_snapshot(str(tmp_path))
    assert meta2["step"] == 8


def test_vis_plot(tmp_path):
    from lion_tpu.utils.vis import plot_points
    pts = np.random.RandomState(0).randn(2, 64, 3).astype(np.float32)
    out = plot_points(pts, str(tmp_path / "p.png"))
    assert os.path.exists(out)


def test_clip_forge_prior_forward():
    """PriorSEClip + clip-conditioned local prior run with clip features."""
    from lion_tpu.config import get_default_cfg
    from lion_tpu.models.registry import build_global_prior
    cfg = get_default_cfg()
    cfg.clipforge.enable = 1
    cfg.latent_pts.style_prior = "models.score_sde.resnet.PriorSEClip"
    cfg.sde.num_channels_dae = 32
    cfg.sde.num_cell_per_scale_dae = 1
    cfg.sde.embedding_dim = 16
    prior = build_global_prior(cfg)
    x = jnp.zeros((2, 128))
    t = jnp.ones((2,))
    clip_feat = jnp.ones((2, 512))
    params = prior.init(jax.random.PRNGKey(0), x, t, clip_feat=clip_feat)
    out = prior.apply(params, x, t, clip_feat=clip_feat)
    assert out.shape == (2, 128)
    assert np.isfinite(np.asarray(out)).all()


def test_loss_fn_variants():
    import jax.numpy as jnp
    from lion_tpu.utils.losses import loss_fn
    rng = np.random.RandomState(20)
    a = jnp.asarray(rng.randn(2, 32, 3).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.randn(2, 32, 3).astype(np.float32) * 0.3)
    # l1_sum: scalar sum over everything (reference reduction='sum')
    l1 = float(loss_fn(a, b, "l1_sum", 3, 2))
    np.testing.assert_allclose(l1, float(jnp.sum(jnp.abs(a - b))), rtol=1e-6)
    mse = float(loss_fn(a, b, "mse", 3, 2))
    np.testing.assert_allclose(mse, float(jnp.mean((a - b) ** 2)), rtol=1e-6)
    cham = np.asarray(loss_fn(a, b, "chamfer", 3, 2))
    assert cham.shape == (2,) and (cham > 0).all()
    cd1 = float(loss_fn(a, b, "cd1_sum", 3, 2))
    assert np.isfinite(cd1) and cd1 > 0
    ce = np.asarray(loss_fn(a, b, "chamfer_emd", 3, 2))
    assert ce.shape == (2,) and np.isfinite(ce).all()
    with pytest.raises(ValueError):
        loss_fn(a, b, "nope", 3, 2)


def test_kl_coeff_schedule():
    from lion_tpu.utils.losses import kl_coeff
    # linear ramp from min to max over total_step after constant_step
    assert kl_coeff(0, 100, 0, 1e-7, 0.5) == pytest.approx(1e-7)
    assert kl_coeff(50, 100, 0, 0.0, 0.5) == pytest.approx(0.25)
    assert kl_coeff(1000, 100, 0, 0.0, 0.5) == 0.5
