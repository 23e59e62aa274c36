"""CLI integration: train_dist.py runs a tiny VAE training end-to-end on a
synthetic dataset with yacs-style overrides, writes cfg.yml + checkpoints."""
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("sn")
    rng = np.random.RandomState(0)
    d = root / "02691156" / "train"
    d.mkdir(parents=True)
    for i in range(8):
        np.save(str(d / f"m{i}.npy"),
                (rng.randn(256, 3) * 0.2).astype(np.float32))
    v = root / "02691156" / "val"
    v.mkdir(parents=True)
    for i in range(2):
        np.save(str(v / f"v{i}.npy"),
                (rng.randn(256, 3) * 0.2).astype(np.float32))
    return str(root)


@pytest.mark.slow
def test_train_dist_vae(tmp_path, data_root):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    exp = tmp_path / "exp"
    cmd = [
        sys.executable, "train_dist.py",
        "--exp_root", str(exp), "--data_root", data_root,
        "trainer.type", "trainers.hvae_trainer",
        "trainer.epochs", "1",
        "data.cates", "airplane",
        "data.tr_max_sample_points", "32",
        "data.te_max_sample_points", "32",
        "data.batch_size", "4",
        "shapelatent.latent_dim", "1",
        "shapelatent.encoder_type",
        "models.latent_points_ada.PointTransPVC",
        "shapelatent.decoder_type",
        "models.latent_points_ada.LatentPointDecPVC",
        "latent_pts.ada_mlp_init_scale", "0.1",
        "latent_pts.skip_weight", "0.01",
        "shapelatent.log_sigma_offset", "6.0",
        "ddpm.loss_type", "l1_sum",
        "viz.save_freq", "-1", "viz.val_freq", "-1",
        "tpu.sa_blocks", "[[[8,1,4],[8,0.2,4,[8,16]]],[null,[4,0.4,4,[16,16]]]]",
        "tpu.fp_blocks", "[[[16,16],[16,1,4]],[[16,8],[8,1,4]]]",
    ]
    # force-cpu config must survive the subprocess (profile pins axon)
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv = " + repr(cmd[1:]) + ";"
        "import runpy; runpy.run_path('train_dist.py', run_name='__main__')")
    result = subprocess.run([sys.executable, "-c", code], env=env,
                            capture_output=True, text=True, timeout=1200,
                            cwd=os.path.dirname(os.path.dirname(
                                os.path.abspath(__file__))))
    assert result.returncode == 0, result.stderr[-3000:]
    exp_dirs = list(exp.iterdir())
    assert exp_dirs, "no experiment dir created"
    d = exp_dirs[0]
    assert (d / "cfg.yml").exists()
    assert (d / "checkpoints" / "final.npz").exists()
    assert (d / "metrics.jsonl").exists()
