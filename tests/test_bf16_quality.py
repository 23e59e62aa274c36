"""bf16 sampling-quality gate (VERDICT round-2 item 2).

The bench headline runs the sampling chain in bf16 (bench.py BENCH_BF16);
these tests pin that bf16 compute does not change WHAT is sampled, only
how fast:

- per-call denoiser drift: the bf16 local/global prior evaluated at the
  same (x, t) stays within bf16-epsilon-scale relative error of fp32;
- end-to-end: a multi-step DDPM chain sampled in bf16 from the same RNG
  lands near its fp32 twin — the paired fp32-vs-bf16 distance must be far
  below the distance between DIFFERENT samples, and set-level MMD-CD
  against the test refs must agree to a loose tolerance.

Full-scale on-chip numbers come from scripts/check_bf16_quality.py (the
1000-step chain on the real flagship spec); measured deltas are recorded
in README.md.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_trainers import _Args, data_root, tiny_train_cfg  # noqa: F401


def _chamfer_np(a, b):
    """Symmetric CD per pair of (N, 3) clouds (mean of squared NN dists)."""
    d = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    return d.min(1).mean() + d.min(0).mean()


@pytest.mark.slow
def test_bf16_sampling_quality(tmp_path, data_root):  # noqa: F811
    from lion_tpu.trainers.train_2prior import Trainer
    cfg = tiny_train_cfg(tmp_path, data_root)
    cfg.ddpm.num_steps = 20          # long enough to accumulate drift
    # the tiny random config diverges at the default 3e-4 within 3 steps
    # (loss 24e3 -> 111 -> nan); clip + small lr keep the weights sane —
    # the test only needs a non-raw-init denoiser
    cfg.sde.learning_rate_dae = 1e-4
    cfg.sde.learning_rate_min_dae = 1e-4
    cfg.sde.grad_clip_max_norm = 1.0
    trainer = Trainer(cfg, _Args(str(tmp_path), data_root))
    # damp the random-init style-posterior head: exp(log_sigma) of the
    # global posterior overflows through the local prior's AdaGN
    # conditioning on some batches (same mitigation as
    # __graft_entry__.dryrun_multichip; trained ckpts never sit there)
    vp = dict(trainer.vae_params)
    se = dict(vp["style_encoder"])
    mlp = dict(se["mlp"])
    mlp["kernel"] = mlp["kernel"] * 0.01
    mlp["bias"] = mlp["bias"] * 0.01
    se["mlp"] = mlp
    vp["style_encoder"] = se
    trainer.vae_params = jax.device_put(vp, trainer.replicated)
    # a few training steps so the denoiser is not a raw-init function
    for i, batch in enumerate(trainer.train_loader):
        m = trainer.train_iter(batch, i)
        assert np.isfinite(m["loss"]), (i, m)
    trainer.save_snapshot()

    cfg16 = tiny_train_cfg(tmp_path, data_root)
    cfg16.ddpm.num_steps = 20
    cfg16.tpu.bf16 = True
    t16 = Trainer(cfg16, _Args(str(tmp_path), data_root))
    assert t16.resume()

    # --- per-call denoiser drift at matched (x, t) -----------------------
    lion32 = trainer.as_lion(use_ema=False)
    lion16 = t16.as_lion(use_ema=False)
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (4, lion32.local_dim))
    cond = jax.random.normal(jax.random.fold_in(rng, 1),
                             (4, lion32.style_dim))
    t = jnp.full((4,), 7.0)
    e32 = lion32.local_prior.apply(
        {"params": lion32.params["local_prior"]}, x, t,
        condition_input=cond)
    e16 = lion16.local_prior.apply(
        {"params": lion16.params["local_prior"]}, x, t,
        condition_input=cond)
    rel = (np.linalg.norm(np.asarray(e16, np.float32) - np.asarray(e32))
           / max(np.linalg.norm(np.asarray(e32)), 1e-9))
    # bf16 has ~2^-8 relative precision; a deep net compounds it but the
    # result must stay in the few-percent range, not O(1)
    assert rel < 0.06, f"bf16 denoiser drift {rel:.4f}"

    # --- end-to-end chain: paired drift << cross-sample distance ---------
    rng = jax.random.PRNGKey(11)
    a = np.asarray(trainer.sample(8, rng=rng, use_ema=False),
                   np.float32)[:, :, :3]
    b = np.asarray(t16.sample(8, rng=rng, use_ema=False),
                   np.float32)[:, :, :3]
    assert np.isfinite(a).all() and np.isfinite(b).all()
    paired = np.mean([_chamfer_np(a[i], b[i]) for i in range(len(a))])
    cross = np.mean([_chamfer_np(a[i], a[(i + 1) % len(a)])
                     for i in range(len(a))])
    assert paired < 0.5 * cross, (paired, cross)

    # --- set-level metric delta vs the test refs -------------------------
    from lion_tpu.eval import compute_all_metrics
    refs = np.concatenate([np.asarray(bt["tr_points"], np.float32)
                           for bt in trainer.test_loader])
    r32 = compute_all_metrics(a[: len(refs)], refs, batch_size=4,
                              metric2=None)
    r16 = compute_all_metrics(b[: len(refs)], refs, batch_size=4,
                              metric2=None)
    m32, m16 = float(r32["lgan_mmd-CD"]), float(r16["lgan_mmd-CD"])
    assert abs(m16 - m32) <= 0.25 * max(m32, 1e-9), (m32, m16)
