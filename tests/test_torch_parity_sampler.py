"""END-TO-END sampler-composition parity vs torch (VERDICT r4 missing #1).

Module forward parity (test_torch_parity*.py) proves each network matches;
this test proves the HIERARCHICAL SAMPLING PIPELINE itself: the reference's
ACTUAL `generate_samples_vada_2prior` (trainers/train_2prior.py:49-127) —
global ancestral chain -> global2style -> conditioned local chain ->
`vae.sample` decode, with mixing_logit applied INSIDE the reverse chain
(diffusion_pvd.py:262-283), the t+1 timestep convention (:257-258), the
'beta' fixed log-scales (:155-168) and the posterior-mean update
(:475-486) — runs on CPU torch against `LION.sample` on strict-imported
weights with IDENTICAL noise, and the final clouds must match.

Determinism: torch.randn is patched to pop from a pre-generated queue
(the function does not plumb its own given_noise through), and the same
arrays feed LION.sample's given_noise path (the reference's given_noise
convention, diffusion_pvd.py:235-239,285-289: init draw + per-step draws
indexed by t). torch.ones/torch.tensor are patched to map the hard-coded
device='cuda' (:237,258,317) onto CPU; nothing else is altered.

Uses the REAL released topology (PVCNN2Prior class-attr sa/fp specs,
PriorSEDrop global prior, PointTransPVC/LatentPointDecPVC VAE) at 2048
points, T=5 diffusion steps, batch 1.
"""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_torch_parity_full import (REF, _install_stubs, _released_our_cfg,
                                    _released_ref_cfg)


def _install_sampler_stubs():
    """Extends _install_stubs with what trainers.train_2prior's import
    chain additionally needs on CPU (torchvision/psutil/calmsize absent in
    this env; comet OfflineExperiment; the full metric-fn surface)."""
    _install_stubs()
    for name in ("torchvision", "psutil", "calmsize", "clip"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.size = lambda *a, **kw: "0B"
            m.load = lambda *a, **kw: (None, None)
            sys.modules[name] = m
    cm = sys.modules["comet_ml"]
    for attr in ("Experiment", "ExistingExperiment", "OfflineExperiment"):
        if not hasattr(cm, attr):
            setattr(cm, attr, object)
    em = sys.modules["utils.evaluation_metrics_fast"]
    for fn in ("compute_all_metrics", "jsd_between_point_cloud_sets",
               "EMD_CD", "print_results", "write_results",
               "formulate_results"):
        if not hasattr(em, fn):
            setattr(em, fn, lambda *a, **kw: None)


@pytest.fixture(scope="module")
def ref_sampler():
    _install_sampler_stubs()
    sys.path.insert(0, REF)
    try:
        from default_config import cfg as ref_cfg
        from models.latent_points_ada_localprior import PVCNN2Prior
        from models.score_sde.resnet import PriorSEDrop
        from models.vae_adain import Model as RefVAE
        from trainers.train_2prior import generate_samples_vada_2prior
        from utils.diffusion_pvd import DiffusionDiscretized
    finally:
        sys.path.remove(REF)
    return (generate_samples_vada_2prior, DiffusionDiscretized,
            PVCNN2Prior, PriorSEDrop, RefVAE, ref_cfg)


class _QueueRandn:
    """torch.randn replacement popping pre-generated draws (and asserting
    the requested shape matches what the queue holds)."""

    def __init__(self, torch, arrays):
        self.torch = torch
        self.queue = list(arrays)
        self.orig = torch.randn

    def __call__(self, *args, size=None, device=None, **kw):
        shape = tuple(size) if size is not None else tuple(
            args[0] if len(args) == 1 and isinstance(args[0], (tuple, list))
            else args)
        assert self.queue, "torch.randn called more times than expected"
        arr = self.queue.pop(0)
        assert tuple(arr.shape) == shape, (arr.shape, shape)
        return self.torch.from_numpy(arr)


def _device_safe(fn):
    def wrapped(*args, device=None, **kw):
        if isinstance(device, str) and "cuda" in device:
            device = "cpu"
        return fn(*args, device=device, **kw)
    return wrapped


@pytest.mark.slow
def test_sampler_composition_parity(ref_sampler, monkeypatch):
    """generate_samples_vada_2prior (torch, CPU, T=5, released topology)
    == LION.sample on the same strict-imported weights + noise."""
    import torch
    (generate_2prior, RefDiffusion, PVCNN2Prior, PriorSEDrop, RefVAE,
     ref_cfg) = ref_sampler

    # the reference hard-codes .cuda() tensor moves (diffusion_pvd.py:136,
    # train_2prior.py device= kwargs); map them onto CPU
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **kw: self, raising=False)
    monkeypatch.setattr(torch.nn.Module, "cuda",
                        lambda self, *a, **kw: self, raising=False)

    T, b, n = 5, 1, 2048
    rc = _released_ref_cfg(ref_cfg)
    rc.ddpm.num_steps = T
    rc.sde.num_channels_dae = 128
    rc.sde.num_cell_per_scale_dae = 2
    rc.sde.embedding_dim = 64
    rc.sde.dropout = 0.2

    torch.manual_seed(3)
    tvae = RefVAE(rc).eval()
    tglobal = PriorSEDrop(rc.sde, rc.latent_pts.style_dim, rc).eval()
    tlocal = PVCNN2Prior(rc.sde, 4, rc).eval()
    tdiff = RefDiffusion(None, None, rc)

    # ---- our side: same cfg, strict weight import
    from lion_tpu.ckpt.torch_import import import_state_dict
    from lion_tpu.models.lion import LION

    cfg = _released_our_cfg()
    cfg.ddpm.num_steps = T
    cfg.sde.num_channels_dae = 128
    cfg.sde.num_cell_per_scale_dae = 2
    cfg.sde.embedding_dim = 64
    cfg.sde.dropout = 0.2
    lion = LION(cfg)
    shapes = jax.eval_shape(lambda: lion.init_params(jax.random.PRNGKey(0)))
    sd = lambda m: {k: v.detach().numpy() for k, v in m.state_dict().items()}
    lion.params = {
        "vae": import_state_dict(sd(tvae), shapes["vae"], "vae",
                                 strict=True),
        "global_prior": import_state_dict(
            sd(tglobal), shapes["global_prior"], "global_prior",
            strict=True),
        "local_prior": import_state_dict(
            sd(tlocal), shapes["local_prior"], "local_prior", strict=True),
    }

    # ---- fixed noise: init + T per-step draws per prior, queued in the
    # order the reference's loop consumes them (t = T-1 .. 0)
    rng = np.random.RandomState(42)
    dg, dl = 128, n * 4
    init_g = rng.randn(b, dg).astype(np.float32)
    init_l = rng.randn(b, dl).astype(np.float32)
    steps_g = rng.randn(T, b, dg).astype(np.float32)
    steps_l = rng.randn(T, b, dl).astype(np.float32)
    queue = ([init_g.reshape(b, dg, 1, 1)]
             + [steps_g[t].reshape(b, dg, 1, 1) for t in range(T - 1, -1, -1)]
             + [init_l.reshape(b, dl, 1, 1)]
             + [steps_l[t].reshape(b, dl, 1, 1)
                for t in range(T - 1, -1, -1)])

    monkeypatch.setattr(torch, "randn", _QueueRandn(torch, queue))
    monkeypatch.setattr(torch, "ones", _device_safe(torch.ones))
    monkeypatch.setattr(torch, "tensor", _device_safe(torch.tensor))
    with torch.no_grad():
        image, nfe, _, _, output = generate_2prior(
            shape=tvae.latent_shape(), dae=[tglobal, tlocal],
            diffusion=tdiff, vae=tvae, num_samples=b,
            enable_autocast=False, ode_sample=0, prior_var=1.0,
            temp=1.0, vae_temp=1.0, ddim_step=0)
    assert not torch.randn.queue, "reference consumed fewer draws than fed"
    want_pts = image.numpy()
    want_eps_local = output["sampled_eps"].numpy().reshape(b, dl)

    out = lion.sample(num_samples=b, rng=jax.random.PRNGKey(0),
                      given_noise=((jnp.asarray(init_g),
                                    jnp.asarray(steps_g)),
                                   (jnp.asarray(init_l),
                                    jnp.asarray(steps_l))))
    got_pts = np.asarray(out["points"])
    got_eps_local = np.asarray(out["z_local"])

    assert got_pts.shape == want_pts.shape
    # T chained U-Net forwards accumulate fp32 noise; require closeness in
    # bulk and a small absolute band (same discipline as the module-parity
    # tests, scaled for depth)
    np.testing.assert_allclose(got_eps_local, want_eps_local,
                               atol=5e-3, rtol=5e-2)
    np.testing.assert_allclose(got_pts, want_pts, atol=5e-3, rtol=5e-2)
    assert np.mean(np.abs(got_pts - want_pts) > 1e-3) < 0.02
