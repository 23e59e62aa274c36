"""Model-level torch <-> flax parity (VERDICT round-2 item 3).

The reference's global prior (models/score_sde/resnet.py) is pure torch —
no CUDA extensions — so it imports on CPU with a loguru stub. These tests
build the REAL reference torch module, export its random-init state_dict,
import it through ckpt/torch_import (strict mode), and assert forward
outputs match at fp32 tolerance: the import shim + our GlobalPrior are
proven equivalent to the reference up to real released weights.

The local prior / VAE torch modules need the pvcnn CUDA extensions and
cannot be constructed here; their shim coverage is the strict-mode
export -> import bijection round-trip (test_export_import_roundtrip) on
top of the existing layer-level parity tests (tests/test_nn.py AdaGN).
"""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_modules():
    """Import the reference torch prior with a loguru stub; restore
    sys.path afterwards (modules stay cached under their ref names)."""
    if "loguru" not in sys.modules:
        stub = types.ModuleType("loguru")

        class _L:
            def __getattr__(self, k):
                return lambda *a, **kw: None

        stub.logger = _L()
        sys.modules["loguru"] = stub
    sys.path.insert(0, REF)
    try:
        from models.score_sde.resnet import PriorSEDrop  # noqa
        from default_config import cfg as ref_cfg
    finally:
        sys.path.remove(REF)
    return PriorSEDrop, ref_cfg


def _tiny_sde(ref_cfg, nf=256, blocks=2, emb=64):
    c = ref_cfg.clone()
    c.defrost()
    c.sde.num_channels_dae = nf
    c.sde.num_cell_per_scale_dae = blocks
    c.sde.embedding_dim = emb
    c.sde.dropout = 0.2
    c.sde.mixed_prediction = True
    c.sde.embedding_type = "positional"
    c.sde.embedding_scale = 1.0
    return c


def test_global_prior_torch_forward_parity(ref_modules):
    """Reference PriorSEDrop (torch, random init) -> strict import ->
    our GlobalPrior: identical eps predictions."""
    import torch
    PriorSEDrop, ref_cfg = ref_modules
    rc = _tiny_sde(ref_cfg)
    torch.manual_seed(0)
    tmodel = PriorSEDrop(rc.sde, 128, rc)
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    from lion_tpu.config import get_default_cfg
    from lion_tpu.models.registry import build_global_prior
    from lion_tpu.ckpt.torch_import import import_state_dict

    cfg = get_default_cfg()
    cfg.sde.num_channels_dae = 256
    cfg.sde.num_cell_per_scale_dae = 2
    cfg.sde.embedding_dim = 64
    cfg.sde.dropout = 0.2
    cfg.sde.mixed_prediction = True
    prior = build_global_prior(cfg)
    shapes = jax.eval_shape(
        lambda: prior.init(jax.random.PRNGKey(0), jnp.zeros((1, 128)),
                           jnp.ones((1,)))["params"])
    params = import_state_dict(sd, shapes, "global_prior", strict=True)

    rng = np.random.RandomState(3)
    x = rng.randn(4, 128).astype(np.float32)
    for tval in (1.0, 57.0, 501.0, 1000.0):
        t = np.full((4,), tval, np.float32)
        with torch.no_grad():
            want = tmodel(torch.from_numpy(x)[:, :, None, None],
                          torch.from_numpy(t))[:, :, 0, 0].numpy()
        got = np.asarray(prior.apply({"params": params}, jnp.asarray(x),
                                     jnp.asarray(t)))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_strict_import_rejects_mismatches(ref_modules):
    """Strict mode: unconsumed torch keys and missing torch keys both
    raise (VERDICT item 3: no silent key mismatch)."""
    import torch
    PriorSEDrop, ref_cfg = ref_modules
    rc = _tiny_sde(ref_cfg)
    torch.manual_seed(0)
    tmodel = PriorSEDrop(rc.sde, 128, rc)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    from lion_tpu.config import get_default_cfg
    from lion_tpu.models.registry import build_global_prior
    from lion_tpu.ckpt.torch_import import import_state_dict

    cfg = get_default_cfg()
    cfg.sde.num_channels_dae = 256
    cfg.sde.num_cell_per_scale_dae = 2
    cfg.sde.embedding_dim = 64
    cfg.sde.mixed_prediction = True
    prior = build_global_prior(cfg)
    shapes = jax.eval_shape(
        lambda: prior.init(jax.random.PRNGKey(0), jnp.zeros((1, 128)),
                           jnp.ones((1,)))["params"])

    extra = dict(sd)
    extra["all_modules.0.conv_extra.weight"] = np.zeros((4, 4), np.float32)
    with pytest.raises(KeyError, match="not consumed"):
        import_state_dict(extra, shapes, "global_prior", strict=True)

    short = dict(sd)
    short.pop("input_layer.weight")
    with pytest.raises(KeyError, match="missing"):
        import_state_dict(short, shapes, "global_prior", strict=True)

    # non-strict salvages what it can
    import_state_dict(extra, shapes, "global_prior", strict=False)


def test_export_import_roundtrip_strict():
    """flax -> torch-schema export -> strict import is the identity for
    ALL THREE models (the shim is a bijection on the full key set)."""
    from lion_tpu.config import get_default_cfg
    from lion_tpu.ckpt.torch_import import (export_state_dict,
                                            import_state_dict)
    from lion_tpu.models.lion import LION

    cfg = get_default_cfg()
    cfg.data.tr_max_sample_points = 32
    cfg.shapelatent.latent_dim = 1
    cfg.shapelatent.encoder_type = \
        "models.latent_points_ada.PointTransPVC"
    cfg.shapelatent.decoder_type = \
        "models.latent_points_ada.LatentPointDecPVC"
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
    lion = LION(cfg)
    params = lion.init_params(jax.random.PRNGKey(0))

    for model, prefix in (("vae", ""), ("global_prior", "0"),
                          ("local_prior", "1")):
        sd = export_state_dict(params[model], model, torch_prefix=prefix)
        shapes = jax.eval_shape(lambda m=model: params[m])
        back = import_state_dict(sd, shapes, model, torch_prefix=prefix,
                                 strict=True)
        flat_a = jax.tree_util.tree_leaves(params[model])
        flat_b = jax.tree_util.tree_leaves(back)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
