"""Checkpoint import shim tests: the flax<->torch key translation round-trips
on a synthetic state dict generated from our own param structure (released
checkpoints are not available offline; the mapping is validated structurally
and numerically both ways)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lion_tpu.config import get_default_cfg
from lion_tpu.ckpt.torch_import import (build_key_map, export_state_dict,
                                        flatten_tree, import_state_dict,
                                        torch_to_flax_array)
from lion_tpu.models.registry import build_global_prior


def tiny_cfg():
    cfg = get_default_cfg()
    cfg.shapelatent.latent_dim = 1
    cfg.shapelatent.encoder_type = "models.latent_points_ada.PointTransPVC"
    cfg.shapelatent.decoder_type = "models.latent_points_ada.LatentPointDecPVC"
    cfg.sde.num_channels_dae = 32
    cfg.sde.num_cell_per_scale_dae = 2
    cfg.sde.embedding_dim = 16
    return cfg


def test_weight_transforms():
    # Linear
    w = np.arange(6, dtype=np.float32).reshape(2, 3)
    np.testing.assert_array_equal(torch_to_flax_array(w, (3, 2)), w.T)
    # Conv1d k=1
    w = np.arange(6, dtype=np.float32).reshape(2, 3, 1)
    np.testing.assert_array_equal(torch_to_flax_array(w, (3, 2)),
                                  w[:, :, 0].T)
    # Conv3d
    w = np.random.RandomState(0).randn(4, 2, 3, 3, 3).astype(np.float32)
    out = torch_to_flax_array(w, (3, 3, 3, 2, 4))
    assert out.shape == (3, 3, 3, 2, 4)
    np.testing.assert_array_equal(out[1, 2, 0], w[:, :, 1, 2, 0].T)
    # mixing logit (non-kernel leaf reshapes)
    w = np.random.RandomState(1).randn(1, 8, 1, 1).astype(np.float32)
    np.testing.assert_array_equal(
        torch_to_flax_array(w, (8,), leaf="mixing_logit"), w.reshape(-1))
    # square Linear weight still transposes
    w = np.random.RandomState(2).randn(4, 4).astype(np.float32)
    np.testing.assert_array_equal(torch_to_flax_array(w, (4, 4)), w.T)


def test_global_prior_key_map_and_roundtrip():
    cfg = tiny_cfg()
    prior = build_global_prior(cfg)
    params = prior.init(jax.random.PRNGKey(0), jnp.zeros((1, 128)),
                        jnp.ones((1,)))["params"]
    key_map = build_key_map(params, "global_prior", torch_prefix="0")
    tkeys = set(key_map.values())
    assert "0.input_layer.weight" in tkeys
    assert "0.all_modules.0.conv1.weight" in tkeys
    assert "0.all_modules.1.SE.fc.0.weight" in tkeys
    assert "0.temb_layer.0.weight" in tkeys
    assert "0.output_layer.bias" in tkeys
    # round trip: export -> import must reproduce the params exactly
    sd = export_state_dict(params, "global_prior", "0")
    shapes = jax.eval_shape(lambda: params)
    back = import_state_dict(sd, shapes, "global_prior", "0")
    flat_a, flat_b = flatten_tree(params), flatten_tree(back)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]), err_msg=str(k))


@pytest.mark.slow
def test_vae_key_map_and_roundtrip():
    from lion_tpu.models import VAE
    cfg = tiny_cfg()
    vae = VAE(cfg)

    def init():
        return vae.init({"params": jax.random.PRNGKey(0),
                         "sample": jax.random.PRNGKey(1)},
                        jnp.zeros((1, 2048, 3)))["params"]

    shapes = jax.eval_shape(init)
    key_map = build_key_map(shapes, "vae")
    tkeys = set(key_map.values())
    # spot-check torch keys against the reference module structure
    assert "style_encoder.mlp.weight" in tkeys
    assert "style_encoder.layers.0.0.voxel_layers.0.weight" in tkeys
    assert "style_encoder.layers.0.2.mlps.0.layers.0.weight" in tkeys
    assert "encoder.layers.sa_layers.0.0.voxel_layers.1.norm.weight" in tkeys
    assert "encoder.layers.sa_layers.0.0.voxel_layers.1.emd.weight" in tkeys
    assert "encoder.layers.sa_layers.3.mlps.0.layers.0.weight" in tkeys
    assert "encoder.layers.global_att.to_qkv.weight" in tkeys
    assert "encoder.layers.fp_layers.0.0.mlp.layers.0.weight" in tkeys
    assert "encoder.layers.classifier.0.layers.0.weight" in tkeys
    assert "encoder.layers.classifier.2.weight" in tkeys
    assert "decoder.layers.sa_layers.1.0.attn.to_qkv.weight" in tkeys
    # every flax leaf has a unique torch key
    assert len(tkeys) == len(key_map)


@pytest.mark.slow
def test_local_prior_key_map():
    from lion_tpu.models.registry import build_local_prior
    cfg = tiny_cfg()
    prior = build_local_prior(cfg)

    def init():
        return prior.init(jax.random.PRNGKey(0), jnp.zeros((1, 2048 * 4)),
                          jnp.ones((1,)),
                          condition_input=jnp.zeros((1, 128)))["params"]

    shapes = jax.eval_shape(init)
    key_map = build_key_map(shapes, "local_prior", torch_prefix="1")
    tkeys = set(key_map.values())
    assert "1.embedf.0.weight" in tkeys
    assert "1.embedf.2.weight" in tkeys
    assert "1.sa_layers.0.0.voxel_layers.0.weight" in tkeys
    assert "1.classifier.2.bias" in tkeys
    assert len(tkeys) == len(key_map)
