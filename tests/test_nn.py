"""Block tests: shapes, channel arithmetic vs the reference factory rules,
and numeric parity of the primitives against torch CPU equivalents."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lion_tpu.nn import (AdaGN, LinearAttention, PVConv, PointNetFPModule,
                         PointNetSAModule, PVCNN2Unet, SharedMLP,
                         build_fp_stages, build_sa_stages, timestep_embedding)

# the latent-points U-Net specs (models/latent_points_ada.py:177-188)
SA_BLOCKS = (
    ((32, 2, 32), (1024, 0.1, 32, (32, 64))),
    ((64, 3, 16), (256, 0.2, 32, (64, 128))),
    ((128, 3, 8), (64, 0.4, 32, (128, 256))),
    (None, (16, 0.8, 32, (128, 128, 128))),
)
FP_BLOCKS = (
    ((128, 128), (128, 3, 8)),
    ((128, 128), (128, 3, 8)),
    ((128, 128), (128, 2, 16)),
    ((128, 128, 64), (64, 2, 32)),
)


def test_sa_stage_spec_arithmetic():
    stages, sa_in, ch, ncenters = build_sa_stages(
        SA_BLOCKS, extra_feature_channels=0, input_dim=3, embed_dim=0,
        use_att=True)
    assert sa_in == [3, 64, 128, 256]
    assert ch == 128 and ncenters == 16
    # stage 0: both conv blocks exist; stages 1,2: single conv (ref quirk)
    assert len(stages[0].convs) == 2
    assert len(stages[1].convs) == 1
    assert len(stages[2].convs) == 1
    assert len(stages[3].convs) == 0
    # attention at (c+1) % 2 == 0 -> stages 1 and 3 (3 has no conv)
    assert not stages[0].convs[0].attention
    assert stages[1].convs[0].attention
    assert not stages[2].convs[0].attention


def test_fp_stage_spec_arithmetic():
    _, sa_in, ch, _ = build_sa_stages(SA_BLOCKS, 0, 3, 0, True)
    stages, ch_fp = build_fp_stages(FP_BLOCKS, ch, sa_in, 0)
    assert ch_fp == 64
    assert [len(s.convs) for s in stages] == [3, 3, 2, 2]
    assert all(not c.attention for s in stages for c in s.convs)


def test_adagn_torch_parity():
    """AdaGN == torch GroupNorm(8) * factor + bias with identical weights."""
    torch = pytest.importorskip("torch")
    b, n, c, sd = 2, 16, 32, 8
    rng = np.random.RandomState(0)
    x = rng.randn(b, n, c).astype(np.float32)
    style = rng.randn(b, sd).astype(np.float32)

    mod = AdaGN(n_channel=c, style_dim=sd)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(style))
    out = np.asarray(mod.apply(params, jnp.asarray(x), jnp.asarray(style)))

    w = np.asarray(params["params"]["emd"]["kernel"])  # (sd, 2c)
    bvec = np.asarray(params["params"]["emd"]["bias"])
    gn_scale = np.asarray(params["params"]["norm"]["scale"])
    gn_bias = np.asarray(params["params"]["norm"]["bias"])

    tx = torch.from_numpy(x).permute(0, 2, 1)  # (B, C, N)
    gn = torch.nn.GroupNorm(8, c)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(gn_scale))
        gn.bias.copy_(torch.from_numpy(gn_bias))
        s = torch.from_numpy(style) @ torch.from_numpy(w) \
            + torch.from_numpy(bvec)
        factor, bias = s.chunk(2, 1)
        want = gn(tx) * factor[:, :, None] + bias[:, :, None]
    np.testing.assert_allclose(out, want.permute(0, 2, 1).numpy(),
                               rtol=1e-4, atol=1e-5)


def test_groupnorm_grouping_matches_torch():
    """flax GroupNorm groups channels the same contiguous way as torch."""
    torch = pytest.importorskip("torch")
    import flax.linen as fnn
    b, n, c = 2, 10, 16
    x = np.random.RandomState(1).randn(b, n, c).astype(np.float32)
    mod = fnn.GroupNorm(num_groups=4, epsilon=1e-5)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(mod.apply(params, jnp.asarray(x)))
    tgn = torch.nn.GroupNorm(4, c)
    with torch.no_grad():
        tgn.weight.fill_(1.0)
        tgn.bias.fill_(0.0)
        want = tgn(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1)
    np.testing.assert_allclose(out, want.numpy(), rtol=1e-4, atol=1e-5)


def test_linear_attention_torch_parity():
    """LinearAttention matches the reference einsum math run in torch."""
    torch = pytest.importorskip("torch")
    b, n, c = 2, 12, 16
    heads, dim_head = 4, 8
    x = np.random.RandomState(2).randn(b, n, c).astype(np.float32)
    mod = LinearAttention(dim=c, heads=heads, dim_head=dim_head)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(mod.apply(params, jnp.asarray(x)))

    wqkv = np.asarray(params["params"]["to_qkv"]["kernel"])  # (C, 3hd)
    wout = np.asarray(params["params"]["to_out"]["kernel"])
    bout = np.asarray(params["params"]["to_out"]["bias"])

    tx = torch.from_numpy(x).permute(0, 2, 1)  # (B, C, N)
    qkv = torch.einsum("bcn,cd->bdn", tx, torch.from_numpy(wqkv))
    qkv = qkv.reshape(b, 3, heads, dim_head, n)
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]  # (B, h, d, N)
    k = k.softmax(dim=-1)
    context = torch.einsum("bhdn,bhen->bhde", k, v)
    o = torch.einsum("bhde,bhdn->bhen", context, q)
    o = o.reshape(b, heads * dim_head, n)
    want = torch.einsum("bcn,cd->bdn", o, torch.from_numpy(wout)) \
        + torch.from_numpy(bout)[None, :, None]
    np.testing.assert_allclose(out, want.permute(0, 2, 1).numpy(),
                               rtol=1e-3, atol=1e-4)


def test_timestep_embedding_matches_reference_formula():
    t = jnp.asarray([1.0, 500.0, 1000.0])
    emb = np.asarray(timestep_embedding(t, 64))
    half = 32
    freqs = np.exp(np.arange(half, dtype=np.float32)
                   * np.float32(-np.log(10000.0) / (half - 1)))
    args = (np.asarray(t, np.float32)[:, None] * freqs[None, :])
    want = np.concatenate([np.sin(args), np.cos(args)], -1)
    # fp32 sin/cos of args up to 1000 rad: allow argument-reduction slack
    np.testing.assert_allclose(emb, want, rtol=1e-4, atol=2e-4)


def test_pvconv_shapes():
    b, n = 2, 64
    feats = jnp.asarray(np.random.RandomState(3).randn(b, n, 8), jnp.float32)
    coords = jnp.asarray(np.random.RandomState(4).randn(b, n, 3), jnp.float32)
    style = jnp.asarray(np.random.RandomState(5).randn(b, 16), jnp.float32)
    mod = PVConv(out_channels=16, resolution=4, ada=True, style_dim=16)
    params = mod.init(jax.random.PRNGKey(0), feats, coords, style)
    out = mod.apply(params, feats, coords, style)
    assert out.shape == (b, n, 16)


def test_sa_module_shapes():
    b, n = 2, 64
    feats = jnp.asarray(np.random.RandomState(6).randn(b, n, 8), jnp.float32)
    coords = jnp.asarray(np.random.RandomState(7).randn(b, n, 3), jnp.float32)
    mod = PointNetSAModule(num_centers=16, radius=0.5, num_neighbors=8,
                           out_channels=(16, 32), ada=False)
    params = mod.init(jax.random.PRNGKey(0), feats, coords)
    out, centers = mod.apply(params, feats, coords)
    assert out.shape == (b, 16, 32)
    assert centers.shape == (b, 16, 3)


def test_fp_module_shapes():
    b, n, m = 2, 64, 16
    pc = jnp.asarray(np.random.RandomState(8).randn(b, n, 3), jnp.float32)
    cc = jnp.asarray(np.random.RandomState(9).randn(b, m, 3), jnp.float32)
    cf = jnp.asarray(np.random.RandomState(10).randn(b, m, 32), jnp.float32)
    pf = jnp.asarray(np.random.RandomState(11).randn(b, n, 8), jnp.float32)
    mod = PointNetFPModule(out_channels=(64, 64), ada=False)
    params = mod.init(jax.random.PRNGKey(0), pc, cc, cf, pf)
    out = mod.apply(params, pc, cc, cf, pf)
    assert out.shape == (b, n, 64)


@pytest.mark.slow
def test_unet_forward_shapes():
    """Full latent-points U-Net (tiny N to keep CPU time sane)."""
    b, n = 1, 2048
    zdim = 1
    num_classes = 2 * zdim + 3 * 2  # PointTransPVC head
    x = jnp.asarray(np.random.RandomState(12).randn(b, n, 3), jnp.float32)
    style = jnp.asarray(np.random.RandomState(13).randn(b, 128), jnp.float32)
    mod = PVCNN2Unet(num_classes=num_classes, sa_blocks=SA_BLOCKS,
                     fp_blocks=FP_BLOCKS, embed_dim=0, use_att=True,
                     extra_feature_channels=0, ada=True, style_dim=128)
    params = mod.init(jax.random.PRNGKey(0), x, style=style)
    out = mod.apply(params, x, style=style)
    assert out.shape == (b, n, num_classes)
    assert np.isfinite(np.asarray(out)).all()


def test_pvconv_fused_eval_matches_modular():
    """Eval flow folds GN/AdaGN/SE/conv-bias into per-channel affines
    (pvconv.py fused branch); must match the modular math."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from lion_tpu.nn.pvconv import PVConv

    rng = np.random.RandomState(11)
    feats = jnp.asarray(rng.randn(2, 64, 16).astype(np.float32))
    coords = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    style = jnp.asarray(rng.randn(2, 32).astype(np.float32))

    for ada in (False, True):
        m = PVConv(out_channels=16, resolution=8, dropout=0.0, ada=ada,
                   style_dim=32)
        p = m.init(jax.random.PRNGKey(0), feats, coords,
                   style if ada else None)
        fused = m.apply(p, feats, coords, style if ada else None,
                        train=False)
        modular = m.apply(p, feats, coords, style if ada else None,
                          train=True, rngs={"dropout": jax.random.PRNGKey(1)})
        np.testing.assert_allclose(np.asarray(fused), np.asarray(modular),
                                   rtol=2e-2, atol=2e-2)


def test_sa_module_fused_matches_modular(monkeypatch):
    """The fused SA branch (ops/pallas/sa_fused.py) creates the same param
    tree as the modular branch and matches its output at bf16-level
    tolerance (interpret mode stands in for the TPU backend)."""
    from jax.experimental.pallas import tpu as pltpu
    from lion_tpu.nn.pointnet import PointNetSAModule

    mod = PointNetSAModule(16, 0.5, 8, (16, 24), ada=True,
                           dtype=jnp.bfloat16)
    rng = np.random.RandomState(7)
    feats = jnp.asarray(rng.randn(2, 64, 8).astype(np.float32)
                        ).astype(jnp.bfloat16)
    coords = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
    style = jnp.asarray(rng.randn(2, 128).astype(np.float32))

    params = mod.init(jax.random.PRNGKey(0), feats, coords, style, True)
    out_mod, ctr_mod = mod.apply(params, feats, coords, style, True)

    monkeypatch.setattr(PointNetSAModule, "_fused_ok",
                        lambda self, *a: True)
    with pltpu.force_tpu_interpret_mode():
        params_f = mod.init(jax.random.PRNGKey(0), feats, coords, style,
                            False)
        out_fus, ctr_fus = mod.apply(params, feats, coords, style, False)

    assert jax.tree_util.tree_structure(params) \
        == jax.tree_util.tree_structure(params_f)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params_f)):
        assert a.shape == b.shape and a.dtype == b.dtype

    np.testing.assert_array_equal(np.asarray(ctr_mod), np.asarray(ctr_fus))
    err = np.abs(np.asarray(out_mod, np.float32)
                 - np.asarray(out_fus, np.float32))
    assert np.quantile(err, 0.99) < 8e-2, np.quantile(err, 0.99)
    assert err.max() < 0.5, err.max()
