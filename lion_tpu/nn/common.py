"""Common neural building blocks (Flax linen, channels-last).

Reference: models/pvcnn2.py + models/pvcnn2_ada.py + models/adagn.py +
models/dense.py. Everything here is channels-LAST ((B, N, C) points,
(B, R, R, R, C) voxel grids) so Dense/Conv contract the channel dim on the
MXU and grids run NDHWC, which is what XLA:TPU prefers.

Weight-layout notes for the torch checkpoint import shim (lion_tpu/ckpt):
  torch Conv1d/Conv2d 1x1 (O, I, 1[, 1]) -> Dense kernel (I, O) transpose;
  torch Conv3d (O, I, 3, 3, 3)           -> Conv kernel (3, 3, 3, I, O);
  torch GroupNorm weight/bias            -> scale/bias unchanged.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


def swish(x):
    return x * jax.nn.sigmoid(x)


def variance_scaling_init(scale: float = 1.0):
    """models/dense.py:60-68 `variance_scaling_init_`: uniform fan_avg.

    var = scale / fan_avg; bound = sqrt(3 * var). Exactly
    jax.nn.initializers.variance_scaling(scale, 'fan_avg', 'uniform').
    """
    return jax.nn.initializers.variance_scaling(
        1e-10 if scale == 0 else scale, "fan_avg", "uniform")


# torch nn.Linear / nn.Conv default init: kaiming_uniform(a=sqrt(5)) for the
# weight == U(-1/sqrt(fan_in), 1/sqrt(fan_in)) == variance_scaling(1/3,
# fan_in, uniform); bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)). Matching it
# matters: flax's hotter lecun_normal default makes exp(log_sigma) paths of
# the VAE overflow fp32 at init (and init parity helps training parity).
TORCH_KERNEL_INIT = jax.nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def TDense(features: int, fan_in: int, use_bias: bool = True,
           name: str = None, dtype=None) -> nn.Dense:
    """nn.Dense with torch nn.Linear's default init. `dtype` is the compute
    dtype (params stay fp32); pass jnp.bfloat16 for the bf16 path."""
    return nn.Dense(features, use_bias=use_bias,
                    kernel_init=TORCH_KERNEL_INIT,
                    bias_init=torch_bias_init(fan_in), name=name,
                    dtype=dtype)


class Conv3dSame(nn.Module):
    """SAME 3D conv (NDHWC) with torch nn.Conv3d's default init.

    Drop-in for nn.Conv (same `kernel`/`bias` param names and layouts, so
    the torch checkpoint shim is unaffected) but routes k=3 through the
    plane-matmul Pallas kernel on TPU (ops/pallas/conv3d.py) — XLA's direct
    conv emitter underfills the MXU at the PVConv channel counts (32-128).
    """
    features: int
    fan_in_channels: int
    kernel_size: int = 3
    dtype: Optional[type] = None

    @nn.compact
    def __call__(self, x, *, fused: bool = False, in_affine=None,
                 pre_swish: bool = False, params_only: bool = False):
        """Standard call: y = conv(x) + bias.

        `fused=True` (eval/sampling only, not differentiable): returns
        (y_raw, stats, bias) where y_raw = conv(swish(x*s + b)) WITHOUT the
        conv bias, stats = per-channel (sum, sumsq) of y_raw over spatial
        dims, and bias is the conv bias value — the caller folds bias into
        the next norm's affine (nn/pvconv.py fused flow).

        `params_only=True` (x may be None): return (kernel, bias) without
        computing — the conv-pair fused kernel consumes raw weights.
        """
        k = self.kernel_size
        in_ch = self.fan_in_channels if x is None else x.shape[-1]
        kernel = self.param(
            "kernel", TORCH_KERNEL_INIT,
            (k, k, k, in_ch, self.features), jnp.float32)
        bias = self.param(
            "bias", torch_bias_init(self.fan_in_channels * k ** 3),
            (self.features,), jnp.float32)
        if params_only:
            return kernel, bias
        dt = self.dtype or x.dtype
        x = x.astype(dt)
        if fused:
            assert k == 3
            sc, bi = (None, None) if in_affine is None else in_affine
            b, r = x.shape[0], x.shape[1]
            from ..ops.pallas.conv3d_packed import (supports_packed,
                                                    supports_packed_small)
            if (jax.default_backend() == "tpu"
                    and (supports_packed(r, x.shape[-1], self.features)
                         or supports_packed_small(r, x.shape[-1],
                                                  self.features))):
                # packed-layout kernel: the reshapes below cancel against
                # voxelize/devoxelize's own (B,R^2,R*C) <-> NDHWC reshapes
                # under XLA, so the r>=16 voxel pipeline runs with
                # zero retiling passes
                from ..ops.pallas.conv3d_packed import conv3d_packed_fused
                xp = x.reshape(b, r * r, r * x.shape[-1])
                y, st = conv3d_packed_fused(
                    xp, kernel.astype(dt), r, in_scale=sc, in_bias=bi,
                    pre_swish=pre_swish, want_stats=True)
                y = y.reshape(b, r, r, r, self.features)
                return y, st, bias
            from ..ops.pallas.conv3d import conv3d_3x3_fused
            y, st = conv3d_3x3_fused(x, kernel.astype(dt), in_scale=sc,
                                     in_bias=bi, pre_swish=pre_swish,
                                     want_stats=True)
            return y, st, bias
        if k == 3:
            from ..ops.pallas.conv3d import conv3d_3x3_same
            y = conv3d_3x3_same(x, kernel.astype(dt))
        else:
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(dt), (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return y + bias.astype(y.dtype)


def TConv3d(features: int, fan_in_channels: int, kernel_size: int,
            name: str = None, dtype=None) -> Conv3dSame:
    """Conv3dSame (NDHWC) with torch nn.Conv3d's default init; fan_in =
    in_channels * k^3."""
    return Conv3dSame(features, fan_in_channels, kernel_size,
                      dtype=dtype, name=name)


class GroupNorm8(nn.Module):
    """GroupNorm(8, C) with torch defaults (eps=1e-5, affine)."""
    num_groups: int = 8
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=self.num_groups,
                            epsilon=self.epsilon, name="gn")(x)


class AdaGN(nn.Module):
    """Adaptive GroupNorm (models/adagn.py:19-65).

    GroupNorm(8, C), then per-channel (factor, bias) from a style vector via
    a variance-scaling-initialized Dense whose bias starts at (1, 0) so the
    layer is identity-ish at init. Works for any rank: style broadcasts over
    all non-channel dims.
    """
    n_channel: int
    style_dim: int = 128
    init_scale: float = 1.0
    dtype: Optional[type] = None

    @nn.compact
    def __call__(self, x, style, affine_stats=None, count=None,
                 conv_bias=None):
        # x: (B, ..., C); style: (B, style_dim)
        assert style.ndim == 2, f"style must be (B, D), got {style.shape}"

        def bias_init(key, shape, dtype=jnp.float32):
            del key
            c = self.n_channel
            return jnp.concatenate([jnp.ones((c,), dtype),
                                    jnp.zeros((shape[0] - c,), dtype)])

        emd = nn.Dense(self.n_channel * 2,
                       kernel_init=variance_scaling_init(self.init_scale),
                       bias_init=bias_init, name="emd")
        s = emd(style.astype(jnp.float32))
        factor, bias = jnp.split(s, 2, axis=-1)
        if x is None and affine_stats is None:
            # channel-affine mode (fused SA path): the POST-normalization
            # per-channel (scale, bias) folding GN affine + style:
            # AdaGN(x) == GN0(x) * ca + cb with GN0 parameter-free
            gw, gb = _GNAffineParams(self.n_channel, name="norm")()
            return gw[None] * factor, gb[None] * factor + bias
        if affine_stats is not None:
            # fused eval path: fold GN + style affine into (scale, bias)
            gw, gb = _GNAffineParams(self.n_channel, name="norm")()
            sc, bi = gn_affine_from_stats(
                affine_stats[:, 0, :], affine_stats[:, 1, :], count, gw, gb,
                pre_bias=conv_bias)
            return sc * factor, bi * factor + bias
        # broadcast (B, 2C) over x's middle dims
        extra = x.ndim - 2
        shape = (x.shape[0],) + (1,) * extra + (self.n_channel,)
        # dtype keeps the bf16 path bf16 (flax otherwise promotes the
        # output back to fp32 via the param dtype); stats stay fp32 inside
        out = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=self.dtype,
                           name="norm")(x)
        return out * factor.reshape(shape).astype(out.dtype) \
            + bias.reshape(shape).astype(out.dtype)


class _DenseParams(nn.Module):
    """Bare Dense params (same names/shapes/init as TDense) for fused
    eval paths that consume the raw kernel/bias instead of applying the
    layer."""
    features: int
    fan_in: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", TORCH_KERNEL_INIT,
                       (self.fan_in, self.features), jnp.float32)
        b = self.param("bias", torch_bias_init(self.fan_in),
                       (self.features,), jnp.float32)
        return k, b


class _GNAffineParams(nn.Module):
    """Bare GroupNorm affine params (same names/shapes/init as
    nn.GroupNorm's scale/bias) so the fused eval path can fold the norm
    into a per-channel affine without touching the full tensor."""
    features: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", jax.nn.initializers.ones,
                           (self.features,), jnp.float32),
                self.param("bias", jax.nn.initializers.zeros,
                           (self.features,), jnp.float32))


def gn_affine_from_stats(s1, s2, count, gn_scale, gn_bias, pre_bias=None,
                         groups: int = 8, eps: float = 1e-5):
    """Fold GroupNorm into per-channel (scale, bias) from raw statistics.

    s1/s2 (B, C): per-channel sum and sum-of-squares of the RAW tensor y
    over spatial dims (count elements per channel). pre_bias (C,) is an
    additive constant folded in (the conv bias): the norm is taken of
    y + pre_bias. Returns (scale, bias) (B, C) fp32 with
    GN(y + pre_bias) == scale * y + bias.
    """
    b, c = s1.shape
    mean_c = s1 / count
    if pre_bias is not None:
        mean_c = mean_c + pre_bias[None, :]
    # E[(y+b)^2] = E[y^2] + 2 b E[y] + b^2
    ex2_c = s2 / count
    if pre_bias is not None:
        ex2_c = (ex2_c + 2.0 * pre_bias[None, :] * (s1 / count)
                 + pre_bias[None, :] ** 2)
    gmean = jnp.mean(mean_c.reshape(b, groups, c // groups), axis=2)
    gex2 = jnp.mean(ex2_c.reshape(b, groups, c // groups), axis=2)
    gvar = jnp.maximum(gex2 - gmean ** 2, 0.0)
    rs = jax.lax.rsqrt(gvar + eps)                        # (B, G)
    rs_c = jnp.repeat(rs, c // groups, axis=1)            # (B, C)
    mu_c = jnp.repeat(gmean, c // groups, axis=1)
    scale = rs_c * gn_scale[None, :]
    bias = gn_bias[None, :] - mu_c * scale
    if pre_bias is not None:
        bias = bias + pre_bias[None, :] * scale
    return scale, bias


class Normalizer(nn.Module):
    """GroupNorm or AdaGN, picked by whether a style is provided.

    Lets the same block code serve models/pvcnn2.py (plain) and
    models/pvcnn2_ada.py (style-conditioned) variants.
    """
    n_channel: int
    ada: bool = False
    style_dim: int = 128
    init_scale: float = 1.0
    dtype: Optional[type] = None

    @nn.compact
    def __call__(self, x, style=None, affine_stats=None, count=None,
                 conv_bias=None):
        """Modular: normalize x. Fused eval (affine_stats (B, 2, C) given):
        return per-channel (scale, bias) (B, C) fp32 folding this norm —
        and the additive conv_bias (C,) — over the raw-stats tensor.
        Channel-affine mode (x is None, no stats): return the
        POST-normalization per-channel (ca, cb) with Norm(x) ==
        GN0(x) * ca + cb (plain GN returns (1, C); AdaGN (B, C)).
        All modes create identical params."""
        if self.ada:
            assert style is not None, "AdaGN requires style"
            return AdaGN(self.n_channel, self.style_dim, self.init_scale,
                         dtype=self.dtype, name="ada")(
                x, style, affine_stats=affine_stats, count=count,
                conv_bias=conv_bias)
        if x is None and affine_stats is None:
            gw, gb = _GNAffineParams(self.n_channel, name="gn")()
            return gw[None], gb[None]
        if affine_stats is not None:
            gw, gb = _GNAffineParams(self.n_channel, name="gn")()
            return gn_affine_from_stats(
                affine_stats[:, 0, :], affine_stats[:, 1, :], count, gw, gb,
                pre_bias=conv_bias)
        return nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=self.dtype,
                            name="gn")(x)


class SE(nn.Module):
    """Squeeze-excite over all spatial dims (models/pvcnn2.py:24-37 SE3d and
    models/score_sde/resnet.py:16-27 SE; identical math, any rank)."""
    channel: int
    reduction: int = 8

    @nn.compact
    def __call__(self, x, pooled=None):
        # x: (B, ..., C); pooled (B, C): fused eval path — return the
        # (B, C) gate computed from the given pooled means instead of
        # pooling and applying (params identical either way)
        gate_only = pooled is not None
        if not gate_only:
            axes = tuple(range(1, x.ndim - 1))
            pooled = jnp.mean(x, axis=axes) if axes else x
        h = TDense(self.channel // self.reduction, self.channel,
                   use_bias=False, name="fc1")(pooled)
        h = jax.nn.relu(h)
        h = TDense(self.channel, self.channel // self.reduction,
                   use_bias=False, name="fc2")(h)
        gate = jax.nn.sigmoid(h)
        if gate_only:
            return gate
        shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (self.channel,)
        return x * gate.reshape(shape).astype(x.dtype)


class LinearAttention(nn.Module):
    """Efficient softmax(k)@v attention (models/pvcnn2.py:39-67).

    O(N * d^2): softmax over the POINT axis of k, then two einsum
    contractions that both ride the MXU.
    """
    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: Optional[type] = None

    @nn.compact
    def __call__(self, x):
        # x: (B, N, C)
        b, n, _ = x.shape
        h, d = self.heads, self.dim_head
        qkv = TDense(h * d * 3, x.shape[-1], use_bias=False,
                     name="to_qkv", dtype=self.dtype)(x)
        # torch layout '(qkv heads c)' -> leading split is qkv, then heads
        qkv = qkv.reshape(b, n, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, h, d)
        k = jax.nn.softmax(k.astype(jnp.float32), axis=1).astype(k.dtype)
        context = jnp.einsum("bnhd,bnhe->bhde", k, v)
        out = jnp.einsum("bhde,bnhd->bnhe", context, q)
        out = out.reshape(b, n, h * d)
        return TDense(self.dim, h * d, name="to_out",
                      dtype=self.dtype)(out)


class SharedMLP(nn.Module):
    """Per-point MLP: [Dense -> (Ada)GN(8) -> Swish] x len(out_channels).

    Reference: models/pvcnn2.py:117-139 / models/pvcnn2_ada.py:120-164.
    Works on (B, N, C) or (B, M, K, C) (the dim=1 / dim=2 conv variants are
    the same op in channels-last).
    """
    out_channels: Sequence[int]
    ada: bool = False
    style_dim: int = 128
    init_scale: float = 1.0
    dtype: Optional[type] = None

    @nn.compact
    def __call__(self, x, style=None, fold_in_features: int = None):
        """Modular: apply the MLP to x. Fold mode (x is None,
        fold_in_features = input channel count): return a list of
        (kernel (Cin, C), bias (C,), ca, cb) per layer for fused-kernel
        consumers, where layer(x) == swish(GN0(x @ kernel + bias) * ca
        + cb). Creates the same params either way."""
        if x is None:
            layers = []
            cin = fold_in_features
            for i, oc in enumerate(self.out_channels):
                kern, bias = _DenseParams(oc, cin, name=f"conv{i}")()
                ca, cb = Normalizer(oc, self.ada, self.style_dim,
                                    self.init_scale, dtype=self.dtype,
                                    name=f"norm{i}")(None, style)
                layers.append((kern, bias, ca, cb))
                cin = oc
            return layers
        for i, oc in enumerate(self.out_channels):
            x = TDense(oc, x.shape[-1], name=f"conv{i}",
                       dtype=self.dtype)(x)
            x = Normalizer(oc, self.ada, self.style_dim, self.init_scale,
                           dtype=self.dtype, name=f"norm{i}")(x, style)
            x = swish(x)
        return x


def timestep_embedding(timesteps: jnp.ndarray, embed_dim: int,
                       scale: float = 1.0) -> jnp.ndarray:
    """Sinusoidal embedding (models/latent_points_ada.py:101-115 and
    models/utils.py:16-31 PositionalEmbedding; identical math)."""
    timesteps = timesteps.astype(jnp.float32) * scale
    half = embed_dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                    * (-jnp.log(10000.0) / (half - 1)))
    args = timesteps[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if embed_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class RandomFourierEmbedding(nn.Module):
    """models/utils.py:34-41 (non-trainable random projection)."""
    embedding_dim: int
    scale: float

    @nn.compact
    def __call__(self, timesteps):
        w = self.param(
            "w", lambda key, shape: jax.random.normal(key, shape) * self.scale,
            (1, self.embedding_dim // 2))
        w = jax.lax.stop_gradient(w)
        emb = timesteps.astype(jnp.float32)[:, None] \
            * (w[0] * (2.0 * 3.14159265359))[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
