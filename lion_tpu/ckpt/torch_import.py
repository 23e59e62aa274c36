"""Torch checkpoint import shim.

Released LION checkpoints are torch .pt files with 'dae_state_dict' (a
ModuleList: '0.*' = global prior, '1.*' = local prior) and 'vae_state_dict'
(models/lion.py:30-35, trainers/train_prior.py:294-350). This module maps
those keys onto our flax param trees.

Key translation is STRUCTURAL: we walk the flax param tree (obtained shape-
only via jax.eval_shape, no compute) and derive each leaf's torch key from
the module naming conventions of both sides. Weight transforms are inferred
from the torch tensor's rank:
    Linear  (O, I)          -> kernel (I, O)
    Conv1d  (O, I, 1)       -> kernel (I, O)
    Conv2d  (O, I, 1, 1)    -> kernel (I, O)
    Conv3d  (O, I, k, k, k) -> kernel (k, k, k, I, O)
    GroupNorm weight/bias   -> scale/bias unchanged
    mixing_logit (1,C,1,1)  -> (C,) flattened
"""
from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- helpers
def flatten_tree(tree, prefix=()) -> Dict[Tuple[str, ...], Any]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict) or hasattr(v, "items"):
            out.update(flatten_tree(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def unflatten_tree(flat: Dict[Tuple[str, ...], Any]):
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def torch_to_flax_array(t: np.ndarray, flax_shape,
                        leaf: str = "kernel") -> np.ndarray:
    """Rank+leaf-driven weight transform torch -> flax. `leaf` is the flax
    param name: only 'kernel' leaves transpose (scale/bias/w pass through,
    so square Linear weights aren't ambiguous)."""
    a = np.asarray(t)
    fs = tuple(flax_shape)
    if leaf != "kernel":
        if a.shape != fs:  # e.g. mixing_logit (1,C,1,1) -> (C,)
            return a.reshape(fs)
        return a
    if a.ndim == 2:  # Linear
        return a.T
    if a.ndim == 3 and a.shape[-1] == 1:  # Conv1d k=1
        return a[:, :, 0].T
    if a.ndim == 4 and a.shape[-1] == 1 and a.shape[-2] == 1:  # Conv2d 1x1
        return a[:, :, 0, 0].T
    if a.ndim == 5:  # Conv3d
        return a.transpose(2, 3, 4, 1, 0)
    raise ValueError(f"Cannot map torch shape {a.shape} to flax {fs}")


def flax_to_torch_array(a: np.ndarray, torch_shape) -> np.ndarray:
    a = np.asarray(a)
    ts = tuple(torch_shape)
    if a.shape == ts:
        return a
    if len(ts) == 2:
        return a.T
    if len(ts) == 3 and ts[-1] == 1:
        return a.T[:, :, None]
    if len(ts) == 4 and ts[-1] == 1 and ts[-2] == 1:
        return a.T[:, :, None, None]
    if len(ts) == 5:
        return a.transpose(4, 3, 0, 1, 2)
    if len(ts) == 4 and a.ndim == 1:
        return a.reshape(ts)
    raise ValueError(f"Cannot map flax shape {a.shape} to torch {ts}")


# ------------------------------------------------------- key translation
def _shared_mlp_key(rest: Tuple[str, ...], torch_prefix: str) -> str:
    """Map SharedMLP leaf path (conv{i}|norm{i}/...) under `torch_prefix`
    (which should point at the SharedMLP module, keys under `.layers`)."""
    head = rest[0]
    m = re.fullmatch(r"(conv|norm)(\d+)", head)
    assert m, rest
    kind, idx = m.group(1), int(m.group(2))
    if kind == "conv":
        return f"{torch_prefix}.layers.{3 * idx}.{_wb(rest[-1])}"
    # norm: plain -> GroupNorm at layers.{3i+1}; ada -> AdaGN there
    if rest[1] == "gn":
        return f"{torch_prefix}.layers.{3 * idx + 1}.{_wb(rest[-1])}"
    assert rest[1] == "ada", rest
    if rest[2] == "norm":
        return f"{torch_prefix}.layers.{3 * idx + 1}.norm.{_wb(rest[-1])}"
    assert rest[2] == "emd", rest
    return f"{torch_prefix}.layers.{3 * idx + 1}.emd.{_wb(rest[-1])}"


def _wb(leaf: str) -> str:
    return {"kernel": "weight", "scale": "weight",
            "bias": "bias", "w": "w"}[leaf]


def _norm_key(rest: Tuple[str, ...], torch_prefix: str) -> str:
    """Normalizer/AdaGN under a PVConv voxel branch position."""
    if rest[0] == "gn":
        return f"{torch_prefix}.{_wb(rest[-1])}"
    assert rest[0] == "ada", rest
    if rest[1] == "norm":
        return f"{torch_prefix}.norm.{_wb(rest[-1])}"
    return f"{torch_prefix}.emd.{_wb(rest[-1])}"


def _pvconv_key(rest: Tuple[str, ...], torch_prefix: str) -> str:
    head = rest[0]
    if head == "vconv0":
        return f"{torch_prefix}.voxel_layers.0.{_wb(rest[-1])}"
    if head == "vnorm0":
        return _norm_key(rest[1:], f"{torch_prefix}.voxel_layers.1")
    if head == "vconv1":
        return f"{torch_prefix}.voxel_layers.4.{_wb(rest[-1])}"
    if head == "vnorm1":
        return _norm_key(rest[1:], f"{torch_prefix}.voxel_layers.5")
    if head == "se":
        sub = {"fc1": "fc.0", "fc2": "fc.2"}[rest[1]]
        return f"{torch_prefix}.voxel_layers.6.{sub}.{_wb(rest[-1])}"
    if head == "point_features":
        return _shared_mlp_key(rest[1:], f"{torch_prefix}.point_features")
    if head == "attn":
        return f"{torch_prefix}.attn.{rest[1]}.{_wb(rest[-1])}"
    raise KeyError(rest)


def _sa_module_key(rest: Tuple[str, ...], torch_prefix: str) -> str:
    m = re.fullmatch(r"mlp(\d+)", rest[0])
    assert m, rest
    return _shared_mlp_key(rest[1:], f"{torch_prefix}.mlps.{m.group(1)}")


def _attn_key(rest: Tuple[str, ...], torch_prefix: str) -> str:
    return f"{torch_prefix}.{rest[0]}.{_wb(rest[-1])}"


def translate_unet_path(path: Tuple[str, ...], stage_blocks: Dict[str, int],
                        torch_prefix: str = "") -> str:
    """Translate one flax leaf path of a PVCNN2Unet into its torch key.

    stage_blocks: {'sa{i}': total_block_count, 'fp{i}': total} used to decide
    whether a stage is an nn.Sequential (index prefix) or a bare module.
    """
    p = torch_prefix + "." if torch_prefix else ""
    head = path[0]
    m = re.fullmatch(r"sa(\d+)_conv(\d+)", head)
    if m:
        i, j = int(m.group(1)), int(m.group(2))
        total = stage_blocks[f"sa{i}"]
        base = f"{p}sa_layers.{i}" + (f".{j}" if total > 1 else "")
        if path[1].startswith("conv") or path[1].startswith("norm"):
            return _shared_mlp_key(path[1:], base)  # SharedMLP block
        return _pvconv_key(path[1:], base)
    m = re.fullmatch(r"sa(\d+)_sa", head)
    if m:
        i = int(m.group(1))
        total = stage_blocks[f"sa{i}"]
        pos = total - 1
        base = f"{p}sa_layers.{i}" + (f".{pos}" if total > 1 else "")
        return _sa_module_key(path[1:], base)
    if head == "global_att":
        return _attn_key(path[1:], f"{p}global_att")
    m = re.fullmatch(r"fp(\d+)_fp", head)
    if m:
        i = int(m.group(1))
        total = stage_blocks[f"fp{i}"]
        base = f"{p}fp_layers.{i}" + (".0" if total > 1 else "")
        assert path[1] == "mlp"
        return _shared_mlp_key(path[2:], f"{base}.mlp")
    m = re.fullmatch(r"fp(\d+)_conv(\d+)", head)
    if m:
        i, j = int(m.group(1)), int(m.group(2))
        base = f"{p}fp_layers.{i}.{j + 1}"
        if path[1].startswith("conv") or path[1].startswith("norm"):
            return _shared_mlp_key(path[1:], base)
        return _pvconv_key(path[1:], base)
    if head == "cls_mlp":
        return _shared_mlp_key(path[1:], f"{p}classifier.0")
    if head == "cls_out":
        return f"{p}classifier.2.{_wb(path[-1])}"
    if head == "embedf0":
        return f"{p}embedf.0.{_wb(path[-1])}"
    if head == "embedf1":
        return f"{p}embedf.2.{_wb(path[-1])}"
    if head == "clip_forge_mapping":
        return f"{p}clip_forge_mapping.{_wb(path[-1])}"
    if head == "style_clip":
        return f"{p}style_clip.{_wb(path[-1])}"
    raise KeyError(path)


def _stage_blocks_from_tree(flat_keys, prefix=()) -> Dict[str, int]:
    """Infer per-stage block counts from the flax key set."""
    counts: Dict[str, set] = {}
    for path in flat_keys:
        sub = path[len(prefix):]
        if not sub:
            continue
        head = sub[0]
        m = re.fullmatch(r"(sa|fp)(\d+)_(conv(\d+)|sa|fp)", head)
        if not m:
            continue
        stage = f"{m.group(1)}{m.group(2)}"
        counts.setdefault(stage, set()).add(head)
    return {k: len(v) for k, v in counts.items()}


def translate_encoder_path(path, stage_blocks, torch_prefix="") -> str:
    """PointNetPlusEncoder (torch module attr is `layers`, not sa_layers)."""
    p = torch_prefix + "." if torch_prefix else ""
    head = path[0]
    m = re.fullmatch(r"sa(\d+)_conv(\d+)", head)
    if m:
        i, j = int(m.group(1)), int(m.group(2))
        total = stage_blocks[f"sa{i}"]
        base = f"{p}layers.{i}" + (f".{j}" if total > 1 else "")
        return _pvconv_key(path[1:], base)
    m = re.fullmatch(r"sa(\d+)_sa", head)
    if m:
        i = int(m.group(1))
        total = stage_blocks[f"sa{i}"]
        base = f"{p}layers.{i}" + (f".{total - 1}" if total > 1 else "")
        return _sa_module_key(path[1:], base)
    if head == "mlp":
        return f"{p}mlp.{_wb(path[-1])}"
    raise KeyError(path)


def translate_global_prior_path(path, torch_prefix="") -> str:
    p = torch_prefix + "." if torch_prefix else ""
    head = path[0]
    if head == "temb0":
        return f"{p}temb_layer.0.{_wb(path[-1])}"
    if head == "temb1":
        return f"{p}temb_layer.1.{_wb(path[-1])}"
    if head == "input_layer":
        return f"{p}input_layer.{_wb(path[-1])}"
    if head == "output_layer":
        return f"{p}output_layer.{_wb(path[-1])}"
    if head == "mixing_logit":
        return f"{p}mixing_logit"
    if head == "clip_feat_mapping":
        return f"{p}clip_feat_mapping.{_wb(path[-1])}"
    if head == "temb_fun":
        return f"{p}temb_fun.{path[-1]}"
    m = re.fullmatch(r"block(\d+)", head)
    if m:
        i = m.group(1)
        sub = path[1]
        if sub in ("conv1", "conv2"):
            return f"{p}all_modules.{i}.{sub}.{_wb(path[-1])}"
        if sub == "se_fc1":
            return f"{p}all_modules.{i}.SE.fc.0.{_wb(path[-1])}"
        if sub == "se_fc2":
            return f"{p}all_modules.{i}.SE.fc.2.{_wb(path[-1])}"
        if sub in ("norm1", "norm2"):
            return f"{p}all_modules.{i}.{'normalize1' if sub == 'norm1' else 'normalize2'}.{_wb(path[-1])}"
    raise KeyError(path)


# ------------------------------------------------------- model-level maps
def build_key_map(params: dict, model: str, torch_prefix: str = ""):
    """{flax_path: torch_key} for 'vae' | 'global_prior' | 'local_prior'."""
    flat = flatten_tree(params)
    keys = list(flat.keys())
    out = {}
    if model == "global_prior":
        for path in keys:
            out[path] = translate_global_prior_path(path, torch_prefix)
        return out
    if model == "local_prior":
        p = torch_prefix + "." if torch_prefix else ""
        unet_keys = [k for k in keys if k[0] == "unet"]
        blocks = _stage_blocks_from_tree([k[1:] for k in unet_keys])
        for path in keys:
            if path[0] == "unet":
                out[path] = translate_unet_path(path[1:], blocks,
                                                torch_prefix)
            elif path[0] == "mixing_logit":
                out[path] = f"{p}mixing_logit"
            else:
                raise KeyError(path)
        return out
    if model == "vae":
        p = torch_prefix + "." if torch_prefix else ""
        for top, tname in (("style_encoder", "style_encoder"),
                           ("encoder", "encoder"), ("decoder", "decoder")):
            sub_keys = [k for k in keys if k[0] == top]
            if top == "style_encoder":
                blocks = _stage_blocks_from_tree([k[1:] for k in sub_keys])
                for path in sub_keys:
                    out[path] = translate_encoder_path(
                        path[1:], blocks, f"{p}{tname}")
            else:
                # PointTransPVC / LatentPointDecPVC wrap the unet as `layers`
                unet_keys = [k for k in sub_keys if k[1] == "layers"]
                blocks = _stage_blocks_from_tree([k[2:] for k in unet_keys])
                for path in unet_keys:
                    out[path] = translate_unet_path(
                        path[2:], blocks, f"{p}{tname}.layers")
        return out
    raise ValueError(model)


# ------------------------------------------------------------- top level
def params_structure(cfg):
    """Shape-only init of all three models (jax.eval_shape, no FLOPs)."""
    from ..models.lion import LION
    lion = LION(cfg)

    def init():
        return lion.init_params(jax.random.PRNGKey(0))

    return jax.eval_shape(init), lion


# torch keys that legitimately exist in released checkpoints but have no
# flax counterpart: module buffers that are constants or training-only.
_STRICT_IGNORE = (
    r"num_batches_tracked$",      # BatchNorm bookkeeping
    r"\.sigma$",                  # spectral-norm power-iteration state
)


def import_state_dict(state_dict: Dict[str, Any], shapes: dict,
                      model: str, torch_prefix: str = "",
                      strict: bool = True) -> dict:
    """Map a torch state_dict onto a flax param (shape) tree -> array tree.

    strict=True (default): fail if any flax leaf has no torch key OR any
    torch key under `torch_prefix` is never consumed (modulo the known
    buffer patterns in _STRICT_IGNORE) — a silent key mismatch is how
    checkpoint imports rot. Pass strict=False to salvage partial ckpts.
    """
    key_map = build_key_map(shapes, model, torch_prefix)
    flat_shapes = flatten_tree(shapes)
    out = {}
    missing = []
    for path, tkey in key_map.items():
        if tkey not in state_dict:
            missing.append(tkey)
            continue
        out[path] = jnp.asarray(
            torch_to_flax_array(state_dict[tkey], flat_shapes[path].shape,
                                leaf=path[-1]),
            jnp.float32)
    if missing and strict:
        raise KeyError(f"{len(missing)} torch keys missing for {model}, "
                       f"e.g. {sorted(missing)[:5]}")
    if strict:
        prefix = torch_prefix + "." if torch_prefix else ""
        consumed = set(key_map.values())
        extra = [k for k in state_dict
                 if k.startswith(prefix) and k not in consumed
                 and not any(re.search(p, k) for p in _STRICT_IGNORE)]
        if extra:
            raise KeyError(
                f"{len(extra)} torch keys under prefix '{prefix or '<root>'}'"
                f" not consumed by {model}, e.g. {sorted(extra)[:5]} — "
                "the import map is incomplete (or pass strict=False)")
    return unflatten_tree(out)


def load_lion_checkpoint(model_path: str, cfg, strict: bool = True) -> dict:
    """Load a released LION .pt -> {'vae', 'global_prior', 'local_prior'}.

    strict (default True): every torch key must map to exactly one flax
    leaf and vice versa (see import_state_dict)."""
    import torch
    ckpt = torch.load(model_path, map_location="cpu", weights_only=True)
    dae_sd = {k: v.numpy() for k, v in ckpt["dae_state_dict"].items()}
    vae_sd = {k: v.numpy() for k, v in ckpt["vae_state_dict"].items()}
    shapes, _ = params_structure(cfg)
    return {
        "vae": import_state_dict(vae_sd, shapes["vae"], "vae",
                                 strict=strict),
        "global_prior": import_state_dict(dae_sd, shapes["global_prior"],
                                          "global_prior", torch_prefix="0",
                                          strict=strict),
        "local_prior": import_state_dict(dae_sd, shapes["local_prior"],
                                         "local_prior", torch_prefix="1",
                                         strict=strict),
    }


def export_state_dict(params: dict, model: str,
                      torch_prefix: str = "") -> Dict[str, np.ndarray]:
    """Inverse mapping: flax params -> torch-layout state_dict (numpy).

    Torch tensor shapes are derived from the flax shapes by inverting the
    rank rules; 1x1 convs export as Linear-shaped (2D) tensors EXCEPT where
    the reference uses convs -- since our transform only depends on rank at
    import time, exporting as 2D round-trips correctly for parity tests.
    """
    key_map = build_key_map(params, model, torch_prefix)
    flat = flatten_tree(params)
    out = {}
    for path, tkey in key_map.items():
        a = np.asarray(flat[path])
        if path[-1] == "kernel" and a.ndim == 2:
            out[tkey] = a.T
        elif path[-1] == "kernel" and a.ndim == 5:
            out[tkey] = a.transpose(4, 3, 0, 1, 2)
        else:
            out[tkey] = a  # scale/bias/w/mixing_logit pass through
    return out
