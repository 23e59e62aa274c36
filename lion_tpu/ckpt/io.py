"""Native checkpoint IO.

Two formats:
  - native: a single .npz of the flattened param/opt pytree + json metadata
    (fast, dependency-free, host-agnostic);
  - torch-compat: export to the reference's released .pt schema
    ({'dae_state_dict', 'vae_state_dict', 'epoch', 'global_step'},
    trainers/train_prior.py:328-350) via the key-translation shim, so
    checkpoints trained here load in the reference codebase and vice versa.

Snapshot semantics mirror the reference preemption-resume protocol
(trainers/base_trainer.py:271-280): write `snapshot_bak`, then atomically
rename to `snapshot`.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .torch_import import flatten_tree, unflatten_tree


_SEP = "|"


def _flat_numpy(tree) -> Dict[str, np.ndarray]:
    flat = flatten_tree(tree)
    return {_SEP.join(k): np.asarray(v) for k, v in flat.items()}


def save_checkpoint(path: str, trees: Dict[str, Any],
                    metadata: Optional[dict] = None):
    """trees: name -> pytree of arrays; metadata: json-serializable."""
    payload = {}
    for name, tree in trees.items():
        for k, v in _flat_numpy(tree).items():
            payload[f"{name}{_SEP}{k}"] = v
    payload["__metadata__"] = np.frombuffer(
        json.dumps(metadata or {}).encode(), dtype=np.uint8)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Tuple[Dict[str, Any], dict]:
    with np.load(path, allow_pickle=False) as data:
        metadata = json.loads(bytes(data["__metadata__"]).decode())
        trees: Dict[str, dict] = {}
        grouped: Dict[str, dict] = {}
        for key in data.files:
            if key == "__metadata__":
                continue
            name, rest = key.split(_SEP, 1)
            grouped.setdefault(name, {})[tuple(rest.split(_SEP))] = \
                jnp.asarray(data[key])
    for name, flat in grouped.items():
        trees[name] = unflatten_tree(flat)
    return trees, metadata


def save_snapshot(ckpt_dir: str, trees: Dict[str, Any], metadata: dict):
    """Atomic snapshot for preemption resume (snapshot_bak -> snapshot)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    bak = os.path.join(ckpt_dir, "snapshot_bak")
    save_checkpoint(bak, trees, metadata)
    os.replace(bak, os.path.join(ckpt_dir, "snapshot"))


def has_snapshot(ckpt_dir: str) -> bool:
    return os.path.exists(os.path.join(ckpt_dir, "snapshot"))


def load_snapshot(ckpt_dir: str):
    return load_checkpoint(os.path.join(ckpt_dir, "snapshot"))


# ---------------------------------------------------------------- torch
def export_torch_checkpoint(path: str, vae_params, global_prior_params,
                            local_prior_params, epoch: int = 0,
                            global_step: int = 0):
    """Write the released .pt prior-checkpoint schema so reference code can
    load models trained here."""
    import torch
    from .torch_import import export_state_dict

    dae_sd = {}
    dae_sd.update(export_state_dict(global_prior_params, "global_prior", "0"))
    dae_sd.update(export_state_dict(local_prior_params, "local_prior", "1"))
    vae_sd = export_state_dict(vae_params, "vae")
    to_torch = lambda sd: {k: torch.from_numpy(np.ascontiguousarray(v))
                           for k, v in sd.items()}
    torch.save({
        "epoch": epoch,
        "global_step": global_step,
        "dae_state_dict": to_torch(dae_sd),
        "vae_state_dict": to_torch(vae_sd),
    }, path)
