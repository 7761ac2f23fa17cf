"""Checkpoint / resume: params + optimizer state + step counter + config.

The reference persists only a bare ``state_dict`` of the fusion model
(``/root/reference/pipeline.py:1112-1134``) — no optimizer state, no epoch
counter, no mid-training resume (SURVEY.md §5). This module fixes that:
a checkpoint is {params, opt_state, step, config_json} written as
npz + a json sidecar (treedef + metadata), so training resumes exactly.
The model is ~6M params; a flat npz is simpler and more portable than an
orbax directory tree at this scale, and loads anywhere numpy does.

Layout: ``<data_root>/models/<prefix>_radad.npz`` — mirroring the
reference's ``<data_root>/models/{prefix}_radad.pt`` naming.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _model_dir(data_root: str) -> str:
    d = os.path.join(data_root, "models")
    os.makedirs(d, exist_ok=True)
    return d


def save_checkpoint(data_root: str, prefix: str, state: Dict[str, Any]) -> str:
    """``state`` = {"params": ..., "opt_state": ..., "step": int,
    "config_json": str}. Returns the path written."""
    path = os.path.join(_model_dir(data_root), f"{prefix}_radad.npz")
    flat, treedef = jax.tree_util.tree_flatten(
        {"params": state["params"], "opt_state": state.get("opt_state")})
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    np.savez(path, **arrays)
    meta = {
        "treedef": pickle.dumps(treedef).hex(),
        "step": int(state.get("step", 0)),
        "config_json": state.get("config_json", "{}"),
        "num_leaves": len(flat),
    }
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)
    return path


def load_checkpoint(data_root: str, prefix: str) -> Optional[Dict[str, Any]]:
    path = os.path.join(_model_dir(data_root), f"{prefix}_radad.npz")
    if not os.path.exists(path):
        return None
    with open(path + ".meta.json") as f:
        meta = json.load(f)
    data = np.load(path)
    flat = [jnp.asarray(data[f"leaf_{i}"])
            for i in range(meta["num_leaves"])]
    treedef = pickle.loads(bytes.fromhex(meta["treedef"]))
    tree = jax.tree_util.tree_unflatten(treedef, flat)
    return {"params": tree["params"], "opt_state": tree["opt_state"],
            "step": meta["step"], "config_json": meta["config_json"]}
