"""Network-config loading.

Reference parity: `NerfRender::load_network_config` + recursive `parent`
inheritance via RFC 7386 merge-patch (src/nerf_render.cu:30-91), and the
hash-grid hyperparameter auto-derivation of `reset_network`
(src/nerf_render.cu:111-171).
"""
from __future__ import annotations

import json
import math
import os
from typing import Any, Dict


def merge_patch(target: Any, patch: Any) -> Any:
    """RFC 7386 JSON merge-patch (what nlohmann's merge_patch implements)."""
    if not isinstance(patch, dict):
        return patch
    if not isinstance(target, dict):
        target = {}
    result = dict(target)
    for k, v in patch.items():
        if v is None:
            result.pop(k, None)
        else:
            result[k] = merge_patch(result.get(k), v)
    return result


def merge_parent_network_config(child: Dict, child_path: str) -> Dict:
    """Recursive `parent` config inheritance (ref nerf_render.cu:30-44)."""
    if "parent" not in child:
        return child
    parent_path = os.path.join(os.path.dirname(child_path), child["parent"])
    with open(parent_path) as f:
        parent = json.load(f)
    parent = merge_parent_network_config(parent, parent_path)
    return merge_patch(parent, child)


def load_network_config(path: str) -> Dict:
    """Load a .json (with parent merge) or .msgpack network config.

    Ref nerf_render.cu:66-91.
    """
    if not path or not os.path.exists(path):
        raise FileNotFoundError(f'Network config "{path}" does not exist.')
    ext = os.path.splitext(path)[1].lower()
    if ext == ".json":
        with open(path) as f:
            cfg = json.load(f)
        return merge_parent_network_config(cfg, path)
    if ext == ".msgpack":
        import msgpack

        with open(path, "rb") as f:
            return msgpack.unpack(f, raw=False, strict_map_key=False)
    raise ValueError(f"Unsupported network config extension: {ext}")


def derive_grid_config(encoding_config: Dict, bound: float = 1.0,
                       n_pos_dims: int = 3) -> Dict:
    """Auto-derive hash-grid hyperparameters.

    Mirrors `NerfRender::reset_network` (nerf_render.cu:125-171):
      - n_levels from n_features / n_features_per_level when n_features given
      - base_resolution = 2^(log2_hashmap_size / 3) when unset
      - per_level_scale = exp(ln(2048*bound / N_min) / (L-1)) when unset
    Returns a new dict; does not mutate the input.
    """
    cfg = dict(encoding_config)
    otype = str(cfg.get("otype", "OneBlob"))
    if "grid" not in otype.lower():
        return cfg
    cfg["n_pos_dims"] = n_pos_dims

    f = int(cfg.get("n_features_per_level", 2))
    if cfg.get("n_features", 0):
        n_levels = int(cfg["n_features"]) // f
    else:
        n_levels = int(cfg.get("n_levels", 16))
    cfg["n_levels"] = n_levels

    log2_t = int(cfg.get("log2_hashmap_size", 15))
    base_res = int(cfg.get("base_resolution", 0))
    if not base_res:
        base_res = 1 << (log2_t // n_pos_dims)
        cfg["base_resolution"] = base_res

    desired_resolution = 2048.0
    pls = float(cfg.get("per_level_scale", 0.0))
    if pls <= 0.0 and n_levels > 1:
        pls = math.exp(
            math.log(desired_resolution * float(bound) / float(base_res))
            / (n_levels - 1)
        )
        cfg["per_level_scale"] = pls
    return cfg
