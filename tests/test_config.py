import json
import math

from nerf_tpu.core.config import (
    derive_grid_config,
    load_network_config,
    merge_patch,
)


def test_merge_patch_rfc7386():
    assert merge_patch({"a": 1, "b": {"c": 2}}, {"b": {"c": 3, "d": 4}}) == {
        "a": 1, "b": {"c": 3, "d": 4}}
    assert merge_patch({"a": 1}, {"a": None}) == {}
    assert merge_patch({"a": {"x": 1}}, {"a": 5}) == {"a": 5}


def test_parent_inheritance(tmp_path):
    parent = {"encoding": {"otype": "HashGrid", "n_levels": 16},
              "network": {"n_neurons": 64}}
    child = {"parent": "base.json", "network": {"n_neurons": 128}}
    (tmp_path / "base.json").write_text(json.dumps(parent))
    (tmp_path / "child.json").write_text(json.dumps(child))
    cfg = load_network_config(str(tmp_path / "child.json"))
    assert cfg["encoding"]["n_levels"] == 16
    assert cfg["network"]["n_neurons"] == 128


def test_derive_grid_config_base():
    # base.json values (configs/nerf/base.json:23-29), bound=1:
    # per_level_scale = exp(ln(2048*1/16)/15) (nerf_render.cu:154-165)
    cfg = derive_grid_config(
        {"otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
         "log2_hashmap_size": 19, "base_resolution": 16}, bound=1.0)
    assert cfg["n_levels"] == 16
    assert cfg["base_resolution"] == 16
    assert abs(cfg["per_level_scale"]
               - math.exp(math.log(2048.0 / 16.0) / 15)) < 1e-12


def test_derive_base_resolution_from_hashmap():
    cfg = derive_grid_config({"otype": "HashGrid", "n_levels": 8,
                              "log2_hashmap_size": 15}, bound=1.0)
    assert cfg["base_resolution"] == 1 << (15 // 3)


def test_derive_n_levels_from_n_features():
    cfg = derive_grid_config({"otype": "HashGrid", "n_features": 32,
                              "n_features_per_level": 2,
                              "base_resolution": 16}, bound=1.0)
    assert cfg["n_levels"] == 16
