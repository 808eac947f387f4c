"""Snapshot (checkpoint) load/save.

Reference parity: `NerfRender::load_snapshot` (src/nerf_render.cu:431-473)
reads a msgpack config whose `snapshot` map holds `aabb` (6 floats),
`bound`, `scale`, `cascade`, `density_grid_size`, `mean_density`,
`density_grid` (cascade*H^3 floats), and `params` (flat float array in the
order density MLP | rgb MLP | pos encoding | dir encoding,
nerf_network.h:273-291). The reference is load-only; we also implement the
missing save path so snapshots round-trip.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import numpy as np

from nerf_tpu.core.config import load_network_config
from nerf_tpu.core.types import RenderSettings


@dataclasses.dataclass
class Snapshot:
    """Host-side snapshot contents (numpy; device placement is the
    engine's job)."""

    config: Dict
    params: np.ndarray          # flat fp32 [n_params]
    density_grid: np.ndarray    # fp32 [cascade * H^3]
    settings: RenderSettings


def load_snapshot(path_or_config) -> Snapshot:
    """Load a .msgpack snapshot file (or an already-parsed config dict).

    File loads use the native C++ codec (nerf_tpu/native) when available —
    the big float arrays decode straight into numpy buffers — and fall
    back to pure-Python msgpack otherwise.
    """
    native_fields = None
    if isinstance(path_or_config, dict):
        config = path_or_config
    else:
        path = str(path_or_config)
        config = None
        if path.lower().endswith(".msgpack") and os.path.exists(path):
            from nerf_tpu import native

            with open(path, "rb") as f:
                raw = f.read()
            scanned = native.fast_scan_snapshot(raw)
            if scanned is not None:
                native_fields, spliced = scanned
                if ("params" in native_fields
                        and "density_grid" in native_fields):
                    import msgpack

                    config = msgpack.unpackb(spliced, raw=False,
                                             strict_map_key=False)
                    snap_map = dict(config.get("snapshot", {}))
                    snap_map["params"] = native_fields["params"]
                    snap_map["density_grid"] = native_fields["density_grid"]
                    if "aabb" in native_fields:
                        snap_map["aabb"] = native_fields["aabb"]
                    config["snapshot"] = snap_map
                else:
                    config = None
        if config is None:
            config = load_network_config(path)
    if "snapshot" not in config:
        raise ValueError("File does not contain a snapshot.")
    snap = config["snapshot"]

    defaults = RenderSettings()
    bound = float(snap.get("bound", defaults.bound))
    settings = RenderSettings(
        bound=bound,
        scale=float(snap.get("scale", defaults.scale)),
        cascade=int(snap.get("cascade", defaults.cascade)),
        grid_h=int(snap.get("density_grid_size", defaults.grid_h)),
        mean_density=float(snap.get("mean_density", defaults.mean_density)),
        aabb=tuple(float(v) for v in snap["aabb"]),
    )

    density_grid = np.asarray(snap["density_grid"], np.float32)
    expected = settings.grid_h ** 3 * settings.cascade
    if density_grid.size != expected:
        raise ValueError("Incompatible number of grid cascades.")

    params = np.asarray(snap["params"], np.float32)
    return Snapshot(config=config, params=params, density_grid=density_grid,
                    settings=settings)


def _pack_f32_array(arr: np.ndarray) -> bytes:
    """msgpack-encode a float array vectorized: array32 header + one
    0xca+BE-float record per element (no per-element Python objects)."""
    a = np.asarray(arr, np.float32).ravel()
    n = a.size
    header = b"\xdd" + np.uint32(n).byteswap().tobytes()  # array32
    body = np.empty((n, 5), np.uint8)
    body[:, 0] = 0xCA
    body[:, 1:] = a.view(np.uint8).reshape(n, 4)[:, ::-1]  # big-endian
    return header + body.tobytes()


def save_snapshot(path: str, config: Dict, params: np.ndarray,
                  density_grid: np.ndarray, settings: RenderSettings) -> None:
    """Write a reference-layout msgpack snapshot (capability the reference
    lacks; layout matches its reader, src/nerf_render.cu:438-453).

    The big float arrays are encoded vectorized (placeholder splice), so
    saving is O(bytes), not O(python objects).
    """
    import msgpack

    ph_grid = b"\x00__NERF_TPU_GRID__\x00"
    ph_params = b"\x00__NERF_TPU_PARAMS__\x00"
    out = {k: v for k, v in config.items() if k != "snapshot"}
    out["snapshot"] = {
        "aabb": [float(v) for v in settings.aabb],
        "bound": float(settings.bound),
        "scale": float(settings.scale),
        "cascade": int(settings.cascade),
        "density_grid_size": int(settings.grid_h),
        "mean_density": float(settings.mean_density),
        "density_grid": ph_grid,
        "params": ph_params,
    }
    packed = msgpack.packb(out, use_bin_type=True)
    packed = packed.replace(
        b"\xc4" + bytes([len(ph_grid)]) + ph_grid,
        _pack_f32_array(density_grid))
    packed = packed.replace(
        b"\xc4" + bytes([len(ph_params)]) + ph_params,
        _pack_f32_array(params))
    with open(path, "wb") as f:
        f.write(packed)


# ---------------------------------------------------------------------------
# Synthetic snapshots for tests/benchmarks (no reference analog; the
# reference ships no checkpoints).
# ---------------------------------------------------------------------------

DEFAULT_NETWORK_CONFIG: Dict = {
    # Mirrors configs/nerf/base.json:23-58 (the keys consumed at inference).
    "encoding": {
        "otype": "HashGrid",
        "n_levels": 16,
        "n_features_per_level": 2,
        "log2_hashmap_size": 19,
        "base_resolution": 16,
    },
    "network": {
        "otype": "FullyFusedMLP",
        "activation": "ReLU",
        "output_activation": "None",
        "n_neurons": 64,
        "n_hidden_layers": 1,
    },
    "dir_encoding": {
        "otype": "Composite",
        "nested": [
            {"n_dims_to_encode": 3, "otype": "SphericalHarmonics",
             "degree": 4},
            {"otype": "Identity", "n_bins": 4, "degree": 4},
        ],
    },
    "rgb_network": {
        "otype": "FullyFusedMLP",
        "activation": "ReLU",
        "output_activation": "None",
        "n_neurons": 64,
        "n_hidden_layers": 2,
    },
}


# The TPU-native flagship config: same model family (multiresolution grid
# + two fused MLPs + SH), with the position encoding laid out for v5e
# gather hardware (encodings/tpugrid.py — one descriptor per sample-level
# instead of eight). Parameter budget matches DEFAULT_NETWORK_CONFIG.
TPU_NETWORK_CONFIG: Dict = {
    **DEFAULT_NETWORK_CONFIG,
    "encoding": {
        "otype": "TpuGrid",
        "n_levels": 16,
        "n_features_per_level": 2,
        "log2_hashmap_size": 19,
        "base_resolution": 16,
    },
}


def make_synthetic_snapshot(seed: int = 0, grid_h: int = 128,
                            cascade: int = 1, bound: float = 1.0,
                            network_config: Optional[Dict] = None,
                            occupancy: str = "sphere") -> Snapshot:
    """Random-weight snapshot with a procedural occupancy grid.

    occupancy "sphere": occupied shell |r| < 0.5*bound (in grid space);
    "full": everything occupied; "empty": nothing.
    """
    from nerf_tpu.models.nerf import build_nerf_network

    config = dict(network_config or DEFAULT_NETWORK_CONFIG)
    net = build_nerf_network(config, bound=bound)

    rng = np.random.default_rng(seed)
    params = (rng.standard_normal(net.n_params, dtype=np.float32)
              * np.float32(0.1))

    h = grid_h
    coords = (np.arange(h, dtype=np.float32) + 0.5) / h * 2.0 - 1.0
    gx, gy, gz = np.meshgrid(coords, coords, coords, indexing="ij")
    r = np.sqrt(gx * gx + gy * gy + gz * gz)
    if occupancy == "sphere":
        grid = np.where(r < 0.5, np.float32(1.0), np.float32(0.0))
    elif occupancy == "full":
        grid = np.ones((h, h, h), np.float32)
    else:
        grid = np.zeros((h, h, h), np.float32)
    grid = np.tile(grid.reshape(-1), cascade)

    settings = RenderSettings(
        bound=bound, cascade=cascade, grid_h=grid_h, mean_density=0.1,
        aabb=(-bound, -bound, -bound, bound, bound, bound),
    )
    return Snapshot(config=config, params=params, density_grid=grid,
                    settings=settings)
