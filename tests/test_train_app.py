"""End-to-end: tiny dataset -> train CLI -> snapshot -> render engine."""
import json
import os

import numpy as np
import pytest

from nerf_tpu.core.snapshot import load_snapshot
from nerf_tpu.core.types import Camera, RenderSettings
from nerf_tpu.render.engine import NerfRender

TINY_CFG = {
    "loss": {"otype": "Huber"},
    "optimizer": {"otype": "Adam", "learning_rate": 1e-2, "beta1": 0.9,
                  "beta2": 0.99, "epsilon": 1e-15},
    "encoding": {"otype": "HashGrid", "n_levels": 4,
                 "n_features_per_level": 2, "log2_hashmap_size": 12,
                 "base_resolution": 8, "per_level_scale": 1.5},
    "network": {"otype": "FullyFusedMLP", "activation": "ReLU",
                "output_activation": "None", "n_neurons": 16,
                "n_hidden_layers": 1},
    "dir_encoding": {"otype": "SphericalHarmonics", "degree": 2},
    "rgb_network": {"otype": "FullyFusedMLP", "activation": "ReLU",
                    "output_activation": "None", "n_neurons": 16,
                    "n_hidden_layers": 1},
}


@pytest.fixture()
def tiny_dataset(tmp_path):
    """Two flat-color views looking at the origin."""
    from PIL import Image

    root = tmp_path / "data"
    root.mkdir()
    w = h = 16
    frames = []
    rng = np.random.default_rng(0)
    for i, z in enumerate((6.0, -6.0)):
        img = np.full((h, w, 3), 128 + 40 * i, np.uint8)
        img[4:12, 4:12] = 30  # a dark square to give gradients structure
        Image.fromarray(img).save(root / f"r_{i}.png")
        pose = np.eye(4)
        pose[2, 3] = z
        frames.append({"file_path": f"r_{i}",
                       "transform_matrix": pose.tolist()})
    meta = {"camera_angle_x": 0.9, "frames": frames}
    (root / "transforms_train.json").write_text(json.dumps(meta))
    return str(root)


def test_dataset_loader(tiny_dataset):
    from nerf_tpu.train.dataset import load_transforms

    ds = load_transforms(tiny_dataset)
    assert ds.n_images == 2
    assert ds.rays_o.shape == (2 * 16 * 16, 3)
    np.testing.assert_allclose(np.linalg.norm(ds.rays_d, axis=-1), 1.0,
                               rtol=1e-5)
    assert ds.rgb.min() >= 0 and ds.rgb.max() <= 1
    # batching covers rays without replacement
    b = next(ds.batches(64, seed=1))
    assert b[0].shape == (64, 3)


def test_train_cli_end_to_end(tiny_dataset, tmp_path):
    from nerf_tpu.apps import train

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(TINY_CFG))
    out = str(tmp_path / "trained.msgpack")
    train.main([
        "--data", tiny_dataset, "--out", out, "--config", str(cfg_path),
        "--steps", "8", "--batch", "128", "--n-samples", "16",
        "--grid-h", "16", "--grid-update-every", "4", "--log-every", "4",
    ])
    assert os.path.exists(out)

    snap = load_snapshot(out)
    assert snap.settings.grid_h == 16
    eng = NerfRender()
    eng.load_from_snapshot(snap)
    eng.set_resolution((8, 8))
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 6.0
    img = eng.render_frame(Camera(10.0, 10.0, 4.0, 4.0), pose)
    assert img.rgb.shape == (8, 8, 3)
    assert np.all(np.isfinite(img.rgb))
