"""NeRF-synthetic / instant-ngp dataset loading.

No direct reference analog (the reference is inference-only and loads
pre-trained snapshots), but the snapshot/pose conventions come from the
same instant-ngp ecosystem: `transforms.json` with `camera_angle_x` or
per-frame intrinsics, c2w matrices in the "nerf" convention that
`nerf_matrix_to_ngp` (render_utils.h:68-77) maps into the unit-cube scene.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Iterator, Optional, Tuple

import numpy as np

from nerf_tpu.core.types import Camera
from nerf_tpu.render.rays import nerf_matrix_to_ngp


@dataclasses.dataclass
class RayDataset:
    """Flattened (origin, direction, rgb) tuples for every train pixel,
    in ngp scene coordinates."""

    rays_o: np.ndarray   # [M, 3] float32
    rays_d: np.ndarray   # [M, 3] float32
    rgb: np.ndarray      # [M, 3] float32 in [0,1]
    camera: Camera
    width: int
    height: int
    n_images: int

    def batches(self, batch_size: int, seed: int = 0,
                epochs: Optional[int] = None
                ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        rng = np.random.default_rng(seed)
        n = self.rays_o.shape[0]
        epoch = 0
        while epochs is None or epoch < epochs:
            perm = rng.permutation(n)
            for i in range(0, n - batch_size + 1, batch_size):
                idx = perm[i:i + batch_size]
                yield self.rays_o[idx], self.rays_d[idx], self.rgb[idx]
            epoch += 1


def _pixel_dirs(cam: Camera, w: int, h: int) -> np.ndarray:
    """Per-pixel camera-space dirs, matching set_rays_d
    (render_utils.h:31-52)."""
    pid = np.arange(w * h, dtype=np.int64)
    i = (pid % w).astype(np.float32) + 0.5
    j = (pid // w).astype(np.float32) + 0.5
    xs = (i - cam.cx) / cam.fl_x
    ys = (j - cam.cy) / cam.fl_y
    d = np.stack([xs, ys, np.ones_like(xs)], -1)
    return (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)


def load_transforms(root: str, split: str = "train", scale: float = 0.33,
                    offset=(0.0, 0.0, 0.0), downsample: int = 1,
                    white_background: bool = True,
                    max_images: Optional[int] = None) -> RayDataset:
    """Load `transforms_{split}.json` (or `transforms.json`) + images."""
    from PIL import Image as PILImage

    for name in (f"transforms_{split}.json", "transforms.json"):
        path = os.path.join(root, name)
        if os.path.exists(path):
            break
    else:
        raise FileNotFoundError(f"no transforms json under {root}")
    with open(path) as f:
        meta = json.load(f)

    frames = meta["frames"]
    if max_images:
        frames = frames[:max_images]

    # probe first image for resolution
    def _img_path(fp):
        p = os.path.join(root, fp)
        if not os.path.splitext(p)[1]:
            p += ".png"
        return p

    first = np.asarray(PILImage.open(_img_path(frames[0]["file_path"])))
    h0, w0 = first.shape[:2]
    w, h = w0 // downsample, h0 // downsample

    if "camera_angle_x" in meta:
        fl_x = 0.5 * w / np.tan(0.5 * float(meta["camera_angle_x"]))
        fl_y = float(meta.get("camera_angle_y", 0)) and \
            0.5 * h / np.tan(0.5 * float(meta["camera_angle_y"])) or fl_x
    else:
        fl_x = float(meta["fl_x"]) / downsample
        fl_y = float(meta["fl_y"]) / downsample
    cx = float(meta.get("cx", w0 / 2)) / downsample
    cy = float(meta.get("cy", h0 / 2)) / downsample
    cam = Camera(fl_x=float(fl_x), fl_y=float(fl_y), cx=cx, cy=cy)

    cam_dirs = _pixel_dirs(cam, w, h)  # [w*h, 3]

    all_o, all_d, all_rgb = [], [], []
    for fr in frames:
        img = PILImage.open(_img_path(fr["file_path"]))
        if downsample > 1:
            img = img.resize((w, h), PILImage.BILINEAR)
        arr = np.asarray(img).astype(np.float32) / 255.0
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, -1)
        if arr.shape[-1] == 4:
            rgb, a = arr[..., :3], arr[..., 3:]
            bg = 1.0 if white_background else 0.0
            arr = rgb * a + bg * (1.0 - a)
        pose = nerf_matrix_to_ngp(
            np.asarray(fr["transform_matrix"], np.float32), scale, offset)
        rot, origin = pose[:3, :3], pose[:3, 3]
        all_d.append((cam_dirs @ rot.T).astype(np.float32))
        all_o.append(np.broadcast_to(origin.astype(np.float32),
                                     (w * h, 3)).copy())
        all_rgb.append(arr[..., :3].reshape(-1, 3).astype(np.float32))

    return RayDataset(
        rays_o=np.concatenate(all_o), rays_d=np.concatenate(all_d),
        rgb=np.concatenate(all_rgb), camera=cam, width=w, height=h,
        n_images=len(frames),
    )
