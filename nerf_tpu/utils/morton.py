"""Morton (Z-order) curve helpers.

Reference parity: `__expand_bits` / `__morton3D` (render_utils.h:163-176),
used by the reference's unused bitfield march variant
(kernel_march_rays0, render_utils.h:417-522). Provided for format
compatibility with instant-ngp-style morton-ordered density bitfields.
"""
from __future__ import annotations

import numpy as np


def expand_bits(v):
    """render_utils.h:163-169 (10-bit -> every 3rd bit)."""
    v = np.asarray(v, np.uint32)
    with np.errstate(over="ignore"):
        v = (v * np.uint32(0x00010001)) & np.uint32(0xFF0000FF)
        v = (v * np.uint32(0x00000101)) & np.uint32(0x0F00F00F)
        v = (v * np.uint32(0x00000011)) & np.uint32(0xC30C30C3)
        v = (v * np.uint32(0x00000005)) & np.uint32(0x49249249)
    return v


def morton3d(x, y, z):
    """render_utils.h:170-176."""
    return (expand_bits(x) | (expand_bits(y) << np.uint32(1))
            | (expand_bits(z) << np.uint32(2)))


def morton3d_invert(code):
    """Inverse of morton3d for one axis at a time."""
    code = np.asarray(code, np.uint32)

    def compact(v):
        v = v & np.uint32(0x49249249)
        with np.errstate(over="ignore"):
            v = (v | (v >> np.uint32(2))) & np.uint32(0xC30C30C3)
            v = (v | (v >> np.uint32(4))) & np.uint32(0x0F00F00F)
            v = (v | (v >> np.uint32(8))) & np.uint32(0xFF0000FF)
            v = (v | (v >> np.uint32(16))) & np.uint32(0x000003FF)
        return v

    return (compact(code), compact(code >> np.uint32(1)),
            compact(code >> np.uint32(2)))


def linear_to_morton_grid(grid: np.ndarray, h: int) -> np.ndarray:
    """Reorder a [h^3] x-major linear density grid into morton order
    (the layout kernel_march_rays0 expects)."""
    ids = np.arange(h ** 3, dtype=np.uint32)
    x = ids // (h * h)
    y = (ids // h) % h
    z = ids % h
    codes = morton3d(x, y, z)
    out = np.empty_like(grid)
    out[codes] = grid
    return out


def density_grid_to_bitfield(grid: np.ndarray, density_thresh: float,
                             h: int) -> np.ndarray:
    """Pack a [C*h^3] float grid into the morton-ordered occupancy
    bitfield format (uint8, 8 voxels/byte) used by instant-ngp snapshots
    and kernel_march_rays0 (render_utils.h:483-484)."""
    c = grid.size // (h ** 3)
    out = []
    for ci in range(c):
        morton = linear_to_morton_grid(
            np.asarray(grid[ci * h ** 3:(ci + 1) * h ** 3]), h)
        bits = (morton > density_thresh).astype(np.uint8)
        out.append(np.packbits(bits, bitorder="little"))
    return np.concatenate(out)
