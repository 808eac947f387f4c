"""Sampling / QMC library.

Reference parity: include/nerf-cuda/random_val.cuh:28-324 and the vendored
pcg32 (dependencies/tiny-cuda-nn/dependencies/pcg32/pcg32.h): pcg32 RNG,
cylindrical/spherical direction maps, fibonacci lattice, cosine
hemisphere, Sobol (5-dim direction numbers) + Burley shuffled-scrambled
Sobol, Halton, and the DLSS-jitter `ld_random_pixel_offset`
(render_buffer.cu:646 uses it for upsampler jitter).

Implemented in NumPy uint32/float32 (host-side sample generation); all
functions are vectorized over `index` arrays and also accept jnp inputs
for the pure-math pieces.
"""
from __future__ import annotations

import numpy as np

PI = 3.14159265358979323846

# pcg32.h:33-35
_PCG32_DEFAULT_STATE = np.uint64(0x853C49E6748FEA9B)
_PCG32_DEFAULT_STREAM = np.uint64(0xDA3E39CB94B95BDB)
_PCG32_MULT = np.uint64(0x5851F42D4C957F2D)

_U64 = np.uint64
_U32 = np.uint32


class PCG32:
    """Minimal pcg32 port (pcg32.h:46-190)."""

    def __init__(self, initstate: int = None, initseq: int = 1):
        self.state = _PCG32_DEFAULT_STATE
        self.inc = _PCG32_DEFAULT_STREAM
        if initstate is not None:
            self.seed(initstate, initseq)

    def seed(self, initstate: int, initseq: int = 1) -> None:
        with np.errstate(over="ignore"):
            self.state = _U64(0)
            self.inc = (_U64(initseq) << _U64(1)) | _U64(1)
            self.next_uint()
            self.state = self.state + _U64(initstate)
            self.next_uint()

    def next_uint(self) -> np.uint32:
        with np.errstate(over="ignore"):
            old = self.state
            self.state = old * _PCG32_MULT + self.inc
            xorshifted = _U32(((old >> _U64(18)) ^ old) >> _U64(27)
                              & _U64(0xFFFFFFFF))
            rot = _U32(old >> _U64(59))
            return _U32((xorshifted >> rot)
                        | _U32((int(xorshifted) << ((-int(rot)) & 31))
                               & 0xFFFFFFFF))

    def next_float(self) -> np.float32:
        # pcg32 nextFloat: (u >> 9) | 0x3f800000 bitcast - 1
        u = (int(self.next_uint()) >> 9) | 0x3F800000
        return np.frombuffer(np.uint32(u).tobytes(), np.float32)[0] \
            - np.float32(1.0)

    def advance(self, delta: int) -> None:
        """O(log n) jump-ahead (pcg32.h:160-175)."""
        with np.errstate(over="ignore"):
            cur_mult = _PCG32_MULT
            cur_plus = self.inc
            acc_mult = _U64(1)
            acc_plus = _U64(0)
            d = _U64(delta & 0xFFFFFFFFFFFFFFFF)
            while int(d) > 0:
                if int(d) & 1:
                    acc_mult = acc_mult * cur_mult
                    acc_plus = acc_plus * cur_mult + cur_plus
                cur_plus = (cur_mult + _U64(1)) * cur_plus
                cur_mult = cur_mult * cur_mult
                d = d >> _U64(1)
            self.state = acc_mult * self.state + acc_plus


# -- direction maps (random_val.cuh:47-69) ---------------------------------

def cylindrical_to_dir(p):
    p = np.asarray(p, np.float32)
    cos_theta = -2.0 * p[..., 0] + 1.0
    phi = 2.0 * PI * (p[..., 1] - 0.5)
    sin_theta = np.sqrt(np.maximum(1.0 - cos_theta * cos_theta, 0.0))
    return np.stack([sin_theta * np.cos(phi), sin_theta * np.sin(phi),
                     cos_theta], -1).astype(np.float32)


def dir_to_cylindrical(d):
    d = np.asarray(d, np.float32)
    cos_theta = np.clip(-d[..., 2], -1.0, 1.0)
    phi = np.arctan2(d[..., 1], d[..., 0])
    return np.stack([(cos_theta + 1.0) / 2.0, phi / (2.0 * PI) + 0.5],
                    -1).astype(np.float32)


def dir_to_spherical_unorm(d):
    d = np.asarray(d, np.float32)
    cos_theta = np.clip(d[..., 2], -1.0, 1.0)
    theta = np.arccos(cos_theta)
    phi = np.arctan2(d[..., 1], d[..., 0])
    return np.stack([theta / PI, phi / (2.0 * PI) + 0.5], -1).astype(
        np.float32)


def fibonacci_dir(i, n_dirs: int, offset=(0.0, 0.0)):
    """random_val.cuh:80-98."""
    i = np.asarray(i, np.float32)
    if n_dirs >= 11000:
        eps = 27.0
    elif n_dirs >= 890:
        eps = 10.0
    elif n_dirs >= 177:
        eps = 3.33
    elif n_dirs >= 24:
        eps = 1.33
    else:
        eps = 0.33
    golden = 1.6180339887498948482045868343656
    u = np.stack([
        np.mod((i + eps) / (n_dirs - 1 + 2 * eps) + offset[0], 1.0),
        np.mod(i / golden + offset[1], 1.0),
    ], -1)
    return cylindrical_to_dir(u)


def square2disk_shirley(square):
    """random_val.cuh:109-125."""
    a, b = np.asarray(square[..., 0]), np.asarray(square[..., 1])
    use_a = a * a > b * b
    r = np.where(use_a, a, b)
    phi = np.where(use_a, (PI / 4.0) * np.divide(
        b, np.where(a == 0, 1, a)),
        (PI / 2.0) - (PI / 4.0) * np.divide(a, np.where(b == 0, 1, b)))
    return np.stack([r * np.cos(phi), r * np.sin(phi)], -1)


def cosine_hemisphere(u):
    """random_val.cuh:127-140."""
    u = np.asarray(u, np.float32)
    r = np.sqrt(u[..., 0])
    phi = 2.0 * PI * u[..., 1]
    x = r * np.cos(phi)
    y = r * np.sin(phi)
    return np.stack([x, y, np.sqrt(np.maximum(1.0 - x * x - y * y, 0.0))],
                    -1).astype(np.float32)


# -- Sobol / scrambling (random_val.cuh:159-324) ----------------------------

_SOBOL_DIRECTIONS = np.array([
    [0x80000000, 0x40000000, 0x20000000, 0x10000000,
     0x08000000, 0x04000000, 0x02000000, 0x01000000,
     0x00800000, 0x00400000, 0x00200000, 0x00100000,
     0x00080000, 0x00040000, 0x00020000, 0x00010000,
     0x00008000, 0x00004000, 0x00002000, 0x00001000,
     0x00000800, 0x00000400, 0x00000200, 0x00000100,
     0x00000080, 0x00000040, 0x00000020, 0x00000010,
     0x00000008, 0x00000004, 0x00000002, 0x00000001],
    [0x80000000, 0xc0000000, 0xa0000000, 0xf0000000,
     0x88000000, 0xcc000000, 0xaa000000, 0xff000000,
     0x80800000, 0xc0c00000, 0xa0a00000, 0xf0f00000,
     0x88880000, 0xcccc0000, 0xaaaa0000, 0xffff0000,
     0x80008000, 0xc000c000, 0xa000a000, 0xf000f000,
     0x88008800, 0xcc00cc00, 0xaa00aa00, 0xff00ff00,
     0x80808080, 0xc0c0c0c0, 0xa0a0a0a0, 0xf0f0f0f0,
     0x88888888, 0xcccccccc, 0xaaaaaaaa, 0xffffffff],
    [0x80000000, 0xc0000000, 0x60000000, 0x90000000,
     0xe8000000, 0x5c000000, 0x8e000000, 0xc5000000,
     0x68800000, 0x9cc00000, 0xee600000, 0x55900000,
     0x80680000, 0xc09c0000, 0x60ee0000, 0x90550000,
     0xe8808000, 0x5cc0c000, 0x8e606000, 0xc5909000,
     0x6868e800, 0x9c9c5c00, 0xeeee8e00, 0x5555c500,
     0x8000e880, 0xc0005cc0, 0x60008e60, 0x9000c590,
     0xe8006868, 0x5c009c9c, 0x8e00eeee, 0xc5005555],
    [0x80000000, 0xc0000000, 0x20000000, 0x50000000,
     0xf8000000, 0x74000000, 0xa2000000, 0x93000000,
     0xd8800000, 0x25400000, 0x59e00000, 0xe6d00000,
     0x78080000, 0xb40c0000, 0x82020000, 0xc3050000,
     0x208f8000, 0x51474000, 0xfbea2000, 0x75d93000,
     0xa0858800, 0x914e5400, 0xdbe79e00, 0x25db6d00,
     0x58800080, 0xe54000c0, 0x79e00020, 0xb6d00050,
     0x800800f8, 0xc00c0074, 0x200200a2, 0x50050093],
    [0x80000000, 0x40000000, 0x20000000, 0xb0000000,
     0xf8000000, 0xdc000000, 0x7a000000, 0x9d000000,
     0x5a800000, 0x2fc00000, 0xa1600000, 0xf0b00000,
     0xda880000, 0x6fc40000, 0x81620000, 0x40bb0000,
     0x22878000, 0xb3c9c000, 0xfb65a000, 0xddb2d000,
     0x78022800, 0x9c0b3c00, 0x5a0fb600, 0x2d0ddb00,
     0xa2878080, 0xf3c9c040, 0xdb65a020, 0x6db2d0b0,
     0x800228f8, 0x400b3cdc, 0x200fb67a, 0xb00ddb9d],
], dtype=np.uint32)


def sobol(index, dim: int = 0) -> np.ndarray:
    index = np.asarray(index, np.uint32)
    x = np.zeros_like(index)
    for bit in range(32):
        mask = (index >> np.uint32(bit)) & np.uint32(1)
        x = x ^ (mask * _SOBOL_DIRECTIONS[dim][bit])
    return x


def hash_combine(seed, v):
    seed = np.uint32(seed)
    v = np.asarray(v, np.uint32)
    with np.errstate(over="ignore"):
        return seed ^ (v + (seed << np.uint32(6)) + (seed >> np.uint32(2)))


def reverse_bits(x):
    x = np.asarray(x, np.uint32)
    x = ((x & 0xAAAAAAAA) >> 1) | ((x & 0x55555555) << 1)
    x = ((x & 0xCCCCCCCC) >> 2) | ((x & 0x33333333) << 2)
    x = ((x & 0xF0F0F0F0) >> 4) | ((x & 0x0F0F0F0F) << 4)
    x = ((x & 0xFF00FF00) >> 8) | ((x & 0x00FF00FF) << 8)
    return ((x >> np.uint32(16)) | (x << np.uint32(16))).astype(np.uint32)


def laine_karras_permutation(x, seed):
    x = np.asarray(x, np.uint32)
    with np.errstate(over="ignore"):
        x = x + np.uint32(seed)
        for c in (0x6C50B47C, 0xB82F1E52, 0xC7AFE638, 0x8D22F6E6):
            x = x ^ (x * np.uint32(c))
    return x


def nested_uniform_scramble_base2(x, seed):
    return reverse_bits(laine_karras_permutation(reverse_bits(x), seed))


def shuffled_scrambled_sobol(index, seed, n_dims: int = 2) -> np.ndarray:
    """Burley 2020 shuffled scrambled Sobol (random_val.cuh:254-270)."""
    index = nested_uniform_scramble_base2(np.asarray(index, np.uint32),
                                          np.uint32(seed))
    out = []
    for d in range(n_dims):
        x = sobol(index, d)
        out.append(nested_uniform_scramble_base2(
            x, hash_combine(np.uint32(seed), np.uint32(d))))
    return np.stack(out, -1)


_S32 = np.float32(1.0 / (1 << 32))


def ld_random_val(index, seed, dim: int = 0):
    index = nested_uniform_scramble_base2(np.asarray(index, np.uint32),
                                          np.uint32(seed))
    x = nested_uniform_scramble_base2(
        sobol(index, dim), hash_combine(np.uint32(seed), np.uint32(dim)))
    return x.astype(np.float32) * _S32


def ld_random_val_2d(index, seed):
    return shuffled_scrambled_sobol(index, seed, 2).astype(np.float32) * _S32


def halton(index, base: int) -> np.ndarray:
    """random_val.cuh:272-287."""
    idx = np.asarray(index, np.int64).copy()
    f = np.ones_like(idx, np.float32)
    result = np.zeros_like(idx, np.float32)
    while np.any(idx > 0):
        f = f / base
        result = result + f * (idx % base)
        idx = idx // base
    return result


def halton23(index):
    return np.stack([halton(index, 2), halton(index, 3)], -1)


def ld_random_pixel_offset(spp: int):
    """Scrambled-Sobol pixel jitter (random_val.cuh:311-322), used by the
    upsampler path (render_buffer.cu:646)."""
    off = (np.float32(0.5) - ld_random_val_2d(np.uint32(0), 0xDEADBEEF)
           + ld_random_val_2d(np.uint32(spp), 0xDEADBEEF))
    return np.mod(off, 1.0).astype(np.float32)
