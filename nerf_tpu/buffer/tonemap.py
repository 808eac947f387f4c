"""Tonemapping and color-space conversions.

Reference parity: the device tonemap/srgb functions of
src/render_buffer.cu:261-339 and include/nerf-cuda/common_device.cuh:38-60:
  - curves Identity / ACES / Hable / Reinhard with the exact rational-
    polynomial constants (incl. pre-exposure cancellation and Hable
    white-scale folding)
  - sRGB <-> linear piecewise transfer functions
  - the 4-step pipeline of tonemap(col, exposure, curve, in_cs, out_cs)
    (render_buffer.cu:320-339)
"""
from __future__ import annotations

import jax.numpy as jnp

CURVES = ("Identity", "ACES", "Hable", "Reinhard")


def srgb_to_linear(x):
    """common_device.cuh:38-43."""
    return jnp.where(x <= 0.04045, x / 12.92,
                     jnp.power(jnp.maximum((x + 0.055) / 1.055, 0.0), 2.4))


def linear_to_srgb(x):
    """common_device.cuh:49-54 (note the reference's 0.41666 exponent)."""
    return jnp.where(x < 0.0031308, 12.92 * x,
                     1.055 * jnp.power(jnp.maximum(x, 1e-12), 0.41666)
                     - 0.055)


def tonemap_curve(x, curve: str = "Identity"):
    """render_buffer.cu:261-318. x: [..., 3] linear color."""
    if curve == "Identity":
        return x
    x = jnp.maximum(x, 0.0)
    if curve == "Reinhard":
        lum = (0.2126 * x[..., 0] + 0.7152 * x[..., 1]
               + 0.0722 * x[..., 2])
        return x * (1.0 / (lum + 1.0))[..., None]
    if curve == "ACES":
        k0 = 0.6 * 0.6 * 2.51
        k1 = 0.6 * 0.03
        k2 = 0.0
        k3 = 0.6 * 0.6 * 2.43
        k4 = 0.6 * 0.59
        k5 = 0.14
    elif curve == "Hable":
        a, b, c, d, e, f = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
        k0 = a * f - a * e
        k1 = c * b * f - b * e
        k2 = 0.0
        k3 = a * f
        k4 = b * f
        k5 = d * f * f
        w = 11.2
        nom = k0 * w * w + k1 * w + k2
        denom = k3 * w * w + k4 * w + k5
        white_scale = denom / nom
        k0 = 4.0 * k0 * white_scale
        k1 = 2.0 * k1 * white_scale
        k2 = k2 * white_scale
        k3 = 4.0 * k3
        k4 = 2.0 * k4
    else:
        raise ValueError(f"Unknown tonemap curve: {curve}")
    x2 = x * x
    return (x2 * k0 + k1 * x + k2) / (k3 * x2 + k4 * x + k5)


def tonemap(col, exposure=0.0, curve: str = "Identity",
            color_space: str = "Linear", output_color_space: str = "Linear"):
    """Full pipeline (render_buffer.cu:320-339)."""
    if color_space == "SRGB":
        col = srgb_to_linear(col)
    col = col * jnp.exp2(jnp.asarray(exposure, col.dtype))
    col = tonemap_curve(col, curve)
    if output_color_space == "SRGB":
        col = linear_to_srgb(col)
    return col
