"""Config-driven losses.

Reference parity: the tcnn loss registry referenced by the config schema
(configs/nerf/base.json:2-4 uses "Huber"; vendored tcnn ships L1/L2/
RelativeL2/RelativeL2Luminance/MAPE/SMAPE/CrossEntropy/Variance losses in
dependencies/tiny-cuda-nn/include/tiny-cuda-nn/losses/). The reference
never instantiates them (training is stubbed, nerf_network.h:202-221);
here they are live because this framework implements real training.

All losses are elementwise mean reductions over (prediction, target).
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

_EPS = 1e-2  # tcnn relative losses use prediction^2 + 0.01


def l1(pred, target):
    return jnp.abs(pred - target)


def l2(pred, target):
    d = pred - target
    return d * d


def relative_l2(pred, target):
    # tcnn treats the denominator as a constant (explicit gradient
    # 2(pred-target)/(pred^2+eps) in losses/relative_l2.h).
    d = pred - target
    denom = jax.lax.stop_gradient(pred * pred + _EPS)
    return d * d / denom


def relative_l2_luminance(pred, target):
    d = pred - target
    lum = 0.299 * target[..., 0:1] + 0.587 * target[..., 1:2] \
        + 0.114 * target[..., 2:3]
    return d * d / (lum * lum + _EPS)


def mape(pred, target):
    return jnp.abs(pred - target) / (jnp.abs(target) + _EPS)


def smape(pred, target):
    return (2.0 * jnp.abs(pred - target)
            / (jnp.abs(pred) + jnp.abs(target) + _EPS))


def huber(pred, target, delta: float = 0.1):
    """Huber a.k.a. smooth-L1 (base.json default loss)."""
    d = jnp.abs(pred - target)
    return jnp.where(d <= delta, 0.5 * d * d / delta, d - 0.5 * delta)


def cross_entropy(pred, target):
    p = jnp.clip(pred, 1e-9, None)
    return -target * jnp.log(p)


_REGISTRY: Dict[str, Callable] = {
    "l1": l1,
    "l2": l2,
    "relativel2": relative_l2,
    "relativel2luminance": relative_l2_luminance,
    "mape": mape,
    "smape": smape,
    "huber": huber,
    "crossentropy": cross_entropy,
}


def create_loss(config: Dict) -> Callable:
    """otype-dispatched loss factory (tcnn loss.h create_loss analog)."""
    otype = str(config.get("otype", "L2")).lower().replace("_", "")
    fn = _REGISTRY.get(otype)
    if fn is None:
        raise ValueError(f"Unknown loss otype: {config.get('otype')}")
    if otype == "huber" and "delta" in config:
        delta = float(config["delta"])
        return lambda p, t: huber(p, t, delta)
    return fn
