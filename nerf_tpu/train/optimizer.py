"""Config-driven optimizer construction.

Reference parity: the tcnn optimizer config schema consumed by
configs/nerf/base.json:5-22 — nested wrappers
Ema{decay, nested: ExponentialDecay{decay_start, decay_interval,
decay_base, nested: Adam{learning_rate, beta1, beta2, epsilon, l2_reg}}}.
The reference never instantiates them (training is stubbed); here they
map onto optax so training is real.

create_optimizer(config) -> (optax.GradientTransformation, ema_decay|None).
EMA weight averaging is returned separately (it averages parameters, not
gradients) and applied by the Trainer.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import optax


def _schedule_from(config: Dict, base_lr: float):
    """ExponentialDecay wrapper -> optax schedule (tcnn
    optimizers/exponential_decay.h semantics: lr *= decay_base every
    decay_interval steps after decay_start, until decay_end)."""
    start = int(config.get("decay_start", 0))
    interval = max(1, int(config.get("decay_interval", 10000)))
    base = float(config.get("decay_base", 0.33))
    end = min(int(config.get("decay_end", 2 ** 31 - 1)), 2 ** 31 - 1)

    def schedule(step):
        import jax.numpy as jnp

        s = jnp.minimum(step, end)
        n = jnp.maximum(0, (s - start) // interval)
        return base_lr * (base ** n.astype(jnp.float32))

    return schedule


def _build(config: Dict, schedule_wrap=None
           ) -> Tuple[optax.GradientTransformation, Optional[float]]:
    otype = str(config.get("otype", "Adam")).lower()

    if otype == "ema":
        inner, _ = _build(config["nested"], schedule_wrap)
        return inner, float(config.get("decay", 0.99))

    if otype == "exponentialdecay":
        return _build(config["nested"], config)

    lr = float(config.get("learning_rate", 1e-3))
    lr_or_schedule = _schedule_from(schedule_wrap, lr) if schedule_wrap else lr

    if otype == "adam":
        tx = optax.adam(
            learning_rate=lr_or_schedule,
            b1=float(config.get("beta1", 0.9)),
            b2=float(config.get("beta2", 0.999)),
            eps=float(config.get("epsilon", 1e-8)),
        )
        l2 = float(config.get("l2_reg", 0.0))
        if l2 > 0:
            tx = optax.chain(optax.add_decayed_weights(l2), tx)
        return tx, None
    if otype == "sgd":
        return optax.sgd(lr_or_schedule,
                         momentum=float(config.get("momentum", 0.0)) or None
                         ), None
    if otype in ("novograd", "lamb", "adagrad", "rmsprop"):
        return getattr(optax, otype)(lr_or_schedule), None
    raise ValueError(f"Unknown optimizer otype: {config.get('otype')}")


def create_optimizer(config: Dict
                     ) -> Tuple[optax.GradientTransformation,
                                Optional[float]]:
    return _build(config)
