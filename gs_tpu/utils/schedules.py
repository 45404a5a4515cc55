"""Learning-rate schedules.

Behavioral parity: reference ``utils/general_utils.py:30-69`` — log-linear
interpolation from lr_init to lr_final over max_steps, with an optional
sine-eased delay multiplier for the first lr_delay_steps.
"""

from __future__ import annotations

import jax.numpy as jnp


def expon_lr(
    step,
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
):
    """Traceable version of get_expon_lr_func; ``step`` may be a traced scalar."""
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, jnp.float32))
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1.0 - t) + jnp.log(lr_final) * t)
    return jnp.where(step < 0, 0.0, delay_rate * log_lerp)


def xyz_lr(step, opt_cfg, spatial_lr_scale: float):
    """The position-lr schedule wired in ``gaussian_model.py:200-205``."""
    return expon_lr(
        step,
        lr_init=opt_cfg.position_lr_init * spatial_lr_scale,
        lr_final=opt_cfg.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt_cfg.position_lr_delay_mult,
        max_steps=opt_cfg.position_lr_max_steps,
    )
