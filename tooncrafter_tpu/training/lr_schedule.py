"""LR schedules: linear-warmup LambdaLR and cosine annealing.

Counterparts of configure_schedulers (ddpm3d.py:1015-1039): the reference
offers a LambdaLR warmup schedule (utils/lr_scheduler.py style) and
CosineAnnealingLR; expressed here as optax schedules so they chain into the
optimizer transformation.
"""

from __future__ import annotations

import optax


def warmup_schedule(base_lr: float, warmup_steps: int,
                    start_factor: float = 0.0) -> optax.Schedule:
    """Linear ramp from start_factor*base_lr to base_lr over warmup_steps,
    then constant."""
    return optax.join_schedules([
        optax.linear_schedule(base_lr * start_factor, base_lr, warmup_steps),
        optax.constant_schedule(base_lr),
    ], [warmup_steps])


def cosine_schedule(base_lr: float, decay_steps: int,
                    warmup_steps: int = 0,
                    final_factor: float = 0.0) -> optax.Schedule:
    if warmup_steps > 0:
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=base_lr,
            warmup_steps=warmup_steps, decay_steps=decay_steps,
            end_value=base_lr * final_factor)
    return optax.cosine_decay_schedule(base_lr, decay_steps,
                                       alpha=final_factor)


def from_config(base_lr: float, scheduler_cfg: dict) -> optax.Schedule:
    """Resolve the reference's scheduler YAML (`target` + params)."""
    target = scheduler_cfg.get("target", "")
    p = scheduler_cfg.get("params", {})
    if "LambdaLRScheduler" in target or "lambda" in target.lower():
        return warmup_schedule(base_lr, p.get("num_warmup_steps",
                                              p.get("warm_up_steps", 1000)))
    if "Cosine" in target:
        return cosine_schedule(base_lr, p.get("decay_steps", 100000),
                               p.get("warm_up_steps", 0),
                               p.get("final_factor", 0.0))
    return optax.constant_schedule(base_lr)
