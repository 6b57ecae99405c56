"""Optimizer construction: Adam + L2 weight decay + grad clipping + schedules.

Matches the reference's torch ``Adam(lr, weight_decay)`` semantics
(reference: src/model/trainer.py:71-75) — torch's ``weight_decay`` adds
``wd * param`` to the *gradient before* the Adam moments (classic L2, not
decoupled AdamW), reproduced here by ordering ``add_decayed_weights``
before ``scale_by_adam``.  Optional global-norm clipping reproduces
``clip_grad_norm_`` (trainer.py:279-283, config gradient_clip 5.0) and the
LR schedule slot reproduces the optional scheduler (trainer.py:516-523).
"""

from __future__ import annotations

import optax

from ncf_tpu.utils.config import TrainConfig


def make_schedule(cfg: TrainConfig, steps_per_epoch: int) -> optax.Schedule:
    total = max(1, cfg.num_epochs * steps_per_epoch)
    if cfg.lr_schedule == "cosine":
        warmup = cfg.warmup_steps
        if warmup > 0:
            return optax.warmup_cosine_decay_schedule(
                0.0, cfg.learning_rate, warmup, total)
        return optax.cosine_decay_schedule(cfg.learning_rate, total)
    if cfg.lr_schedule == "constant":
        return optax.constant_schedule(cfg.learning_rate)
    raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")


def make_optimizer(
    cfg: TrainConfig, steps_per_epoch: int = 1000
) -> optax.GradientTransformation:
    schedule = make_schedule(cfg, steps_per_epoch)
    chain = []
    if cfg.gradient_clip_norm and cfg.gradient_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.gradient_clip_norm))
    if cfg.weight_decay and cfg.weight_decay > 0:
        # L2-into-Adam (torch Adam weight_decay), not decoupled AdamW
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    chain.append(optax.scale_by_adam())
    chain.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*chain)
