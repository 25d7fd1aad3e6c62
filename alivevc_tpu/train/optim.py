"""Optimizers / schedules matching the reference trainers.

  * RAdam lr=1e-4 for encoder/F0 training (train_content_encoder.py:56)
  * AdamW(betas=(0.8, 0.99)) + torch-semantics CosineAnnealingLR(T_max=5000)
    for the GAN loops (train_decoder.py:100-104)
"""

from __future__ import annotations

import math

import optax


def cosine_annealing(base_lr: float, t_max: int, eta_min: float = 0.0):
    """torch.optim.lr_scheduler.CosineAnnealingLR closed form — periodic:
    lr(t) = eta_min + (base-eta_min) * (1 + cos(pi * t / T_max)) / 2."""

    def schedule(step):
        import jax.numpy as jnp

        return eta_min + (base_lr - eta_min) * (
            1.0 + jnp.cos(math.pi * step / t_max)
        ) / 2.0

    return schedule


def adamw_gan(
    learning_rate: float = 1e-4,
    b1: float = 0.8,
    b2: float = 0.99,
    t_max: int = 5000,
    weight_decay: float = 0.01,
) -> optax.GradientTransformation:
    return optax.adamw(
        learning_rate=cosine_annealing(learning_rate, t_max),
        b1=b1,
        b2=b2,
        weight_decay=weight_decay,
    )


def radam(learning_rate: float = 1e-4) -> optax.GradientTransformation:
    return optax.radam(learning_rate)
