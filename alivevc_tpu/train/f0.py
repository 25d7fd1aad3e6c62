"""F0Estimator training: per-frame 4096-way classification on WORLD labels.

Reference: train_f0_estimator.py:62-88 — amplitude augmentation ×U(0.25, 1),
CE loss with ignore_index=0 (unvoiced), RAdam.  Labels come from the WORLD
DIO+StoneMask pipeline (ops/world.py on the host data path).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from alivevc_tpu.models.f0_estimator import f0_estimator, init_f0_estimator
from alivevc_tpu.ops.stft import spectrogram
from alivevc_tpu.train.losses import f0_cross_entropy
from alivevc_tpu.train.optim import radam


class F0TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


def init_f0_train(key, learning_rate: float = 1e-4) -> F0TrainState:
    params = init_f0_estimator(key)
    opt = radam(learning_rate)
    return F0TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))


@functools.partial(jax.jit, static_argnames=("learning_rate",))
def f0_train_step(
    state: F0TrainState,
    wave: jax.Array,   # [N, L]
    f0: jax.Array,     # [N, T] Hz labels (T = L//320)
    rng: jax.Array,
    learning_rate: float = 1e-4,
):
    opt = radam(learning_rate)
    amp = jax.random.uniform(rng, (wave.shape[0], 1)) * 0.75 + 0.25
    wave = wave * amp

    def loss_fn(params):
        logits = f0_estimator(params, spectrogram(wave))
        return f0_cross_entropy(logits, f0)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return F0TrainState(params, opt_state, state.step + 1), {"loss": loss}
