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


@functools.lru_cache(maxsize=None)
def _dp_f0_fn(mesh, learning_rate: float, axis_name: str):
    from jax.sharding import PartitionSpec as P

    from alivevc_tpu.train.losses import f0_cross_entropy_parts

    opt = radam(learning_rate)

    def shard_fn(state, wave, f0, rng):
        i = jax.lax.axis_index(axis_name)
        amp_rng = jax.random.fold_in(rng, i)
        amp = jax.random.uniform(amp_rng, (wave.shape[0], 1)) * 0.75 + 0.25
        wave_aug = wave * amp

        def loss_fn(params):
            logits = f0_estimator(params, spectrogram(wave_aug))
            # psum BOTH reduction parts: the sharded loss equals the global
            # ignore_index=0 mean exactly even with uneven voiced counts
            total, count = f0_cross_entropy_parts(logits, f0)
            total = jax.lax.psum(total, axis_name)
            count = jax.lax.psum(count, axis_name)
            return total / jnp.maximum(count, 1)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        # loss_fn's psums make the value AND its cotangents global already;
        # psum of the per-shard grads completes sum over shard-local batches
        grads = jax.lax.psum(grads, axis_name)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return F0TrainState(params, opt_state, state.step + 1), {"loss": loss}

    return jax.jit(
        jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(axis_name), P(axis_name), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )


def dp_f0_train_step(
    mesh,
    state: F0TrainState,
    wave: jax.Array,   # [N, L] sharded over ``axis_name``
    f0: jax.Array,     # [N, T] sharded the same way
    rng: jax.Array,
    learning_rate: float = 1e-4,
    axis_name: str = "data",
):
    """Explicit-SPMD data-parallel F0 training step (local grads + psum);
    exactly equal to the dense step's loss on the same global batch."""
    return _dp_f0_fn(mesh, learning_rate, axis_name)(state, wave, f0, rng)
