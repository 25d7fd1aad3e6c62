"""ContentEncoder distillation from a WavLM teacher.

Reference: train_content_encoder.py:62-87 — L1 between the student's output
and the teacher feature (mean of WavLM hidden states 4 and 9, linearly
interpolated to wave_len//320 frames, module/hubert.py:15-22).

TPU-native split: the frozen torch teacher runs host-side (or features are
precomputed to disk by ``alivevc_tpu.io.teacher``); the student step is a
single jitted program taking (wave, teacher_feature) batches.  Teacher
features are the only host↔device traffic besides audio.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from alivevc_tpu.models.content_encoder import content_encoder, init_content_encoder
from alivevc_tpu.ops.stft import spectrogram
from alivevc_tpu.train.optim import radam


class DistillState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


def init_distill(key, learning_rate: float = 1e-4) -> DistillState:
    params = init_content_encoder(key)
    opt = radam(learning_rate)
    return DistillState(params, opt.init(params), jnp.zeros((), jnp.int32))


@functools.partial(jax.jit, static_argnames=("learning_rate",))
def distill_step(
    state: DistillState,
    wave: jax.Array,            # [N, L] at 16 kHz
    teacher_feature: jax.Array,  # [N, T, 768] aligned to L//320 frames
    learning_rate: float = 1e-4,
):
    opt = radam(learning_rate)

    def loss_fn(params):
        spec = spectrogram(wave)
        out = content_encoder(params, spec)
        return jnp.mean(jnp.abs(out - teacher_feature))

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return DistillState(params, opt_state, state.step + 1), {"loss": loss}


@functools.lru_cache(maxsize=None)
def _dp_distill_fn(mesh, learning_rate: float, axis_name: str):
    from jax.sharding import PartitionSpec as P

    opt = radam(learning_rate)

    def shard_fn(state, wave, teacher):
        def loss_fn(params):
            out = content_encoder(params, spectrogram(wave))
            return jnp.mean(jnp.abs(out - teacher))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grads = jax.lax.pmean(grads, axis_name)
        loss = jax.lax.pmean(loss, axis_name)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return DistillState(params, opt_state, state.step + 1), {"loss": loss}

    return jax.jit(
        jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(axis_name), P(axis_name)), out_specs=(P(), P()),
            check_vma=False,
        )
    )


def dp_distill_step(
    mesh,
    state: DistillState,
    wave: jax.Array,             # [N, L] sharded over ``axis_name``
    teacher_feature: jax.Array,  # [N, T, 768] sharded the same way
    learning_rate: float = 1e-4,
    axis_name: str = "data",
):
    """Explicit-SPMD data-parallel distillation step: local grads + one
    pmean (equal shard sizes make the pmean'd element-mean L1 exactly the
    global mean).  Same rationale as train/gan.py:dp_gan_train_step — the
    GSPMD partitioning of conv weight grads all-gathers activations, which
    is fatal over DCN."""
    return _dp_distill_fn(mesh, learning_rate, axis_name)(
        state, wave, teacher_feature
    )
