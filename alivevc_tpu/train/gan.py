"""GAN decoder training — the reference's most complex loop as one jitted step.

Reference: train_decoder.py:117-176.  Per step:

  * amplitude augmentation ×U(0, 2);
  * frozen ContentEncoder / F0Estimator produce content + F0 (no grad);
  * ``wave_recon`` — decoder on self-matched content (match_features(content,
    content), true F0); ``wave_fake`` — decoder on content matched against the
    batch rolled by one (pseudo-cross-speaker) with F0 jittered ×U(0.5, 1.5);
  * G loss = 45·mel(recon, wave) + 2·feat_match + 1·content-preservation +
    Σ logit² over D(center(fake)) and D(center(recon));
  * D step on the detached fake vs real (inverted LSGAN labels), computed with
    the *pre-update* generator outputs, exactly like the torch ordering;
  * AdamW(0.8, 0.99) + cosine-annealing(5000) for both optimizers.

The whole step jits into a single TPU program; under a ``('data',)`` mesh the
batch shards and the SPMD partitioner inserts the gradient psum.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from alivevc_tpu.config import DecoderConfig, DiscriminatorConfig, TrainConfig
from alivevc_tpu.models.content_encoder import content_encoder
from alivevc_tpu.models.decoder import decoder, init_decoder
from alivevc_tpu.models.discriminator import (
    discriminator_feat_loss,
    discriminator_logits,
    init_discriminator,
)
from alivevc_tpu.models.f0_estimator import f0_estimate
from alivevc_tpu.ops.knn import match_features
from alivevc_tpu.ops.stft import spectrogram
from alivevc_tpu.train.losses import (
    cut_center,
    discriminator_adv_loss,
    generator_adv_loss,
    mel_l1_loss,
)
from alivevc_tpu.train.optim import adamw_gan


class GanState(NamedTuple):
    dec_params: dict
    disc_params: dict
    dec_opt: optax.OptState
    disc_opt: optax.OptState
    step: jax.Array


def _make_opts(cfg: TrainConfig):
    opt_g = adamw_gan(cfg.learning_rate, cfg.adam_b1, cfg.adam_b2, cfg.cosine_t_max)
    opt_d = adamw_gan(cfg.learning_rate, cfg.adam_b1, cfg.adam_b2, cfg.cosine_t_max)
    return opt_g, opt_d


def init_gan(
    key,
    cfg: TrainConfig = TrainConfig(),
    dec_cfg: DecoderConfig = DecoderConfig(),
    disc_cfg: DiscriminatorConfig = DiscriminatorConfig(),
) -> GanState:
    k1, k2 = jax.random.split(key)
    dec = init_decoder(k1, dec_cfg)
    disc = init_discriminator(k2, disc_cfg)
    opt_g, opt_d = _make_opts(cfg)
    return GanState(dec, disc, opt_g.init(dec), opt_d.init(disc), jnp.zeros((), jnp.int32))


@functools.partial(jax.jit, static_argnames=("cfg", "dec_cfg", "disc_cfg"))
def gan_train_step(
    state: GanState,
    ce_params,       # frozen
    pe_params,       # frozen
    wave: jax.Array,  # [N, L]
    rng: jax.Array,
    cfg: TrainConfig = TrainConfig(),
    dec_cfg: DecoderConfig = DecoderConfig(),
    disc_cfg: DiscriminatorConfig = DiscriminatorConfig(),
):
    opt_g, opt_d = _make_opts(cfg)
    r_amp, r_f0 = jax.random.split(rng)

    wave = wave * (jax.random.uniform(r_amp, (wave.shape[0], 1)) * 2.0)
    spec = spectrogram(wave)
    f0 = f0_estimate(pe_params, spec)
    content = jax.lax.stop_gradient(content_encoder(ce_params, spec))
    f0_jitter = 0.5 + jax.random.uniform(r_f0, (1, 1, 1))

    matched_self = match_features(content, content)
    matched_roll = match_features(content, jnp.roll(content, 1, axis=0))

    def g_loss_fn(dec_params):
        wave_recon, _ = decoder(dec_params, matched_self, f0, cfg=dec_cfg)
        wave_fake, _ = decoder(dec_params, matched_roll, f0 * f0_jitter, cfg=dec_cfg)
        logits = discriminator_logits(
            state.disc_params, cut_center(wave_fake), disc_cfg
        ) + discriminator_logits(state.disc_params, cut_center(wave_recon), disc_cfg)
        loss_mel = mel_l1_loss(wave_recon, wave)
        loss_feat = discriminator_feat_loss(
            state.disc_params, cut_center(wave_recon), cut_center(wave), disc_cfg
        )
        loss_con = jnp.mean(
            jnp.abs(content - content_encoder(ce_params, spectrogram(wave_recon)))
        )
        loss_adv = generator_adv_loss(logits)
        loss_g = (
            loss_mel * cfg.mel_weight
            + loss_feat * cfg.feat_weight
            + loss_con * cfg.content_weight
            + loss_adv
        )
        aux = {
            "mel": loss_mel,
            "feat": loss_feat,
            "con": loss_con,
            "adv": loss_adv,
            "fake": wave_fake,
        }
        return loss_g, aux

    (loss_g, aux), grads_g = jax.value_and_grad(g_loss_fn, has_aux=True)(
        state.dec_params
    )
    upd_g, dec_opt = opt_g.update(grads_g, state.dec_opt, state.dec_params)
    dec_params = optax.apply_updates(state.dec_params, upd_g)

    wave_fake = jax.lax.stop_gradient(aux.pop("fake"))

    def d_loss_fn(disc_params):
        logits_fake = discriminator_logits(disc_params, cut_center(wave_fake), disc_cfg)
        logits_real = discriminator_logits(disc_params, cut_center(wave), disc_cfg)
        return discriminator_adv_loss(logits_real, logits_fake)

    loss_d, grads_d = jax.value_and_grad(d_loss_fn)(state.disc_params)
    upd_d, disc_opt = opt_d.update(grads_d, state.disc_opt, state.disc_params)
    disc_params = optax.apply_updates(state.disc_params, upd_d)

    metrics = {"loss_g": loss_g, "loss_d": loss_d, **aux}
    return (
        GanState(dec_params, disc_params, dec_opt, disc_opt, state.step + 1),
        metrics,
    )
