"""Fine-tuning on target-speaker data, optionally co-training the VoiceLibrary.

Reference: fine_tune.py:137-204 — same GAN loop as train_decoder minus the
rolled fake branch; when a library is given, reconstruction goes through the
*differentiable* ``VoiceLibrary.match`` and a third AdamW(default betas)
optimizer trains the tokens (fine_tune.py:127-170; SURVEY §2.4.6).  The
discriminator can be frozen (``--freeze-discriminator``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from alivevc_tpu.config import DecoderConfig, DiscriminatorConfig, TrainConfig
from alivevc_tpu.models.content_encoder import content_encoder
from alivevc_tpu.models.decoder import decoder
from alivevc_tpu.models.discriminator import (
    discriminator_feat_loss,
    discriminator_logits,
)
from alivevc_tpu.models.f0_estimator import f0_estimate
from alivevc_tpu.models.voice_library import voice_library_match
from alivevc_tpu.ops.knn import match_features
from alivevc_tpu.ops.stft import spectrogram
from alivevc_tpu.train.losses import (
    cut_center,
    discriminator_adv_loss,
    generator_adv_loss,
    mel_l1_loss,
)
from alivevc_tpu.train.optim import adamw_gan


class FineTuneState(NamedTuple):
    dec_params: dict
    disc_params: dict
    vl_params: Optional[dict]
    dec_opt: optax.OptState
    disc_opt: optax.OptState
    vl_opt: Optional[optax.OptState]
    step: jax.Array


def _opts(cfg: TrainConfig):
    opt_g = adamw_gan(cfg.learning_rate, cfg.adam_b1, cfg.adam_b2, cfg.cosine_t_max)
    opt_d = adamw_gan(cfg.learning_rate, cfg.adam_b1, cfg.adam_b2, cfg.cosine_t_max)
    # OptVL is a default AdamW in the reference (fine_tune.py:127)
    opt_vl = optax.adamw(cfg.learning_rate)
    return opt_g, opt_d, opt_vl


def init_fine_tune(
    dec_params,
    disc_params,
    vl_params: Optional[dict] = None,
    cfg: TrainConfig = TrainConfig(),
) -> FineTuneState:
    opt_g, opt_d, opt_vl = _opts(cfg)
    return FineTuneState(
        dec_params,
        disc_params,
        vl_params,
        opt_g.init(dec_params),
        opt_d.init(disc_params),
        opt_vl.init(vl_params) if vl_params is not None else None,
        jnp.zeros((), jnp.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("use_library", "freeze_discriminator", "cfg", "dec_cfg", "disc_cfg"),
)
def fine_tune_step(
    state: FineTuneState,
    ce_params,
    pe_params,
    wave: jax.Array,
    rng: jax.Array,
    use_library: bool = True,
    freeze_discriminator: bool = False,
    cfg: TrainConfig = TrainConfig(),
    dec_cfg: DecoderConfig = DecoderConfig(),
    disc_cfg: DiscriminatorConfig = DiscriminatorConfig(),
):
    opt_g, opt_d, opt_vl = _opts(cfg)

    wave = wave * (jax.random.uniform(rng, (wave.shape[0], 1)) * 2.0)
    spec = spectrogram(wave)
    f0 = f0_estimate(pe_params, spec)
    content = jax.lax.stop_gradient(content_encoder(ce_params, spec))

    def g_loss_fn(dec_params, vl_params):
        if use_library:
            matched = voice_library_match(vl_params, content)
        else:
            matched = match_features(content, content)
        wave_recon, _ = decoder(dec_params, matched, f0, cfg=dec_cfg)
        logits = discriminator_logits(state.disc_params, cut_center(wave_recon), disc_cfg)
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
            "mel": loss_mel, "feat": loss_feat, "con": loss_con, "adv": loss_adv,
            "recon": wave_recon,
        }
        return loss_g, aux

    if use_library:
        (loss_g, aux), (grads_g, grads_vl) = jax.value_and_grad(
            g_loss_fn, argnums=(0, 1), has_aux=True
        )(state.dec_params, state.vl_params)
        upd_vl, vl_opt = opt_vl.update(grads_vl, state.vl_opt, state.vl_params)
        vl_params = optax.apply_updates(state.vl_params, upd_vl)
    else:
        (loss_g, aux), grads_g = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.dec_params, state.vl_params
        )
        vl_params, vl_opt = state.vl_params, state.vl_opt

    upd_g, dec_opt = opt_g.update(grads_g, state.dec_opt, state.dec_params)
    dec_params = optax.apply_updates(state.dec_params, upd_g)

    wave_recon = jax.lax.stop_gradient(aux.pop("recon"))

    if freeze_discriminator:
        disc_params, disc_opt = state.disc_params, state.disc_opt
        loss_d = jnp.zeros(())
    else:
        def d_loss_fn(disc_params):
            lf = discriminator_logits(disc_params, cut_center(wave_recon), disc_cfg)
            lr = discriminator_logits(disc_params, cut_center(wave), disc_cfg)
            return discriminator_adv_loss(lr, lf)

        loss_d, grads_d = jax.value_and_grad(d_loss_fn)(state.disc_params)
        upd_d, disc_opt = opt_d.update(grads_d, state.disc_opt, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, upd_d)

    metrics = {"loss_g": loss_g, "loss_d": loss_d, **aux}
    return (
        FineTuneState(
            dec_params, disc_params, vl_params, dec_opt, disc_opt, vl_opt,
            state.step + 1,
        ),
        metrics,
    )


@functools.lru_cache(maxsize=None)
def _dp_fine_tune_fn(mesh, use_library, freeze_discriminator, cfg, dec_cfg,
                     disc_cfg, axis_name):
    """Jitted shard_map fine-tune step, built once per (mesh, configs).

    Rather than duplicating the loss code, each shard runs the SINGLE-device
    ``fine_tune_step`` math with its optimizer updates recomputed from
    pmean'd gradients — implemented by differentiating per shard and
    reducing before the update, exactly like train/gan.py:dp_gan_train_step
    (the GSPMD alternative all-gathers conv activations for weight grads).
    """
    from jax.sharding import PartitionSpec as P

    opt_g, opt_d, opt_vl = _opts(cfg)

    def shard_fn(state, ce_params, pe_params, wave, rng):
        i = jax.lax.axis_index(axis_name)
        rng = jax.random.fold_in(rng, i)          # per-shard amplitude aug
        wave = wave * (jax.random.uniform(rng, (wave.shape[0], 1)) * 2.0)
        spec = spectrogram(wave)
        f0 = f0_estimate(pe_params, spec)
        content = jax.lax.stop_gradient(content_encoder(ce_params, spec))

        def g_loss_fn(dec_params, vl_params):
            if use_library:
                matched = voice_library_match(vl_params, content)
            else:
                matched = match_features(content, content)
            wave_recon, _ = decoder(dec_params, matched, f0, cfg=dec_cfg)
            logits = discriminator_logits(
                state.disc_params, cut_center(wave_recon), disc_cfg
            )
            loss_mel = mel_l1_loss(wave_recon, wave)
            loss_feat = discriminator_feat_loss(
                state.disc_params, cut_center(wave_recon), cut_center(wave),
                disc_cfg,
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
                "mel": loss_mel, "feat": loss_feat, "con": loss_con,
                "adv": loss_adv, "recon": wave_recon,
            }
            return loss_g, aux

        if use_library:
            (loss_g, aux), (grads_g, grads_vl) = jax.value_and_grad(
                g_loss_fn, argnums=(0, 1), has_aux=True
            )(state.dec_params, state.vl_params)
            grads_vl = jax.lax.pmean(grads_vl, axis_name)
            upd_vl, vl_opt = opt_vl.update(grads_vl, state.vl_opt, state.vl_params)
            vl_params = optax.apply_updates(state.vl_params, upd_vl)
        else:
            (loss_g, aux), grads_g = jax.value_and_grad(g_loss_fn, has_aux=True)(
                state.dec_params, state.vl_params
            )
            vl_params, vl_opt = state.vl_params, state.vl_opt

        grads_g = jax.lax.pmean(grads_g, axis_name)
        upd_g, dec_opt = opt_g.update(grads_g, state.dec_opt, state.dec_params)
        dec_params = optax.apply_updates(state.dec_params, upd_g)

        wave_recon = jax.lax.stop_gradient(aux.pop("recon"))
        if freeze_discriminator:
            disc_params, disc_opt = state.disc_params, state.disc_opt
            loss_d = jnp.zeros(())
        else:
            def d_loss_fn(disc_params):
                lf = discriminator_logits(disc_params, cut_center(wave_recon), disc_cfg)
                lr = discriminator_logits(disc_params, cut_center(wave), disc_cfg)
                return discriminator_adv_loss(lr, lf)

            loss_d, grads_d = jax.value_and_grad(d_loss_fn)(state.disc_params)
            grads_d = jax.lax.pmean(grads_d, axis_name)
            upd_d, disc_opt = opt_d.update(grads_d, state.disc_opt, state.disc_params)
            disc_params = optax.apply_updates(state.disc_params, upd_d)

        metrics = jax.lax.pmean({"loss_g": loss_g, "loss_d": loss_d, **aux},
                                axis_name)
        return (
            FineTuneState(dec_params, disc_params, vl_params, dec_opt,
                          disc_opt, vl_opt, state.step + 1),
            metrics,
        )

    return jax.jit(
        jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P(), P(axis_name), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )


def dp_fine_tune_step(
    mesh,
    state: FineTuneState,
    ce_params,
    pe_params,
    wave: jax.Array,   # [N, L] sharded over ``axis_name``
    rng: jax.Array,
    use_library: bool = True,
    freeze_discriminator: bool = False,
    cfg: TrainConfig = TrainConfig(),
    dec_cfg: DecoderConfig = DecoderConfig(),
    disc_cfg: DiscriminatorConfig = DiscriminatorConfig(),
    axis_name: str = "data",
):
    """Explicit-SPMD data-parallel fine-tune step (up to three optimizers:
    decoder, discriminator, voice-library tokens — all on pmean'd grads)."""
    fn = _dp_fine_tune_fn(mesh, use_library, freeze_discriminator, cfg,
                          dec_cfg, disc_cfg, axis_name)
    return fn(state, ce_params, pe_params, wave, rng)
