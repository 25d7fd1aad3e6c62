"""Fine-tuning CLI (reference: fine_tune.py): decoder GAN on target-speaker
data, optionally co-training the voice library with a third optimizer."""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from alivevc_tpu.cli.common import load_params_or_init
from alivevc_tpu.compat.torch_import import (
    import_content_encoder,
    import_decoder,
    import_discriminator,
    import_f0_estimator,
    import_voice_library,
)
from alivevc_tpu.config import TrainConfig
from alivevc_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from alivevc_tpu.io.dataset import WaveChunkDataset
from alivevc_tpu.models.content_encoder import init_content_encoder
from alivevc_tpu.models.decoder import init_decoder
from alivevc_tpu.models.discriminator import init_discriminator
from alivevc_tpu.models.f0_estimator import init_f0_estimator
from alivevc_tpu.models.voice_library import init_voice_library
from alivevc_tpu.train.fine_tune import fine_tune_step, init_fine_tune


def build_parser():
    p = argparse.ArgumentParser(description="fine-tune decoder (+voice library)")
    p.add_argument("dataset")
    p.add_argument("-dep", "--decoder-path", default="decoder.ckpt")
    p.add_argument("-disp", "--discriminator-path", default="discriminator.ckpt")
    p.add_argument("-cep", "--content-encoder-path", default="content_encoder.ckpt")
    p.add_argument("-f0ep", "--f0-estimator-path", default="f0_estimator.ckpt")
    p.add_argument("-lib", "--voice-library-path", default="voice_library.ckpt")
    p.add_argument("-sp", "--state-path", default="fine_tune_state.ckpt")
    p.add_argument("-e", "--epoch", default=1000, type=int)
    p.add_argument("-b", "--batch-size", default=1, type=int)
    p.add_argument("-lr", "--learning-rate", default=1e-4, type=float)
    p.add_argument("-len", "--length", default=38400, type=int)
    p.add_argument("-m", "--max-data", default=-1, type=int)
    p.add_argument("--feature-matching", default=2.0, type=float)
    p.add_argument("--mel", default=45.0, type=float)
    p.add_argument("--content", default=1.0, type=float)
    p.add_argument("--max-step", default=-1, type=int)
    p.add_argument("-fd", "--freeze-discriminator", action="store_true")
    p.add_argument("--save-every", default=100, type=int)
    p.add_argument("--dp", action="store_true",
                   help="data-parallel over all visible devices (explicit "
                        "shard_map step, train/fine_tune.py:dp_fine_tune_step)")
    return p


def main(argv=None):
    from alivevc_tpu.cli.common import apply_platform_env

    apply_platform_env()
    args = build_parser().parse_args(argv)
    key = jax.random.PRNGKey(0)
    ce = load_params_or_init(
        args.content_encoder_path, init_content_encoder, import_content_encoder, key
    )
    pe = load_params_or_init(
        args.f0_estimator_path, init_f0_estimator, import_f0_estimator, key
    )
    dec = load_params_or_init(args.decoder_path, init_decoder, import_decoder, key)
    disc = load_params_or_init(
        args.discriminator_path, init_discriminator, import_discriminator, key
    )
    use_library = args.voice_library_path != "NONE"
    vl = (
        load_params_or_init(
            args.voice_library_path, init_voice_library, import_voice_library, key
        )
        if use_library
        else None
    )

    cfg = TrainConfig(
        learning_rate=args.learning_rate,
        mel_weight=args.mel,
        feat_weight=args.feature_matching,
        content_weight=args.content,
    )
    state = init_fine_tune(dec, disc, vl, cfg)
    if os.path.exists(args.state_path):
        state = load_checkpoint(args.state_path, state)
        print(f"resumed at step {int(state.step)}")

    # multi-host dp: each host loads only its file shard (per-host RAM =
    # corpus/host_count; gradients psum across hosts, so disjoint data is
    # all that is needed)
    _hs = ((jax.process_index(), jax.process_count())
           if jax.process_count() > 1 else None)
    ds = WaveChunkDataset([args.dataset], length=args.length,
                          max_files=args.max_data, host_shard=_hs)
    print(f"Loaded {len(ds)} chunks")
    if len(ds) == 0:
        raise SystemExit("no audio chunks found — check the dataset path/length")

    def save_all():
        save_checkpoint(args.state_path, state)
        save_checkpoint(args.decoder_path, state.dec_params)
        if use_library:
            save_checkpoint(args.voice_library_path, state.vl_params)

    mesh = None
    if args.dp:
        from alivevc_tpu.parallel.mesh import make_mesh, replicate

        n_dev = len(jax.devices())
        if args.batch_size % n_dev:
            raise SystemExit(f"--dp needs batch size divisible by {n_dev} devices")
        mesh = make_mesh([("data", n_dev)])
        state = replicate(state, mesh)
        ce = replicate(ce, mesh)
        pe = replicate(pe, mesh)
        print(f"data-parallel over {n_dev} devices")

    rng_np = np.random.default_rng(0)
    rng = jax.random.PRNGKey(2)
    for epoch in range(args.epoch):
        order = rng_np.permutation(len(ds))
        for i in range(0, len(ds) - args.batch_size + 1, args.batch_size):
            sel = order[i : i + args.batch_size]
            rng, sub = jax.random.split(rng)
            if mesh is not None:
                import jax.numpy as jnp

                from alivevc_tpu.parallel.mesh import shard_along
                from alivevc_tpu.train.fine_tune import dp_fine_tune_step

                state, m = dp_fine_tune_step(
                    mesh, state, ce, pe,
                    shard_along(jnp.asarray(ds.chunks[sel]), mesh, "data", 0),
                    sub, use_library=use_library,
                    freeze_discriminator=args.freeze_discriminator, cfg=cfg,
                )
            else:
                state, m = fine_tune_step(
                    state, ce, pe, ds.chunks[sel], sub,
                    use_library=use_library,
                    freeze_discriminator=args.freeze_discriminator,
                    cfg=cfg,
                )
            print(
                f"Step {int(state.step)}, D: {float(m['loss_d']):.4f}, "
                f"Adv.: {float(m['adv']):.4f}, Mel.: {float(m['mel']):.4f}, "
                f"Feat.: {float(m['feat']):.4f}, Con.: {float(m['con']):.4f}"
            )
            if int(state.step) % args.save_every == 0:
                save_all()
            if args.max_step != -1 and int(state.step) >= args.max_step:
                save_all()
                return
    save_all()
    print("Training Complete!")


if __name__ == "__main__":
    main()
