"""ContentEncoder distillation CLI (reference: train_content_encoder.py).

    python -m alivevc_tpu.cli.train_content_encoder DATASET_DIR \
        [--teacher-features feats.npz]

Teacher features come from a cached WavLM (io/teacher.py) or a precomputed
``.npz`` (key 'features', [M, T, 768] aligned with the dataset's chunks).
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from alivevc_tpu.cli.common import load_params_or_init, save_params
from alivevc_tpu.compat.torch_import import import_content_encoder
from alivevc_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from alivevc_tpu.io.dataset import WaveChunkDataset
from alivevc_tpu.models.content_encoder import init_content_encoder
from alivevc_tpu.train.distill import DistillState, distill_step, init_distill


def build_parser():
    p = argparse.ArgumentParser(description="train content encoder (distillation)")
    p.add_argument("dataset")
    p.add_argument("-mp", "--model-path", default="content_encoder.ckpt")
    p.add_argument("-e", "--epoch", default=1000, type=int)
    p.add_argument("-b", "--batch-size", default=16, type=int)
    p.add_argument("-lr", "--learning-rate", default=1e-4, type=float)
    p.add_argument("-len", "--length", default=65536, type=int)
    p.add_argument("-m", "--max-data", default=-1, type=int)
    p.add_argument("--teacher-features", default=None,
                   help=".npz with precomputed WavLM features")
    p.add_argument("--wavlm-checkpoint", default=None,
                   help="torch WavLM state dict (.pt/.bin) — runs the JAX "
                        "WavLM teacher on-device instead of host torch")
    p.add_argument("--save-every", default=100, type=int)
    p.add_argument("--dp", action="store_true",
                   help="data-parallel over all visible devices (explicit "
                        "shard_map step, train/distill.py:dp_distill_step)")
    return p


def main(argv=None):
    from alivevc_tpu.cli.common import apply_platform_env

    apply_platform_env()
    args = build_parser().parse_args(argv)
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

    if args.teacher_features:
        feats = np.load(args.teacher_features)["features"]
        assert feats.shape[0] == len(ds), "teacher features must align with chunks"
    elif args.wavlm_checkpoint:
        from alivevc_tpu.compat.torch_import import load_torch_state_dict
        from alivevc_tpu.models.wavlm import import_wavlm, wavlm_features

        wl = import_wavlm(load_torch_state_dict(args.wavlm_checkpoint))
        outs = []
        for i in range(0, len(ds), 8):
            batch = jax.numpy.asarray(ds.chunks[i : i + 8])
            outs.append(np.asarray(wavlm_features(wl, batch)))
        feats = np.concatenate(outs, axis=0)
    else:
        from alivevc_tpu.io.teacher import precompute_teacher_features

        feats = precompute_teacher_features(ds.chunks)

    state = init_distill(jax.random.PRNGKey(0), args.learning_rate)
    import os

    if os.path.exists(args.model_path):
        state = load_checkpoint(args.model_path, state)
        print(f"resumed at step {int(state.step)}")

    mesh = None
    if args.dp:
        from alivevc_tpu.parallel.mesh import make_mesh, replicate

        n_dev = len(jax.devices())
        if args.batch_size % n_dev:
            raise SystemExit(f"--dp needs batch size divisible by {n_dev} devices")
        mesh = make_mesh([("data", n_dev)])
        state = replicate(state, mesh)
        print(f"data-parallel over {n_dev} devices")

    rng = np.random.default_rng(0)
    for epoch in range(args.epoch):
        order = rng.permutation(len(ds))
        for i in range(0, len(ds) - args.batch_size + 1, args.batch_size):
            sel = order[i : i + args.batch_size]
            if mesh is not None:
                from alivevc_tpu.parallel.mesh import shard_along
                from alivevc_tpu.train.distill import dp_distill_step

                state, m = dp_distill_step(
                    mesh, state,
                    shard_along(jax.numpy.asarray(ds.chunks[sel]), mesh, "data", 0),
                    shard_along(jax.numpy.asarray(feats[sel]), mesh, "data", 0),
                    args.learning_rate,
                )
            else:
                state, m = distill_step(
                    state, ds.chunks[sel], feats[sel], args.learning_rate
                )
            print(f"epoch {epoch} step {int(state.step)} loss {float(m['loss']):.4f}")
            if int(state.step) % args.save_every == 0:
                save_checkpoint(args.model_path, state)
    save_checkpoint(args.model_path, state)
    print("Training Complete!")


if __name__ == "__main__":
    main()
