"""F0Estimator training CLI (reference: train_f0_estimator.py)."""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from alivevc_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from alivevc_tpu.io.dataset import WaveChunkDataset
from alivevc_tpu.train.f0 import f0_train_step, init_f0_train


def build_parser():
    p = argparse.ArgumentParser(description="train f0 estimator")
    p.add_argument("dataset")
    p.add_argument("-mp", "--model-path", default="f0_estimator.ckpt")
    p.add_argument("-e", "--epoch", default=100, type=int)
    p.add_argument("-b", "--batch-size", default=1, type=int)
    p.add_argument("-lr", "--learning-rate", default=1e-4, type=float)
    p.add_argument("-len", "--length", default=65536, type=int)
    p.add_argument("-m", "--max-data", default=-1, type=int)
    p.add_argument("--save-every", default=1000, type=int)
    p.add_argument("--dp", action="store_true",
                   help="data-parallel over all visible devices (explicit "
                        "shard_map step, train/f0.py:dp_f0_train_step)")
    return p


def main(argv=None):
    from alivevc_tpu.cli.common import apply_platform_env

    apply_platform_env()
    args = build_parser().parse_args(argv)
    _hs = ((jax.process_index(), jax.process_count())
           if jax.process_count() > 1 else None)
    ds = WaveChunkDataset(
        [args.dataset], length=args.length, max_files=args.max_data,
        with_f0=True, host_shard=_hs,
    )
    print(f"Loaded {len(ds)} chunks (WORLD F0 labels precomputed)")
    if len(ds) == 0:
        raise SystemExit("no audio chunks found — check the dataset path/length")

    state = init_f0_train(jax.random.PRNGKey(0), args.learning_rate)
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

    rng_np = np.random.default_rng(0)
    rng = jax.random.PRNGKey(1)
    for epoch in range(args.epoch):
        order = rng_np.permutation(len(ds))
        for i in range(0, len(ds) - args.batch_size + 1, args.batch_size):
            sel = order[i : i + args.batch_size]
            rng, sub = jax.random.split(rng)
            if mesh is not None:
                import jax.numpy as jnp

                from alivevc_tpu.parallel.mesh import shard_along
                from alivevc_tpu.train.f0 import dp_f0_train_step

                state, m = dp_f0_train_step(
                    mesh, state,
                    shard_along(jnp.asarray(ds.chunks[sel]), mesh, "data", 0),
                    shard_along(jnp.asarray(ds.f0[sel]), mesh, "data", 0),
                    sub, args.learning_rate,
                )
            else:
                state, m = f0_train_step(
                    state, ds.chunks[sel], ds.f0[sel], sub, args.learning_rate
                )
            print(f"epoch {epoch} step {int(state.step)} loss {float(m['loss']):.4f}")
            if int(state.step) % args.save_every == 0:
                save_checkpoint(args.model_path, state)
    save_checkpoint(args.model_path, state)
    print("Training Complete!")


if __name__ == "__main__":
    main()
