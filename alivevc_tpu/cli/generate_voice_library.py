"""Voice-library generation CLI (reference: generate_voice_library.py)."""

from __future__ import annotations

import argparse

import jax
import numpy as np

from alivevc_tpu.cli.common import load_params_or_init
from alivevc_tpu.compat.torch_import import import_content_encoder
from alivevc_tpu.io.checkpoint import save_checkpoint
from alivevc_tpu.io.dataset import WaveChunkDataset
from alivevc_tpu.models.content_encoder import init_content_encoder
from alivevc_tpu.train.library_gen import generate_voice_library


def build_parser():
    p = argparse.ArgumentParser(description="generate voice library")
    p.add_argument("dataset")
    p.add_argument("-lib", "--voice-library-path", default="voice_library.ckpt")
    p.add_argument("-cep", "--content-encoder-path", default="content_encoder.ckpt")
    p.add_argument("--seed", default=0, type=int)
    return p


def main(argv=None):
    from alivevc_tpu.cli.common import apply_platform_env

    apply_platform_env()
    args = build_parser().parse_args(argv)
    ce = load_params_or_init(
        args.content_encoder_path,
        init_content_encoder,
        import_content_encoder,
        jax.random.PRNGKey(0),
    )
    ds = WaveChunkDataset([args.dataset], length=7680)
    print(f"Loaded {len(ds)} chunks")
    if len(ds) == 0:
        raise SystemExit("no audio chunks found — check the dataset path/length")
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(ds))[:512]
    print("Generating Library...")
    lib = generate_voice_library(ce, ds.chunks[order], seed=args.seed)
    save_checkpoint(args.voice_library_path, lib)
    print("Complete!")


if __name__ == "__main__":
    main()
