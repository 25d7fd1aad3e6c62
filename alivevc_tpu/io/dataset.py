"""Wave-chunk datasets (reference: module/dataset.py:9-78).

Recursively globs audio files, resamples to 16 kHz, splits into fixed-length
chunks (dropping remainders), holds everything in host RAM, and serves
shuffled fixed-shape batches — fixed shapes keep the jitted training step at
one compilation.  The F0 variant precomputes WORLD labels per chunk at load
time (ops/world.py), mirroring WaveFileDirectoryWithF0.
"""

from __future__ import annotations

import glob
import os

from typing import Iterator, List, Optional

import numpy as np

from alivevc_tpu.io.audio import read_audio


def _resample_np(wave: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    if sr_in == sr_out:
        return wave
    import jax.numpy as jnp

    from alivevc_tpu.ops.resample import resample

    return np.asarray(resample(jnp.asarray(wave), sr_in, sr_out))


class WaveChunkDataset:
    """In-RAM chunked wave dataset.

    chunks: [N, length] float32 at ``sampling_rate``; optional per-chunk F0
    labels [N, length//320] when ``with_f0``.
    """

    def __init__(
        self,
        source_dirs: List[str],
        length: int = 65_536,
        max_files: int = -1,
        sampling_rate: int = 16_000,
        with_f0: bool = False,
        host_shard: Optional[tuple] = None,
    ):
        """host_shard: optional (host_index, host_count) — each host loads
        only every host_count-th file starting at host_index, so multi-host
        dp training keeps per-host RAM at corpus_size/host_count instead of
        replicating the whole corpus (the reference loads everything in every
        process, module/dataset.py:9-35).  Pass
        (jax.process_index(), jax.process_count()) from the dp trainers;
        shuffling stays per-host (dp gradients psum across hosts, so hosts
        only need disjoint data, not a global permutation)."""
        paths: List[str] = []
        for d in source_dirs:
            for fmt in ("wav", "mp3", "ogg", "flac"):
                paths += glob.glob(os.path.join(d, f"**/*.{fmt}"), recursive=True)
        paths.sort()
        if max_files != -1:
            paths = paths[:max_files]
        if host_shard is not None:
            hi, hc = host_shard
            assert 0 <= hi < hc, host_shard
            paths = paths[hi::hc]

        chunks = []
        for path in paths:
            decoded = read_audio(path)  # mp3/ogg/flac via ffmpeg when on PATH
            if decoded is None:
                continue
            wave, sr = decoded  # chunking takes channel 0 (module/dataset.py:33)
            wave = _resample_np(wave, sr, sampling_rate)
            n = wave.shape[1] // length
            for i in range(n):
                w = wave[0, i * length : (i + 1) * length]
                chunks.append(w.astype(np.float32))
        self.chunks = (
            np.stack(chunks) if chunks else np.zeros((0, length), np.float32)
        )
        self.f0 = None
        if with_f0 and chunks:
            # batched calls — the threaded C++ labeler shards each batch
            # over every host core (alive_dio_stonemask_batch); 256 chunks
            # per call bounds the resample scratch on huge datasets
            from alivevc_tpu.ops.world import compute_f0

            self.f0 = np.concatenate([
                compute_f0(self.chunks[i : i + 256], sampling_rate)
                for i in range(0, len(chunks), 256)
            ])
        self.length = length

    def __len__(self) -> int:
        return self.chunks.shape[0]

    def __getitem__(self, i: int):
        if self.f0 is not None:
            return self.chunks[i], self.f0[i]
        return self.chunks[i]


def batch_iterator(
    ds: WaveChunkDataset,
    batch_size: int,
    seed: int = 0,
    drop_last: bool = True,
) -> Iterator:
    """Shuffled fixed-shape batches; yields wave [B, L] (+ f0 [B, T])."""
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(ds))
    end = len(ds) - (len(ds) % batch_size) if drop_last else len(ds)
    for i in range(0, end, batch_size):
        sel = idx[i : i + batch_size]
        if ds.f0 is not None:
            yield ds.chunks[sel], ds.f0[sel]
        else:
            yield ds.chunks[sel]
