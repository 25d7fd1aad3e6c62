"""IO: checkpoint round-trip (params+opt+step), WAV round-trip, dataset."""

import numpy as np

import jax
import jax.numpy as jnp

from alivevc_tpu.io.audio import read_wav, write_wav
from alivevc_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from alivevc_tpu.io.dataset import WaveChunkDataset, batch_iterator
from alivevc_tpu.train.distill import DistillState, init_distill


def test_checkpoint_roundtrip_state(tmp_path):
    state = init_distill(jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state)
    like = init_distill(jax.random.PRNGKey(1))
    loaded = load_checkpoint(path, like)
    assert isinstance(loaded, DistillState)
    assert int(loaded.step) == int(state.step)
    flat_a = jax.tree_util.tree_leaves(state.params)
    flat_b = jax.tree_util.tree_leaves(loaded.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_wav_roundtrip(tmp_path):
    wave = (0.5 * np.sin(2 * np.pi * 440 * np.arange(1600) / 16000)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, wave, 16000)
    back, sr = read_wav(p)
    assert sr == 16000
    assert back.shape == (1, 1600)
    np.testing.assert_allclose(back[0], wave, atol=1e-3)


def test_dataset_chunks_and_batches(tmp_path):
    sr = 16000
    wave = np.sin(2 * np.pi * 220 * np.arange(3 * 16000) / sr).astype(np.float32)
    write_wav(str(tmp_path / "x.wav"), wave, sr)
    ds = WaveChunkDataset([str(tmp_path)], length=16000)
    assert len(ds) == 3
    batches = list(batch_iterator(ds, 2))
    assert len(batches) == 1
    assert batches[0].shape == (2, 16000)


def test_dataset_host_shard_partitions_files(tmp_path):
    """Per-host file sharding (r5): hosts load disjoint file subsets that
    union to the whole corpus — multi-host dp RAM scales as corpus/hosts."""
    sr = 16000
    for i in range(5):
        wave = np.sin(2 * np.pi * (100 + 40 * i) * np.arange(sr) / sr)
        write_wav(str(tmp_path / f"f{i}.wav"), wave.astype(np.float32), sr)
    full = WaveChunkDataset([str(tmp_path)], length=16000)
    parts = [
        WaveChunkDataset([str(tmp_path)], length=16000, host_shard=(h, 2))
        for h in (0, 1)
    ]
    assert len(parts[0]) == 3 and len(parts[1]) == 2
    got = np.concatenate([p.chunks for p in parts])
    # union equals the full corpus (order differs by interleaving)
    assert sorted(map(tuple, got[:, :8].round(5))) == sorted(
        map(tuple, full.chunks[:, :8].round(5))
    )


def test_dataset_resamples(tmp_path):
    sr = 24000
    wave = np.sin(2 * np.pi * 220 * np.arange(int(1.5 * sr)) / sr).astype(np.float32)
    write_wav(str(tmp_path / "x.wav"), wave, sr)
    ds = WaveChunkDataset([str(tmp_path)], length=16000)
    assert len(ds) == 1  # 1.5 s → one full 1 s chunk at 16 kHz


def test_checkpoint_resume_determinism(tmp_path):
    """Save mid-training, reload, continue — losses must match exactly (the
    reference loses optimizer/step state on resume; we don't, SURVEY §5)."""
    import jax

    from alivevc_tpu.train.distill import distill_step, init_distill

    wave = jnp.asarray(
        np.sin(2 * np.pi * 220 * np.arange(6400) / 16000, dtype=np.float32)
    )[None, :].repeat(2, axis=0)
    teacher = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 20, 768)).astype(np.float32)
    )

    state = init_distill(jax.random.PRNGKey(0))
    for _ in range(2):
        state, _ = distill_step(state, wave, teacher)
    path = str(tmp_path / "mid.npz")
    save_checkpoint(path, state)

    contA, lossesA = state, []
    for _ in range(3):
        contA, m = distill_step(contA, wave, teacher)
        lossesA.append(float(m["loss"]))

    contB = load_checkpoint(path, init_distill(jax.random.PRNGKey(9)))
    lossesB = []
    for _ in range(3):
        contB, m = distill_step(contB, wave, teacher)
        lossesB.append(float(m["loss"]))

    assert lossesA == lossesB
