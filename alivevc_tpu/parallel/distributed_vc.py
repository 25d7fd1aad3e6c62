"""Pod-scale batched offline VC (BASELINE config #5).

2-D mesh ``('data', 'library')``: utterance windows shard over ``data``,
the voice library (1M+ frames at pod scale) shards over ``library``, models
replicate.  Each device converts its local windows against its library shard
with a streaming local top-k; the k candidates per query are merged across
the ``library`` axis with an ``all_gather`` over ICI — communication is
O(queries * P_lib * k * (D+1)), independent of library size.  The result
equals the single-device pipeline exactly.

On a multi-host pod call ``jax.distributed.initialize`` first and build the
mesh so ``library`` maps to intra-slice ICI; tests run the same code on the
8-device virtual CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from alivevc_tpu.config import DecoderConfig
from alivevc_tpu.models.content_encoder import content_encoder
from alivevc_tpu.models.decoder import decoder
from alivevc_tpu.models.f0_estimator import f0_estimate
from alivevc_tpu.ops.pitch import apply_intonation
from alivevc_tpu.ops.stft import spectrogram
from alivevc_tpu.parallel.sharded_knn import (
    local_topk_merge,
    pad_library_for_sharding,
)


def convert_windows_distributed(
    mesh: Mesh,
    ce_params,
    f0_params,
    dec_params,
    windows: jax.Array,     # [N, Lw], N divisible by data-axis size
    library: jax.Array,     # [Lr, 768] (unpadded; padded+sharded internally)
    f0_rate: float = 1.0,
    pitch_shift: float = 0.0,
    intonation: float = 1.0,
    k: int = 4,
    alpha: float = 0.0,
    dec_cfg: DecoderConfig = DecoderConfig(),
    chunk: int = 4096,
    impl: str = "auto",
) -> jax.Array:
    """→ converted windows [N, Lw], sharded over 'data'."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    n_lib = mesh.shape["library"]
    lib_p, valid = pad_library_for_sharding(library, n_lib)
    lib_p = jax.device_put(lib_p, NamedSharding(mesh, P("library")))
    valid = jax.device_put(valid, NamedSharding(mesh, P("library")))
    windows = jax.device_put(windows, NamedSharding(mesh, P("data")))

    def local_fn(win_local, lib_shard, valid_shard):
        spec = spectrogram(win_local)
        f0 = f0_estimate(f0_params, spec)
        f0 = jax.vmap(lambda f: apply_intonation(f, intonation, pitch_shift))(f0)
        content = content_encoder(ce_params, spec)       # [n_loc, Ls, 768]

        n_loc, ls, d = content.shape
        flat = content.reshape(n_loc * ls, d)
        matched = local_topk_merge(
            flat, lib_shard, valid_shard, k=k, alpha=alpha,
            axis_name="library", chunk=chunk, impl=impl,
        ).reshape(n_loc, ls, d)

        wave, _ = decoder(dec_params, matched, f0 * f0_rate, cfg=dec_cfg)
        return wave

    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P("data"), P("library"), P("library")),
        out_specs=P("data"),
        check_vma=False,
    )
    return fn(windows, lib_p, valid)
