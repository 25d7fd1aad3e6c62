"""Reverse interop: our params → torch state_dict, loadable by the reference
and round-tripping bit-exactly through the importer."""

import numpy as np
import torch

import jax

from alivevc_tpu.compat.torch_export import (
    export_content_encoder,
    export_decoder,
    export_f0_estimator,
    export_voice_library,
)
from alivevc_tpu.compat.torch_import import (
    import_content_encoder,
    import_decoder,
    import_f0_estimator,
    import_voice_library,
)
from alivevc_tpu.models.content_encoder import init_content_encoder
from alivevc_tpu.models.decoder import init_decoder
from alivevc_tpu.models.f0_estimator import init_f0_estimator
from alivevc_tpu.models.voice_library import init_voice_library

from ref_loader import load_reference

ref = load_reference()


def _trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_roundtrip_all_models():
    k = jax.random.PRNGKey(0)
    for init, exp, imp in (
        (init_content_encoder, export_content_encoder, import_content_encoder),
        (init_f0_estimator, export_f0_estimator, import_f0_estimator),
        (init_decoder, export_decoder, import_decoder),
        (init_voice_library, export_voice_library, import_voice_library),
    ):
        params = init(k)
        _trees_equal(params, imp(exp(params)))


def test_reference_loads_exported_state_dicts():
    """The torch reference modules must accept our exported dicts verbatim."""
    k = jax.random.PRNGKey(1)
    pairs = [
        (init_content_encoder(k), export_content_encoder, ref.content_encoder.ContentEncoder()),
        (init_f0_estimator(k), export_f0_estimator, ref.f0_estimator.F0Estimator()),
        (init_decoder(k), export_decoder, ref.decoder.Decoder()),
        (init_voice_library(k), export_voice_library, ref.voice_library.VoiceLibrary()),
    ]
    for params, exp, module in pairs:
        sd = {kk: torch.from_numpy(np.ascontiguousarray(v)) for kk, v in exp(params).items()}
        module.load_state_dict(sd, strict=True)
