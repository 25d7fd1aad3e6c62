"""Shared CLI helpers: model loading with .pt / .npz auto-detection, the
reference's resume-by-existence convention (train_decoder.py:57-64), logging.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import numpy as np


def apply_platform_env() -> None:
    """Honor JAX_PLATFORMS even when the axon site config pre-registered the
    TPU plugin (its register() can pin the backend before env is consulted)."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass


def load_params_or_init(
    path: Optional[str],
    init_fn: Callable,
    import_fn: Callable,
    key,
):
    """Load params from ``path`` if it exists (torch ``.pt`` via the importer
    or our ``.npz`` checkpoints), else fresh-init — the reference's
    resume-by-existence behaviour."""
    if path and os.path.exists(path):
        if path.endswith(".pt"):
            from alivevc_tpu.compat.torch_import import load_torch_state_dict

            return import_fn(load_torch_state_dict(path))
        from alivevc_tpu.io.checkpoint import load_checkpoint

        template = init_fn(key)
        return load_checkpoint(path, template)
    return init_fn(key)


def save_params(path: str, params) -> None:
    from alivevc_tpu.io.checkpoint import save_checkpoint

    save_checkpoint(path, params)


def log_logo():
    print(
        "alivevc_tpu — TPU-native kNN voice conversion "
        "(JAX/XLA/Pallas from-scratch re-design of ALiVE-VC)"
    )
