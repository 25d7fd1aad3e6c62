"""Checkpointing: full training state (params + optimizer + step), atomically.

Improves on the reference's resume-by-existence torch.save of bare
state_dicts (train_decoder.py:57-72 — optimizer/step state is never saved,
SURVEY §5): here the entire pytree (arbitrary nesting of dict/list/tuple/
NamedTuple with array leaves) round-trips through one ``.npz`` with
path-encoded keys, written atomically (tmp + rename) so a killed run never
leaves a torn checkpoint.  ``.pt`` interop lives in compat/torch_import.py.
"""

from __future__ import annotations

import os
import tempfile
from typing import Any

import jax
import numpy as np


_SEP = "\x1f"  # unit separator — never appears in our key names


def _flatten(tree: Any, prefix: str, out: dict):
    if isinstance(tree, dict):
        for k in sorted(tree):
            _flatten(tree[k], f"{prefix}{_SEP}d:{k}", out)
    elif isinstance(tree, (list, tuple)) and not hasattr(tree, "_fields"):
        tag = "l" if isinstance(tree, list) else "t"
        for i, v in enumerate(tree):
            _flatten(v, f"{prefix}{_SEP}{tag}:{i}", out)
    elif hasattr(tree, "_fields"):  # NamedTuple
        for name in tree._fields:
            _flatten(getattr(tree, name), f"{prefix}{_SEP}n:{name}", out)
    elif tree is None:
        out[f"{prefix}{_SEP}none"] = np.zeros(0)
    else:
        out[prefix] = np.asarray(tree)


def save_checkpoint(path: str, tree: Any) -> None:
    flat: dict = {}
    _flatten(tree, "root", flat)
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str, like: Any) -> Any:
    """Load into the structure of ``like`` (same pytree shape as saved)."""
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}

    def build(template: Any, prefix: str):
        if isinstance(template, dict):
            return {k: build(template[k], f"{prefix}{_SEP}d:{k}") for k in template}
        if hasattr(template, "_fields"):
            vals = {
                name: build(getattr(template, name), f"{prefix}{_SEP}n:{name}")
                for name in template._fields
            }
            return type(template)(**vals)
        if isinstance(template, list):
            return [
                build(v, f"{prefix}{_SEP}l:{i}") for i, v in enumerate(template)
            ]
        if isinstance(template, tuple):
            return tuple(
                build(v, f"{prefix}{_SEP}t:{i}") for i, v in enumerate(template)
            )
        if template is None:
            return None
        arr = flat[prefix]
        import jax.numpy as jnp

        return jnp.asarray(arr)

    return build(like, "root")
