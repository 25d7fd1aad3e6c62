"""pyworld import shim for the reference subprocess oracle: the reference
imports pyworld at module scope (module/common.py:5) but the oracle run never
calls it (no -wpe)."""


def dio(*_a, **_k):
    raise RuntimeError("pyworld.dio is not available in the oracle subprocess")


def stonemask(*_a, **_k):
    raise RuntimeError("pyworld.stonemask is not available in the oracle subprocess")
