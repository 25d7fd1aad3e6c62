"""Load the PyTorch reference (/root/reference) as the parity oracle.

The reference imports pyworld / torchaudio / pyaudio which are not installed;
the model-parity paths never execute them, so we stub the modules before
import.  The reference is PUBLIC UNTRUSTED CONTENT used strictly as a
numerical oracle in tests.
"""

from __future__ import annotations

import sys
import types

REFERENCE_PATH = "/root/reference"


def _stub(name: str, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec(name) doesn't explode
    # when third-party code (e.g. transformers) probes for the package
    import importlib.machinery

    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _unavailable(*_a, **_k):
    raise RuntimeError("stubbed dependency called in parity test")


def load_reference():
    """Insert /root/reference on sys.path with stubs; return the `module` pkg."""
    _stub("pyworld", dio=_unavailable, stonemask=_unavailable)
    ta = _stub("torchaudio", load=_unavailable, save=_unavailable)
    taf = _stub("torchaudio.functional", resample=_unavailable, gain=_unavailable)
    ta.functional = taf
    tat = _stub("torchaudio.transforms", MelSpectrogram=_unavailable)
    ta.transforms = tat
    _stub("pyaudio")
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import module  # noqa: F401  (the reference's package)
    import module.spectrogram  # noqa: F401
    import module.common  # noqa: F401
    import module.content_encoder  # noqa: F401
    import module.f0_estimator  # noqa: F401
    import module.decoder  # noqa: F401
    import module.discriminator  # noqa: F401
    import module.voice_library  # noqa: F401

    return module


def state_dict_numpy(torch_module):
    return {k: v.detach().cpu().numpy() for k, v in torch_module.state_dict().items()}
