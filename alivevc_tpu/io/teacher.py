"""WavLM teacher for ContentEncoder distillation — host-side.

Reference: module/hubert.py:6-22 — frozen ``microsoft/wavlm-base-plus``;
feature = mean of hidden_states[4] and [9], linearly interpolated to
wave_len//320 frames.

TPU-native split: the teacher is a frozen torch module that runs once per
utterance on the host; its features are the training *data* for the jitted
distillation step (train/distill.py).  ``precompute_teacher_features`` dumps
them to .npz so the TPU training loop never touches torch.  In an offline
image without the HF weights cached, construction raises with instructions.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class WavLMTeacher:
    def __init__(self, model_name: str = "microsoft/wavlm-base-plus"):
        try:
            import torch
            from transformers import WavLMModel

            self._torch = torch
            self.model = WavLMModel.from_pretrained(model_name)
        except Exception as e:  # offline image / missing cache
            raise RuntimeError(
                f"WavLM teacher unavailable ({e}). Pre-download the weights or "
                "precompute teacher features elsewhere and pass them to "
                "distill_step directly."
            ) from e
        self.model.eval()
        for p in self.model.parameters():
            p.requires_grad = False

    def extract(self, wave: np.ndarray, segment_size: int = 320) -> np.ndarray:
        """wave [N, L] float32 @16 kHz → features [N, L//320, 768]."""
        torch = self._torch
        with torch.no_grad():
            w = torch.from_numpy(np.asarray(wave, np.float32))
            hs = self.model(w, output_hidden_states=True).hidden_states
            feat = (hs[4] + hs[9]) * 0.5              # [N, T', 768]
            feat = feat.transpose(1, 2)
            length = wave.shape[1] // segment_size
            feat = torch.nn.functional.interpolate(feat, length, mode="linear")
            return feat.transpose(1, 2).numpy()


def precompute_teacher_features(
    chunks: np.ndarray,
    out_path: Optional[str] = None,
    batch_size: int = 8,
    model_name: str = "microsoft/wavlm-base-plus",
) -> np.ndarray:
    """chunks [M, L] → features [M, L//320, 768]; optionally saved to .npz."""
    teacher = WavLMTeacher(model_name)
    feats = []
    for i in range(0, chunks.shape[0], batch_size):
        feats.append(teacher.extract(chunks[i : i + batch_size]))
    out = np.concatenate(feats, axis=0)
    if out_path:
        np.savez(out_path, features=out)
    return out
