"""alivevc_tpu — a TPU-native (JAX/XLA/Pallas) voice-conversion framework.

A from-scratch re-design of the capabilities of uthree/ALiVE-VC (kNN-VC family
any-to-one voice changer) for TPU hardware:

  * signal core: rectangular-window magnitude STFT front end, HTK mel, polyphase
    sinc resampler, torch-compatible linear interpolation (ops/)
  * models: ConvNeXt-1d ContentEncoder (WavLM-distilled), 4096-bin F0Estimator,
    DDSP harmonic-oscillator + modulated causal-conv U-Net Decoder, MPD+MRD GAN
    discriminators, learnable VoiceLibrary (models/)
  * retrieval core: top-k cosine kNN feature matching, single-device and
    library-sharded across a device mesh (ops/knn.py, parallel/)
  * pipelines: offline chunked VC, phase-continuous streaming VC (infer/)
  * training: WavLM distillation, F0 classification, GAN decoder training,
    fine-tune with trainable library (train/)

All models are plain parameter pytrees + pure functions, fully jittable, with a
PyTorch-checkpoint importer (compat/) used by the parity test-suite against the
reference implementation.
"""

__version__ = "0.1.0"
