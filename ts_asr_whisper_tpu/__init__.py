"""TPU-native target-speaker ASR framework (DiCoW / SE-DiCoW / TS-Whisper).

A ground-up JAX/XLA/Pallas re-design of the capabilities of
BUTSpeechFIT/TS-ASR-Whisper: diarization-conditioned Whisper (FDDT/STNO),
self-enrollment (SE-DiCoW), CTC encoder pre-training, long-form decoding with
joint CTC rescoring, and the full training/eval stack — built for TPU meshes
(pjit/shard_map), static shapes, and MXU-friendly kernels.
"""

__version__ = "0.1.0"
