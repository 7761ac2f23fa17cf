"""RADAD-TPU: a TPU-native retrieval-augmented deepfake audio detection
framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``AvinashSaxena777/RADAD-RetrievalAugmentedDeepfakeAudioDetection``:
frozen speech encoders (Wav2Vec2 / Whisper / WavLM) → temporal pyramid
pooling → HBM-resident vector index with fused Pallas top-k retrieval →
trainable retrieval-augmented fusion classifier, compiled as a single
on-device graph and sharded over a device mesh.
"""

__version__ = "0.1.0"

from radad_tpu.config import Config  # noqa: F401
