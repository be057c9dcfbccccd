"""mmer_tpu — TPU-native audio-visual emotion recognition framework.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the
reference repo EvanZJ/multi-modal-emotion-recognition (PyTorch/CUDA):

- 6-class (NEU/HAP/SAD/ANG/FEA/DIS) emotion recognition over RAVDESS+CREMA-D
- ViViT-style video feature extraction, Wav2Vec2 audio embeddings
- CrossModalFusion transformer + MLP classifier
- training, interpretability (Integrated Gradients), and HTTP serving

Importable package name is ``mmer_tpu``; the distribution is
``multi-modal-emotion-recognition-tpu``.
"""

__version__ = "0.1.0"

from mmer_tpu.config import (  # noqa: F401
    DataConfig,
    ModelConfig,
    TrainConfig,
    MeshConfig,
    LABELS,
)
