from mmer_tpu.models.fusion import (  # noqa: F401
    CrossModalFusion,
    EmotionClassifier,
    MultimodalEmotionModel,
)
