from mmer_tpu.core.mesh import create_mesh, data_sharding, replicated_sharding  # noqa: F401
from mmer_tpu.core.artifacts import (  # noqa: F401
    load_video_features,
    load_audio_features,
    save_video_features,
    save_audio_features,
)
