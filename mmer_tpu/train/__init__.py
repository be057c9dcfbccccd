from mmer_tpu.train.loop import train_model, TrainOutput  # noqa: F401
from mmer_tpu.train.metrics import (  # noqa: F401
    confusion_matrix, prf_from_confusion, accuracy_from_confusion)
