from mmer_tpu.ops.losses import weighted_cross_entropy, focal_loss  # noqa: F401
from mmer_tpu.ops.masked_ops import masked_mean_pool  # noqa: F401
