from mmer_tpu.parallel.sharding import (  # noqa: F401
    fusion_param_spec, shard_params, batch_spec)
