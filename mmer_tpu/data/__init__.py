from mmer_tpu.data.catalog import (  # noqa: F401
    label_from_name,
    sample_key,
    build_catalog,
    CatalogEntry,
)
from mmer_tpu.data.pipeline import load_dataset, DatasetArrays, DataSplits  # noqa: F401
