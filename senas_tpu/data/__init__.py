from senas_tpu.data.base import (
    DATASETS,
    DataLoader,
    PrefetchLoader,
    DatasetSpec,
    get_dataset,
    get_dataset_spec,
)
