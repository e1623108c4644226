from senas_tpu.utils.logging import get_logger, create_exp_dir, calc_time, store_images
from senas_tpu.utils.misc import (
    calc_parameters_count,
    create_class_weight,
    get_gpus_memory_info,
    one_hot_encoding,
    set_seed,
)
