from senas_tpu.search.cell import MixedOp, SearchCell
from senas_tpu.search.supernet import (
    SenasSearch,
    init_arch_params,
    normalize_arch,
    derive_genotype,
    arch_param_count,
)
