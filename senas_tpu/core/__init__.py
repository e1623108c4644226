from senas_tpu.core.genotype import Genotype, GenoParser, parse_genotype
from senas_tpu.core.config import load_config
