from senas_tpu.models.senas_model import BuildCell, Head, SenasModel
from senas_tpu.models import geno_searched
