from senas_tpu.models.senas_model import BuildCell, Head, SenasModel
from senas_tpu.models import geno_searched
from senas_tpu.models.factory import get_segmentation_model
