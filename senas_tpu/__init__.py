"""senas_tpu — TPU-native differentiable NAS framework for 2D medical image segmentation.

A ground-up JAX/Flax/Pallas re-design with the capabilities of the SENAS
("Shrink-and-Expand NAS") reference framework: supernet architecture search
(bilevel DARTS-style optimization), fixed-genotype model training, a baseline
segmentation-model zoo, medical-image data pipelines, and evaluation tooling.

Layout is NHWC (TPU-native); all compute paths are jit-compiled XLA programs;
multi-device scaling goes through `senas_tpu.parallel` (jax.sharding.Mesh:
data-parallel batch axis + optional spatial partitioning), never through
host-side replication.
"""

__version__ = "0.1.0"

from senas_tpu.core.genotype import Genotype, GenoParser, parse_genotype
