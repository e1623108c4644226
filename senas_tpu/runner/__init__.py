from senas_tpu.runner.search import SearchRunner
from senas_tpu.runner.train import TrainRunner
from senas_tpu.runner.test import TestRunner
