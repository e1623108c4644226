"""Search CLI e2e on synthetic data: bilevel epochs, genotype logging,
checkpointing, and resume restoring epoch/patience/genotype state."""

import json
import os

import pytest

pytestmark = pytest.mark.slow

from senas_tpu.core.config import load_config
from senas_tpu.core.genotype import parse_genotype
from senas_tpu.runner.search import SearchRunner

CFG = os.path.join(os.path.dirname(__file__), "..", "configs", "senas",
                   "senas_synthetic.yml")


@pytest.fixture(scope="module")
def search_run(tmp_path_factory):
    log_root = str(tmp_path_factory.mktemp("slogs"))
    cfg = load_config(CFG)
    cfg["searching"]["epoch"] = 2
    cfg["searching"]["depth"] = 2
    cfg["searching"]["meta_node_num"] = 2
    cfg["searching"]["init_channels"] = 4
    cfg["searching"]["batch_size"] = 4
    cfg["data"]["hw"] = 16
    cfg["data"]["size"] = 16
    runner = SearchRunner(cfg, config_path=CFG, log_root=log_root)
    final = runner.run()
    return cfg, runner.run_dir, final


def test_search_artifacts_and_genotype(search_run):
    cfg, run_dir, final = search_run
    g = parse_genotype(final)  # best genotype string round-trips
    assert len(g.down) == 2 * cfg["searching"]["meta_node_num"]
    assert os.path.isdir(os.path.join(run_dir, "ckpt", "last"))
    assert os.path.isfile(os.path.join(run_dir, "ckpt", "last.meta.json"))
    scalars = [json.loads(l) for l in open(os.path.join(run_dir,
                                                        "scalars.jsonl"))]
    tags = {s["tag"] for s in scalars}
    assert {"Train/Loss", "Val/dice", "Train/steps_per_sec"} <= tags
    assert os.path.isfile(os.path.join(run_dir, "all_scalars.json"))


def test_search_resume_restores_state(search_run):
    cfg, run_dir, final = search_run
    cfg2 = json.loads(json.dumps(cfg))
    cfg2["searching"]["resume"] = os.path.join(run_dir, "ckpt")
    cfg2["searching"]["epoch"] = 3
    runner = SearchRunner(cfg2, config_path=CFG,
                          log_root=os.path.dirname(run_dir))
    assert runner.start_epoch == 2, "resume did not restore the epoch"
    # genotype-stability patience state restored from the meta sidecar
    assert runner.geno_type is None or isinstance(runner.geno_type, str)
    # the resumed arch params derive a valid genotype immediately
    g = runner.derive()
    assert len(g.up) == 2 * cfg["searching"]["meta_node_num"]
