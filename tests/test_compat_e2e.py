"""E2E: torch reference checkpoint -> tools/import_torch_checkpoint.py ->
runner resume. Proves a reference user's trained .pth.tar becomes a
checkpoint directory our CLIs actually resume from (epoch counter, best
metrics, patience, geno_type carried over; optax state re-initialized)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from senas_tpu.core.config import load_config
from senas_tpu.models import geno_searched
from test_compat import _load_ref, _randomize_bn

pytestmark = pytest.mark.slow

ROOT = os.path.join(os.path.dirname(__file__), "..")
CFG = os.path.join(ROOT, "configs", "senas", "senas_synthetic.yml")
TOOL = os.path.join(ROOT, "tools", "import_torch_checkpoint.py")


def _run_tool(*args):
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    proc = subprocess.run([sys.executable, TOOL, *args], env=env,
                          capture_output=True, text=True, cwd=ROOT,
                          timeout=600)
    assert proc.returncode == 0, f"tool failed:\n{proc.stdout}\n{proc.stderr}"
    return proc.stdout


def test_import_tool_train_resume(tmp_path):
    ref_mod = _load_ref("/root/reference/models/senas_model.py", "e2e_model")
    from utils.genotype import Genotype
    ref_geno = eval(repr(geno_searched.senas),
                    {"Genotype": Genotype, "range": range})
    torch.manual_seed(0)
    ref_net = ref_mod.SenasModel(2, 1, c=8, depth=3, supervision=False,
                                 genotype=ref_geno, double_down_channel=False)
    _randomize_bn(ref_net)
    ckpt_path = str(tmp_path / "model_best.pth.tar")
    torch.save({"epoch": 2, "dur_time": 10.0,
                "model_state": ref_net.state_dict(), "model_optimizer": {},
                "best_pixAcc": 90.0, "best_mIoU": 70.0,
                "best_dice_coeff": 81.5, "best_loss": 0.3}, ckpt_path)

    out_dir = str(tmp_path / "imported")
    _run_tool(ckpt_path, "--config", CFG, "--out", out_dir)
    assert os.path.isdir(os.path.join(out_dir, "last"))
    meta = json.load(open(os.path.join(out_dir, "last.meta.json")))
    assert meta["epoch"] == 2 and meta["best_dice"] == 81.5

    from senas_tpu.runner.train import TrainRunner
    cfg = load_config(CFG)
    cfg["training"]["epoch"] = 3
    cfg["data"]["hw"] = 32
    cfg["data"]["size"] = 16
    cfg["training"]["resume"] = out_dir
    runner = TrainRunner(cfg, model_name="senas", config_path=CFG,
                         log_root=str(tmp_path / "logs"))
    assert runner.start_epoch == 2, "imported epoch counter not restored"
    assert runner.best_dice == pytest.approx(81.5)
    # the imported weights ARE the state: spot-check one translated kernel
    got = np.asarray(runner.state.params["stem0"]["_ConvWeight_0"]["kernel"])
    want = np.transpose(ref_net.state_dict()["stem0.0.weight"].numpy(),
                        (2, 3, 1, 0))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    result = runner.run()  # one epoch from the imported state
    assert np.isfinite(result["best_dice"])


def test_import_tool_search_resume(tmp_path):
    ref_mod = _load_ref("/root/reference/search/senas_search.py", "e2e_search")
    torch.manual_seed(0)
    ref_nas = ref_mod.NAS(1, 8, 2, 3, meta_node_num=2, use_sharing=False,
                          double_down_channel=False, supervision=False,
                          device=torch.device("cpu"))
    _randomize_bn(ref_nas)
    ckpt_path = str(tmp_path / "checkpint.pth.tar")
    torch.save({"epoch": 1, "dur_time": 5.0, "cur_patience": 1,
                "geno_type": "Genotype(...)",
                "model_state": ref_nas.state_dict(),
                "arch_optimizer": {}, "model_optimizer": {},
                "alphas_dict": ref_nas.alphas_dict(),
                "betas_dict": ref_nas.betas_dict(),
                "scheduler": {}}, ckpt_path)

    out_dir = str(tmp_path / "imported")
    _run_tool(ckpt_path, "--config", CFG, "--out", out_dir,
              "--depth", "3", "--meta_node_num", "2")
    meta = json.load(open(os.path.join(out_dir, "last.meta.json")))
    assert meta["epoch"] == 1 and meta["cur_patience"] == 1

    from senas_tpu.runner.search import SearchRunner
    cfg = load_config(CFG)
    cfg["searching"]["epoch"] = 2
    cfg["data"]["hw"] = 32
    cfg["data"]["size"] = 16
    cfg["searching"]["resume"] = out_dir
    runner = SearchRunner(cfg, config_path=CFG,
                          log_root=str(tmp_path / "logs"))
    assert runner.start_epoch == 1, "imported epoch counter not restored"
    assert runner.patience == 1
    # arch tables came from the torch run, not the fresh init
    got = np.asarray(runner.state.arch["alphas_dn"])
    want = ref_nas.alphas_dn.detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6)
    genotype = runner.run()  # one epoch from the imported state
    assert isinstance(genotype, str) and genotype.startswith("Genotype")
