"""Serving export (senas_tpu/serve.py): StableHLO artifact round-trip.

Covers: symbolic-batch export, serialize -> deserialize, Predictor logits
== in-process model at multiple batch sizes, uint8 mask helper, and the
tools/export_model.py CLI end-to-end from a checkpoint directory."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from senas_tpu.models.geno_searched import senas_node_4
from senas_tpu.models.senas_model import SenasModel
from senas_tpu.serve import (Predictor, export_predict_fn, load_artifact,
                             save_artifact)

pytestmark = pytest.mark.slow

ROOT = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture(scope="module")
def tiny_model():
    model = SenasModel(nclass=2, in_channels=1, c=8, depth=3,
                       genotype=senas_node_4)
    x0 = jnp.zeros((2, 32, 32, 1), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x0, False)
    return model, variables


def test_export_roundtrip_batch_polymorphic(tiny_model, tmp_path):
    model, variables = tiny_model
    exported = export_predict_fn(model.apply, variables, (32, 32, 1),
                                 platforms=("cpu",))
    out_dir = str(tmp_path / "artifact")
    save_artifact(exported, {"model": "senas", "num_classes": 2}, out_dir)
    assert os.path.isfile(os.path.join(out_dir, "model.stablehlo"))
    meta = json.load(open(os.path.join(out_dir, "meta.json")))
    assert meta["format"] == "jax.export/stablehlo"

    pred = Predictor(out_dir)
    rs = np.random.RandomState(0)
    for batch in (1, 3):  # symbolic batch: no re-export needed
        x = rs.randn(batch, 32, 32, 1).astype(np.float32)
        got = np.asarray(pred.logits(x))
        want = np.asarray(model.apply(variables, jnp.asarray(x), False)[-1])
        # the artifact and the direct jit compile separately -> different
        # fusion orders; allow float-noise-level divergence
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
        masks = pred.predict_masks(x)
        assert masks.shape == (batch, 32, 32) and masks.dtype == np.uint8
        np.testing.assert_array_equal(masks, got.argmax(-1))


def test_artifact_is_self_contained(tiny_model, tmp_path):
    """The loaded artifact must not need the variables — weights are baked
    in as constants (deserialize + call only)."""
    model, variables = tiny_model
    exported = export_predict_fn(model.apply, variables, (32, 32, 1),
                                 platforms=("cpu",))
    out_dir = str(tmp_path / "artifact")
    save_artifact(exported, {}, out_dir)
    loaded, _ = load_artifact(out_dir)
    x = np.random.RandomState(1).randn(2, 32, 32, 1).astype(np.float32)
    got = np.asarray(jax.jit(loaded.call)(jnp.asarray(x)))
    want = np.asarray(model.apply(variables, jnp.asarray(x), False)[-1])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_export_tool_cli(tiny_model, tmp_path):
    """checkpoint dir -> tools/export_model.py --check -> artifact."""
    from senas_tpu.train.checkpoint import CheckpointManager
    from senas_tpu.train.optim import build_optimizer
    from senas_tpu.train.trainer import FixedTrainState

    import yaml

    model, variables = tiny_model
    tx = build_optimizer({"name": "sgd", "lr": 1e-3})
    state = FixedTrainState.create(variables, tx)
    ckpt_dir = str(tmp_path / "ckpt")
    CheckpointManager(ckpt_dir).save(state, {"epoch": 9, "best_dice": 77.0},
                                     is_best=True, name="last")

    cfg = yaml.load(open(os.path.join(ROOT, "configs", "senas",
                                      "senas_synthetic.yml")),
                    Loader=yaml.FullLoader)
    cfg["training"]["depth"] = 3
    cfg["training"]["init_channels"] = 8
    cfg_path = str(tmp_path / "cfg.yml")
    yaml.dump(cfg, open(cfg_path, "w"))

    out_dir = str(tmp_path / "artifact")
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "export_model.py"),
         "--config", cfg_path, "--resume", ckpt_dir, "--out", out_dir,
         "--check"],
        env=env, capture_output=True, text=True, cwd=ROOT, timeout=900)
    assert proc.returncode == 0, f"{proc.stdout}\n{proc.stderr}"
    assert "check OK" in proc.stdout
    meta = json.load(open(os.path.join(out_dir, "meta.json")))
    assert meta["checkpoint_meta"]["best_dice"] == 77.0
    # the synthetic spec is 64x64: the tool exports at dataset geometry
    assert meta["input_hw"] == [64, 64]

def test_data_parallel_predictor_matches_single_device(tiny_model, tmp_path):
    """data_parallel=True shards the request batch over all 8 fake devices
    and must return the same logits/masks as the single-device Predictor,
    including the zero-pad path when batch % n_devices != 0."""
    model, variables = tiny_model
    exported = export_predict_fn(model.apply, variables, (32, 32, 1),
                                 platforms=("cpu",))
    out_dir = str(tmp_path / "artifact")
    save_artifact(exported, {}, out_dir)

    single = Predictor(out_dir)
    sharded = Predictor(out_dir, data_parallel=True)
    assert sharded._n_shard == len(jax.devices()) == 8

    rs = np.random.RandomState(2)
    for batch in (8, 16, 5):  # divisible, multiple, pad path
        x = rs.randn(batch, 32, 32, 1).astype(np.float32)
        got = np.asarray(sharded.logits(x))
        want = np.asarray(single.logits(x))
        assert got.shape == want.shape == (batch, 32, 32, 2)
        # same program, different device partitioning -> reassociation noise
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(sharded.predict_masks(x),
                                      np.asarray(want).argmax(-1))
