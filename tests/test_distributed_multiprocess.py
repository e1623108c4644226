"""Genuine 2-process distributed test (VERDICT r3 #4).

Spawns two CPU subprocesses that form a real jax.distributed cluster
(gloo collectives over localhost), each owning 4 virtual devices of a
global 8-device "data" mesh. Validates the one previously untested
distributed seam (parallel/mesh.py):

  * ``initialize_distributed`` env wiring (SENAS_COORDINATOR /
    SENAS_NUM_PROCESSES / SENAS_PROCESS_ID) brings up the global device set;
  * ``assemble_global_batch`` stitches per-process local numpy batches into
    the correct global jax.Arrays (each process verifies its addressable
    shards against the known global batch);
  * one sharded fixed-model train step over the 2-process mesh produces the
    SAME loss and updated-parameter checksum as the identical step run
    single-process on an 8-virtual-device mesh (GSPMD gradient psums ride
    the cross-process collectives).

Reference scope being generalized: the reference's only distributed path is
single-host nn.DataParallel (experiments/train_model.py:135-137); SURVEY
§2.2 makes the mesh backend first-class, so the multi-process seam gets a
first-class test. Skips (not fails) if the cluster cannot form on this
platform (no localhost sockets / no gloo).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["SENAS_REPO"])
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from senas_tpu.parallel.mesh import (MeshSpec, assemble_global_batch,
                                     initialize_distributed, make_mesh,
                                     place_state, replicate)

initialize_distributed()  # env-driven (SENAS_COORDINATOR / ..._PROCESSES / ..._ID)

nproc = jax.process_count()
pid = jax.process_index()
ndev_global = len(jax.devices())
ndev_local = len(jax.local_devices())

mesh = make_mesh(spec=MeshSpec(data=ndev_global, spatial=1))

# deterministic GLOBAL batch, every process derives the same one
B, HW = ndev_global, 16
rs = np.random.RandomState(0)
g_img = rs.randn(B, HW, HW, 1).astype(np.float32)
g_lab = rs.randint(0, 2, (B, HW, HW)).astype(np.int32)
lo = pid * (B // nproc)
hi = lo + B // nproc
local = {"image": g_img[lo:hi], "label": g_lab[lo:hi]}

batch = assemble_global_batch(mesh, local, spatial=False)
assert batch["image"].shape == (B, HW, HW, 1), batch["image"].shape
assert batch["label"].shape == (B, HW, HW), batch["label"].shape
# every addressable shard must hold exactly its slice of the global batch
for shard in batch["image"].addressable_shards:
    row = shard.index[0].start or 0
    np.testing.assert_array_equal(np.asarray(shard.data)[0], g_img[row])

from senas_tpu.models.geno_searched import senas_node_4
from senas_tpu.models.senas_model import SenasModel
from senas_tpu.train.loss import build_loss
from senas_tpu.train.optim import build_optimizer
from senas_tpu.train.trainer import FixedTrainState, make_train_step

model = SenasModel(nclass=2, in_channels=1, c=4, depth=2,
                   genotype=senas_node_4)
variables = model.init({"params": jax.random.PRNGKey(0)},
                       np.zeros((B, HW, HW, 1), np.float32), False)
tx = build_optimizer({"name": "sgd", "lr": 1e-2, "momentum": 0.9})
step = make_train_step(model.apply, build_loss("dice_ce"), tx,
                       grad_clip=5.0, donate=False)
state = place_state(mesh, FixedTrainState.create(variables, tx))
new_state, metrics = step(state, batch)
loss = float(metrics["loss"])
checksum = float(sum(float(jax.numpy.sum(jax.numpy.abs(l)))
                     for l in jax.tree.leaves(new_state.params)))
print(json.dumps({"pid": pid, "nproc": nproc, "ndev": ndev_global,
                  "ndev_local": ndev_local, "loss": loss,
                  "checksum": checksum}), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(extra):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
         if p and "axon_site" not in p] + [_REPO])
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["SENAS_REPO"] = _REPO
    env.pop("SENAS_COORDINATOR", None)
    env.pop("SENAS_NUM_PROCESSES", None)
    env.pop("SENAS_PROCESS_ID", None)
    env.update(extra)
    return env


def _parse_line(out: str) -> dict:
    for ln in reversed(out.splitlines()):
        ln = ln.strip()
        if ln.startswith("{"):
            return json.loads(ln)
    raise AssertionError(f"no JSON line in worker output: {out[-2000:]}")


def test_two_process_mesh_matches_single_process(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    port = _free_port()

    procs = []
    for pid in (0, 1):
        env = _env({"SENAS_COORDINATOR": f"127.0.0.1:{port}",
                    "SENAS_NUM_PROCESSES": "2",
                    "SENAS_PROCESS_ID": str(pid)})
        procs.append(subprocess.Popen(
            [sys.executable, "-u", str(script)], env=env, cwd=_REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=600)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("2-process cluster did not complete on this platform")
    for rc, out, err in outs:
        if rc != 0 and ("DEADLINE_EXCEEDED" in err or "UNAVAILABLE" in err
                        or "barrier" in err.lower()):
            pytest.skip(f"cluster bring-up unavailable here: {err[-400:]}")
        assert rc == 0, f"worker failed rc={rc}\n{err[-3000:]}"

    r0 = _parse_line(outs[0][1])
    r1 = _parse_line(outs[1][1])
    assert r0["nproc"] == r1["nproc"] == 2
    assert r0["ndev"] == r1["ndev"] == 8
    assert r0["ndev_local"] == r1["ndev_local"] == 4
    # both processes observed the SAME global computation
    assert r0["loss"] == pytest.approx(r1["loss"], rel=1e-6)
    assert r0["checksum"] == pytest.approx(r1["checksum"], rel=1e-6)

    # single-process run: same global batch, same 8-device mesh geometry
    env = _env({"XLA_FLAGS": "--xla_force_host_platform_device_count=8"})
    sp = subprocess.run([sys.executable, "-u", str(script)], env=env,
                        cwd=_REPO, capture_output=True, text=True,
                        timeout=600)
    assert sp.returncode == 0, sp.stderr[-3000:]
    rs = _parse_line(sp.stdout)
    assert rs["nproc"] == 1 and rs["ndev"] == 8
    # same partitioning -> same reduction structure; tolerance covers
    # XLA:CPU codegen variance between the gloo and in-process collectives
    assert r0["loss"] == pytest.approx(rs["loss"], rel=2e-5, abs=2e-5)
    assert r0["checksum"] == pytest.approx(rs["checksum"], rel=2e-5)
