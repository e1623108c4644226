"""Unit tests for the driver entry-point glue in __graft_entry__.py.

These pin the dryrun_multichip orchestration CONTRACT (the part the driver
depends on) without running any XLA compile: subprocess.run is stubbed, so
the tests cover budget accounting, stage-3 skip/timeout semantics, and the
environment the CPU subprocess is launched with (reference behavior being
generalized: the single-process CUDA setup at train_model.py:74-86 has no
equivalent — this is the TPU-native driver surface).
"""

import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft


class _FakeProc:
    def __init__(self, rc=0):
        self.returncode = rc


@pytest.fixture
def calls(monkeypatch):
    """Stub subprocess.run inside __graft_entry__; record every invocation."""
    recorded = []

    def fake_run(cmd, **kw):
        recorded.append({"cmd": cmd, **kw})
        return _FakeProc(0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    return recorded


def test_stage3_runs_within_budget(calls, monkeypatch):
    monkeypatch.setenv("SENAS_DRYRUN_BUDGET", "1000")
    monkeypatch.setenv("SENAS_DRYRUN_REAL", "1")
    monkeypatch.delenv("SENAS_DRYRUN_REAL_TIMEOUT", raising=False)
    graft.dryrun_multichip(8)
    assert len(calls) == 2, "stages 1-2 subprocess + stage-3 subprocess"
    # stage 3 timeout is capped by the remaining budget (minus margin),
    # never by more than the explicit per-stage cap
    assert calls[1]["timeout"] <= 1000 - 15 + 1
    assert calls[1]["timeout"] <= 1800


def test_stage3_skipped_when_budget_exhausted(calls, monkeypatch, capsys):
    # stages 1-2 consume ~0s in the stub, so remaining ≈ budget; a budget
    # below the 120s floor must skip stage 3 cleanly (no exception, rc-0
    # semantics for the driver)
    monkeypatch.setenv("SENAS_DRYRUN_BUDGET", "100")
    monkeypatch.setenv("SENAS_DRYRUN_REAL", "1")
    graft.dryrun_multichip(8)
    assert len(calls) == 1, "stage 3 must not launch"
    assert "SKIPPED" in capsys.readouterr().out


def test_stage3_off_by_default(calls, monkeypatch, capsys):
    """VERDICT r3 #1: stage 3's compile (>469s measured) can never fit the
    driver's ~300s external window — the default dryrun is stages 1-2 only."""
    monkeypatch.delenv("SENAS_DRYRUN_REAL", raising=False)
    graft.dryrun_multichip(8)
    assert len(calls) == 1, "stage 3 must not launch by default"
    assert "skipped by default" in capsys.readouterr().out


def test_stage3_disabled_via_env(calls, monkeypatch, capsys):
    monkeypatch.setenv("SENAS_DRYRUN_REAL", "0")
    graft.dryrun_multichip(8)
    assert len(calls) == 1
    assert "skipped by default" in capsys.readouterr().out


def test_stage3_timeout_is_clean_skip(monkeypatch, capsys):
    monkeypatch.setenv("SENAS_DRYRUN_BUDGET", "1000")
    monkeypatch.setenv("SENAS_DRYRUN_REAL", "1")
    n = {"calls": 0}

    def fake_run(cmd, **kw):
        n["calls"] += 1
        if n["calls"] == 2:
            raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 0))
        return _FakeProc(0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    graft.dryrun_multichip(8)  # must NOT raise — rc stays 0 for the driver
    assert "SKIPPED" in capsys.readouterr().out


def test_stage12_failure_raises(monkeypatch):
    def fake_run(cmd, **kw):
        return _FakeProc(3)

    monkeypatch.setattr(subprocess, "run", fake_run)
    with pytest.raises(RuntimeError, match="rc=3"):
        graft.dryrun_multichip(8)


@pytest.mark.skipif(os.environ.get("SENAS_RUN_REAL_DRYRUN") != "1",
                    reason="opt-in: >469s XLA:CPU compile of the flagship "
                           "256² search step (set SENAS_RUN_REAL_DRYRUN=1)")
def test_real_config_sharded_search_dryrun():
    """Builder-side home of the former dryrun stage 3 (VERDICT r3 #1): the
    flagship supernet bilevel search step at the production geometry
    (c=32, depth=5, meta=3, 256², batch 8), data-parallel over an 8-device
    virtual mesh. Validates the reference's real searching config
    (configs/senas/senas_promise12.yml:10-26 geometry, replica path
    search/senas_search.py:262-279) compiles + executes under GSPMD."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
         if p and "axon_site" not in p] + [here])
    code = ("import jax; jax.config.update('jax_platforms', 'cpu')\n"
            f"import sys; sys.path.insert(0, {here!r})\n"
            "import __graft_entry__ as g\n"
            "g._dryrun_real_search(8)\n")
    proc = subprocess.run([sys.executable, "-u", "-c", code], env=env,
                          cwd=here, timeout=3600)
    assert proc.returncode == 0


def test_subprocess_env_is_tunnel_independent(calls, monkeypatch):
    """The CPU subprocess must never see the axon TPU plugin (a parent-side
    backend probe hanging on a dead tunnel is the MULTICHIP_r02 failure)."""
    monkeypatch.setenv("PYTHONPATH", "/root/.axon_site:/elsewhere")
    monkeypatch.setenv("XLA_FLAGS",
                       "--xla_force_host_platform_device_count=2 --foo")
    monkeypatch.setenv("SENAS_DRYRUN_REAL", "0")
    graft.dryrun_multichip(8)
    env = calls[0]["env"]
    assert "axon_site" not in env["PYTHONPATH"]
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert "device_count=2" not in env["XLA_FLAGS"]
    assert "--foo" in env["XLA_FLAGS"]
    assert env["JAX_PLATFORMS"] == "cpu"
