"""Smoke tests for the offline tools/ scripts (reference tools/ parity):
each runs as a subprocess against synthetic inputs and must produce its
artifact."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=240):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = env.get("JAX_PLATFORMS", "")
    proc = subprocess.run([sys.executable] + args, cwd=REPO, timeout=timeout,
                          capture_output=True, text=True, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc


def test_cell_visualize_writes_dot(tmp_path):
    _run(["tools/cell_visualize.py", "--geno-name", "senas_node_2",
          "--directory", str(tmp_path)])
    dots = [f for f in os.listdir(tmp_path) if f.endswith(".dot")
            or f.endswith(".gv")] or list(os.listdir(tmp_path))
    assert dots, f"no artifacts in {tmp_path}"


def _write_run_dir(tmp_path):
    run = tmp_path / "run"
    run.mkdir()
    with open(run / "scalars.jsonl", "w") as f:
        for step in range(5):
            f.write(json.dumps({"tag": "Train/Loss", "step": step,
                                "value": 1.0 / (step + 1)}) + "\n")
            f.write(json.dumps({"tag": "Val/dice", "step": step,
                                "value": 50.0 + step}) + "\n")
    return run


def test_log_display_plots_scalars(tmp_path):
    run = _write_run_dir(tmp_path)
    _run(["tools/log_display.py", "--path", str(run),
          "--out", str(tmp_path / "curves.png")])
    outs = [f for f in os.listdir(tmp_path) if f.endswith(".png")]
    assert outs, "log_display produced no plot"


def test_train_display_builds_html(tmp_path):
    run = _write_run_dir(tmp_path)
    _run(["tools/train_display.py", "--path", str(run), "--no-images",
          "--out", str(tmp_path / "replay.html")])
    assert (tmp_path / "replay.html").exists()


def test_calc_mean_std_on_synthetic():
    proc = _run(["tools/calc_mean_std.py", "--dataset", "synthetic",
                 "--limit", "8"])
    out = proc.stdout.lower()
    assert "mean" in out and "std" in out, proc.stdout[-500:]


def test_profile_report_summarizes_trace(tmp_path):
    """Capture a tiny jax.profiler trace (CPU fallback path) and check the
    per-kernel-class table comes out with the expected classes."""
    trace = str(tmp_path / "trace")
    capture = (
        "import jax, jax.numpy as jnp\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "f = jax.jit(lambda x: jnp.tanh(x @ x).sum())\n"
        "x = jnp.ones((256, 256)); f(x).block_until_ready()\n"
        f"jax.profiler.start_trace({trace!r})\n"
        "for _ in range(2): f(x).block_until_ready()\n"
        "jax.profiler.stop_trace()\n"
    )
    script = tmp_path / "cap.py"
    script.write_text(capture)
    _run([str(script)])
    proc = _run(["tools/profile_report.py", trace])
    assert "device busy" in proc.stdout
    assert "matmul" in proc.stdout
    assert "dot_general" in proc.stdout


def test_bench_window_report_reads_kill_time(tmp_path):
    """The heartbeat/killed stamps in a capture tail encode the driver's
    kill window; the report tool must read it back (VERDICT r4 #5)."""
    lines = [
        json.dumps({"metric": "senas_search_steps_per_sec", "value": 2.3,
                    "heartbeat": True, "elapsed_s": 60.0, "at": "00:01:00"}),
        "stderr noise between JSON lines",
        json.dumps({"metric": "senas_search_steps_per_sec", "value": 2.3,
                    "killed": True, "elapsed_s": 301.5, "at": "00:05:01"}),
    ]
    # driver-artifact form: {"tail": ..., "rc": 124}
    art = tmp_path / "BENCH_rX.json"
    art.write_text(json.dumps({"tail": "\n".join(lines), "rc": 124}))
    proc = _run(["tools/bench_window_report.py", str(art)])
    r = json.loads(proc.stdout.strip())
    assert r["kill_window_s"] == 301.5
    assert "exact" in r["window_source"]
    assert r["last_headline_value"] == 2.3
    assert r["heartbeats"] == 1
    # heartbeat-only capture: lower bound
    art2 = tmp_path / "BENCH_rY.json"
    art2.write_text(json.dumps({"tail": lines[0], "rc": 124}))
    r2 = json.loads(_run(["tools/bench_window_report.py",
                          str(art2)]).stdout.strip())
    assert r2["kill_window_s"] == 60.0
    assert "lower bound" in r2["window_source"]
