"""Multi-process bring-up smoke test (SURVEY.md section 4.2): 2 localhost
processes x 4 virtual CPU devices run the partitioned fusion over a global
8-device mesh; process 0 checks allclose vs the unpartitioned oracle."""

import os
import socket
import subprocess
import sys

import pytest

# Each test forks 2 fresh interpreters (cold jax import + compile, 280 s
# timeouts) — the slow tier. Default CI runs `-m "not slow"`; run these with
# `pytest -m ""` (docs/ci.md).
pytestmark = pytest.mark.slow


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_two_procs(cmd_for_pid, ok_marker, timeout=280, env_extra=None):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS",)}  # workers set their own device count
    env.update(env_extra or {})
    procs = [subprocess.Popen(
        cmd_for_pid(pid), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, env=env) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert ok_marker in out, f"worker {pid} no OK:\n{out[-3000:]}"
    return outs


def test_two_process_partitioned_fusion():
    worker = os.path.join(os.path.dirname(__file__), "mp_fusion_worker.py")
    port = _free_port()
    _run_two_procs(
        lambda pid: [sys.executable, worker, str(pid), "2", str(port)],
        "WORKER_OK")


def test_two_process_training_via_cli():
    """End-to-end multi-host TRAINING through the real CLI flags
    (--coordinator/--num_processes/--process_id, VERDICT round 1 item 5):
    2 localhost processes x 4 CPU devices, graph axis 8, two_robot_mean."""
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def cmd(pid):
        return [sys.executable, "-m", "mrp_gnn_tpu.train",
                "--config", "two_robot_mean", "--steps", "3",
                "--train_scenes", "8", "--log_every", "1",
                "--graph_axis", "8",
                "--coordinator", f"localhost:{port}",
                "--num_processes", "2", "--process_id", str(pid),
                "--local_device_count", "4"]

    outs = _run_two_procs(
        cmd, "final loss",
        env_extra={"JAX_PLATFORMS": "cpu",
                   "PYTHONPATH": repo + os.pathsep
                   + os.environ.get("PYTHONPATH", "")})
    assert '"step": 3' in outs[0]


def test_two_process_per_host_data_sharding():
    """Round 3 (VERDICT #3): each process renders ONLY the scenes whose
    node shards it addresses — the worker logs its node range and the two
    ranges are disjoint halves — and the 2-process loss trace matches the
    single-process run of the identical config."""
    import json
    import re
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {"JAX_PLATFORMS": "cpu",
           "PYTHONPATH": repo + os.pathsep + os.environ.get("PYTHONPATH", "")}

    def cmd(pid):
        return [sys.executable, "-m", "mrp_gnn_tpu.train",
                "--config", "two_robot_mean", "--steps", "3",
                "--train_scenes", "8", "--log_every", "1",
                "--graph_axis", "8", "--eval_every", "3",
                "--coordinator", f"localhost:{port}",
                "--num_processes", "2", "--process_id", str(pid),
                "--local_device_count", "4"]

    outs = _run_two_procs(cmd, "final loss", env_extra=env)
    ranges = []
    for out in outs:
        mm = re.search(r"per-host shard: node rows \[(\d+), (\d+)\) of (\d+)",
                       out)
        assert mm, f"no per-host shard marker:\n{out[-2000:]}"
        ranges.append((int(mm.group(1)), int(mm.group(2))))
        assert int(mm.group(3)) == 8
    # disjoint halves covering the 8-node axis
    assert sorted(ranges) == [(0, 4), (4, 8)], ranges

    def losses(out):
        ls = []
        for line in out.splitlines():
            if line.startswith("{"):
                rec = json.loads(line)
                if "total" in rec:
                    ls.append(rec["total"])
        return ls

    mp_losses = losses(outs[0])
    assert len(mp_losses) == 3

    # single-process reference: same config on 8 virtual devices
    ref = subprocess.run(
        [sys.executable, "-m", "mrp_gnn_tpu.train",
         "--config", "two_robot_mean", "--steps", "3",
         "--train_scenes", "8", "--log_every", "1", "--graph_axis", "8",
         "--eval_every", "3",
         "--local_device_count", "8"],
        capture_output=True, text=True, timeout=280,
        env={**{k: v for k, v in os.environ.items()
                if k not in ("XLA_FLAGS",)}, **env})
    assert ref.returncode == 0, ref.stdout[-2000:] + ref.stderr[-1000:]
    ref_losses = losses(ref.stdout)
    assert len(ref_losses) == 3
    for a, b in zip(mp_losses, ref_losses):
        assert abs(a - b) < 1e-4 * max(1.0, abs(b)), (mp_losses, ref_losses)

    # per-host-sharded EVAL (each process renders only its scenes) must
    # produce the same metric as the single-process full-render eval
    def eval_rmse(out):
        for line in out.splitlines():
            if line.startswith("{"):
                rec = json.loads(line)
                if "eval_rmse" in rec:
                    return rec["eval_rmse"]
        return None

    mp_rmse, ref_rmse = eval_rmse(outs[0]), eval_rmse(ref.stdout)
    assert mp_rmse is not None and ref_rmse is not None
    assert abs(mp_rmse - ref_rmse) < 1e-4 * max(1.0, abs(ref_rmse))
