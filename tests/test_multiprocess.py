"""Multi-process bring-up smoke test (SURVEY.md section 4.2): 2 localhost
processes x 4 virtual CPU devices run the partitioned fusion over a global
8-device mesh; process 0 checks allclose vs the unpartitioned oracle."""

import os
import socket
import subprocess
import sys



def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_partitioned_fusion():
    worker = os.path.join(os.path.dirname(__file__), "mp_fusion_worker.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS",)}  # workers set their own device count
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=280)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert "WORKER_OK" in out, f"worker {pid} no OK:\n{out[-3000:]}"
