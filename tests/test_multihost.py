"""Multi-host data parallelism on a fake 2-process cluster (SURVEY.md §4c).

Spawns two python processes, each with 4 virtual CPU devices, joined via
jax.distributed into one 8-device mesh, and runs a sharded stage-2 train
step — validating the cross-host collective path without TPU pods.
"""

import socket
import subprocess
import sys
from pathlib import Path



def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train_step():
    port = _free_port()
    worker = Path(__file__).parent / "multihost_worker.py"
    root = Path(__file__).parent.parent
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port)],
            cwd=str(root), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"WORKER{i} OK" in out
