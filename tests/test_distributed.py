"""Multi-host jax.distributed smoke test: two OS processes, Gloo CPU
collectives, running the pipeline's own mesh code (SURVEY §2c final
row / VERDICT round-1 item 4).  The mesh places the replicate axis
across processes so replicate fan-out needs no inter-host traffic."""

import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_fanout():
    port = _free_port()
    worker = os.path.join(HERE, "dist_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
        for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        assert rc == 0, err[-2000:]
        assert "DIST_OK" in out
    # both processes computed the same sharded total
    vals = [o.split("DIST_OK")[1].split() for _, o, _ in outs]
    assert vals[0][1] == vals[1][1]
