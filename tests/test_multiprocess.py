"""True multi-process sharding test: 2 processes x 4 virtual CPU devices,
jax.distributed + gloo collectives (the DCN-analog path the single-process
virtual mesh cannot exercise — VERDICT r1 item 4b).

The psum convergence vote inside the sharded while-loop crosses the process
boundary; each worker asserts its shard matches an unsharded local solve
(tests/multiprocess_worker.py)."""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "multiprocess_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_solve_parity():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_PROCESSES")}
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker {pid}/2: OK" in out, out
        # leg 2: the shard_map-over-Pallas straggler pipeline across the
        # process boundary (bitwise per-shard parity asserted in-worker)
        assert f"worker {pid}/2: pipeline OK" in out, out
