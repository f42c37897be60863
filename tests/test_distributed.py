"""Two-process jax.distributed CPU test for the multi-host layer.

Round 1 exercised parallel/mesh.py's process-reduction code only at
world_size=1; this spawns two real jax.distributed CPU processes
(the TPU analog of a 2-rank NCCL job — ref: basicsr/utils/dist_util.py)
and runs init + metric all-sum + process-sharded SRModel.dist_validation
end-to-end in each (tests/_dist_worker.py)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # the workers form their own 2-process world; don't inherit the suite's
    # 8-virtual-device flag (irrelevant but keeps device counts predictable)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen([sys.executable, worker, str(port), str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out}"
        assert f"DIST_WORKER_OK rank={i}" in out, out
