"""Multi-host DCN path (SURVEY §2.2): 2 coordinated processes, 2 virtual CPU
devices each, one 4-device global mesh, one flagship pretrain step — the
loss must match the single-process 4-device run (VERDICT r2 Missing #3).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_matches_single_process():
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "distributed_worker.py")
    coordinator = f"127.0.0.1:{_free_port()}"

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # the worker appends its own device-count flag
    env["XLA_FLAGS"] = ""
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [os.path.dirname(here), env.get("PYTHONPATH", "")] if p
    )

    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, out[-4000:]

    losses = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("DIST_LOSS ")]
        assert lines, out[-4000:]
        losses.append(float(lines[-1].split()[1]))
    # the replicated loss is identical on both processes
    assert losses[0] == losses[1], losses

    # single-process 4-device control on the in-test 8-device backend
    from tests.distributed_worker import run_flagship_step

    single = run_flagship_step()
    np.testing.assert_allclose(losses[0], single, rtol=1e-6)
