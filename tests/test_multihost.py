"""Multi-host (multi-process) runtime tests.

SURVEY.md section 4: multi-host coverage without a pod — N local CPU
processes, each with M virtual devices, joined via jax.distributed; the
landmark-sharded Schur BA runs as one SPMD program whose psums cross
process boundaries."""

import json
import socket
import subprocess
import sys

import pytest

from conftest import cpu_mesh_environ


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_cluster(num_processes, ndev_per_proc, n_iters=8, assembly="pcg",
                 timeout=600):
    port = _free_port()
    procs = []
    for pid in range(num_processes):
        env = cpu_mesh_environ(ndev_per_proc)
        procs.append(subprocess.Popen(
            [sys.executable, "-m",
             "orb_slam3_study_kr_tpu.parallel.multihost_worker",
             str(pid), str(num_processes), str(port), str(n_iters),
             assembly],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    rc0, out0, err0 = outs[0]
    assert all(rc == 0 for rc, _, _ in outs), \
        "\n".join(f"[proc {i} rc={rc}]\n{err[-3000:]}"
                  for i, (rc, _, err) in enumerate(outs))
    return json.loads(out0.strip().splitlines()[-1])


@pytest.mark.slow
def test_multiprocess_ba_two_hosts():
    """2 processes x 2 virtual devices: the BA's psums run over process
    boundaries and the solve still converges to ground truth."""
    res = _run_cluster(2, 2)
    assert res["n_processes"] == 2
    assert res["n_devices_global"] == 4
    assert res["pose_err"] < 0.05, res
    assert res["rot_err"] < 0.01, res
    # The sharded landmark table gathers back to every process.
    assert res["X_shape"][0] % 4 == 0


@pytest.mark.slow
def test_multiprocess_matches_single_process():
    """The same problem solved 1-process/4-device and 2-process/2-device
    converges to the same optimum (collectives don't change the math)."""
    res1 = _run_cluster(1, 4)
    res2 = _run_cluster(2, 2)
    assert res1["pose_err"] < 0.05 and res2["pose_err"] < 0.05
    assert abs(res1["pose_err"] - res2["pose_err"]) < 0.02
