"""Real 2-process jax.distributed test (SURVEY §5.8 / BASELINE config 5's
testable half): two OS processes, each with 2 virtual CPU devices, one
4-device `tiles` mesh spanning both — the same pjit program and psum
path that spans hosts on a pod. Verifies the distributed losses equal a
single-process run of the identical step."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "mp_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train_step(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # each worker re-inits its own backend; don't inherit this process's
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    dist_losses = np.array(
        [float(v) for v in open(tmp_path / "losses.txt").read().split()]
    )

    # single-process reference: same program on a 4-device local mesh
    ref = subprocess.run(
        [sys.executable, WORKER, "0", "1", str(port + 1), str(tmp_path)],
        env={**env, "XLA_FLAGS": "--xla_force_host_platform_device_count=4"},
        capture_output=True,
        timeout=600,
    )
    assert ref.returncode == 0, ref.stdout[-3000:]
    ref_losses = np.array(
        [float(v) for v in open(tmp_path / "losses.txt").read().split()]
    )
    np.testing.assert_allclose(dist_losses, ref_losses, rtol=1e-5)
    assert dist_losses[-1] < dist_losses[0]  # it actually trains
