"""True multi-controller integration: two OS processes, 4 fake CPU devices
each, joined by jax.distributed into one 8-device mesh over localhost —
the particle-sharded step must reproduce the single-device trajectory
(BASELINE.json config #5, SURVEY.md §5 'distributed communication
backend')."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_matches_single_device(tmp_path):
    port = _free_port()
    runner = os.path.join(os.path.dirname(__file__), "multihost_runner.py")
    ckpt = str(tmp_path / "mh")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)       # runner sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, runner, str(pid), "2", str(port), ckpt],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost runner timed out")
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"MULTIHOST-OK-{pid}" in out, out

    # Both processes saved identical global checkpoints.
    a = np.load(ckpt + ".p0")
    b = np.load(ckpt + ".p1")
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k])
