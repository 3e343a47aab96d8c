"""Multi-process multi-host test (SURVEY.md §2.3/§4).

Launches TWO OS processes that rendezvous via jax.distributed (TCP
coordinator), each owning 4 virtual CPU devices, forming one global
8-device 'rays' mesh that spans the process boundary — the actual
multi-controller code path of cge_tpu.parallel.sharding. Asserts the
distributed train step's loss and gradient movement match the
single-process 8-device result exactly (same mesh shape, same threefry
streams, same reduction order).
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
WORKER = os.path.join(HERE, "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_result():
    """The same 8-device train step in-process (conftest's virtual mesh)."""
    import jax.numpy as jnp
    from cge_tpu import (Camera, Features, RenderParams, SceneType,
                         load_scene_prebuilt)
    from cge_tpu.camera import pixel_grid
    from cge_tpu.parallel.sharding import make_mesh, train_step_sharded

    mesh = make_mesh(("rays",))
    scene = load_scene_prebuilt(SceneType.CornellBox)
    features = Features(enable_shading=True, enable_hard_shadow=True,
                        enable_recursive=True)
    grid = pixel_grid(8, 8).reshape(-1, 2)
    o, d = Camera().generate_rays(grid)
    target = jnp.zeros((o.shape[0], 3), jnp.float32)
    loss, new_scene = train_step_sharded(scene, o, d, target, features,
                                         RenderParams(), mesh, lr=1e-4,
                                         seed=0)
    dkd = float(np.abs(np.asarray(new_scene.mat_kd - scene.mat_kd)).sum())
    return float(loss), dkd


@pytest.mark.slow
def test_two_process_train_step_matches_single_process():
    port = _free_port()
    addr = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen([sys.executable, WORKER, addr, "2", str(pid)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True, cwd=REPO)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    results = {}
    for out, p in zip(outs, procs):
        assert p.returncode == 0, f"worker failed:\n{out}"
        m = re.search(r"MULTIHOST_RESULT pid=(\d+) ndev=(\d+) "
                      r"loss=([-\d.e]+) dkd=([-\d.e+]+)", out)
        assert m, f"no result line in worker output:\n{out}"
        assert int(m.group(2)) == 8, "mesh did not span both processes"
        results[int(m.group(1))] = (float(m.group(3)), float(m.group(4)))

    assert set(results) == {0, 1}
    # both processes see the identical replicated result
    assert results[0] == results[1]

    loss_1p, dkd_1p = _single_process_result()
    loss_2p, dkd_2p = results[0]
    # same mesh shape + same threefry fold-ins + same psum order => equal
    np.testing.assert_allclose(loss_2p, loss_1p, rtol=1e-6)
    np.testing.assert_allclose(dkd_2p, dkd_1p, rtol=1e-5)
