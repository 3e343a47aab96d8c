"""Multi-process jax.distributed worker for tests/test_multihost.py.

Each process owns 4 virtual CPU devices (XLA_FLAGS set by the launcher);
two processes form one global 8-device 'rays' mesh spanning both. The
worker runs train_step_sharded across the process boundary — the real
multi-controller code path (SURVEY.md §2.3: jax.distributed + mesh
collectives), which the in-process virtual-mesh tests cannot exercise —
and prints the loss plus a gradient-movement checksum for the launcher to
compare against the single-process result.

Usage: python multihost_worker.py <coordinator_addr> <num_procs> <proc_id>
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def main():
    addr, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from cge_tpu.parallel.sharding import init_distributed
    init_distributed(coordinator_address=addr, num_processes=nproc,
                     process_id=pid)
    assert jax.process_count() == nproc

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils

    from cge_tpu import Camera, Features, RenderParams, SceneType, \
        load_scene_prebuilt
    from cge_tpu.camera import pixel_grid
    from cge_tpu.parallel.sharding import make_mesh, train_step_sharded

    n_dev = len(jax.devices())
    mesh = make_mesh(("rays",))
    scene = load_scene_prebuilt(SceneType.CornellBox)
    camera = Camera()
    features = Features(enable_shading=True, enable_hard_shadow=True,
                        enable_recursive=True)
    params = RenderParams()

    grid = pixel_grid(8, 8).reshape(-1, 2)       # 64 rays: divides 8 devices
    o, d = camera.generate_rays(grid)
    target = jnp.zeros((o.shape[0], 3), jnp.float32)

    # form global arrays: rays sharded over the (cross-process) mesh, scene
    # replicated. host_local_array_to_global_array takes each process's
    # local slice of the 'rays' axis.
    n_local = o.shape[0] // nproc
    sl = slice(pid * n_local, (pid + 1) * n_local)

    def gshard(x):
        return multihost_utils.host_local_array_to_global_array(
            np.asarray(x)[sl], mesh, P("rays"))

    def grep_(x):
        return jax.device_put(np.asarray(x),
                              NamedSharding(mesh, P()))

    scene_g = jax.tree.map(grep_, scene)
    loss, new_scene = train_step_sharded(
        scene_g, gshard(o), gshard(d), gshard(target), features, params,
        mesh, lr=1e-4, seed=0)
    # loss and scene params come back fully replicated (out_specs P()), so
    # each process reads them locally
    loss = float(loss)
    dkd = float(np.abs(np.asarray(new_scene.mat_kd)
                       - np.asarray(scene.mat_kd)).sum())
    print(f"MULTIHOST_RESULT pid={pid} ndev={n_dev} "
          f"loss={loss:.9f} dkd={dkd:.9e}", flush=True)


if __name__ == "__main__":
    main()
