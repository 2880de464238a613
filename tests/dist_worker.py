"""Worker process for the two-process jax.distributed test
(tests/test_dist_multiprocess.py).  Each process owns 4 virtual CPU
devices; the pair forms the same 8-device (4 tiles × 2 samples) global
mesh the single-process suite uses, runs one sharded render + one
make_train_step step, and process 0 prints a JSON digest for the parent
to compare against the single-process run.
"""

import json
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
# the env convention under test (README "Multi-host")
os.environ["JAX_COORDINATOR"] = f"127.0.0.1:{port}"
os.environ["JAX_NUM_PROCESSES"] = str(nproc)
os.environ["JAX_PROCESS_ID"] = str(pid)

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ptx.integrate.camera import Camera            # noqa: E402
from ptx.integrate.trace import compile_scene       # noqa: E402
from ptx.parallel import dist                       # noqa: E402
from ptx.parallel.mesh import image_sharding        # noqa: E402
from ptx.parallel.render import make_train_step, render_sharded  # noqa: E402
from ptx.scenes.builders import baseline_config1    # noqa: E402


def main():
    dist.initialize()        # from the env convention
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc

    scene = compile_scene(baseline_config1())
    cam = Camera(16, 8)
    mesh = dist.global_mesh(tiles=4, samples=2)
    key = jax.random.PRNGKey(0)

    img = render_sharded(scene, cam, mesh, key, spp=4, depth=3)
    from jax.experimental import multihost_utils
    img_full = np.asarray(multihost_utils.process_allgather(
        img, tiled=True))

    target = jax.make_array_from_process_local_data(
        image_sharding(mesh),
        np.zeros((cam.height // nproc, cam.width, 3), np.float32))
    step = make_train_step(scene, cam, mesh, spp=4, depth=3)
    new_params, loss = step(scene.params, target, key)
    grad_digest = float(jnp_sum_abs(new_params))

    if pid == 0:
        print("RESULT " + json.dumps({
            "loss": float(loss),
            "img_mean": float(img_full.mean()),
            "img_sum": float(img_full.sum()),
            "grad_digest": grad_digest,
        }), flush=True)


def jnp_sum_abs(params):
    import jax.numpy as jnp
    total = 0.0
    for leaf in jax.tree.leaves(params):
        total = total + jnp.sum(jnp.abs(leaf))
    return total


if __name__ == "__main__":
    main()
