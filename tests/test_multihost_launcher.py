"""Multi-process distributed test (SURVEY.md §4): two REAL processes over
jax.distributed on CPU, sharded render compared against the single-process
render. Exercises DCN-style process coordination without a cluster.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

coord, pid = sys.argv[1], int(sys.argv[2])
from tpu_pathtracer.parallel import multihost
multihost.initialize(coord, 2, pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 8  # 2 procs x 4 local cpu devices

import numpy as np
from jax.experimental import multihost_utils
from tpu_pathtracer.models import camera as cm, scene as sc
from tpu_pathtracer.models.integrator import RenderConfig, render_image
from tpu_pathtracer.parallel.mesh import make_mesh
from tpu_pathtracer.parallel.sharding import render_sharded_jit

scene, cs = sc.single_sphere()
camera = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], 16, 16, cs["fov"])
cfg = RenderConfig(spp=4, max_bounces=3)
key = jax.random.key(11)

mesh = make_mesh(jax.devices(), n_tile=4, n_sample=2)
img = render_sharded_jit(scene, camera, key, cfg, mesh)
full = multihost_utils.process_allgather(img, tiled=True)

# single-process oracle computed locally on each process
want = np.array(render_image(scene, camera, key, cfg))
got = np.asarray(full).reshape(want.shape)
assert np.array_equal(got, want), (np.abs(got - want).max(),)
if pid == 0:
    print("MULTIHOST_OK", flush=True)
"""


def test_two_process_sharded_render_matches(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no TPU plugin in workers
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
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
            pytest.fail("multihost workers timed out")
        outs.append((p.returncode, out))
    for rc, out in outs:
        assert rc == 0, out[-2000:]
    assert "MULTIHOST_OK" in outs[0][1]
