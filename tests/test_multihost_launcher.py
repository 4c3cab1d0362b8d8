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


KERNEL_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

coord, pid = sys.argv[1], int(sys.argv[2])
from tpu_pathtracer.parallel import multihost
multihost.initialize(coord, 2, pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 8

import numpy as np
import jax.numpy as jnp
from jax.experimental import multihost_utils
from tpu_pathtracer.models import camera as cm, scene as sc
from tpu_pathtracer.ops.pallas.persistent import init_state, persistent_step
from tpu_pathtracer.ops.pallas.trace_kernel import pack_camera
from tpu_pathtracer.parallel.mesh import make_mesh
from tpu_pathtracer.parallel.persistent_sharded import (
    init_state_sharded, persistent_step_sharded,
)
from tpu_pathtracer.diff.inverse import kernel_loss_and_grads, params_of

W, H, TR = 16, 12, 8
MB, SPP, BUDGET = 3, 2, 4
scene, cs = sc.cornell_spheres()
camera = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], W, H, cs["fov"])
cp = pack_camera(camera)
seed = jnp.array([5, 11], jnp.int32)
# ONE device from each process: the smallest mesh that still crosses a
# real process boundary (8 interpreted shards would multiply the
# interpreter cost 4x for no extra coverage)
devs = sorted(jax.devices(), key=lambda d: d.process_index)
sub = [next(d for d in devs if d.process_index == p) for p in (0, 1)]
mesh = make_mesh(sub, n_tile=2, n_sample=1)

# --- production persistent-kernel step across 2 real processes
st = init_state_sharded(W, H, mesh, tile_rows=TR)
# interpret="generic": the Mosaic TPU interpreter installs a
# threading.Barrier across ALL mesh devices, which deadlocks when the
# mesh spans real processes; the generic pallas interpreter is
# bit-identical for this kernel (external uniforms)
st, nr = persistent_step_sharded(
    scene, cp, seed, st, mesh, budget=BUDGET, width=W, height=H,
    max_bounces=MB, tile_rows=TR, interpret="generic",
)
# single-process oracle computed locally on each process
st_ref = init_state(W, H, tile_rows=TR, tiles_multiple=2)
st_ref, nr_ref = persistent_step(
    scene, cp, seed, st_ref, budget=BUDGET, width=W, height=H,
    max_bounces=MB, tile_rows=TR, interpret="generic",
)
assert int(nr) == int(nr_ref), (int(nr), int(nr_ref))
for f in ("lr", "lg", "lb", "n_samp", "alive"):
    got = np.asarray(
        multihost_utils.process_allgather(getattr(st, f), tiled=True)
    )
    want = np.asarray(getattr(st_ref, f))
    assert np.array_equal(got, want), (f, np.abs(got - want).max())

# --- production fused value-and-grad kernel across 2 real processes
rng = np.random.default_rng(9)
target = jnp.asarray(rng.random((H, W, 3), np.float32))
params = params_of(scene)
loss_s, grads_s = kernel_loss_and_grads(
    params, scene, camera, target, seed, 0, spp=SPP, max_bounces=MB,
    tile_rows=TR, budget=BUDGET, mesh=mesh, engine="persistent",
    interpret="generic",
)
loss_1, grads_1 = kernel_loss_and_grads(
    params, scene, camera, target, seed, 0, spp=SPP, max_bounces=MB,
    tile_rows=TR, budget=BUDGET, mesh=None, engine="persistent",
    interpret="generic",
)
# psum'd outputs are replicated => fully addressable on every process
np.testing.assert_allclose(float(loss_s), float(loss_1), rtol=1e-6)
assert np.abs(np.asarray(grads_1["mat_color"])).max() > 0
for k in grads_1:
    np.testing.assert_allclose(
        np.asarray(grads_s[k]), np.asarray(grads_1[k]),
        rtol=1e-5, atol=1e-8, err_msg=k,
    )
if pid == 0:
    print("MULTIHOST_KERNEL_OK", flush=True)
"""


def _run_two_workers(tmp_path, worker_src, ok_token, timeout=420):
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
    script.write_text(worker_src)
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
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost workers timed out")
        outs.append((p.returncode, out))
    for rc, out in outs:
        assert rc == 0, out[-2000:]
    assert ok_token in outs[0][1]


def test_two_process_sharded_render_matches(tmp_path):
    _run_two_workers(tmp_path, WORKER, "MULTIHOST_OK", timeout=240)


def test_two_process_production_kernels_match(tmp_path):
    """The PRODUCTION paths — the sharded persistent path-regeneration
    step and the fused value-and-grad kernel — across 2 real processes
    (4 cpu devices each): bit-identical state / equal loss+grads vs the
    single-process run (VERDICT r4 item 5: the >= 0.9 scaling evidence on
    the path users run, not only the XLA oracle)."""
    _run_two_workers(tmp_path, KERNEL_WORKER, "MULTIHOST_KERNEL_OK")
