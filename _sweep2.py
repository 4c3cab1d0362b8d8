import time
from functools import partial
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/tpupt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from tpu_pathtracer.models import camera as cm, scene as sc
from tpu_pathtracer.ops.pallas.persistent import init_state, persistent_step, state_image
from tpu_pathtracer.ops.pallas.trace_kernel import pack_camera
W, H, MB, ITERS = 640, 480, 10, 30
scene, cs = sc.cornell_spheres()
cam = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], W, H, cs["fov"])
cp = pack_camera(cam)
def mk(tile_rows, budget):
    @partial(jax.jit, static_argnames=("k",))
    def frames(salt, k):
        st0 = init_state(W, H, tile_rows)
        def body(carry, i):
            st, rays = carry
            st, nr = persistent_step(scene, cp, jnp.stack([salt, i]), st, budget=budget,
                width=W, height=H, max_bounces=MB, tile_rows=tile_rows)
            return (st, rays + nr), None
        (st, rays), _ = jax.lax.scan(body, (st0, jnp.int32(0)), jnp.arange(k, dtype=jnp.int32))
        return state_image(st, W, H).mean(), rays
    return frames
def measure(frames):
    salt = jnp.int32(time.time_ns() & 0x0FFFFFFF)
    def timed(k, s):
        t0 = time.perf_counter()
        acc, rays = frames(s, k)
        float(acc)
        return time.perf_counter() - t0, int(rays)
    timed(1, salt + 1); timed(ITERS, salt + 2)
    best = 0.0
    for j in (3, 5, 7):
        t1, r1 = timed(1, salt + j)
        tn, rn = timed(ITERS, salt + j + 1)
        best = max(best, (rn - r1) / max(tn - t1, 1e-9))
    return best
for tr, b in ((32, 32), (64, 16), (64, 32), (32, 16), (96, 16)):
    try:
        print(f"tile_rows={tr} budget={b}: {measure(mk(tr, b))/1e9:.2f} Grays/s", flush=True)
    except Exception as e:
        print(f"tile_rows={tr} budget={b}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
