"""Focused A/B: incoherent + coherent wave, tile_rows 8/16, current code."""
import time
from functools import partial
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/tpupt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from tpu_pathtracer.models import scene as sc
from tpu_pathtracer.ops.pallas.mesh_kernel import intersect_mesh_packet, pack_mesh

W, H, SPP = 256, 192, 2
N = W * H * SPP

def slope(fn, iters=6):
    s = int(time.time_ns() & 0xFFFFF)
    def timed(k, ss):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(ss, k))
        return time.perf_counter() - t0
    timed(1, s + 1); timed(iters, s + 2)
    t1 = min(timed(1, s + 3 + i) for i in range(3))
    tn = min(timed(iters, s + 9 + i) for i in range(3))
    return (tn - t1) / (iters - 1) * 1e3

def main():
    import os
    import tpu_pathtracer.ops.pallas.mesh_kernel as mk
    mk.WALK_PAIR = int(os.environ.get("TP_PAIR", "2"))
    mk.QUEUE_CAP = int(os.environ.get("TP_QCAP", "16"))
    print(f"pair={mk.WALK_PAIR} qcap={mk.QUEUE_CAP}", flush=True)
    print(f"devices: {jax.devices()}", flush=True)
    scene, cs = sc.terrain_textured()
    import os
    cl = int(os.environ.get("TP_CL", "64"))
    packed = pack_mesh(scene.mesh, collapse_leaf=cl)
    coarse = pack_mesh(scene.mesh, collapse_leaf=1024, nodes_only=True,
                       fine_leaf=cl)
    key = jax.random.key(0)
    k2, k3 = jax.random.split(key)
    o_inc = jax.random.uniform(
        k2, (N, 3), minval=jnp.asarray([-100.0, 0.0, -100.0]),
        maxval=jnp.asarray([100.0, 14.0, 100.0]))
    d_inc = jax.random.normal(k3, (N, 3))
    d_inc = d_inc / jnp.linalg.norm(d_inc, axis=-1, keepdims=True)

    def wave(o, d, tile_rows, any_hit=False):
        @partial(jax.jit, static_argnames=("k",))
        def fn(salt, k):
            def body(acc, i):
                oo = o + (salt + i).astype(jnp.float32) * 1e-6
                ph = intersect_mesh_packet(
                    packed, oo, d, tmin=3e-2, coarse=coarse,
                    tile_rows=tile_rows, any_hit=any_hit)
                return acc + jnp.sum(ph.t * 0 + ph.uv[:, 0]) + ph.t[0], None
            out, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(k, dtype=jnp.int32))
            return out
        return fn

    for tr in (8, 16):
        print(f"incoherent closest tile_rows {tr}: "
              f"{slope(wave(o_inc, d_inc, tr)):6.1f} ms", flush=True)
    for tr in (8, 16):
        print(f"incoherent any-hit tile_rows {tr}: "
              f"{slope(wave(o_inc, d_inc, tr, any_hit=True)):6.1f} ms",
              flush=True)

main()
