"""Microbenchmark the integrator's pieces at the reference workload size.

Times (on whatever backend is active): per-bounce RNG generation, the
intersection sweep, BSDF sampling, and the full frame — to locate the
bottleneck before optimizing. Run on the real chip:  python
benchmarks/profile_pieces.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tpupt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tpu_pathtracer.models import camera as cm, scene as sc
from tpu_pathtracer.models.integrator import RenderConfig, render, trace
from tpu_pathtracer.models.scene import prim_attrs
from tpu_pathtracer.ops import bsdf
from tpu_pathtracer.ops.intersect import intersect
from tpu_pathtracer.utils import rng

N = 640 * 480 * 4
BOUNCES = 11


def timeit(name, fn, *args, iters=5):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:24s} {dt*1e3:9.2f} ms")
    return dt


def main():
    scene, cs = sc.cornell_spheres()
    camera = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], 640, 480, cs["fov"])
    attrs = prim_attrs(scene)
    key = jax.random.key(0)
    lanes = jnp.arange(N, dtype=jnp.int32)

    @jax.jit
    def rng_only(k):
        def body(acc, b):
            u = rng.bounce_uniforms(k, b, lanes)
            return acc + u.sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(BOUNCES))
        return acc

    @jax.jit
    def intersect_only(k):
        o0 = jnp.zeros((N, 3))
        d0 = jnp.tile(jnp.asarray([[0.577, 0.577, -0.577]]), (N, 1))
        def body(carry, b):
            o, d = carry
            h = intersect(scene, attrs, o, d)
            # feed hit point back so the chain isn't CSE'd away
            d2 = jnp.roll(d, 1, axis=0)
            return (h.p, d2), None
        (o, _), _ = jax.lax.scan(body, (o0, d0), jnp.arange(BOUNCES))
        return o.sum()

    @jax.jit
    def bsdf_only(k):
        n = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (N, 1))
        wo = jnp.tile(jnp.asarray([[0.3, 0.2, -0.93]]), (N, 1))
        alb = jnp.full((N, 3), 0.7)
        coef = jnp.full((N,), 1.5)
        mt = (lanes % 3).astype(jnp.int32)
        def body(carry, b):
            u = rng.bounce_uniforms(k, b, lanes)
            f, wi, pdf = bsdf.sample(mt, alb, coef, carry, n, u[:, 0], u[:, 1])
            return wi, None
        wi, _ = jax.lax.scan(body, wo, jnp.arange(BOUNCES))
        return wi.sum()

    cfg = RenderConfig(spp=4, max_bounces=10, remat=False)

    @jax.jit
    def full_frame(k):
        return render(scene, camera, k, cfg, iteration=0)

    t_rng = timeit("rng x11", rng_only, key)
    t_int = timeit("intersect x11", intersect_only, key)
    t_bsdf = timeit("rng+bsdf x11", bsdf_only, key)
    t_full = timeit("full frame", full_frame, key)
    print(f"bsdf-only estimate      {max(t_bsdf - t_rng, 0)*1e3:9.2f} ms")
    print(f"sum of pieces           {(t_rng + t_int + max(t_bsdf-t_rng,0))*1e3:9.2f} ms")


if __name__ == "__main__":
    main()
