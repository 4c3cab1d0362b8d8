"""Piecewise cost breakdown of a config-4 frame: packet waves vs sort vs
shading. Slope-protocol timings (see bench.py)."""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tpupt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tpu_pathtracer.models import camera as cm, scene as sc
from tpu_pathtracer.models.integrator import RenderConfig, render
from tpu_pathtracer.ops.pallas.mesh_kernel import intersect_mesh_packet

W, H, SPP = 256, 192, 2
N = W * H * SPP


def timed(fn, k, salt):
    t0 = time.perf_counter()
    out = fn(salt, k)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def slope(fn, iters=6):
    s = int(time.time_ns() & 0xFFFFF)
    timed(fn, 1, s + 1)
    timed(fn, iters, s + 2)
    t1 = timed(fn, 1, s + 3)
    tn = timed(fn, iters, s + 4)
    return (tn - t1) / (iters - 1) * 1e3  # ms per unit


def main():
    print(f"devices: {jax.devices()}", flush=True)
    scene, cs = sc.terrain_textured()
    scene = sc.with_packet_mesh(scene)
    camera = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], W, H,
                            cs["fov"])
    packed = scene.mesh_packed

    # representative ray sets
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    # primary-style: coherent fan from the eye
    eye = jnp.asarray(cs["eye"], jnp.float32)
    d_pri = jax.random.normal(k1, (N, 3))
    d_pri = d_pri.at[:, 1].add(-1.5)  # biased downward at the terrain
    d_pri = d_pri / jnp.linalg.norm(d_pri, axis=-1, keepdims=True)
    o_pri = jnp.broadcast_to(eye, (N, 3))
    # incoherent bounce-style: origins on the terrain, random directions
    o_inc = jax.random.uniform(
        k2, (N, 3), minval=jnp.asarray([-100.0, 0.0, -100.0]),
        maxval=jnp.asarray([100.0, 14.0, 100.0]))
    d_inc = jax.random.normal(k3, (N, 3))
    d_inc = d_inc / jnp.linalg.norm(d_inc, axis=-1, keepdims=True)

    def wave(o, d, sort, t_init=None):
        @partial(jax.jit, static_argnames=("k",))
        def fn(salt, k):
            def body(acc, i):
                oo = o + (salt + i).astype(jnp.float32) * 1e-6
                ph = intersect_mesh_packet(packed, oo, d, tmin=3e-2,
                                           sort=sort, t_init=t_init)
                return acc + jnp.sum(ph.t * 0 + ph.uv[:, 0]) + ph.t[0], None
            out, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(k, dtype=jnp.int32))
            return out
        return fn

    for label, o, d in [("coherent", o_pri, d_pri),
                        ("incoherent", o_inc, d_inc)]:
        ms_s = slope(wave(o, d, True))
        ms_n = slope(wave(o, d, False))
        print(f"{label:10s}: sorted {ms_s:6.1f} ms   unsorted {ms_n:6.1f} ms",
              flush=True)

    # sort machinery alone (argsort + 2 permutations of 8 planes)
    @partial(jax.jit, static_argnames=("k",))
    def sort_only(salt, k):
        def body(acc, i):
            key = (o_inc[:, 0] * 97 + d_inc[:, 1] * 31
                   + (salt + i).astype(jnp.float32)).astype(jnp.int32)
            perm = jnp.argsort(key)
            inv = jnp.argsort(perm)
            vals = [jnp.take(x, perm) for x in
                    (o_inc[:, 0], o_inc[:, 1], o_inc[:, 2],
                     d_inc[:, 0], d_inc[:, 1], d_inc[:, 2])]
            back = [jnp.take(v, inv) for v in vals]
            return acc + sum(b[0] for b in back), None
        out, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(k, dtype=jnp.int32))
        return out
    print(f"sort+permute alone: {slope(sort_only):6.1f} ms", flush=True)

    # full frame for reference
    cfg = RenderConfig(spp=SPP, max_bounces=3, use_nee=True)
    @partial(jax.jit, static_argnames=("k",))
    def frame(salt, k):
        def body(acc, i):
            img = render(scene, camera, key, cfg, iteration=salt + i)
            return acc + jnp.mean(img), None
        out, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(k, dtype=jnp.int32))
        return out
    print(f"full frame (nee): {slope(frame):6.1f} ms", flush=True)


if __name__ == "__main__":
    main()
