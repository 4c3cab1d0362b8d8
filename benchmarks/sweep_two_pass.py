"""A/B the two-pass binned traversal against single-pass octant packets.

Measures, on the config-4 workload (100k-tri terrain):
  - synthetic full-intensity coherent + incoherent waves (the VERDICT r3
    "incoherent-wave wall" metric) for each traversal mode;
  - the REAL frame (256x192x2spp, 3 bounces, NEE) for each mode;
  - fine tile_rows and coarse_leaf sensitivity under binning.

Slope-protocol timings (see bench.py).
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tpupt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tpu_pathtracer.models import camera as cm, scene as sc
from tpu_pathtracer.models.integrator import RenderConfig, render
from tpu_pathtracer.ops.pallas.mesh_kernel import (
    intersect_mesh_packet, pack_mesh,
)

W, H, SPP = 256, 192, 2
N = W * H * SPP


def slope(fn, iters=6):
    s = int(time.time_ns() & 0xFFFFF)

    def timed(k, ss):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(ss, k))
        return time.perf_counter() - t0

    timed(1, s + 1)
    timed(iters, s + 2)
    t1 = min(timed(1, s + 3 + i) for i in range(3))
    tn = min(timed(iters, s + 9 + i) for i in range(3))
    return (tn - t1) / (iters - 1) * 1e3


def main():
    print(f"devices: {jax.devices()}", flush=True)
    scene, cs = sc.terrain_textured()
    camera = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], W, H,
                            cs["fov"])
    packed = pack_mesh(scene.mesh)

    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    eye = jnp.asarray(cs["eye"], jnp.float32)
    d_pri = jax.random.normal(k1, (N, 3))
    d_pri = d_pri.at[:, 1].add(-1.5)
    d_pri = d_pri / jnp.linalg.norm(d_pri, axis=-1, keepdims=True)
    o_pri = jnp.broadcast_to(eye, (N, 3))
    o_inc = jax.random.uniform(
        k2, (N, 3), minval=jnp.asarray([-100.0, 0.0, -100.0]),
        maxval=jnp.asarray([100.0, 14.0, 100.0]))
    d_inc = jax.random.normal(k3, (N, 3))
    d_inc = d_inc / jnp.linalg.norm(d_inc, axis=-1, keepdims=True)

    def wave(o, d, coarse, tile_rows=16):
        @partial(jax.jit, static_argnames=("k",))
        def fn(salt, k):
            def body(acc, i):
                oo = o + (salt + i).astype(jnp.float32) * 1e-6
                ph = intersect_mesh_packet(
                    packed, oo, d, tmin=3e-2, coarse=coarse,
                    tile_rows=tile_rows)
                return acc + jnp.sum(ph.t * 0 + ph.uv[:, 0]) + ph.t[0], None
            out, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(k, dtype=jnp.int32))
            return out
        return fn

    for cl in (256, 1024, 4096):
        coarse = pack_mesh(scene.mesh, collapse_leaf=cl, nodes_only=True)
        print(f"coarse_leaf {cl}: {coarse.num_nodes} nodes", flush=True)
        for label, o, d in [("coherent", o_pri, d_pri),
                            ("incoherent", o_inc, d_inc)]:
            for tr in (8, 16):
                ms = slope(wave(o, d, coarse, tr))
                print(f"  two-pass {label:10s} tile_rows {tr:2d}: "
                      f"{ms:6.1f} ms", flush=True)
    for label, o, d in [("coherent", o_pri, d_pri),
                        ("incoherent", o_inc, d_inc)]:
        ms = slope(wave(o, d, None))
        print(f"single-pass {label:10s} tile_rows 16: {ms:6.1f} ms",
              flush=True)

    # real frames
    for two_pass, cl in ((False, 0), (True, 256), (True, 1024)):
        s = (sc.with_packet_mesh(scene, two_pass=two_pass, coarse_leaf=cl)
             if not two_pass or cl else sc.with_packet_mesh(scene, False))
        cfg = RenderConfig(spp=SPP, max_bounces=3, use_nee=True)

        @partial(jax.jit, static_argnames=("k",))
        def frame(salt, k, s=s, cfg=cfg):
            def body(acc, i):
                img = render(s, camera, key, cfg, iteration=salt + i)
                return acc + jnp.mean(img), None
            out, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(k, dtype=jnp.int32))
            return out

        ms = slope(frame)
        mode = f"two-pass cl={cl}" if two_pass else "single-pass"
        print(f"frame (nee, b3) {mode}: {ms:6.1f} ms", flush=True)


if __name__ == "__main__":
    main()
