"""How much does a DEAD tile (all lanes culled) cost the fine walk?

After the bin pass's sort, live lanes pack into the first ~11 of 48
tiles on the config-4 incoherent wave — yet every tile runs a full
program. Measures the pre-sorted fine walk with (a) the real wave,
(b) t_init all-dead (pure per-tile fixed cost), and (c) the real wave
cropped to just the live tiles (what a dead-tile fast path could
achieve)."""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tpupt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tpu_pathtracer.models import scene as sc
from tpu_pathtracer.ops.pallas.mesh_kernel import (
    LANES, _octant, bin_rays, intersect_mesh_packet,
)

W, H, SPP = 256, 192, 2
N = W * H * SPP
TILE_ROWS = 16


def timed(fn, k, salt):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(salt, k))
    return time.perf_counter() - t0


def slope(fn, iters=6):
    s = int(time.time_ns() & 0xFFFFF)
    timed(fn, 1, s + 1)
    timed(fn, iters, s + 2)
    t1 = min(timed(fn, 1, s + 3), timed(fn, 1, s + 5))
    tn = min(timed(fn, iters, s + 4), timed(fn, iters, s + 6))
    return (tn - t1) / (iters - 1) * 1e3


def main():
    print(f"devices: {jax.devices()}", flush=True)
    scene, _ = sc.terrain_textured()
    scene = sc.with_packet_mesh(scene)
    packed = scene.mesh_packed
    coarse = scene.mesh_packed_coarse

    key = jax.random.key(0)
    k2, k3 = jax.random.split(key)
    o_inc = jax.random.uniform(
        k2, (N, 3), minval=jnp.asarray([-100.0, 0.0, -100.0]),
        maxval=jnp.asarray([100.0, 14.0, 100.0]))
    d_inc = jax.random.normal(k3, (N, 3))
    d_inc = d_inc / jnp.linalg.norm(d_inc, axis=-1, keepdims=True)
    t_init = jnp.full((N,), 1e30, jnp.float32)

    cell, btn = jax.jit(partial(bin_rays, tmin=3e-2,
                                tile_rows=TILE_ROWS))(
        coarse, o_inc, d_inc, t_init)
    has = cell >= 0
    tq = jnp.clip(btn * (1.0 / 8.0), 0.0, 63.0).astype(jnp.int32)
    k_ = jnp.where(has, ((cell * 8 + _octant(d_inc)) << 6) | tq,
                   jnp.int32(1 << 26))
    perm = jnp.argsort(k_)
    o_s = jnp.take(o_inc, perm, axis=0)
    d_s = jnp.take(d_inc, perm, axis=0)
    t_s = jnp.where(jnp.take(has, perm), 1e30, 0.0)
    tile_lanes = TILE_ROWS * LANES
    hcell = jnp.take(cell, perm[::tile_lanes])
    hrange = jnp.take(coarse.fine_map, jnp.clip(hcell, 0, None), axis=0)
    hints = jnp.where(hcell[:, None] >= 0, hrange, 0)
    n_live = int(jnp.sum(has))
    n_live_tiles = -(-n_live // tile_lanes)
    n_tiles = N // tile_lanes
    print(f"live lanes {n_live} -> {n_live_tiles}/{n_tiles} tiles")

    def scan_over(body):
        @partial(jax.jit, static_argnames=("k",))
        def fn(salt, k):
            def b(acc, i):
                oo = (salt + i).astype(jnp.float32) * 1e-6
                return acc + body(oo), None
            out, _ = jax.lax.scan(b, jnp.float32(0),
                                  jnp.arange(k, dtype=jnp.int32))
            return out
        return fn

    full = scan_over(lambda oo: jnp.sum(intersect_mesh_packet(
        packed, o_s + oo, d_s, tmin=3e-2, t_init=t_s,
        sort=False, hints=hints).uv[:, 0]))
    print(f"fine walk, real wave (48 tiles):   {slope(full):6.2f} ms",
          flush=True)

    dead = scan_over(lambda oo: jnp.sum(intersect_mesh_packet(
        packed, o_s + oo, d_s, tmin=3e-2, t_init=t_s * 0.0,
        sort=False, hints=hints).uv[:, 0]))
    print(f"fine walk, ALL tiles dead:         {slope(dead):6.2f} ms",
          flush=True)

    nl = n_live_tiles * tile_lanes
    crop = scan_over(lambda oo: jnp.sum(intersect_mesh_packet(
        packed, o_s[:nl] + oo, d_s[:nl], tmin=3e-2, t_init=t_s[:nl],
        sort=False, hints=hints[:n_live_tiles]).uv[:, 0]))
    print(f"fine walk, live tiles only ({n_live_tiles:2d}):   "
          f"{slope(crop):6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
