"""Sweep (tile_rows, collapse_leaf) for the packet kernel on sorted
incoherent waves — the balance moved after t-pruning, any-hit shadows and
in-kernel attributes landed, so re-measure the round-1 operating point
(tile_rows 16, collapse_leaf 64)."""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tpupt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tpu_pathtracer.models import scene as sc
from tpu_pathtracer.ops.pallas.mesh_kernel import (
    intersect_mesh_packet, pack_mesh,
)

N = 256 * 192 * 2


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
    return (tn - t1) / (iters - 1) * 1e3


def main():
    print(f"devices: {jax.devices()}", flush=True)
    scene, _ = sc.terrain_textured()
    mesh = scene.mesh

    key = jax.random.key(0)
    k2, k3 = jax.random.split(key)
    o_inc = jax.random.uniform(
        k2, (N, 3), minval=jnp.asarray([-100.0, 0.0, -100.0]),
        maxval=jnp.asarray([100.0, 14.0, 100.0]))
    d_inc = jax.random.normal(k3, (N, 3))
    d_inc = d_inc / jnp.linalg.norm(d_inc, axis=-1, keepdims=True)

    def wave(packed, tile_rows, any_hit):
        @partial(jax.jit, static_argnames=("k",))
        def fn(salt, k):
            def body(acc, i):
                oo = o_inc + (salt + i).astype(jnp.float32) * 1e-6
                t0v = (jnp.full((N,), 60.0, jnp.float32) if any_hit
                       else None)
                ph = intersect_mesh_packet(
                    packed, oo, d_inc, tmin=3e-2, sort=True,
                    tile_rows=tile_rows, t_init=t0v, any_hit=any_hit)
                return acc + jnp.sum(ph.uv[:, 0]) + ph.t[0], None
            out, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(k, dtype=jnp.int32))
            return out
        return fn

    for cl in (8, 16, 32):
        packed = pack_mesh(mesh, collapse_leaf=cl)
        print(f"collapse_leaf={cl}: nodes={packed.num_nodes} "
              f"tri_rows={packed.tri_rows.shape[0]} "
              f"leaf_size={packed.leaf_size}", flush=True)
        for tr in (8, 16):
            ms = slope(wave(packed, tr, False))
            ms_sh = slope(wave(packed, tr, True))
            print(f"  tile_rows={tr:2d}: closest {ms:6.1f} ms   "
                  f"any-hit(seg=60) {ms_sh:6.1f} ms", flush=True)


if __name__ == "__main__":
    main()
