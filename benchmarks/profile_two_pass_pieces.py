"""Stage-level cost breakdown of the CURRENT two-pass binned traversal
(intersect_mesh_packet with a coarse tree): bin pass, argsort, inverse
scatter, packed permutes, fine walk, un-permute — measured separately on
a config-4 full-intensity incoherent wave. Slope-protocol timings.

The older profile_mesh_pieces.py predates the two-pass path (it times the
octant-sorted single-pass); this one times what the integrator actually
runs on config 4.
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tpupt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tpu_pathtracer.models import camera as cm, scene as sc
from tpu_pathtracer.ops.pallas.mesh_kernel import (
    LANES, _octant, bin_rays, intersect_mesh_packet,
)

W, H, SPP = 256, 192, 2
N = W * H * SPP
TILE_ROWS = 16


def slope(fn, iters=6):
    def timed(k, s):
        t0 = time.perf_counter()
        out = fn(s, k)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    s = int(time.time_ns() & 0xFFFFF)
    timed(1, s + 1)
    timed(iters, s + 2)
    t1 = min(timed(1, s + 3), timed(1, s + 5))
    tn = min(timed(iters, s + 4), timed(iters, s + 6))
    return (tn - t1) / (iters - 1) * 1e3


def main():
    print(f"devices: {jax.devices()}", flush=True)
    scene, cs = sc.terrain_textured()
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

    def scan_over(body):
        @partial(jax.jit, static_argnames=("k",))
        def fn(salt, k):
            def b(acc, i):
                oo = o_inc + (salt + i).astype(jnp.float32) * 1e-6
                return acc + body(oo), None
            out, _ = jax.lax.scan(b, jnp.float32(0),
                                  jnp.arange(k, dtype=jnp.int32))
            return out
        return fn

    # full two-pass wave (what the integrator runs per closest wave)
    full = scan_over(lambda oo: jnp.sum(intersect_mesh_packet(
        packed, oo, d_inc, tmin=3e-2, t_init=t_init, coarse=coarse,
    ).uv[:, 0]))
    print(f"two-pass wave (closest): {slope(full):6.2f} ms", flush=True)

    anyh = scan_over(lambda oo: jnp.sum(intersect_mesh_packet(
        packed, oo, d_inc, tmin=3e-2, t_init=t_init, coarse=coarse,
        any_hit=True,
    ).t))
    print(f"two-pass wave (any-hit): {slope(anyh):6.2f} ms", flush=True)

    # stage 1: bin pass alone
    binp = scan_over(lambda oo: jnp.sum(bin_rays(
        coarse, oo, d_inc, t_init, 3e-2, tile_rows=TILE_ROWS,
    )[1] * 0.0 + bin_rays(
        coarse, oo, d_inc, t_init, 3e-2, tile_rows=TILE_ROWS,
    )[0]))
    # (two calls dedupe by CSE inside jit -> effectively one)
    print(f"bin pass alone:          {slope(binp):6.2f} ms", flush=True)

    # stage 2: key + argsort alone (on realistic binned keys)
    cell, btn = jax.jit(partial(bin_rays, tmin=3e-2,
                                tile_rows=TILE_ROWS))(
        coarse, o_inc, d_inc, t_init)
    cell = jax.block_until_ready(cell)

    def key_sort(oo):
        has = cell >= 0
        tq = jnp.clip(btn * (1.0 / 8.0), 0.0, 63.0).astype(jnp.int32)
        k_ = jnp.where(
            has,
            ((cell * 8 + _octant(d_inc + oo[:, :1] * 0)) << 6) | tq,
            jnp.int32(1 << 26),
        )
        k_ = k_ + (oo[:, 0] * 0).astype(jnp.int32)
        return jnp.sum(jnp.argsort(k_))
    srt = scan_over(lambda oo: key_sort(oo).astype(jnp.float32))
    print(f"key+argsort alone:       {slope(srt):6.2f} ms", flush=True)

    # stage 3: argsort + inverse scatter + packed row gather + unpermute
    def machinery(oo):
        has = cell >= 0
        tq = jnp.clip(btn * (1.0 / 8.0), 0.0, 63.0).astype(jnp.int32)
        k_ = jnp.where(has, (cell * 8 << 6) | tq, jnp.int32(1 << 26))
        k_ = k_ + (oo[:, 0] * 0).astype(jnp.int32)
        perm = jnp.argsort(k_)
        inv = jnp.zeros_like(perm).at[perm].set(
            jnp.arange(perm.shape[0], dtype=perm.dtype))
        packed_rays = jnp.take(
            jnp.concatenate([oo, d_inc, t_init[:, None]], axis=1),
            perm, axis=0)
        t_u = jnp.take(packed_rays[:, 6], inv)
        return jnp.sum(t_u * 0.0 + packed_rays[0, 0])
    mach = scan_over(machinery)
    print(f"sort+scatter+permutes:   {slope(mach):6.2f} ms", flush=True)

    # stage 4: fine walk alone on PRE-SORTED rays (sort=False + hints)
    tq = jnp.clip(btn * (1.0 / 8.0), 0.0, 63.0).astype(jnp.int32)
    has = cell >= 0
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
    fine = scan_over(lambda oo: jnp.sum(intersect_mesh_packet(
        packed, o_s + oo[:, :1] * 0, d_s, tmin=3e-2, t_init=t_s,
        sort=False, hints=hints,
    ).uv[:, 0]))
    print(f"fine walk (pre-sorted):  {slope(fine):6.2f} ms", flush=True)

    # stage 5: post-walk attribute resolution alone (packed row gather)
    ph = jax.jit(partial(intersect_mesh_packet, tmin=3e-2, sort=False))(
        packed, o_s, d_s, t_init=t_s, hints=hints)
    idx = jax.block_until_ready(
        jnp.argsort(jax.random.uniform(key, (N,))).astype(jnp.int32))

    def attrs(oo):
        slots = packed.tri_rows.reshape(-1, 16)
        row = jnp.take(
            slots,
            jnp.clip(idx + (oo[:, 0] * 0).astype(jnp.int32), 0,
                     slots.shape[0] - 1),
            axis=0)
        return jnp.sum(row[:, 0])
    att = scan_over(attrs)
    print(f"slot-row gather alone:   {slope(att):6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
