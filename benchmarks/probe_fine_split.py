"""Split the two-pass fine walk's cost into SCALAR node-step overhead vs
VECTOR leaf work, by measuring the production wave at several fine leaf
sizes and pairing each with its emulated (node steps, leaf-slot tests).

Model:  ms = a * steps + b * (leaf_visits * leaf_size) + c
(the kernel unrolls every leaf visit to the full leaf_size slot count —
docs/STATUS.md round-4 negative result #2). Three leaf sizes give an
overdetermined fit; the a/b split decides WHERE config-4's remaining
headroom is (8-wide/shallower trees attack a*steps, sub-tile leaf
gating attacks b*slots).

  --measure : TPU timing (slope protocol) per collapse_leaf
  --emulate : CPU step/visit counts per collapse_leaf (walk_stats logic)
"""
from __future__ import annotations

import argparse
import time
from functools import partial

import numpy as np

CLS = (16, 32, 64, 128)
W, H, SPP = 256, 192, 2
N = W * H * SPP
TILE_ROWS = 16


def build_wave_np(o, d):
    return o, d


def measure():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/tpupt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpu_pathtracer.models import scene as sc
    from tpu_pathtracer.ops.pallas.mesh_kernel import (
        intersect_mesh_packet, pack_mesh,
    )

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

    for cl in CLS:
        packed = pack_mesh(mesh, collapse_leaf=cl)
        coarse = pack_mesh(mesh, collapse_leaf=1024, nodes_only=True,
                           fine_leaf=cl)

        @partial(jax.jit, static_argnames=("k",))
        def fn(salt, k, packed=packed, coarse=coarse):
            def body(acc, i):
                oo = o_inc + (salt + i).astype(jnp.float32) * 1e-6
                ph = intersect_mesh_packet(
                    packed, oo, d_inc, tmin=3e-2, sort=True,
                    tile_rows=TILE_ROWS, coarse=coarse)
                return acc + jnp.sum(ph.uv[:, 0]) + ph.t[0], None

            out, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(k, dtype=jnp.int32))
            return out

        ms = slope(fn)
        print(f"collapse_leaf={cl:3d}: nodes={packed.num_nodes:5d} "
              f"leaf_size={packed.leaf_size:3d} wave {ms:6.2f} ms",
              flush=True)


def emulate():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpu_pathtracer.models import scene as sc
    from tpu_pathtracer.ops.pallas.mesh_kernel import (
        LANES, _octant, pack_mesh,
    )

    scene, _ = sc.terrain_textured()
    mesh = scene.mesh
    key = jax.random.key(0)
    k2, k3 = jax.random.split(key)
    o0 = np.array(jax.random.uniform(
        k2, (N, 3), minval=jnp.asarray([-100.0, 0.0, -100.0]),
        maxval=jnp.asarray([100.0, 14.0, 100.0])))
    d0 = np.array(jax.random.normal(k3, (N, 3)))
    d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)

    for cl in CLS:
        packed = pack_mesh(mesh, collapse_leaf=cl)
        coarse = pack_mesh(mesh, collapse_leaf=1024, nodes_only=True,
                           fine_leaf=cl)
        cn = np.asarray(coarse.nodes, np.float64)
        c_min, c_max = cn[:, 0:3], cn[:, 3:6]
        c_count = cn[:, 8].astype(np.int64)
        o, d = o0, d0
        with np.errstate(divide="ignore"):
            invd = 1.0 / np.where(np.abs(d) > 1e-12, d,
                                  np.where(d >= 0, 1e-12, -1e-12))
        cell = np.full(N, -1, np.int64)
        btn = np.full(N, 1e30)
        for n_ in range(coarse.num_nodes):
            if c_count[n_] <= 0:
                continue
            t0s = (c_min[n_][None] - o) * invd
            t1s = (c_max[n_][None] - o) * invd
            tn = np.minimum(t0s, t1s).max(axis=-1)
            tf = np.maximum(t0s, t1s).min(axis=-1)
            hit = (tn <= tf) & (tf > 3e-2) & (tn < btn)
            tne = np.maximum(tn, 0.0)
            better = hit & (tne < btn)
            btn = np.where(better, tne, btn)
            cell = np.where(better, n_, cell)
        has = cell >= 0
        tq = np.clip(btn / 8.0, 0, 63).astype(np.int64)
        keyv = np.where(has, ((cell * 8 + np.asarray(
            _octant(jnp.asarray(d)))) << 6) | tq, 1 << 26)
        perm = np.argsort(keyv, kind="stable")
        o, d = o[perm], d[perm]
        t0 = np.where(has[perm], 1e30, 0.0)
        cell_s = cell[perm]

        nodes = np.asarray(packed.nodes, np.float64)
        bmin, bmax = nodes[:, 0:3], nodes[:, 3:6]
        skip = nodes[:, 6].astype(np.int64)
        start = nodes[:, 7].astype(np.int64)
        count = nodes[:, 8].astype(np.int64)
        M = packed.num_nodes
        fine_map = np.asarray(coarse.fine_map)
        slots = np.asarray(packed.tri_rows, np.float64).reshape(-1, 16)
        tmin = 3e-2
        TILE = TILE_ROWS * LANES
        n_tiles = -(-N // TILE)
        pad = n_tiles * TILE - N
        o = np.concatenate([o, np.zeros((pad, 3))])
        d = np.concatenate([d, np.ones((pad, 3))])
        t0 = np.concatenate([t0, np.zeros(pad)])
        cell_s = np.concatenate([cell_s, np.full(pad, -1)])

        def entry(ov, dv, nmin, nmax):
            with np.errstate(divide="ignore", invalid="ignore"):
                inv = 1.0 / np.where(np.abs(dv) > 1e-12, dv,
                                     np.where(dv >= 0, 1e-12, -1e-12))
            t0s = (nmin[None] - ov) * inv
            t1s = (nmax[None] - ov) * inv
            return (np.minimum(t0s, t1s).max(axis=-1),
                    np.maximum(t0s, t1s).min(axis=-1))

        def leaf_test_vec(ov, dv, tb, s0, cnt):
            rows = slots[s0:s0 + cnt]
            v0, e1, e2 = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9]
            p = np.cross(dv[:, None, :], e2[None, :, :])
            det = np.einsum("lkc,kc->lk", p, e1)
            okd = np.abs(det) > 1e-12
            inv = 1.0 / np.where(okd, det, 1.0)
            tv = ov[:, None, :] - v0[None, :, :]
            uu = np.einsum("lkc,lkc->lk", tv, p) * inv
            q = np.cross(tv, e1[None, :, :])
            vv = np.einsum("lc,lkc->lk", dv, q) * inv
            tt = np.einsum("kc,lkc->lk", e2, q) * inv
            ok = (okd & (uu >= 0) & (vv >= 0) & (uu + vv <= 1.0)
                  & (tt > tmin) & (tt < tb[:, None]))
            tt = np.where(ok, tt, np.inf)
            return np.minimum(tb, tt.min(axis=1))

        tot_steps = tot_leaves = 0
        for ti in range(n_tiles):
            sl = slice(ti * TILE, (ti + 1) * TILE)
            ov, dv, tb = o[sl], d[sl], t0[sl].copy()
            live = tb > 0
            if not live.any():
                continue
            c0 = cell_s[sl][0]
            hs, he = (fine_map[c0] if c0 >= 0 else (0, 0))

            def walk(lo, hi, tb, skip_range=None):
                steps = leaves = 0
                n = lo
                while n < hi:
                    if (skip_range and n == skip_range[0]
                            and skip_range[1] > n):
                        n = skip_range[1]
                        continue
                    steps += 1
                    tn, tf = entry(ov, dv, bmin[n], bmax[n])
                    boxhit = live & (tn <= tf) & (tf > tmin) & (tn < tb)
                    anyb = boxhit.any()
                    if count[n] > 0:
                        if anyb:
                            leaves += 1
                            tb = leaf_test_vec(ov, dv, tb, start[n],
                                               int(count[n]))
                        n = skip[n]
                    else:
                        n = n + 1 if anyb else skip[n]
                return steps, leaves, tb

            s1, l1, tb = walk(hs, he, tb)
            s2, l2, tb = walk(0, M, tb, skip_range=(hs, he))
            tot_steps += s1 + s2
            tot_leaves += l1 + l2

        print(f"collapse_leaf={cl:3d}: nodes={M:5d} "
              f"leaf_size={packed.leaf_size:3d} steps={tot_steps:6d} "
              f"leaf_visits={tot_leaves:5d} "
              f"slot_tests={tot_leaves * packed.leaf_size:7d}", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--emulate", action="store_true")
    args = ap.parse_args()
    (emulate if args.emulate else measure)()
