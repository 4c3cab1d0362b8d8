"""Exact host-side emulation of the two-pass fine walk's control flow on
a config-4 incoherent wave: counts node steps and leaf visits per tile,
and computes two FLOORS —

  - tile floor: leaves ANY order must visit given the current 2048-lane
    tiles (union over lanes of leaves whose box entry precedes the lane's
    final t) — how much better a smarter walk ORDER could do;
  - lane floor: the same set per lane (average size) — how much better
    perfect per-leaf lane COMPACTION could do.

Pure NumPy (no TPU needed); the walk semantics mirror
ops/pallas/mesh_kernel._packet_kernel (threaded DFS, any-lane descent,
t-pruned, hint-first restart).
"""
from __future__ import annotations

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from tpu_pathtracer.models import scene as sc
from tpu_pathtracer.ops.pallas.mesh_kernel import LANES, _octant, bin_rays

W, H, SPP = 256, 192, 2
N = W * H * SPP
TILE_ROWS = 16
TILE = TILE_ROWS * LANES


def main():
    scene, cs = sc.terrain_textured()
    scene = sc.with_packet_mesh(scene)
    packed = scene.mesh_packed
    coarse = scene.mesh_packed_coarse

    key = jax.random.key(0)
    k2, k3 = jax.random.split(key)
    o = np.array(jax.random.uniform(
        k2, (N, 3), minval=jnp.asarray([-100.0, 0.0, -100.0]),
        maxval=jnp.asarray([100.0, 14.0, 100.0])))
    d = np.array(jax.random.normal(k3, (N, 3)))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_init = np.full(N, 1e30, np.float32)

    # NumPy emulation of bin_rays (per-lane results are control-flow
    # independent: tile-level descent only adds tests that fail)
    cn = np.asarray(coarse.nodes, np.float64)
    c_min, c_max = cn[:, 0:3], cn[:, 3:6]
    c_count = cn[:, 8].astype(np.int64)
    with np.errstate(divide="ignore"):
        invd = 1.0 / np.where(np.abs(d) > 1e-12, d,
                              np.where(d >= 0, 1e-12, -1e-12))
    cell = np.full(N, -1, np.int64)
    btn = np.full(N, 1e30, np.float64)
    for n_ in range(coarse.num_nodes):
        if c_count[n_] <= 0:
            continue
        t0s = (c_min[n_][None] - o) * invd
        t1s = (c_max[n_][None] - o) * invd
        tn = np.minimum(t0s, t1s).max(axis=-1)
        tf = np.maximum(t0s, t1s).min(axis=-1)
        tcur = np.minimum(t_init, btn)
        hit = (tn <= tf) & (tf > 3e-2) & (tn < tcur)
        tne = np.maximum(tn, 0.0)
        better = hit & (tne < btn)
        btn = np.where(better, tne, btn)
        cell = np.where(better, n_, cell)
    has = cell >= 0
    tq = np.clip(btn / 8.0, 0, 63).astype(np.int64)
    keyv = np.where(has, ((cell.astype(np.int64) * 8 + np.asarray(
        _octant(jnp.asarray(d)))) << 6) | tq, 1 << 26)
    perm = np.argsort(keyv, kind="stable")
    o, d = o[perm], d[perm]
    t0 = np.where(has[perm], 1e30, 0.0).astype(np.float64)
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

    n_tiles = -(-N // TILE)
    pad = n_tiles * TILE - N
    for arr_name in ("o", "d"):
        pass
    o = np.concatenate([o, np.zeros((pad, 3))])
    d = np.concatenate([d, np.ones((pad, 3))])
    t0 = np.concatenate([t0, np.zeros(pad)])
    cell_s = np.concatenate([cell_s, np.full(pad, -1)])

    def leaf_test(ot, dt, tb, s0, cnt):
        """Vectorized MT over the leaf's triangles; returns updated tb."""
        for j in range(cnt):
            row = slots[s0 + j]
            v0, e1, e2 = row[0:3], row[3:6], row[6:9]
            p = np.cross(dt, e2)
            det = p @ e1
            okd = abs(det) > 1e-12
            inv = 1.0 / (det if okd else 1.0)
            tv = ot - v0
            uu = (tv @ p) * inv
            q = np.cross(tv, e1)
            vv = (dt @ q) * inv
            tt = (e2 @ q) * inv
            ok = okd & (uu >= 0) & (vv >= 0) & (uu + vv <= 1.0)
            ok = ok & (tt > tmin) & (tt < tb)
            tb = np.where(ok, tt, tb)
        return tb

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
        ok = okd & (uu >= 0) & (vv >= 0) & (uu + vv <= 1.0) & (tt > tmin)
        ok = ok & (tt < tb[:, None])
        tt = np.where(ok, tt, np.inf)
        return np.minimum(tb, tt.min(axis=1))

    def entry(ov, dv, nmin, nmax):
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = 1.0 / np.where(np.abs(dv) > 1e-12, dv,
                                 np.where(dv >= 0, 1e-12, -1e-12))
        t0s = (nmin[None] - ov) * inv
        t1s = (nmax[None] - ov) * inv
        tn = np.minimum(t0s, t1s).max(axis=-1)
        tf = np.maximum(t0s, t1s).min(axis=-1)
        return tn, tf

    tot_steps = tot_leaves = tot_tris = 0
    tot_floor_leaves = tot_floor_tris = 0
    lane_floor_tris = 0.0
    live_lane_total = 0

    for ti in range(n_tiles):
        sl = slice(ti * TILE, (ti + 1) * TILE)
        ov, dv, tb = o[sl], d[sl], t0[sl].copy()
        live = tb > 0
        if not live.any():
            continue
        # hint range from the first lane's cell
        c0 = cell_s[sl][0]
        hs, he = (fine_map[c0] if c0 >= 0 else (0, 0))

        def walk(lo, hi, tb, skip_range=None):
            steps = leaves = tris = 0
            n = lo
            while n < hi:
                if skip_range and n == skip_range[0] and skip_range[1] > n:
                    n = skip_range[1]
                    continue
                steps += 1
                tn, tf = entry(ov, dv, bmin[n], bmax[n])
                boxhit = live & (tn <= tf) & (tf > tmin) & (tn < tb)
                anyb = boxhit.any()
                if count[n] > 0:
                    if anyb:
                        leaves += 1
                        tris += int(count[n])
                        tb = leaf_test_vec(ov, dv, tb, start[n],
                                           int(count[n]))
                    n = skip[n]
                else:
                    n = n + 1 if anyb else skip[n]
            return steps, leaves, tris, tb

        s1, l1, tr1, tb = walk(hs, he, tb)
        s2, l2, tr2, tb = walk(0, M, tb, skip_range=(hs, he))
        tot_steps += s1 + s2
        tot_leaves += l1 + l2
        tot_tris += tr1 + tr2

        # floors: per-lane final t known now (tb); a leaf is IRREDUCIBLE
        # for a lane iff its box entry < final t (any walk order must
        # test it). Vector entry over all leaf nodes x tile lanes.
        leaf_ids = np.nonzero(count > 0)[0]
        lane_tris = np.zeros(TILE, np.float64)
        irr_union = np.zeros(len(leaf_ids), bool)
        for bi in range(0, len(leaf_ids), 256):
            ids = leaf_ids[bi:bi + 256]
            inv = 1.0 / np.where(np.abs(dv) > 1e-12, dv,
                                 np.where(dv >= 0, 1e-12, -1e-12))
            t0s = (bmin[ids][None, :, :] - ov[:, None, :]) * inv[:, None, :]
            t1s = (bmax[ids][None, :, :] - ov[:, None, :]) * inv[:, None, :]
            tn = np.minimum(t0s, t1s).max(axis=-1)
            tf = np.maximum(t0s, t1s).min(axis=-1)
            need = (live[:, None] & (tn <= tf) & (tf > tmin)
                    & (tn < tb[:, None]))
            lane_tris += need @ count[ids].astype(np.float64)
            irr_union[bi:bi + 256] = need.any(axis=0)
        tot_floor_leaves += int(irr_union.sum())
        tot_floor_tris += int(count[leaf_ids[irr_union]].sum())
        lane_floor_tris += float(lane_tris[live].sum())
        live_lane_total += int(live.sum())

    print(f"tiles: {n_tiles}, live lanes: {live_lane_total}/{N}")
    print(f"walk:   {tot_steps} node steps, {tot_leaves} leaf visits, "
          f"{tot_tris} leaf tris")
    print(f"tile floor (perfect order):   {tot_floor_leaves} leaf visits, "
          f"{tot_floor_tris} leaf tris")
    print(f"  -> order headroom: {tot_tris / max(tot_floor_tris, 1):.2f}x")
    print(f"lane floor avg needed leaves/lane: "
          f"{lane_floor_tris / max(live_lane_total, 1):.2f} tris-equiv")


if __name__ == "__main__":
    main()
