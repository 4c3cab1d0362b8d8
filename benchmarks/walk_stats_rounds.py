"""Emulate the ROUND-BINNED fine walk on a config-4 incoherent wave.

Scheme (round-5 candidate, docs/STATUS.md "per-leaf lane compaction"):
instead of one fine walk whose 2048-lane tiles drag every lane through
the union of ~25 coarse cells' subtrees, iterate NEAR-TO-FAR over each
lane's crossed coarse cells:

  round k: live lanes (still no hit closer than their k-th cell's entry
  distance) sort by their k-th crossed cell; each tile walks ONLY the
  contiguous fine-node range spanned by its lanes' cells (cell ids are
  DFS order, so consecutive cells = contiguous fine ranges). Hits
  tighten the global per-lane t, killing the lane for later rounds
  (t_best <= tn_k means no farther cell can improve).

  cleanup: lanes that crossed more than K cells and are still live get
  today's full hint-first walk (t-pruned by their best t so far).

This emulator mirrors mesh_kernel._packet_kernel semantics (any-lane
descent, t-pruned boxes, threaded DFS) and reports per-round node steps
/ leaf visits / broadcast tri tests, with and without per-round
re-sorting, against the current two-pass walk from walk_stats.py.

Cost model for the verdict line: measured wave 18.6 ms = bin 1.7 +
sort/permutes 1.3 + fine walk ~16.9 ms where the fine walk is
~55 ps x broadcast-tris + ~60 ps x node-steps per tile (vpu roofline,
docs/STATUS.md round-4 notes).
"""
from __future__ import annotations

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from tpu_pathtracer.models import scene as sc
from tpu_pathtracer.ops.pallas.mesh_kernel import LANES, _octant

W, H, SPP = 256, 192, 2
N = W * H * SPP
TILE_ROWS = 16
TILE = TILE_ROWS * LANES
K = 4  # binned rounds before cleanup
TMIN = 3e-2

# measured per-unit costs (v5e, docs/STATUS.md): broadcast tri test /
# node step on a (16,128) tile; sort machinery per 98k-lane round
PS_TRI = 55e-12
PS_STEP = 60e-12
SORT_S = 1.3e-3


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
    # the probe wave's lanes are ~22% live (sphere-pass/regeneration
    # deadness), matching walk_stats.py
    t_init = np.full(N, 1e30, np.float64)

    cn = np.asarray(coarse.nodes, np.float64)
    c_count = cn[:, 8].astype(np.int64)
    cell_ids = np.nonzero(c_count > 0)[0]
    fine_map = np.asarray(coarse.fine_map)

    with np.errstate(divide="ignore"):
        invd = 1.0 / np.where(np.abs(d) > 1e-12, d,
                              np.where(d >= 0, 1e-12, -1e-12))

    # ---- ALL crossed cells per lane (entry distance per cell)
    c_min = cn[cell_ids, 0:3]
    c_max = cn[cell_ids, 3:6]
    t0s = (c_min[None, :, :] - o[:, None, :]) * invd[:, None, :]
    t1s = (c_max[None, :, :] - o[:, None, :]) * invd[:, None, :]
    tn = np.minimum(t0s, t1s).max(axis=-1)
    tf = np.maximum(t0s, t1s).min(axis=-1)
    crossed = (tn <= tf) & (tf > TMIN) & (tn < t_init[:, None])
    tne = np.where(crossed, np.maximum(tn, 0.0), np.inf)  # (N, C)

    order = np.argsort(tne, axis=1)  # near-to-far crossed cells
    tne_sorted = np.take_along_axis(tne, order, axis=1)
    cells_sorted = cell_ids[order]
    n_cross = crossed.sum(axis=1)
    live0 = n_cross > 0
    print(f"lanes: {N}, with >=1 crossed cell: {int(live0.sum())}")
    for q in (50, 90, 99, 99.9, 100):
        print(f"  crossings p{q}: "
              f"{np.percentile(n_cross[live0], q):.1f}")

    nodes = np.asarray(packed.nodes, np.float64)
    bmin, bmax = nodes[:, 0:3], nodes[:, 3:6]
    skip = nodes[:, 6].astype(np.int64)
    start = nodes[:, 7].astype(np.int64)
    count = nodes[:, 8].astype(np.int64)
    M = packed.num_nodes
    slots = np.asarray(packed.tri_rows, np.float64).reshape(-1, 16)

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
        ok = okd & (uu >= 0) & (vv >= 0) & (uu + vv <= 1.0) & (tt > TMIN)
        ok = ok & (tt < tb[:, None])
        tt = np.where(ok, tt, np.inf)
        return np.minimum(tb, tt.min(axis=1))

    def walk_tile(ov, dv, tb, live, lo, hi, skip_range=None):
        """Threaded-DFS any-lane-descent walk of [lo, hi)."""
        steps = leaves = tris = 0
        inv = 1.0 / np.where(np.abs(dv) > 1e-12, dv,
                             np.where(dv >= 0, 1e-12, -1e-12))
        n = lo
        while n < hi:
            if skip_range and n == skip_range[0] and skip_range[1] > n:
                n = skip_range[1]
                continue
            steps += 1
            t0s = (bmin[n][None] - ov) * inv
            t1s = (bmax[n][None] - ov) * inv
            tn_ = np.minimum(t0s, t1s).max(axis=-1)
            tf_ = np.maximum(t0s, t1s).min(axis=-1)
            boxhit = live & (tn_ <= tf_) & (tf_ > TMIN) & (tn_ < tb)
            anyb = boxhit.any()
            if count[n] > 0:
                if anyb:
                    leaves += 1
                    tris += int(count[n])
                    tb = leaf_test_vec(ov, dv, tb, start[n], int(count[n]))
                n = skip[n]
            else:
                n = n + 1 if anyb else skip[n]
        return steps, leaves, tris, tb

    oct_ = np.asarray(_octant(jnp.asarray(d)))

    def run_rounds(resort: bool):
        t_best = t_init.copy()
        tot = dict(steps=0, leaves=0, tris=0, tiles=0, sorts=0)
        perm0 = None
        for k in range(K):
            has_k = n_cross > k
            live_k = has_k & (t_best > tne_sorted[:, k] - 1e-6)
            nlive = int(live_k.sum())
            if nlive == 0:
                print(f"  round {k}: 0 live")
                continue
            cell_k = np.where(live_k, cells_sorted[:, k], 1 << 20)
            if resort or perm0 is None:
                keyv = (cell_k.astype(np.int64) << 3) | oct_
                perm = np.argsort(keyv, kind="stable")
                tot["sorts"] += 1
                if perm0 is None:
                    perm0 = perm
            else:
                perm = perm0
            st = lv = tr = tl = 0
            n_tiles = -(-N // TILE)
            for ti in range(n_tiles):
                sl = perm[ti * TILE:(ti + 1) * TILE]
                lv_t = live_k[sl]
                if not lv_t.any():
                    continue
                cs_t = cell_k[sl][lv_t]
                cmin, cmax = int(cs_t.min()), int(cs_t.max())
                lo, hi = int(fine_map[cmin][0]), int(fine_map[cmax][1])
                if hi <= lo:
                    lo, hi = 0, M
                tl += 1
                s_, l_, r_, tb_new = walk_tile(
                    o[sl], d[sl], t_best[sl].copy(), lv_t, lo, hi)
                t_best[sl] = np.where(lv_t, tb_new, t_best[sl])
                st += s_; lv += l_; tr += r_
            print(f"  round {k}: live {nlive:6d} tiles {tl:3d} "
                  f"steps {st:6d} leaves {lv:5d} tris {tr:7d}")
            tot["steps"] += st; tot["leaves"] += lv
            tot["tris"] += tr; tot["tiles"] += tl
        # cleanup: lanes with more than K crossings still live
        has_more = n_cross > K
        live_c = has_more & (t_best > tne_sorted[:, K] - 1e-6)
        nlive = int(live_c.sum())
        if nlive:
            cell_c = np.where(live_c, cells_sorted[:, K], 1 << 20)
            keyv = (cell_c.astype(np.int64) << 3) | oct_
            perm = np.argsort(keyv, kind="stable")
            tot["sorts"] += 1
            st = lv = tr = tl = 0
            n_tiles = -(-N // TILE)
            for ti in range(n_tiles):
                sl = perm[ti * TILE:(ti + 1) * TILE]
                lv_t = live_c[sl]
                if not lv_t.any():
                    continue
                tl += 1
                # full walk with hint-first restart on the first lane
                c0 = cell_c[sl][lv_t][0]
                hs, he = (int(fine_map[c0][0]), int(fine_map[c0][1]))
                s1, l1, r1, tb1 = walk_tile(
                    o[sl], d[sl], t_best[sl].copy(), lv_t, hs, he)
                s2, l2, r2, tb2 = walk_tile(
                    o[sl], d[sl], tb1, lv_t, 0, M, skip_range=(hs, he))
                t_best[sl] = np.where(lv_t, tb2, t_best[sl])
                st += s1 + s2; lv += l1 + l2; tr += r1 + r2
            print(f"  cleanup: live {nlive:6d} tiles {tl:3d} "
                  f"steps {st:6d} leaves {lv:5d} tris {tr:7d}")
            tot["steps"] += st; tot["leaves"] += lv
            tot["tris"] += tr; tot["tiles"] += tl
        est = (tot["tris"] * PS_TRI + tot["steps"] * PS_STEP
               + tot["sorts"] * SORT_S)
        print(f"  TOTAL steps {tot['steps']} leaves {tot['leaves']} "
              f"tris {tot['tris']} sorts {tot['sorts']} "
              f"-> est fine-walk+sort time {est * 1e3:.1f} ms "
              f"(current: ~18.2 ms = 16.9 walk + 1.3 sort)")
        return t_best

    print(f"\nrounds with per-round re-sort (K={K}):")
    tb_a = run_rounds(resort=True)
    print(f"\nrounds reusing round-0 order (K={K}):")
    tb_b = run_rounds(resort=False)
    # correctness cross-check: both orderings converge to the same t
    bad = np.abs(tb_a - tb_b) > 1e-9
    print(f"\nmax |t_a - t_b| over lanes: "
          f"{np.abs(tb_a - tb_b).max():.3e} ({int(bad.sum())} differ)")


if __name__ == "__main__":
    main()
