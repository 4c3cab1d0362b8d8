"""Sub-tile leaf-gating headroom on the config-4 incoherent wave.

The packet walk's wall (docs/STATUS.md): every visited leaf is tested by
the whole (16,128) tile even though ~11 lanes need it. Mosaic can gate
vector work at SUBLANE granularity — per (8,128) group (native register)
or per (1,128) row (dynamic sublane slice) — IF the gate actually fires.
Round-4's visit-time box-hit gate on 8-row halves measured NEGATIVE
(too loose). This emulator quantifies, in row-op units (1 unit = one
triangle test on one (1,128) row):

  per granularity g in {tile(16), group(8), row(1)} x
  per gate in {boxhit (achievable at visit time),
               need (oracle: box entry < final t)} x
  per lane order in {current (cell,octant,depth) sort,
                     first-leaf sort (re-sorted by each lane's nearest
                     needed leaf — a second-level binning pass)}

to find whether ANY sub-tile scheme clears the ~2x needed for the
<= 50 ms config-4 target before touching the kernel.
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


def build_wave():
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
    live = has[perm]
    return scene, o, d, live


def main():
    scene, o, d, live = build_wave()
    packed = scene.mesh_packed
    nodes = np.asarray(packed.nodes, np.float64)
    bmin, bmax = nodes[:, 0:3], nodes[:, 3:6]
    count = nodes[:, 8].astype(np.int64)
    leaf_ids = np.nonzero(count > 0)[0]
    tmin = 3e-2

    with np.errstate(divide="ignore"):
        invd = 1.0 / np.where(np.abs(d) > 1e-12, d,
                              np.where(d >= 0, 1e-12, -1e-12))

    # per-lane final t by brute closest-hit over leaf tris (exact; the
    # walk's per-lane result is tile-composition invariant)
    slots = np.asarray(packed.tri_rows, np.float64).reshape(-1, 16)
    start = nodes[:, 7].astype(np.int64)
    tb = np.where(live, 1e30, 0.0)
    CH = 4096
    for bi in range(0, N, CH):
        sl = slice(bi, bi + CH)
        ov, dv = o[sl], d[sl]
        t = tb[sl].copy()
        for li in leaf_ids:
            s0, cnt = start[li], count[li]
            rows = slots[s0 // 16 * 0 + s0:s0 + cnt]  # start is slot idx
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
                  & (tt > tmin) & (tt < t[:, None]))
            tt = np.where(ok, tt, np.inf)
            t = np.minimum(t, tt.min(axis=1))
        tb[sl] = t

    # need matrix: leaf box entry < final t (lane x leaf), plus first-leaf
    nL = len(leaf_ids)
    first_leaf = np.full(N, nL, np.int64)
    first_tn = np.full(N, 1e30)
    need_rows_units = {}
    orders = {}

    def entry_all(ov, iv, ids):
        t0s = (bmin[ids][None, :, :] - ov[:, None, :]) * iv[:, None, :]
        t1s = (bmax[ids][None, :, :] - ov[:, None, :]) * iv[:, None, :]
        tn = np.minimum(t0s, t1s).max(axis=-1)
        tf = np.maximum(t0s, t1s).min(axis=-1)
        return tn, tf

    need = np.zeros((N, nL), bool)
    for bi in range(0, N, CH):
        sl = slice(bi, bi + CH)
        tn, tf = entry_all(o[sl], invd[sl], leaf_ids)
        nd = (live[sl, None] & (tn <= tf) & (tf > tmin)
              & (tn < tb[sl, None]))
        need[sl] = nd
        tne = np.where(nd, np.maximum(tn, 0.0), 1e30)
        fl = tne.argmin(axis=1)
        ft = tne[np.arange(tne.shape[0]), fl]
        has_f = ft < 1e30
        first_leaf[sl] = np.where(has_f, fl, nL)
        first_tn[sl] = ft

    tris = count[leaf_ids].astype(np.int64)
    n_tiles = -(-N // TILE)
    pad = n_tiles * TILE - N
    needp = np.concatenate([need, np.zeros((pad, nL), bool)])

    orders["current-sort"] = np.arange(N + pad)
    fkey = first_leaf * (1 << 12) + np.minimum(
        (first_tn / 4.0).astype(np.int64), (1 << 11) - 1)
    orders["first-leaf-sort"] = np.concatenate(
        [np.argsort(fkey, kind="stable"), np.arange(N, N + pad)])

    print(f"lanes {N} (live {int(live.sum())}), leaves {nL}, "
          f"tiles {n_tiles}")
    print("floors in row-op units (1 = one tri test on one (1,128) row);"
          "\n  current measured walk = 305217 tile-visits x 16 rows = "
          f"{305217 * 16}")
    for oname, perm in orders.items():
        npd = needp[perm]
        for rows_g, gname in ((16, "tile(16)"), (8, "group(8)"),
                              (1, "row(1)")):
            n_blocks = (N + pad) // (rows_g * LANES)
            blocks = npd.reshape(n_blocks, rows_g * LANES, nL)
            blk_need = blocks.any(axis=1)  # (n_blocks, nL)
            units = int((blk_need @ tris) * rows_g // 1) if False else \
                int((blk_need.astype(np.int64) @ tris).sum() * rows_g)
            print(f"  {oname:16s} {gname:9s}: {units:>9d} units "
                  f"({305217 * 16 / max(units, 1):.2f}x vs walk)")


if __name__ == "__main__":
    main()
