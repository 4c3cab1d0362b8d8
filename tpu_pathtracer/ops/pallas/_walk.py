"""Shared in-kernel threaded-DFS mesh walk for the persistent kernels.

One implementation serves the forward persistent path-regeneration kernel
(ops/pallas/persistent.py) and the fused value-and-grad kernel
(ops/pallas/replay_persistent.py): the whole (rows, 128) tile walks ONE
scalar node sequence over the packed mesh (ops/pallas/mesh_kernel
pack_mesh layout — SMEM node tables, VMEM triangle rows), with per-lane
t-pruning from the caller's start distance. Walk state lives in VMEM
scratch tiles (Mosaic cannot legalize large vector while_loop carries).

Closest mode fills (s_t, normal, mat) (+ interpolated uv when track_uv);
occlusion mode zeroes s_t at the first intersected triangle and lanes
with t_init <= 0 do no box work at all.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def make_mesh_walk(
    mbox_ref,  # (Mn*6,) f32 SMEM node AABBs, flat
    mmeta_ref,  # (Mn*3,) i32 SMEM [skip start count], flat
    mtris_ref,  # (R, 128) f32 VMEM triangle rows (8 slots of 16 floats)
    scratch,  # (s_t, s_nx, s_ny, s_nz, s_m[, s_u, s_v]) VMEM tiles
    *,
    shape: tuple,
    tmin: float,
    mesh_nodes: int,
    leaf_rows: int,
    track_uv: bool = False,
):
    """Build the walk closure over this kernel's refs/scratch."""
    if track_uv:
        s_t, s_nx, s_ny, s_nz, s_m, s_u, s_v = scratch
    else:
        s_t, s_nx, s_ny, s_nz, s_m = scratch
    fzeros = jnp.zeros(shape, jnp.float32)

    def _safe_inv3(dx, dy, dz):
        def si(a):
            s = jnp.where(jnp.abs(a) > 1e-12, a,
                          jnp.where(a >= 0, 1e-12, -1e-12))
            return 1.0 / s
        return si(dx), si(dy), si(dz)

    def mesh_walk(ox, oy, oz, dx, dy, dz, t_init, occlusion):
        """Whole-tile shared scalar node sequence, per-lane t-pruning from
        t_init (<= 0 marks a dead lane)."""
        ix, iy, iz = _safe_inv3(dx, dy, dz)
        uv = track_uv and not occlusion
        s_t[:, :] = t_init
        if not occlusion:
            s_nx[:, :] = fzeros
            s_ny[:, :] = fzeros
            s_nz[:, :] = fzeros
            s_m[:, :] = jnp.zeros(shape, jnp.int32) - 1
        if uv:
            s_u[:, :] = fzeros
            s_v[:, :] = fzeros

        def body(nn):
            t_cur = s_t[:, :]
            b6 = nn * 6
            bx = lambda k: mbox_ref[b6 + k]
            tx0 = (bx(0) - ox) * ix
            tx1 = (bx(3) - ox) * ix
            ty0 = (bx(1) - oy) * iy
            ty1 = (bx(4) - oy) * iy
            tz0 = (bx(2) - oz) * iz
            tz1 = (bx(5) - oz) * iz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.minimum(tz0, tz1),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.maximum(tz0, tz1),
            )
            box_hit = (t_cur > 0.0) & (tn <= tf) & (tf > tmin) & (tn < t_cur)
            anyb = jnp.sum(box_hit.astype(jnp.int32)) > 0
            m3 = nn * 3
            skip = mmeta_ref[m3]
            start = mmeta_ref[m3 + 1]
            count = mmeta_ref[m3 + 2]
            is_leaf = count > 0

            @pl.when(anyb & is_leaf)
            def _leaf():
                base = start // 8
                trs = mtris_ref[pl.ds(base, leaf_rows), :]
                t_best = s_t[:, :]
                if not occlusion:
                    nx_b = s_nx[:, :]
                    ny_b = s_ny[:, :]
                    nz_b = s_nz[:, :]
                    m_b = s_m[:, :]
                if uv:
                    u_b = s_u[:, :]
                    v_b = s_v[:, :]
                for j in range(leaf_rows * 8):
                    r = j // 8
                    c0 = (j % 8) * 16
                    v0x, v0y, v0z = trs[r, c0], trs[r, c0 + 1], trs[r, c0 + 2]
                    e1x, e1y, e1z = (trs[r, c0 + 3], trs[r, c0 + 4],
                                     trs[r, c0 + 5])
                    e2x, e2y, e2z = (trs[r, c0 + 6], trs[r, c0 + 7],
                                     trs[r, c0 + 8])
                    px_ = dy * e2z - dz * e2y
                    py_ = dz * e2x - dx * e2z
                    pz_ = dx * e2y - dy * e2x
                    det = e1x * px_ + e1y * py_ + e1z * pz_
                    ok = jnp.abs(det) > 1e-12
                    inv_det = 1.0 / jnp.where(ok, det, 1.0)
                    tvx = ox - v0x
                    tvy = oy - v0y
                    tvz = oz - v0z
                    uu = (tvx * px_ + tvy * py_ + tvz * pz_) * inv_det
                    qx = tvy * e1z - tvz * e1y
                    qy = tvz * e1x - tvx * e1z
                    qz = tvx * e1y - tvy * e1x
                    vv = (dx * qx + dy * qy + dz * qz) * inv_det
                    tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                    valid = (
                        ok & (j < count)
                        & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                        & (tt > tmin) & (tt < t_best)
                    )
                    if occlusion:
                        t_best = jnp.where(valid, 0.0, t_best)
                        continue
                    t_best = jnp.where(valid, tt, t_best)
                    gnx = e1y * e2z - e1z * e2y
                    gny = e1z * e2x - e1x * e2z
                    gnz = e1x * e2y - e1y * e2x
                    nx_b = jnp.where(valid, gnx, nx_b)
                    ny_b = jnp.where(valid, gny, ny_b)
                    nz_b = jnp.where(valid, gnz, nz_b)
                    m_b = jnp.where(valid, trs[r, c0 + 9].astype(jnp.int32),
                                    m_b)
                    if uv:
                        # interpolated texture uv (slots 10-15: uv0,
                        # uv_e1, uv_e2 — pack_mesh layout)
                        uvx = (trs[r, c0 + 10] + uu * trs[r, c0 + 12]
                               + vv * trs[r, c0 + 14])
                        uvy = (trs[r, c0 + 11] + uu * trs[r, c0 + 13]
                               + vv * trs[r, c0 + 15])
                        u_b = jnp.where(valid, uvx, u_b)
                        v_b = jnp.where(valid, uvy, v_b)
                s_t[:, :] = t_best
                if not occlusion:
                    s_nx[:, :] = nx_b
                    s_ny[:, :] = ny_b
                    s_nz[:, :] = nz_b
                    s_m[:, :] = m_b
                if uv:
                    s_u[:, :] = u_b
                    s_v[:, :] = v_b

            descend = anyb & ~is_leaf
            return jnp.where(descend, nn + 1, skip)

        jax.lax.while_loop(lambda nn: nn < mesh_nodes, body, jnp.int32(0))

    return mesh_walk
