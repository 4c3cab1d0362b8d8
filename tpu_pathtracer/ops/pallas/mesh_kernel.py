"""Packet BVH traversal in Pallas: the whole tile walks one node sequence.

The XLA mesh traversal (ops/triangle.py) gives every lane its own node
pointer, which makes every step a per-lane GATHER — measured to be the
bottleneck for config-4 scenes on TPU (docs/STATUS.md). This kernel
inverts that: a TILE of rays shares ONE scalar threaded-DFS walk, so every
node/triangle fetch is a scalar-indexed ROW read broadcast against the
lanes — no gathers at all. AABB and Möller-Trumbore tests are vectorized
over the (rows, 128) lane tile; a subtree is descended iff ANY lane hits
its box (classic ray-packet traversal).

Trade: packets prune well for COHERENT rays (primary/shadow tiles);
incoherent bounce packets degrade toward visiting the whole tree. Use for
the coherent waves; direction-bucketed sorting is the planned extension.

VMEM layout (the whole acceleration structure is VMEM-resident):
  - nodes: (M, 16) f32 rows [min3 max3 skip start count pad...] — the
    16-lane rows pad to 128 lanes in VMEM, so M*512 bytes;
  - triangles: 8 per 128-lane row, 16 floats each [v0 e1 e2 pad]; leaf
    starts are ALIGNED to 8 at pack time so a leaf is a contiguous row
    block readable at a scalar row offset with STATIC lane offsets.

Capacity on a ~13MB-usable v5e VMEM: ~100k triangles + ~10k nodes
(leaf_size 32), i.e. exactly the config-4 scale.
"""
from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax import Array, lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_pathtracer.models.mesh import MeshData

LANES = 128
BIG = 1e30
TRIS_PER_ROW = 8
TRI_STRIDE = 16  # floats per triangle slot


@flax.struct.dataclass
class PackedMesh:
    """Packet-traversal layout + remap back to MeshData triangle ids."""

    nodes: Array  # (M, 16) f32
    tri_rows: Array  # (R, 128) f32
    remap: Array  # (Tp,) int32 padded-tri -> original tri (-1 pad)
    leaf_size: int = flax.struct.field(pytree_node=False, default=32)
    num_nodes: int = flax.struct.field(pytree_node=False, default=0)


def pack_mesh(mesh: MeshData) -> PackedMesh:
    """Re-pack a built MeshData for packet traversal (leaf-aligned tris)."""
    node_start = np.asarray(mesh.node_start)
    node_count = np.asarray(mesh.node_count)
    node_skip = np.asarray(mesh.node_skip)
    node_min = np.asarray(mesh.node_min)
    node_max = np.asarray(mesh.node_max)
    v0 = np.asarray(mesh.v0)
    e1 = np.asarray(mesh.e1)
    e2 = np.asarray(mesh.e2)
    M = mesh.num_nodes
    leaf_size = int(node_count.max()) if M else 0

    new_start = np.zeros(M, np.int64)
    tri_blocks = []
    remap = []
    cursor = 0
    for n in range(M):
        c = node_count[n]
        if c == 0:
            continue
        # align to a row boundary
        pad = (-cursor) % TRIS_PER_ROW
        if pad:
            tri_blocks.append(np.full((pad,), -1, np.int64))
            cursor += pad
        new_start[n] = cursor
        idx = np.arange(node_start[n], node_start[n] + c)
        tri_blocks.append(idx)
        cursor += c
    tri_ids = (np.concatenate(tri_blocks) if tri_blocks
               else np.zeros((0,), np.int64))
    pad_tail = (-len(tri_ids)) % TRIS_PER_ROW
    if pad_tail:
        tri_ids = np.concatenate([tri_ids, np.full(pad_tail, -1, np.int64)])
    Tp = len(tri_ids)

    slots = np.zeros((Tp, TRI_STRIDE), np.float32)
    valid = tri_ids >= 0
    src = np.clip(tri_ids, 0, max(len(v0) - 1, 0))
    slots[:, 0:3] = np.where(valid[:, None], v0[src], 0.0)
    slots[:, 3:6] = np.where(valid[:, None], e1[src], 0.0)
    slots[:, 6:9] = np.where(valid[:, None], e2[src], 0.0)
    tri_rows = slots.reshape(Tp // TRIS_PER_ROW, TRIS_PER_ROW * TRI_STRIDE)

    nodes = np.zeros((M, 16), np.float32)
    nodes[:, 0:3] = node_min
    nodes[:, 3:6] = node_max
    nodes[:, 6] = node_skip
    nodes[:, 7] = new_start
    nodes[:, 8] = node_count

    return PackedMesh(
        nodes=jnp.asarray(nodes),
        tri_rows=jnp.asarray(tri_rows),
        remap=jnp.asarray(np.where(valid, tri_ids, -1), jnp.int32),
        leaf_size=leaf_size,
        num_nodes=M,
    )


def _packet_kernel(
    nodes_ref,  # (M, 16) VMEM
    tris_ref,  # (R, 128) VMEM
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,  # (rows, 128)
    t_ref, idx_ref, u_ref, v_ref,  # outputs (rows, 128)
    *,
    rows: int,
    n_nodes: int,
    leaf_rows: int,
    tmin: float,
):
    ox, oy, oz = ox_ref[:, :], oy_ref[:, :], oz_ref[:, :]
    dx, dy, dz = dx_ref[:, :], dy_ref[:, :], dz_ref[:, :]

    def safe_inv(a):
        s = jnp.where(jnp.abs(a) > 1e-12, a, jnp.where(a >= 0, 1e-12, -1e-12))
        return 1.0 / s

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

    t_ref[:, :] = jnp.full((rows, LANES), BIG, jnp.float32)
    idx_ref[:, :] = jnp.zeros((rows, LANES), jnp.int32)
    u_ref[:, :] = jnp.zeros((rows, LANES), jnp.float32)
    v_ref[:, :] = jnp.zeros((rows, LANES), jnp.float32)

    def body(n):
        nd = nodes_ref[n]  # (16,) scalar row
        t_cur = t_ref[:, :]
        tx0 = (nd[0] - ox) * ix
        tx1 = (nd[3] - ox) * ix
        ty0 = (nd[1] - oy) * iy
        ty1 = (nd[4] - oy) * iy
        tz0 = (nd[2] - oz) * iz
        tz1 = (nd[5] - oz) * iz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        box_hit = (tn <= tf) & (tf > tmin) & (tn < t_cur)
        any_hit = jnp.sum(box_hit.astype(jnp.int32)) > 0

        skip = nd[6].astype(jnp.int32)
        start = nd[7].astype(jnp.int32)
        count = nd[8].astype(jnp.int32)
        is_leaf = count > 0

        @pl.when(any_hit & is_leaf)
        def _leaf():
            base = start // TRIS_PER_ROW
            trs = tris_ref[pl.ds(base, leaf_rows), :]  # (leaf_rows, 128)
            t_best = t_ref[:, :]
            idx_b = idx_ref[:, :]
            u_b = u_ref[:, :]
            v_b = v_ref[:, :]
            for j in range(leaf_rows * TRIS_PER_ROW):
                r = j // TRIS_PER_ROW
                c0 = (j % TRIS_PER_ROW) * TRI_STRIDE
                v0x, v0y, v0z = trs[r, c0], trs[r, c0 + 1], trs[r, c0 + 2]
                e1x, e1y, e1z = trs[r, c0 + 3], trs[r, c0 + 4], trs[r, c0 + 5]
                e2x, e2y, e2z = trs[r, c0 + 6], trs[r, c0 + 7], trs[r, c0 + 8]
                # Moller-Trumbore with scalar triangle, vector rays
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
                t_best = jnp.where(valid, tt, t_best)
                idx_b = jnp.where(valid, start + j, idx_b)
                u_b = jnp.where(valid, uu, u_b)
                v_b = jnp.where(valid, vv, v_b)
            t_ref[:, :] = t_best
            idx_ref[:, :] = idx_b
            u_ref[:, :] = u_b
            v_ref[:, :] = v_b

        descend = any_hit & ~is_leaf
        return jnp.where(descend, n + 1, skip)

    lax.while_loop(lambda n: n < n_nodes, body, jnp.int32(0))


@functools.partial(
    jax.jit, static_argnames=("rows_total", "tile_rows", "n_nodes",
                              "leaf_rows", "tmin"),
)
def _run_packet(nodes, tri_rows, o_planes, d_planes, rows_total, tile_rows,
                n_nodes, leaf_rows, tmin):
    grid = (rows_total // tile_rows,)
    lane_spec = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0))
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _packet_kernel, rows=tile_rows, n_nodes=n_nodes,
        leaf_rows=leaf_rows, tmin=tmin,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[full(nodes), full(tri_rows)] + [lane_spec] * 6,
        out_specs=[lane_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((rows_total, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows_total, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows_total, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows_total, LANES), jnp.float32),
        ],
    )(nodes, tri_rows, *o_planes, *d_planes)


def intersect_mesh_packet(
    packed: PackedMesh, o: Array, d: Array, tmin: float,
    tile_rows: int = 8, sort: bool = True,
):
    """Packet-traversal closest hit. o, d: (N, 3). Returns (t, tri, u, v)
    with `tri` in ORIGINAL MeshData order (post-BVH-reorder), t=BIG on miss.

    sort=True groups rays by direction octant + coarse origin cell before
    tiling (results are un-permuted on return): incoherent bounce waves
    otherwise make every packet visit the union of its lanes' subtrees.
    """
    if sort:
        oct_ = (
            (d[:, 0] < 0).astype(jnp.int32) * 4
            + (d[:, 1] < 0).astype(jnp.int32) * 2
            + (d[:, 2] < 0).astype(jnp.int32)
        )
        lo = jnp.min(o, axis=0)
        hi = jnp.max(o, axis=0)
        q = jnp.clip(
            ((o - lo) / jnp.maximum(hi - lo, 1e-6) * 15.0).astype(jnp.int32),
            0, 15,
        )
        cell = (q[:, 0] * 16 + q[:, 2]) * 16 + q[:, 1]
        perm = jnp.argsort(oct_ * 4096 + cell)
        inv = jnp.argsort(perm)
        t, tri, uu, vv = intersect_mesh_packet(
            packed, jnp.take(o, perm, axis=0), jnp.take(d, perm, axis=0),
            tmin, tile_rows=tile_rows, sort=False,
        )
        return (jnp.take(t, inv), jnp.take(tri, inv),
                jnp.take(uu, inv), jnp.take(vv, inv))
    n = o.shape[0]
    tile_lanes = tile_rows * LANES
    n_tiles = -(-n // tile_lanes)
    rows_total = n_tiles * tile_rows
    pad = rows_total * LANES - n

    def plane(a):
        return jnp.pad(a, (0, pad)).reshape(rows_total, LANES)

    o_planes = tuple(plane(o[:, i]) for i in range(3))
    d_planes = tuple(plane(d[:, i]) for i in range(3))  # pad lanes sliced off

    leaf_rows = max(1, -(-packed.leaf_size // TRIS_PER_ROW))
    t, idx, uu, vv = _run_packet(
        packed.nodes, packed.tri_rows, o_planes, d_planes,
        rows_total, tile_rows, packed.num_nodes, leaf_rows, tmin,
    )
    t = t.reshape(-1)[:n]
    idx = idx.reshape(-1)[:n]
    uu = uu.reshape(-1)[:n]
    vv = vv.reshape(-1)[:n]
    hit = t < 0.5 * BIG
    tri = jnp.where(hit, jnp.take(packed.remap, jnp.clip(idx, 0, packed.remap.shape[0] - 1)), 0)
    return jnp.where(hit, t, BIG), tri, uu, vv
