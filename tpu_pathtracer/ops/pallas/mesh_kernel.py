"""Packet BVH traversal in Pallas: the whole tile walks one node sequence.

The XLA mesh traversal (ops/triangle.py) gives every lane its own node
pointer, which makes every step a per-lane GATHER — measured to be the
bottleneck for config-4 scenes on TPU (docs/STATUS.md). This kernel
inverts that: a TILE of rays shares ONE scalar threaded-DFS walk, so every
node/triangle fetch is a scalar-indexed ROW read broadcast against the
lanes — no gathers at all. AABB and Möller-Trumbore tests are vectorized
over the (rows, 128) lane tile; a subtree is descended iff ANY lane hits
its box (classic ray-packet traversal).

Round-2 upgrades (all aimed at the incoherent bounce/shadow waves that
dominated the round-1 frame time):

  - per-lane ``t_init``: the walk starts from the caller's best-known hit
    distance (the sphere-pass t for closest-hit merges, the visibility
    segment length for shadow rays) instead of +inf, so subtrees beyond
    it are pruned — for shadow rays this makes the walk effectively
    any-hit (the first found occluder shrinks t and prunes the rest);
  - dead-lane masking: lanes with ``t_init <= 0`` never expand boxes, and
    the pre-pass sorts them to the tail tiles; tiles with no live lane
    skip the whole walk via a scalar-prefetched per-tile flag — at deep
    bounces (RR kills most lanes) whole tiles drop out;
  - in-kernel attribute resolution: each 16-float triangle slot carries
    [v0 e1 e2 | mat uv0 uvE1 uvE2] and the kernel emits the geometric
    normal (cross(e1,e2), normalized — bit-compatible with
    MeshData.n_geom), the interpolated texture uv and the material id of
    the winning hit, killing the post-traversal per-lane gathers
    (the round-1 ops/intersect.py jnp.take chain).

On-chip layout (the whole acceleration structure is chip-resident):
  - nodes: split into a flat (M*6,) f32 AABB table and a flat (M*3,) i32
    [skip start count] table, both SMEM (1-D — SMEM pads 2-D rows to
    512 B) so the walk reads node fields as true scalar loads broadcast
    into the vector AABB test. The SMEM layout is used up to
    SMEM_NODE_BUDGET bytes of node tables (36 B/node -> ~19.4k nodes at
    the default 700 kB, leaving ~300 kB of the ~1 MiB SMEM for the
    scalar-prefetch flags, grid scalars and Mosaic's own use); past the
    budget the tables fall back to 2-D VMEM with per-element [n, k]
    extracts — slower per step but unbounded.
  - triangles: 8 slots of 16 floats per 128-lane row (VMEM); leaf starts
    ALIGNED to 8 at pack time so a leaf is a contiguous row block
    readable at a scalar row offset with STATIC lane offsets.

Capacity on a ~13MB-usable v5e VMEM: ~100k triangles of tri_rows plus
the node tables (config-4 scale is ~100k tris / ~9k nodes at
leaf_size 32 — SMEM-resident nodes with room to spare).
"""
from __future__ import annotations

import functools
from typing import Any

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

# Byte budget for the flat SMEM node tables (6 f32 + 3 i32 = 36 B/node).
# TPU SMEM is ~1 MiB on current generations (v4/v5e/v5p); 700 kB leaves
# explicit headroom for the scalar-prefetch flags, grid scalars and the
# compiler's own SMEM use. Chips with a different SMEM size (or a future
# Mosaic that reserves more) can lower/raise this module knob; meshes
# beyond it transparently use the 2-D VMEM node layout instead
# (exercised by tests/test_mesh.py::test_vmem_node_fallback).
SMEM_NODE_BUDGET = 700_000
TRI_STRIDE = 16  # floats per triangle slot
# Independent tile walks interleaved per packet-kernel instance: the walk
# is node-step-bound and each step's any-lane reduction drains the vector
# pipeline (~171 ns); a partner walk's independent vector work overlaps
# the drain (73 ns/step at 2, benchmarks/_step_probe.py). Results are
# bit-identical for any value.
WALK_PAIR = 4
# Leaf visits queued per walk before a descent pause drains them as one
# uniform vector batch (see _packet_kernel). Larger = fewer pauses but
# staler t-tightening in the descent's box culling (more visits).
# Swept on the config-4 incoherent wave (round 5): pair 4 + cap 4 beat
# {pair 2, caps 2..64} — small batches keep culling t fresh and 4-way
# interleaving hides the extra pause overhead.
QUEUE_CAP = 4
# XLA:TPU's scoped SMEM arena charges ~512 B per grid tile for the
# packet call (semaphores + per-step bookkeeping); past ~1.6k tiles the
# 1 MiB SMEM budget bursts (config-4 at SPEC scale: 2048 tiles + the
# 180 KB node tables = 1.16 MiB -> compile error). Launch at most this
# many tiles per pallas_call and chunk bigger waves (must stay a
# multiple of WALK_PAIR).
MAX_TILES_PER_CALL = 1024
# Occlusion (shadow) waves run lighter leaves and favor SMALLER tiles:
# 8-row tiles cut the broadcast waste where the walk isn't step-bound
# (12.3 vs 14.1 ms on the full-intensity any-hit probe).
ANY_HIT_TILE_ROWS = 8


@flax.struct.dataclass
class PackedMesh:
    """Packet-traversal layout + remap back to MeshData triangle ids."""

    nodes: Array  # (M, 16) f32
    tri_rows: Array  # (R, 128) f32
    remap: Array  # (Tp,) int32 padded-tri -> original tri (-1 pad)
    leaf_size: int = flax.struct.field(pytree_node=False, default=32)
    num_nodes: int = flax.struct.field(pytree_node=False, default=0)
    # Coarse trees only: (M, 2) int32 [fine_start, fine_skip) — each
    # coarse node's subtree as a FINE-tree node range, for the fine
    # walk's hint-first restart (see intersect_mesh_packet).
    fine_map: Any = None
    # Coarse trees only: the LEAF cells as flat tables — (C*6,) f32
    # boxes and (C,) int32 node ids in DFS order. The bin pass sweeps
    # these linearly (no tree walk, no any-lane reductions): at a few
    # hundred cells the pure-vector sweep beats the reduction-stalled
    # walk ~5x (see _bin_kernel).
    cell_boxes: Any = None
    cell_ids: Any = None


def _collapse_subtrees(node_start, node_count, node_skip, node_min,
                       node_max, collapse_leaf: int):
    """Collapse every BVH subtree holding <= collapse_leaf triangles into
    a single leaf node.

    The build-side LEAF_SIZE (models/mesh.py, default 4) is right for the
    XLA per-lane traversal, but the packet kernel keeps the WHOLE node
    table VMEM-resident where each 16-float row pads to a 128-lane row
    (512 B/node): at config-4 scale a leaf-4 tree is ~56k nodes = 28 MB —
    past v5e VMEM. Packets also amortize triangle tests across 1024 lanes,
    so fat leaves are the right operating point anyway. This keeps the
    node table ~8x smaller and the walk ~8x shorter.

    Works on the threaded-DFS arrays: node i's subtree is the contiguous
    DFS range [i, skip_i), and the builder assigns leaf triangle ranges
    left-to-right, so a subtree's triangles are the contiguous range
    [first-leaf start, last-leaf start+count).
    """
    M = len(node_start)
    pre = np.zeros(M + 1, np.int64)  # prefix sum of leaf counts over DFS
    np.cumsum(node_count, out=pre[1:])
    # first leaf triangle-start at or after each DFS position
    first_start = np.full(M + 1, -1, np.int64)
    nxt = -1
    for i in range(M - 1, -1, -1):
        if node_count[i] > 0:
            nxt = node_start[i]
        first_start[i] = nxt

    sub_count = pre[node_skip] - pre[np.arange(M)]
    out = []  # (min, max, old_skip, start, count)
    kept_orig = []  # original DFS index of each emitted node
    old2new = np.full(M + 1, -1, np.int64)
    i = 0
    while i < M:
        old2new[i] = len(out)
        kept_orig.append(i)
        sc = sub_count[i]
        if 0 < sc <= collapse_leaf:
            out.append((node_min[i], node_max[i], node_skip[i],
                        first_start[i], sc))
            i = int(node_skip[i])  # whole subtree becomes this one leaf
        else:
            out.append((node_min[i], node_max[i], node_skip[i],
                        node_start[i], node_count[i]))
            i += 1
    old2new[M] = len(out)
    new_min = np.stack([o[0] for o in out])
    new_max = np.stack([o[1] for o in out])
    old_skips = np.asarray([o[2] for o in out], np.int64)
    new_skip = old2new[old_skips]
    assert (new_skip >= 0).all(), "collapsed skip target not emitted"
    new_start = np.asarray([o[3] for o in out], np.int64)
    new_count = np.asarray([o[4] for o in out], np.int64)
    return (new_start, new_count, new_skip, new_min, new_max,
            old2new, np.asarray(kept_orig, np.int64), old_skips)


def pack_mesh(mesh: MeshData, collapse_leaf: int = 64,
              nodes_only: bool = False,
              fine_leaf: int | None = None) -> PackedMesh:
    """Re-pack a built MeshData for packet traversal (leaf-aligned tris).

    Slot layout (16 f32): v0 xyz | e1 xyz | e2 xyz | material_id |
    uv0 uv | uv_e1 uv | uv_e2 uv — geometry AND shading attributes, so
    the kernel resolves everything at the hit site.

    collapse_leaf: subtrees holding up to this many triangles fold into
    one fat leaf (see _collapse_subtrees — VMEM capacity + packet
    amortization). Defaults from a measured (tile_rows, collapse) sweep
    on incoherent config-4 waves: 16-row tiles amortize the scalar node
    walk best (82 ms vs 110 ms at 8 rows), and 64-tri leaves halve the
    node table again with no wave-time cost.

    nodes_only=True skips the triangle re-pack entirely (empty tri_rows /
    remap) — for COARSE trees consumed by the box-only binning pass
    (bin_rays), which never touches triangles. Use a large collapse_leaf
    (~1024) so the coarse table is a few hundred nodes.
    """
    node_start = np.asarray(mesh.node_start)
    node_count = np.asarray(mesh.node_count)
    node_skip = np.asarray(mesh.node_skip)
    node_min = np.asarray(mesh.node_min)
    node_max = np.asarray(mesh.node_max)
    kept_orig = old_skips = None
    if collapse_leaf and mesh.num_nodes:
        (node_start, node_count, node_skip, node_min,
         node_max, _o2n, kept_orig, old_skips) = _collapse_subtrees(
            node_start, node_count, node_skip, node_min, node_max,
            collapse_leaf,
        )
    if nodes_only:
        M = len(node_start)
        nodes = np.zeros((M, 16), np.float32)
        nodes[:, 0:3] = node_min
        nodes[:, 3:6] = node_max
        nodes[:, 6] = node_skip
        nodes[:, 7] = node_start  # raw tri index; unused by the bin pass
        nodes[:, 8] = node_count
        fine_map = None
        if fine_leaf is not None and kept_orig is not None:
            # map each coarse node to its subtree's node range in the
            # FINE tree (same original tree, smaller collapse): any
            # coarse-emitted original index is also fine-emitted (a
            # fine-collapsed subtree is strictly inside some
            # coarse-collapsed one), so old2new_fine is defined there.
            (_fs, _fc, _fk, _fm, _fx, o2n_f, _ko, _os) = _collapse_subtrees(
                np.asarray(mesh.node_start), np.asarray(mesh.node_count),
                np.asarray(mesh.node_skip), np.asarray(mesh.node_min),
                np.asarray(mesh.node_max), fine_leaf,
            )
            fs = o2n_f[kept_orig]
            fe = o2n_f[old_skips]
            # A coarse cell FINER than the fine collapse (coarse_leaf <
            # fine_leaf, e.g. tiny test trees) can sit inside a
            # fine-collapsed subtree and have no fine-node image; such
            # cells simply get no hint (0, 0).
            ok_map = (fs >= 0) & (fe >= 0)
            fine_map = jnp.asarray(
                np.stack([np.where(ok_map, fs, 0),
                          np.where(ok_map, fe, 0)], axis=1), jnp.int32
            )
        leaf_sel = np.nonzero(node_count > 0)[0]
        return PackedMesh(
            nodes=jnp.asarray(nodes),
            tri_rows=jnp.zeros((1, LANES), jnp.float32),
            remap=jnp.full((1,), -1, jnp.int32),
            leaf_size=int(node_count.max()) if M else 0,
            num_nodes=M,
            fine_map=fine_map,
            cell_boxes=jnp.asarray(
                np.concatenate([node_min[leaf_sel], node_max[leaf_sel]],
                               axis=1).reshape(-1), jnp.float32
            ),
            cell_ids=jnp.asarray(leaf_sel, jnp.int32),
        )
    v0 = np.asarray(mesh.v0)
    e1 = np.asarray(mesh.e1)
    e2 = np.asarray(mesh.e2)
    mat = np.asarray(mesh.material_id)
    uv0 = np.asarray(mesh.uv0)
    uve1 = np.asarray(mesh.uv_e1)
    uve2 = np.asarray(mesh.uv_e2)
    M = len(node_start)  # post-collapse node count
    leaf_size = int(node_count.max()) if M else 0

    new_start = np.zeros(M, np.int64)
    tri_blocks = []
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
    # tail padding: row-align, plus one full leaf block so the kernel's
    # fixed leaf_rows-row read never runs past the buffer for a leaf that
    # starts near the end (reads are masked by `j < count` anyway)
    leaf_rows_pad = max(1, -(-leaf_size // TRIS_PER_ROW)) * TRIS_PER_ROW
    pad_tail = (-len(tri_ids)) % TRIS_PER_ROW + leaf_rows_pad
    tri_ids = np.concatenate([tri_ids, np.full(pad_tail, -1, np.int64)])
    Tp = len(tri_ids)

    slots = np.zeros((Tp, TRI_STRIDE), np.float32)
    valid = tri_ids >= 0
    src = np.clip(tri_ids, 0, max(len(v0) - 1, 0))
    slots[:, 0:3] = np.where(valid[:, None], v0[src], 0.0)
    slots[:, 3:6] = np.where(valid[:, None], e1[src], 0.0)
    slots[:, 6:9] = np.where(valid[:, None], e2[src], 0.0)
    slots[:, 9] = np.where(valid, mat[src].astype(np.float32), 0.0)
    slots[:, 10:12] = np.where(valid[:, None], uv0[src], 0.0)
    slots[:, 12:14] = np.where(valid[:, None], uve1[src], 0.0)
    slots[:, 14:16] = np.where(valid[:, None], uve2[src], 0.0)
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
    flags_ref,  # scalar prefetch: (n_tiles, 3) int32 — live flag + hints
    box_ref,  # (M*6,) f32 node AABBs [min3 max3] flat — SMEM (1-D: SMEM
    #          pads every 2-D ROW to 512 B, so tables must be flat)
    meta_ref,  # (M*3,) i32 [skip start count] flat — SMEM
    tris_ref,  # (R, 128) VMEM
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,  # (pair*rows, 128)
    t0_ref,  # (pair*rows, 128) per-lane start distance; <= 0 marks dead
    t_ref, idx_ref, nx_ref, ny_ref, nz_ref, tu_ref, tv_ref, mat_ref,
    *queue_refs,  # pair SMEM (queue_cap,) int32 scratch queues
    rows: int,
    n_nodes: int,
    leaf_rows: int,
    tmin: float,
    occlusion: bool,
    flat_nodes: bool,
    defer_attrs: bool = False,
    pair: int = 1,
    queue_cap: int = 16,
):
    """QUEUE-BATCH paired walk. Two structural facts drive this shape
    (benchmarks/_step_probe*.py):

    1. The walk is NODE-STEP-bound, not leaf-math-bound: each step's
       any-lane reduction (vector predicate -> scalar branch) drains the
       vector pipeline before the scalar unit can pick the next node
       (~171 ns/step vs ~25 ns of box-test math).
    2. A conditional VECTOR region (pl.when leaf body) inside the loop
       serializes everything around it — pairing two walks recovers
       nothing while the leaf test is inline (probe: 168 ns/step paired
       inline vs 73 ns paired pure-dataflow).

    So: the descent loop only QUEUES leaf node ids (a conditional SMEM
    scalar write — no conditional vector work), pausing every
    ``queue_cap`` leaves to run the triangle tests as one uniform vector
    batch; and ``pair`` independent tiles advance through the shared
    while_loops so each walk's reduction drain overlaps the partner's
    vector work (probe: 2.1x per step vs the inline structure). Leaf
    t-tightening becomes batch-granular, which only ADDS box-test
    visits (supersets, same DFS order, strict-< updates) — results are
    bit-identical to the inline walk.
    """
    gtile = pl.program_id(0)
    brows = pair * rows

    def safe_inv(a):
        s = jnp.where(jnp.abs(a) > 1e-12, a, jnp.where(a >= 0, 1e-12, -1e-12))
        return 1.0 / s

    t0_all = t0_ref[:, :]
    live_all = t0_all > 0.0
    t_ref[:, :] = jnp.where(live_all, t0_all, 0.0)
    idx_ref[:, :] = jnp.zeros((brows, LANES), jnp.int32)
    nx_ref[:, :] = jnp.zeros((brows, LANES), jnp.float32)
    ny_ref[:, :] = jnp.zeros((brows, LANES), jnp.float32)
    nz_ref[:, :] = jnp.zeros((brows, LANES), jnp.float32)
    tu_ref[:, :] = jnp.zeros((brows, LANES), jnp.float32)
    tv_ref[:, :] = jnp.zeros((brows, LANES), jnp.float32)
    mat_ref[:, :] = jnp.zeros((brows, LANES), jnp.int32)

    def make_walk(w):
        sl = pl.ds(w * rows, rows)
        queue_ref = queue_refs[w]
        ox, oy, oz = ox_ref[sl, :], oy_ref[sl, :], oz_ref[sl, :]
        dx, dy, dz = dx_ref[sl, :], dy_ref[sl, :], dz_ref[sl, :]
        live = t0_ref[sl, :] > 0.0
        ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

        def descend(n, qi, t_cur, act):
            # act: scalar bool — False parks the walk (cursor unchanged,
            # no queue writes; its vector ops still issue and serve as
            # overlap fodder for the partner walk's reduction drain).
            # t_cur: the culling t carried in REGISTERS, refreshed from
            # t_ref only at batch boundaries — a per-step t_ref load
            # costs ~50 ns of unhidden VMEM latency (_step_probe3:
            # 111 vs 44 ns/step); the staleness only ADDS box visits
            # (strict-< leaf updates keep results bit-identical).
            nc = jnp.minimum(n, n_nodes - 1)
            # node fields are true scalar loads from SMEM broadcast into
            # the vector op — the old VMEM-row + lane-extract formulation
            # paid vector-pipeline stalls per step
            if flat_nodes:
                b6 = nc * 6
                bx = lambda k: box_ref[b6 + k]
            else:
                bx = lambda k: box_ref[nc, k]
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
            box_hit = live & (tn <= tf) & (tf > tmin) & (tn < t_cur)
            if occlusion:
                # occlusion mode: a found occluder zeroes the lane's t,
                # which must kill it outright (tn can be negative when the
                # origin sits inside a box, so tn < t_cur alone would keep
                # expanding)
                box_hit = box_hit & (t_cur > 0.0)
            any_hit = (jnp.sum(box_hit.astype(jnp.int32)) > 0) & act

            if flat_nodes:
                m3 = nc * 3
                mt = lambda k: meta_ref[m3 + k]
            else:
                mt = lambda k: meta_ref[nc, k]
            skip = mt(0)
            count = mt(2)
            is_leaf = count > 0
            put = any_hit & is_leaf

            @pl.when(put)
            def _enqueue():
                queue_ref[qi] = nc

            descend_ = any_hit & ~is_leaf
            return (
                jnp.where(descend_, nc + 1, jnp.where(act, skip, n)),
                qi + put.astype(jnp.int32),
            )

        def process_queue(qn):
            """Test the queued leaves' triangles: one uniform vector
            batch, no reductions, t tightening sequentially per leaf.
            The per-lane best state rides the fori carry in REGISTERS —
            one ref read before and one write after the whole batch."""

            def leaf_body(qj, carry):
                n = queue_ref[qj]
                if flat_nodes:
                    m3 = n * 3
                    mt = lambda k: meta_ref[m3 + k]
                else:
                    mt = lambda k: meta_ref[n, k]
                start = mt(1)
                count = mt(2)
                base = start // TRIS_PER_ROW
                trs = tris_ref[pl.ds(base, leaf_rows), :]  # (leaf_rows,128)
                if occlusion:
                    (t_best,) = carry
                elif defer_attrs:
                    t_best, idx_b = carry
                else:
                    (t_best, idx_b, nx_b, ny_b, nz_b, tu_b, tv_b,
                     mat_b) = carry
                for j in range(leaf_rows * TRIS_PER_ROW):
                    r = j // TRIS_PER_ROW
                    c0 = (j % TRIS_PER_ROW) * TRI_STRIDE
                    v0x, v0y, v0z = (trs[r, c0], trs[r, c0 + 1],
                                     trs[r, c0 + 2])
                    e1x, e1y, e1z = (trs[r, c0 + 3], trs[r, c0 + 4],
                                     trs[r, c0 + 5])
                    e2x, e2y, e2z = (trs[r, c0 + 6], trs[r, c0 + 7],
                                     trs[r, c0 + 8])
                    # Moller-Trumbore with scalar triangle, vector
                    # rays. No explicit det!=0 guard: det==0 makes
                    # inv_det inf, so uu/vv/tt come out +-inf or NaN and
                    # every such lane fails the window compares below
                    # (NaN compares false; tt=-inf fails tt > tmin) —
                    # IEEE semantics do the masking for free (~4 vector
                    # ops per triangle saved)
                    px_ = dy * e2z - dz * e2y
                    py_ = dz * e2x - dx * e2z
                    pz_ = dx * e2y - dy * e2x
                    det = e1x * px_ + e1y * py_ + e1z * pz_
                    inv_det = 1.0 / det
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
                        (j < count)
                        & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                        & (tt > tmin) & (tt < t_best)
                    )
                    if occlusion:
                        # occlusion query: the first occluder zeroes t —
                        # the lane stops expanding boxes (see box_hit in
                        # descend) and t=0 < t_init reads as "occluded"
                        # to the caller. No attribute resolution at all.
                        t_best = jnp.where(valid, 0.0, t_best)
                        continue
                    t_best = jnp.where(valid, tt, t_best)
                    idx_b = jnp.where(valid, start + j, idx_b)
                    if defer_attrs:
                        # leanest leaf loop: (t, slot) only; the caller
                        # resolves normal/uv/mat with ONE packed row
                        # gather from the slot table (the winner's
                        # barycentrics recompute in ~10 vectorized XLA
                        # ops) — ~20 VPU ops per tested triangle saved.
                        continue
                    # scalar geometric normal (cross of the scalar
                    # edges) and scalar-coefficient uv interpolation
                    gnx = e1y * e2z - e1z * e2y
                    gny = e1z * e2x - e1x * e2z
                    gnz = e1x * e2y - e1y * e2x
                    nx_b = jnp.where(valid, gnx, nx_b)
                    ny_b = jnp.where(valid, gny, ny_b)
                    nz_b = jnp.where(valid, gnz, nz_b)
                    tu_b = jnp.where(
                        valid,
                        trs[r, c0 + 10] + uu * trs[r, c0 + 12]
                        + vv * trs[r, c0 + 14],
                        tu_b,
                    )
                    tv_b = jnp.where(
                        valid,
                        trs[r, c0 + 11] + uu * trs[r, c0 + 13]
                        + vv * trs[r, c0 + 15],
                        tv_b,
                    )
                    mat_b = jnp.where(
                        valid, trs[r, c0 + 9].astype(jnp.int32), mat_b
                    )
                if occlusion:
                    return (t_best,)
                if defer_attrs:
                    return (t_best, idx_b)
                return (t_best, idx_b, nx_b, ny_b, nz_b, tu_b, tv_b,
                        mat_b)

            if occlusion:
                carry0 = (t_ref[sl, :],)
            elif defer_attrs:
                carry0 = (t_ref[sl, :], idx_ref[sl, :])
            else:
                carry0 = (t_ref[sl, :], idx_ref[sl, :], nx_ref[sl, :],
                          ny_ref[sl, :], nz_ref[sl, :], tu_ref[sl, :],
                          tv_ref[sl, :], mat_ref[sl, :])
            out = lax.fori_loop(0, qn, leaf_body, carry0)
            t_ref[sl, :] = out[0]
            if not occlusion:
                idx_ref[sl, :] = out[1]
                if not defer_attrs:
                    nx_ref[sl, :] = out[2]
                    ny_ref[sl, :] = out[3]
                    nz_ref[sl, :] = out[4]
                    tu_ref[sl, :] = out[5]
                    tv_ref[sl, :] = out[6]
                    mat_ref[sl, :] = out[7]

        return descend, process_queue

    walks = [make_walk(w) for w in range(pair)]
    fl = lambda w, k: flags_ref[gtile * pair + w, k]
    actives = [fl(w, 0) != 0 for w in range(pair)]
    any_live = actives[0]
    for w in range(1, pair):
        any_live = any_live | actives[w]

    @pl.when(any_live)
    def _walk():
        # Hint-first restart: each walk visits its tile's majority coarse
        # cell's fine subtree [hs, he) FIRST — most lanes find their
        # closest hit there, so the full walk below starts with a tight
        # per-lane t and prunes most of the tree (nearest-first ordering
        # the plain threaded DFS lacks). Phase 2 jumps over the already-
        # walked range (a subtree is DFS-contiguous, so any entry lands
        # exactly at hs); revisiting node hs itself once is idempotent
        # (strict t-improvement updates only). A finished (or dead) walk
        # parks its cursor while its partner continues.
        hs = [fl(w, 1) for w in range(pair)]
        he = [fl(w, 2) for w in range(pair)]

        def run_phase(limits, n_init, jump):
            """Paired descent with batch pauses: the inner loop advances
            every unparked walk until its queue fills (or it finishes);
            the outer loop drains all queues, refreshes the register-
            carried culling t from t_ref, and resumes."""

            def icond(c):
                ns, qis = c[0], c[1]
                r = (ns[0] < limits[0]) & (qis[0] < queue_cap)
                for w in range(1, pair):
                    r = r | ((ns[w] < limits[w]) & (qis[w] < queue_cap))
                return r

            def ibody(c):
                ns, qis, tcs = c
                n_out, q_out = [], []
                for w in range(pair):
                    act = (ns[w] < limits[w]) & (qis[w] < queue_cap)
                    n2, q2 = walks[w][0](ns[w], qis[w], tcs[w], act)
                    if jump:
                        n2 = jnp.where(
                            act & (ns[w] == hs[w]) & (he[w] > hs[w]),
                            he[w], n2,
                        )
                    n_out.append(n2)
                    q_out.append(q2)
                return tuple(n_out), tuple(q_out), tcs

            def ocond(c):
                ns = c[0]
                r = ns[0] < limits[0]
                for w in range(1, pair):
                    r = r | (ns[w] < limits[w])
                return r

            def obody(c):
                ns, _, tcs = c
                c2 = lax.while_loop(
                    icond, ibody,
                    (ns, tuple(jnp.int32(0) for _ in range(pair)), tcs),
                )
                ns2, qis2, _ = c2
                for w in range(pair):
                    walks[w][1](qis2[w])
                tcs2 = tuple(
                    t_ref[pl.ds(w * rows, rows), :] for w in range(pair)
                )
                return ns2, qis2, tcs2

            tcs0 = tuple(
                t_ref[pl.ds(w * rows, rows), :] for w in range(pair)
            )
            lax.while_loop(
                ocond, obody,
                (n_init, tuple(jnp.int32(0) for _ in range(pair)), tcs0),
            )

        run_phase(
            he,
            tuple(jnp.where(actives[w], hs[w], he[w]) for w in range(pair)),
            jump=False,
        )
        run_phase(
            [jnp.int32(n_nodes)] * pair,
            tuple(jnp.where(actives[w], 0, n_nodes).astype(jnp.int32)
                  for w in range(pair)),
            jump=True,
        )

    # normalize the winning normal (n_geom convention, models/mesh.py)
    if not occlusion:
        nx, ny, nz = nx_ref[:, :], ny_ref[:, :], nz_ref[:, :]
        inv_len = 1.0 / jnp.sqrt(
            jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20)
        )
        nx_ref[:, :] = nx * inv_len
        ny_ref[:, :] = ny * inv_len
        nz_ref[:, :] = nz * inv_len


@functools.partial(
    jax.jit, static_argnames=("rows_total", "tile_rows", "n_nodes",
                              "leaf_rows", "tmin", "any_hit", "flat_nodes",
                              "defer_attrs", "pair", "interpret"),
)
def _run_packet(flags, nodes, tri_rows, o_planes, d_planes, t0_plane,
                rows_total, tile_rows, n_nodes, leaf_rows, tmin,
                any_hit=False, flat_nodes=True, defer_attrs=False,
                pair=1, interpret=False):
    lane_spec = pl.BlockSpec((pair * tile_rows, LANES),
                             lambda i, *_: (i, 0))
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i, *_: (0, 0),
                                    memory_space=pltpu.VMEM)
    # Node fields are read as per-step scalars; SMEM makes those true
    # scalar loads. SMEM pads every 2-D ROW to 512 B, so the tables are
    # FLAT 1-D arrays, capped at SMEM_NODE_BUDGET bytes (36 B/node ->
    # ~19.4k nodes at the default budget; see the module constant for
    # the headroom rationale). Beyond that fall back to 2-D VMEM
    # (scalar reads become vector-lane extracts — slower per step).
    if flat_nodes:
        # flat 1-D SMEM tables (scalar-indexed at [n*6+k] / [n*3+k])
        node = lambda arr: pl.BlockSpec(arr.shape, lambda i, *_: (0,),
                                        memory_space=pltpu.SMEM)
        box = nodes[:, 0:6].reshape(-1)
        meta = nodes[:, 6:9].astype(jnp.int32).reshape(-1)
    else:
        # 2-D VMEM fallback, indexed [n, k] (Mosaic cannot prove the
        # alignment of a flat dynamic scalar load from VMEM)
        node = lambda arr: pl.BlockSpec(arr.shape, lambda i, *_: (0, 0),
                                        memory_space=pltpu.VMEM)
        box = nodes[:, 0:6]
        meta = nodes[:, 6:9].astype(jnp.int32)
    kernel = functools.partial(
        _packet_kernel, rows=tile_rows, n_nodes=n_nodes,
        leaf_rows=leaf_rows, tmin=tmin, occlusion=any_hit,
        flat_nodes=flat_nodes, defer_attrs=defer_attrs, pair=pair,
        queue_cap=QUEUE_CAP,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rows_total // (pair * tile_rows),),
        in_specs=[node(box), node(meta), full(tri_rows)]
        + [lane_spec] * 7,
        out_specs=[lane_spec] * 8,
        scratch_shapes=[pltpu.SMEM((QUEUE_CAP,), jnp.int32)] * pair,
    )
    f32 = jnp.float32
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows_total, LANES), f32),  # t
            jax.ShapeDtypeStruct((rows_total, LANES), jnp.int32),  # idx
            jax.ShapeDtypeStruct((rows_total, LANES), f32),  # nx
            jax.ShapeDtypeStruct((rows_total, LANES), f32),  # ny
            jax.ShapeDtypeStruct((rows_total, LANES), f32),  # nz
            jax.ShapeDtypeStruct((rows_total, LANES), f32),  # tex u
            jax.ShapeDtypeStruct((rows_total, LANES), f32),  # tex v
            jax.ShapeDtypeStruct((rows_total, LANES), jnp.int32),  # mat
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(flags, box, meta, tri_rows, *o_planes, *d_planes, t0_plane)


def _bin_kernel(
    flags_ref,  # scalar prefetch: (n_tiles,) int32 — any live lane?
    cbox_ref,  # (C*6,) f32 leaf-cell AABBs [min3 max3] flat — SMEM
    cid_ref,  # (C,) int32 leaf-cell node ids (DFS order) — SMEM
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,  # (rows, 128)
    t0_ref,  # (rows, 128) per-lane pruning distance; <= 0 marks dead
    cell_ref,  # OUT (rows, 128) int32: nearest coarse-leaf node id, -1 none
    tn_ref,  # OUT (rows, 128) f32: its clamped entry distance
    *,
    rows: int,
    n_cells: int,
    tmin: float,
):
    """Box-only binning as a LINEAR LEAF-CELL SWEEP: per lane, the coarse
    leaf whose box the ray enters NEAREST (clamped entry distance, ties
    first-in-DFS-order wins), among leaves entered strictly before t0.
    Lanes entering no coarse leaf provably have no mesh hit before t0 —
    the caller culls them from the fine walk entirely.

    No tree walk: a fori over the few-hundred leaf cells with the best
    (tn, cell) carried in registers — pure vector dataflow, zero
    any-lane reductions. The walking formulation paid ~171 ns/node for
    its per-step vector->scalar drain (benchmarks/_step_probe.py); the
    sweep tests every cell for ~40 ns each, which at C ~ a few hundred
    is ~5x cheaper and bit-identical (the walk's subtree pruning only
    skips tests that strict-< updates would reject anyway)."""
    tile = pl.program_id(0)
    ox, oy, oz = ox_ref[:, :], oy_ref[:, :], oz_ref[:, :]
    dx, dy, dz = dx_ref[:, :], dy_ref[:, :], dz_ref[:, :]
    t0 = t0_ref[:, :]
    live = t0 > 0.0

    def safe_inv(a):
        s = jnp.where(jnp.abs(a) > 1e-12, a, jnp.where(a >= 0, 1e-12, -1e-12))
        return 1.0 / s

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
    cell_ref[:, :] = jnp.full((rows, LANES), -1, jnp.int32)
    tn_ref[:, :] = jnp.full((rows, LANES), BIG, jnp.float32)

    @pl.when(flags_ref[tile] != 0)
    def _sweep():
        def body(c, carry):
            best, cell = carry
            b6 = c * 6
            bx = lambda k: cbox_ref[b6 + k]
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
            tn_eff = jnp.maximum(tn, 0.0)
            better = (
                live & (tn <= tf) & (tf > tmin)
                & (tn < jnp.minimum(t0, best)) & (tn_eff < best)
            )
            return (
                jnp.where(better, tn_eff, best),
                jnp.where(better, cid_ref[c], cell),
            )

        best, cell = lax.fori_loop(
            0, n_cells, body,
            (jnp.full((rows, LANES), BIG, jnp.float32),
             jnp.full((rows, LANES), -1, jnp.int32)),
        )
        tn_ref[:, :] = best
        cell_ref[:, :] = cell


@functools.partial(
    jax.jit, static_argnames=("tile_rows", "tmin", "interpret"),
)
def bin_rays(
    coarse: PackedMesh, o: Array, d: Array, t_init: Array,
    tmin: float, tile_rows: int = 16, interpret: bool = False,
) -> tuple[Array, Array]:
    """(cell, tn): (N,) int32 nearest coarse-cell id per ray (-1: provably
    no mesh hit before t_init / dead lane) and (N,) f32 its clamped entry
    distance (BIG when none). The binning inputs of the two-pass
    traversal (see intersect_mesh_packet's `coarse`)."""
    n = o.shape[0]
    n_nodes = coarse.num_nodes
    tile_lanes = tile_rows * LANES
    n_tiles = -(-n // tile_lanes)
    rows_total = n_tiles * tile_rows
    pad = rows_total * LANES - n

    def plane(a, fill=0.0):
        return jnp.pad(a, (0, pad), constant_values=fill).reshape(
            rows_total, LANES
        )

    o_planes = tuple(plane(o[:, i]) for i in range(3))
    d_planes = tuple(plane(d[:, i]) for i in range(3))
    t0_plane = plane(t_init, fill=0.0)
    flags = jnp.any(
        (t0_plane > 0.0).reshape(n_tiles, tile_rows * LANES), axis=1
    ).astype(jnp.int32)

    if coarse.cell_boxes is not None:
        cbox, cid = coarse.cell_boxes, coarse.cell_ids
    else:
        # coarse tree packed before the cell tables existed: derive them
        # (counts live in nodes[:, 8]; concrete under jit via pure_callback
        # is overkill — callers always come through pack_mesh, which fills
        # the tables; this path exists for hand-built PackedMesh values)
        counts = np.asarray(coarse.nodes[:, 8])
        sel = np.nonzero(counts > 0)[0]
        nb = np.asarray(coarse.nodes)
        cbox = jnp.asarray(nb[sel, 0:6].reshape(-1), jnp.float32)
        cid = jnp.asarray(sel, jnp.int32)
    n_cells = int(cid.shape[0])
    node = lambda arr: pl.BlockSpec(arr.shape, lambda i, *_: (0,),
                                    memory_space=pltpu.SMEM)
    kernel = functools.partial(
        _bin_kernel, rows=tile_rows, n_cells=n_cells, tmin=tmin,
    )
    lane_spec = pl.BlockSpec((tile_rows, LANES), lambda i, *_: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[node(cbox), node(cid)] + [lane_spec] * 7,
        out_specs=[lane_spec] * 2,
    )
    cell, tn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows_total, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows_total, LANES), jnp.float32),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(flags, cbox, cid, *o_planes, *d_planes, t0_plane)
    return cell.reshape(-1)[:n], tn.reshape(-1)[:n]


@flax.struct.dataclass
class PacketHit:
    """Closest-hit record with kernel-resolved shading attributes."""

    t: Array  # (N,) BIG on miss
    tri: Array  # (N,) original MeshData tri id (post-BVH-reorder)
    n: Array  # (N, 3) geometric normal
    uv: Array  # (N, 2) interpolated texture uv
    mat: Array  # (N,) material id


def _octant(d: Array) -> Array:
    return (
        (d[:, 0] < 0).astype(jnp.int32) * 4
        + (d[:, 1] < 0).astype(jnp.int32) * 2
        + (d[:, 2] < 0).astype(jnp.int32)
    )


def packet_sort_key(o: Array, d: Array, alive: Array | None = None) -> Array:
    """Ray-coherence sort key: direction octant (major) + coarse origin
    cell (minor); dead lanes sort to the tail so their tiles skip the
    whole walk. Exposed so the integrator can sort ONCE per bounce and
    run both the shadow and the next closest-hit wave pre-sorted —
    the per-call argsort+permute pipeline is ~7-9 ms per wave at config-4
    scale, about half the frame (benchmarks/profile_mesh_pieces.py)."""
    oct_ = _octant(d)
    lo = jnp.min(o, axis=0)
    hi = jnp.max(o, axis=0)
    q = jnp.clip(
        ((o - lo) / jnp.maximum(hi - lo, 1e-6) * 15.0).astype(jnp.int32),
        0, 15,
    )
    cell = (q[:, 0] * 16 + q[:, 2]) * 16 + q[:, 1]
    key = oct_ * 4096 + cell
    if alive is not None:
        key = jnp.where(alive, key, jnp.int32(1 << 20))
    return key


def intersect_mesh_packet(
    packed: PackedMesh, o: Array, d: Array, tmin: float,
    tile_rows: int = 16, sort: bool = True,
    t_init: Array | None = None,
    any_hit: bool = False,
    coarse: PackedMesh | None = None,
    defer_attrs: bool = True,
    hints: Array | None = None,
    want_tri: bool = True,
    interpret: bool = False,
) -> PacketHit:
    """Packet-traversal closest hit with in-kernel attribute resolution.

    want_tri=False returns the padded SLOT id (post-BVH-reorder) in
    PacketHit.tri instead of the original MeshData triangle id, skipping
    the remap gather (a 1-D gather = ~0.7 ms of per-element scalar loads
    at config-4 wave size). Every integrator/diff consumer only tests
    prim >= sphere-count, so the render path runs with want_tri=False;
    ask for True when original tri identity matters.

    o, d: (N, 3). t_init (N,), optional: per-lane starting hit distance —
    the walk only finds hits strictly CLOSER than it (pass the sphere-pass
    t to prune, or the shadow segment length for an occlusion query);
    lanes with t_init <= 0 are dead and cost nothing. Returns a PacketHit
    whose t equals t_init (or BIG) where no closer mesh hit exists.

    any_hit=True turns the walk into a pure occlusion query: the FIRST
    intersected triangle zeroes the lane's t (t=0 < t_init reads as
    "occluded"), the lane immediately stops expanding boxes, and no
    shading attributes are resolved (tri/n/uv/mat are zeros) — roughly
    half the per-wave cost for shadow rays.

    sort=True groups live rays by direction octant + coarse origin cell
    (dead lanes go LAST, so their tiles skip the whole walk) before
    tiling; results are un-permuted on return.

    coarse (with sort=True) switches to the TWO-PASS binned traversal —
    the structural answer to the incoherent-wave wall (the octant sort's
    tiles still drag every lane through the union of all lanes' leaves):
    a box-only walk of the ~few-hundred-node coarse tree (bin_rays) maps
    each ray to its NEAREST coarse cell; rays then sort by (cell,
    octant, quantized entry depth) so a fine-walk tile's lanes genuinely
    share subtrees, and rays that enter NO coarse cell before t_init —
    provably mesh-miss lanes, e.g. sky-facing bounce rays — are culled
    from the fine walk outright (their tiles skip everything). If the
    coarse tree carries a fine_map (pack_mesh fine_leaf=...), each tile
    additionally walks its first lane's cell subtree FIRST (hint-first
    restart: nearest-first t tightening, then the full walk jumps the
    already-walked range).

    defer_attrs=True (default) keeps the hot leaf loop down to (t, slot)
    tracking; normal/uv/mat resolve after the walk with one packed row
    gather + a vectorized barycentric recompute. defer_attrs=False keeps
    the round-2 in-kernel resolution (A/B baseline).

    hints: (n_tiles, 2) int32 [fine_start, fine_skip) per tile for the
    unsorted path — normally produced internally by the sorted/two-pass
    branch; (0, 0) rows mean "no hint".
    """
    n = o.shape[0]
    if t_init is None:
        t_init = jnp.full((n,), BIG, jnp.float32)
    if sort:
        live = t_init > 0.0
        if coarse is not None:
            cell, btn = bin_rays(coarse, o, d, t_init, tmin,
                                 tile_rows=tile_rows, interpret=interpret)
            has = (cell >= 0) & live
            # minor key: quantized entry distance — lanes entering the
            # cell at similar depths share fine leaves. Bucket size is
            # normalized by the root-AABB diagonal (diag/64 per bucket,
            # ADVICE r4) so the depth keying keeps its resolution for
            # scenes much larger or smaller than Cornell scale.
            root = coarse.nodes[0]
            diag = jnp.sqrt(jnp.sum((root[3:6] - root[0:3]) ** 2))
            tq = jnp.clip(btn * (64.0 / jnp.maximum(diag, 1e-6)),
                          0.0, 63.0).astype(jnp.int32)
            key = jnp.where(
                has, ((cell * 8 + _octant(d)) << 6) | tq,
                jnp.int32(1 << 26),
            )
            t_eff = jnp.where(has, t_init, 0.0)
        else:
            key = packet_sort_key(o, d, alive=live)
            t_eff = t_init
        perm = jnp.argsort(key)
        in_hints = None
        if coarse is not None and coarse.fine_map is not None:
            # per-tile hint = the SPAN of the tile's lanes' coarse cells
            # [cmin..cmax] mapped to fine-tree node ranges (cells are the
            # sort major key, so a tile's cells are contiguous and their
            # fine subtrees are one DFS range). The fine walk descends
            # the whole span first: near-optimal nearest-first
            # t-tightening for EVERY lane, not only the first lane's
            # cell (round-4 behavior), and phase 2 then prunes almost
            # everything. Span bounds come from a VALUE sort of the keys
            # (~0.1 ms) — no full-lane gather needed.
            tile_lanes = tile_rows * LANES
            n_t = -(-n // tile_lanes)
            skey = jnp.sort(key)
            skey = jnp.pad(skey, (0, n_t * tile_lanes - n),
                           constant_values=jnp.int32(1 << 26))
            skey = skey.reshape(n_t, tile_lanes)
            cell_s = skey >> 9  # key = ((cell*8 + oct) << 6) | tq
            valid_s = skey < (1 << 26)
            cmin = jnp.where(valid_s[:, 0], cell_s[:, 0], -1)
            cmax = jnp.max(jnp.where(valid_s, cell_s, -1), axis=1)
            lo = jnp.take(coarse.fine_map[:, 0], jnp.clip(cmin, 0, None))
            hi = jnp.take(coarse.fine_map[:, 1], jnp.clip(cmax, 0, None))
            in_hints = jnp.where(
                (cmin >= 0)[:, None], jnp.stack([lo, hi], axis=1), 0
            )
        # inverse permutation via a second argsort: XLA:TPU's sort at
        # this size (~0.1 ms at 98k) beats the row-scatter formulation
        # (~1 ms) — the round-2 "scatter is 20% cheaper" measurement
        # predates the two-pass path and no longer holds (re-measured
        # round 5, benchmarks/_machinery_probe.py)
        inv = jnp.argsort(perm)
        # One packed (N, 7) row gather instead of 3 separate takes (the
        # same trick as the integrator's bounce-level carry permute).
        packed_rays = jnp.take(
            jnp.concatenate([o, d, t_eff[:, None]], axis=1), perm, axis=0
        )
        hit = intersect_mesh_packet(
            packed, packed_rays[:, 0:3], packed_rays[:, 3:6],
            tmin, tile_rows=tile_rows, sort=False,
            t_init=packed_rays[:, 6], any_hit=any_hit,
            defer_attrs=defer_attrs, hints=in_hints, want_tri=want_tri,
            interpret=interpret,
        )
        if any_hit:
            # occlusion queries only consume t; tri/n/uv/mat are zeros by
            # construction — skip their un-permutes entirely. The take
            # goes through a (N, 1) 2-D shape: XLA lowers a 1-D gather
            # to per-element scalar-memory loads (~0.7 ms at this size)
            # but a row gather to the fast vector path.
            t_u = jnp.take(hit.t[:, None], inv, axis=0)[:, 0]
            if coarse is not None:
                # culled live lanes have no mesh hit before t_init:
                # restore the caller's "no closer hit" convention (the
                # inner call saw t0=0)
                t_u = jnp.where(live & ~has, t_init, t_u)
            return PacketHit(
                t=t_u,
                tri=jnp.zeros((n,), jnp.int32),
                n=jnp.zeros((n, 3), jnp.float32),
                uv=jnp.zeros((n, 2), jnp.float32),
                mat=jnp.zeros((n,), jnp.int32),
            )
        # ONE packed (N, 8) row un-permute for all outputs. A 1-D gather
        # on TPU lowers to per-element scalar loads (~0.7 ms EACH at
        # config-4 wave size — they were 5 of the frame's top-10 ops,
        # benchmarks/_machinery_probe.py + the round-5 device trace);
        # a 2-D row gather costs the same once, not per array. Ints ride
        # as bitcasts (exact).
        bc = lambda a: lax.bitcast_convert_type(a, jnp.float32)[:, None]
        po = jnp.take(
            jnp.concatenate(
                [hit.t[:, None], bc(hit.tri), hit.n, hit.uv, bc(hit.mat)],
                axis=1,
            ),
            inv, axis=0,
        )
        t_u = po[:, 0]
        if coarse is not None:
            # culled live lanes have no mesh hit before t_init: restore
            # the caller's "no closer hit" convention (inner saw t0=0)
            t_u = jnp.where(live & ~has, t_init, t_u)
        ibc = lambda a: lax.bitcast_convert_type(a, jnp.int32)
        return PacketHit(
            t=t_u,
            tri=ibc(po[:, 1]),
            n=po[:, 2:5],
            uv=po[:, 5:7],
            mat=ibc(po[:, 7]),
        )
    tile_lanes = tile_rows * LANES
    # pair-of-tiles kernel instances (see _packet_kernel): round the tile
    # count up to a WALK_PAIR multiple; padded tiles are all-dead and
    # their walks park immediately
    n_tiles = -(-(-(-n // tile_lanes)) // WALK_PAIR) * WALK_PAIR
    rows_total = n_tiles * tile_rows
    pad = rows_total * LANES - n

    def plane(a, fill=0.0):
        return jnp.pad(a, (0, pad), constant_values=fill).reshape(
            rows_total, LANES
        )

    o_planes = tuple(plane(o[:, i]) for i in range(3))
    d_planes = tuple(plane(d[:, i]) for i in range(3))
    t0_plane = plane(t_init, fill=0.0)  # pad lanes are dead
    live_flag = jnp.any(
        (t0_plane > 0.0).reshape(n_tiles, tile_rows * LANES), axis=1
    ).astype(jnp.int32)
    if hints is None:
        hints = jnp.zeros((n_tiles, 2), jnp.int32)
    elif hints.shape[0] < n_tiles:  # caller built hints pre-pair-padding
        hints = jnp.pad(hints, ((0, n_tiles - hints.shape[0]), (0, 0)))
    flags = jnp.concatenate([live_flag[:, None], hints], axis=1)

    leaf_rows = max(1, -(-packed.leaf_size // TRIS_PER_ROW))

    def _run(fl, op, dp, t0p, rt):
        return _run_packet(
            fl, packed.nodes, packed.tri_rows, op, dp, t0p,
            rt, tile_rows, packed.num_nodes, leaf_rows, tmin,
            any_hit=any_hit,
            flat_nodes=36 * packed.num_nodes <= SMEM_NODE_BUDGET,
            defer_attrs=defer_attrs, pair=WALK_PAIR, interpret=interpret,
        )

    if n_tiles <= MAX_TILES_PER_CALL:
        t, idx, nx, ny, nz, tu, tv, mat = _run(
            flags, o_planes, d_planes, t0_plane, rows_total
        )
    else:
        # spec-scale waves burst the scoped SMEM arena in one launch
        # (see MAX_TILES_PER_CALL); chunk along tiles — blocks are
        # independent, so results are bit-identical to one launch
        chunks = []
        for s in range(0, n_tiles, MAX_TILES_PER_CALL):
            e = min(s + MAX_TILES_PER_CALL, n_tiles)
            rs, re = s * tile_rows, e * tile_rows
            chunks.append(_run(
                flags[s:e],
                tuple(p[rs:re] for p in o_planes),
                tuple(p[rs:re] for p in d_planes),
                t0_plane[rs:re], (e - s) * tile_rows,
            ))
        t, idx, nx, ny, nz, tu, tv, mat = (
            jnp.concatenate([c[k] for c in chunks], axis=0)
            for k in range(8)
        )

    def unplane(a):
        return a.reshape(-1)[:n]

    t = unplane(t)
    # "found a mesh hit" == strictly closer than the start distance
    found = t < jnp.where(t_init > 0.0, t_init, 0.0)
    t_out = jnp.where(found, t, jnp.where(t_init > 0.0, t_init, BIG))
    if any_hit:
        # Occlusion mode resolves NO attributes in-kernel; return explicit
        # zeros (not the kernel's idx output, which can alias triangle 0
        # on occluded lanes) so sorted and unsorted any-hit calls agree —
        # only t is meaningful in any-hit mode.
        z = jnp.zeros((n,), jnp.int32)
        return PacketHit(
            t=t_out, tri=z, n=jnp.zeros((n, 3), jnp.float32),
            uv=jnp.zeros((n, 2), jnp.float32), mat=z,
        )
    idx = unplane(idx)
    idx_c = jnp.clip(idx, 0, packed.remap.shape[0] - 1)
    tri = jnp.where(
        found,
        jnp.take(packed.remap, idx_c) if want_tri else idx_c,
        0,
    )
    if defer_attrs:
        # Post-walk attribute resolution: ONE packed row gather from the
        # slot table + ~15 vectorized ops (normal cross, Moller-Trumbore
        # barycentrics recompute, uv interpolation) — the hot leaf loop
        # only tracked (t, slot). Masked to the kernel's zeros-on-miss
        # convention.
        slots = packed.tri_rows.reshape(-1, TRI_STRIDE)
        row = jnp.take(
            slots, jnp.clip(idx, 0, slots.shape[0] - 1), axis=0
        )
        fnd = found[:, None].astype(jnp.float32)
        v0, e1, e2 = row[:, 0:3], row[:, 3:6], row[:, 6:9]
        n_raw = jnp.cross(e1, e2)
        n_len = jnp.sqrt(
            jnp.maximum(jnp.sum(n_raw * n_raw, axis=-1), 1e-20)
        )
        n_out = n_raw / n_len[:, None] * fnd
        p_ = jnp.cross(d, e2)
        det = jnp.sum(e1 * p_, axis=-1)
        inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
        tvv = o - v0
        uu = jnp.sum(tvv * p_, axis=-1) * inv_det
        q_ = jnp.cross(tvv, e1)
        vv = jnp.sum(d * q_, axis=-1) * inv_det
        uv = (
            row[:, 10:12] + uu[:, None] * row[:, 12:14]
            + vv[:, None] * row[:, 14:16]
        ) * fnd
        mat_out = jnp.where(found, row[:, 9].astype(jnp.int32), 0)
        return PacketHit(t=t_out, tri=tri, n=n_out, uv=uv, mat=mat_out)
    return PacketHit(
        t=t_out,
        tri=tri,
        n=jnp.stack([unplane(nx), unplane(ny), unplane(nz)], axis=-1),
        uv=jnp.stack([unplane(tu), unplane(tv)], axis=-1),
        mat=unplane(mat),
    )
