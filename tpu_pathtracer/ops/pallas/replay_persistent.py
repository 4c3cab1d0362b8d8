"""Persistent fused value-and-grad kernel: fwd+bwd at ~full occupancy.

The fused replay kernel (ops/pallas/replay_kernel.py) collapses the
primal and adjoint walks into one pass, but it still unrolls
`max_bounces + 1` static bounce stages over every (pixel, sample) lane —
the same ~42% dead-lane waste the forward side had before the persistent
kernel (ops/pallas/persistent.py). This kernel applies the persistent
path-regeneration scheme to the FUSED fwd+bwd walk: one lane per PIXEL,
and the moment a lane's path dies it immediately starts the next sample
for its own pixel (gated on `completed < spp`), so every wavefront
iteration advances a live path on (nearly) every lane until the frame's
sample budget drains.

Streaming adjoint under regeneration (replay_kernel.py's identity, per
PATH instead of per lane): every BSDF factor / emission term is linear in
its material color A_m / light intensity I_l, so with per-path prefix
radiance C (through vertex b) and per-path totals C_tot:

    dC_tot/dA_m = ( C_tot * nA_m - cA_m ) / A_m
        nA_m = #vertices at material m whose BSDF factor was applied
        cA_m = sum_b [ C_after_b * ok_b - nee_b * act_b ] * 1[mid_b = m]
    dC_tot/dI_l = cI_l / I_l

nA/cA/cI are in-flight per-path running sums; when the path completes
they are FLUSHED into per-lane gradient accumulators
    GA_m += C_tot * nA_m - cA_m        GI_l += cI_l
(the suffix factor appears at path completion — the persistent analogue
of replay_kernel applying it after the unrolled walk). In-flight paths at
the end of the launch are discarded on BOTH sides (their radiance never
enters the pixel mean, their adjoint terms never enter the gradient), so
the differentiated estimator is exactly "MSE of the mean over completed
paths". The MSE cotangent g = 2*(mean - target)/(n_pix*3) is lane-local
here (lane == pixel: the mean is C_sum / n_completed, no cross-lane
reduction needed), applied to GA/GI once at the end of the launch.

Everything happens in ONE pallas_call per gradient: no carried HBM state,
all accumulators live in VMEM/registers for the whole walk. Integrator
math is bounce-for-bounce replay_kernel.py's (reference
pathtracer.cu:112-170 semantics + live NEE/MIS from the dead
scene.h:110-170 machinery), with per-lane vector RR/bounce-cap gates as
in persistent.py (lanes sit at different depths).

Validated on CPU (interpret mode + external threefry uniforms) against
jax.grad of a pure-JAX replica of the regeneration schedule
(tests/test_replay_persistent.py).

Texture-atlas gradients (textured mesh materials) use a TWO-LAUNCH
scheme over the same kernel body. The streaming identity extends
per-TEXEL: every BSDF/NEE factor at a textured vertex is linear in the
bilinear texel, so with per-path totals C_tot

    dC_tot/dT[tap] = sum_b w_tap(b)/texel_b * (ok_b*(C_tot - C_b) + nee_b)

where C_b is the path radiance right after vertex b's emit+NEE terms.
C_tot is unknown at vertex time, and the per-tap sums cannot live in
per-lane registers (they are atlas-shaped), so:

  launch 1 (adjoint mode) walks as before, additionally RECORDING each
  completed path's C_tot into a per-lane slot (slot = sample index,
  3*spp lane tiles) and outputting them;
  launch 2 (scatter mode) REPLAYS the identical schedule (same counter
  RNG streams), and at each textured vertex the whole bracket above is
  now computable lane-locally — the recorded C_tot of the lane's
  current sample slot, the lane-local MSE cotangent g (computed between
  launches from launch 1's L/n_samp), and the live texel. The per-tap
  scatter is the TRANSPOSE of the forward soft-two-hot sampler: per
  sublane row, (TW,128) x-two-hot-times-value contracted against the
  (KTH,128) y-two-hot on the MXU accumulates into a (3*TW, K*TH)
  VMEM-resident gradient block (texT layout), revisited across tiles.
In-flight paths at the end of launch 1 never recorded a C_tot; launch 2
gates on slot < n_samp_final, so both sides of the estimator keep
excluding them consistently.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_pathtracer.models.scene import (
    SPECULAR, TRANSMISSIVE, EPSILON, Scene,
)
from tpu_pathtracer.ops.pallas import mesh_kernel
from tpu_pathtracer.ops.pallas._walk import make_mesh_walk
from tpu_pathtracer.ops.pallas.trace_kernel import (
    LANES, BIG, INV_PI,
    _dot3, _normalize3, _rand, _seed_streams,
    pack_camera, pack_lights, pack_prims,
)


def _preplay_kernel(
    # scalar prefetch: [seed, salt, tile_offset, iteration]
    seed_ref,
    # SMEM operands
    prims_ref,  # (P, 12) f32
    cam_ref,  # (24,) f32 pack_camera layout
    lights_ref,  # (L, 8) f32
    *refs,
    rows: int,
    budget: int,
    spp: int,
    n_prims: int,
    emissive: tuple,
    spec_prims: tuple,
    trans_prims: tuple,
    prims_by_mat: tuple,
    lights_static: tuple,
    n_mats: int,
    use_nee: bool,
    use_dof: bool,
    strat_k: int,
    width: int,
    max_bounces: int,
    rr_start: int,
    tmin: float,
    n_lanes: int,
    inv_loss_n: float,
    external_rng: bool,
    # mesh statics (mesh=False leaves every mesh block untraced);
    # mesh_mats = material ids used by mesh triangles (adjoint routing)
    mesh: bool = False,
    mesh_nodes: int = 0,
    leaf_rows: int = 1,
    mat_types: tuple = (),
    tri_lights_static: tuple = (),  # ((light_idx, mat_id, offset, K), ...)
    mesh_mats: tuple = (),
    # texture statics (tex=False leaves every texture block untraced)
    tex: bool = False,
    tex_k: int = 0,
    tex_th: int = 0,
    tex_tw: int = 0,
    mat_tex: tuple = (),  # per-material texture id (-1 = untextured)
    # record_ct: launch 1 of the texture-gradient scheme — record and
    # output each completed path's C_tot (off for forward-only textured
    # calls, which then skip launch 2 entirely)
    record_ct: bool = False,
    # scatter_mode: launch 2 of the texture-gradient scheme — replay the
    # identical schedule and scatter per-vertex atlas-tap gradients into
    # the (3*TW, K*TH) output (module docstring). No adjoint registers,
    # no loss/partials outputs.
    scatter_mode: bool = False,
    # defer_g: output the GA/GI accumulators PER-LANE instead of folding
    # the lane-local MSE cotangent in the epilogue. This is the chunked
    # sample-budget scheme (spp > 32 textured gradients): each chunk's
    # per-lane sums combine linearly outside the kernel, where the
    # POOLED-mean cotangent (unknown during any single chunk) is applied
    # once. No loss/partials outputs in this mode.
    defer_g: bool = False,
):
    # refs (adjoint mode): [mesh refs?][texT?], [tr_, tg_, tb_ target
    # lanes], [rng?], outputs [lr_o, lg_o, lb_o, ns_o, part_o, loss_o,
    # nrays_o] (+ iff tex 3*spp per-path C_tot slot tiles), then iff
    # mesh the five VMEM walk scratch tiles (+ texture scratch iff tex).
    # refs (scatter mode): [mesh refs][texT], [gr_, gg_, gb_ cotangent
    # lanes], [3*spp C_tot slot tiles], [nsf (completed-count) tile],
    # [rng?], output [gT_o (3*TW, K*TH)], walk + texture + value scratch.
    if mesh:
        matm_ref, mbox_ref, mmeta_ref, tl_ref, mtris_ref = refs[:5]
        refs = refs[5:]
    if tex:
        texT_ref = refs[0]  # (3*TW, K*TH) f32 transposed atlas (VMEM)
        refs = refs[1:]
    if scatter_mode:
        gr_i, gg_i, gb_i = refs[0], refs[1], refs[2]
        ct_refs = refs[3:3 + 3 * spp]
        nsf_ref = refs[3 + 3 * spp]
        refs = refs[4 + 3 * spp:]
    else:
        tr_i, tg_i, tb_i = refs[0], refs[1], refs[2]
        refs = refs[3:]
    rng_ref = refs[0] if external_rng else None
    if external_rng:
        refs = refs[1:]
    if scatter_mode:
        gT_o = refs[0]
        refs = refs[1:]
    elif defer_g:
        lr_o, lg_o, lb_o, ns_o, nrays_o = refs[:5]
        refs = refs[5:]
        if tex and record_ct:
            ct_o = refs[:3 * spp]
            refs = refs[3 * spp:]
        gl_os = refs[:(n_mats + len(lights_static)) * 3]
        refs = refs[(n_mats + len(lights_static)) * 3:]
    else:
        lr_o, lg_o, lb_o, ns_o, part_o, loss_o, nrays_o = refs[:7]
        refs = refs[7:]
        if tex and record_ct:
            ct_o = refs[:3 * spp]
            refs = refs[3 * spp:]
    if mesh:
        walk_scratch = refs[:5]
        refs = refs[5:]
    if tex:
        (s_u, s_v, s_i0, s_i1, s_i2, s_i3, s_w0, s_w1,
         s_txr, s_txg, s_txb) = refs[:11]
        refs = refs[11:]
        walk_scratch = tuple(walk_scratch) + (s_u, s_v)
    if scatter_mode:
        s_vr, s_vg, s_vb = refs[:3]

    n_lights = len(lights_static)
    tile = pl.program_id(0)
    shape = (rows, LANES)
    fzeros = jnp.zeros(shape, jnp.float32)
    # mesh materials can be specular/transmissive without any
    # sphere of that type: gate the delta-lobe blocks on EITHER
    any_spec = bool(spec_prims) or (mesh and SPECULAR in mat_types)
    any_trans = bool(trans_prims) or (mesh and TRANSMISSIVE in mat_types)

    lane = (
        jax.lax.broadcasted_iota(jnp.int32, shape, 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        + (tile + seed_ref[2]) * (rows * LANES)
    )
    in_domain = lane < n_lanes
    px = (lane % width).astype(jnp.float32)
    py = (lane // width).astype(jnp.float32)

    if not external_rng:
        # external_rng supplies every draw; skipping the seed lets the
        # kernel run under the GENERIC pallas interpreter too (multihost
        # CPU tests — the Mosaic interpreter barriers across processes)
        _seed_streams(
            seed_ref[0], seed_ref[3], tile + seed_ref[2], seed_ref[1],
            jnp.int32(0),
        )

    if mesh:
        mesh_walk = make_mesh_walk(
            mbox_ref, mmeta_ref, mtris_ref, walk_scratch,
            shape=shape, tmin=tmin, mesh_nodes=mesh_nodes,
            leaf_rows=leaf_rows, track_uv=tex,
        )
        s_t, s_nx, s_ny, s_nz, s_m = walk_scratch[:5]

    def intersect(ox, oy, oz, dx, dy, dz, alive_m):
        """Unrolled closest-hit over the sphere scene (scene.h:71-94),
        merged with the in-kernel BVH walk for mesh geometry (the same
        structure as persistent.py's intersect; best_p carries the
        sphere winner, -1 on mesh-won lanes so no sphere mask fires)."""
        best_t = fzeros + BIG
        best_p = jnp.zeros(shape, jnp.int32)
        for p in range(n_prims):
            opx = prims_ref[p, 0] - ox
            opy = prims_ref[p, 1] - oy
            opz = prims_ref[p, 2] - oz
            r = prims_ref[p, 3]
            b = _dot3(opx, opy, opz, dx, dy, dz)
            det = b * b - _dot3(opx, opy, opz, opx, opy, opz) + r * r
            sq = jnp.sqrt(jnp.maximum(det, 0.0))
            t0 = b - sq
            t = jnp.where(t0 > tmin, t0, b + sq)  # primitive.h:44 roots
            closer = (det >= 0.0) & (t > tmin) & (t < best_t)
            best_t = jnp.where(closer, t, best_t)
            best_p = jnp.where(closer, p, best_p)
        hit = best_t < (0.5 * BIG)
        hx = ox + dx * best_t
        hy = oy + dy * best_t
        hz = oz + dz * best_t
        nx = fzeros; ny = fzeros; nz = fzeros
        ar = fzeros; ag = fzeros; ab = fzeros
        for p in range(n_prims):
            is_p = best_p == p
            inv_r = 1.0 / prims_ref[p, 3]  # scalar reciprocal
            nx = jnp.where(is_p, (hx - prims_ref[p, 0]) * inv_r, nx)
            ny = jnp.where(is_p, (hy - prims_ref[p, 1]) * inv_r, ny)
            nz = jnp.where(is_p, (hz - prims_ref[p, 2]) * inv_r, nz)
            ar = jnp.where(is_p, prims_ref[p, 4], ar)
            ag = jnp.where(is_p, prims_ref[p, 5], ag)
            ab = jnp.where(is_p, prims_ref[p, 6], ab)
        coef = fzeros
        for p in (*spec_prims, *trans_prims):
            coef = jnp.where(best_p == p, prims_ref[p, 7], coef)
        er = fzeros; eg = fzeros; eb = fzeros
        for p in emissive:
            is_p = best_p == p
            er = jnp.where(is_p, prims_ref[p, 9], er)
            eg = jnp.where(is_p, prims_ref[p, 10], eg)
            eb = jnp.where(is_p, prims_ref[p, 11], eb)
        is_s = jnp.zeros(shape, jnp.bool_)
        for p in spec_prims:
            is_s = is_s | (best_p == p)
        is_t = jnp.zeros(shape, jnp.bool_)
        for p in trans_prims:
            is_t = is_t | (best_p == p)

        if not mesh:
            mesh_closer = jnp.zeros(shape, jnp.bool_)
            tm = fzeros + BIG
            mmat = jnp.zeros(shape, jnp.int32) - 1
            no_tex = jnp.zeros(shape, jnp.bool_)
            return (hit, best_p, hx, hy, hz, nx, ny, nz, ar, ag, ab, coef,
                    is_s, is_t, er, eg, eb, mesh_closer, tm, mmat, no_tex)

        # ---- mesh closest-hit walk, pruned from the sphere-pass t
        t_init = jnp.where(alive_m, best_t, 0.0)
        mesh_walk(ox, oy, oz, dx, dy, dz, t_init, occlusion=False)
        tm = s_t[:, :]
        mesh_closer = alive_m & (tm < best_t) & (tm < (0.5 * BIG))
        mmat = s_m[:, :]
        mnx, mny, mnz = s_nx[:, :], s_ny[:, :], s_nz[:, :]
        inv_len = jax.lax.rsqrt(
            jnp.maximum(mnx * mnx + mny * mny + mnz * mnz, 1e-20)
        )
        hit = hit | mesh_closer
        hx = jnp.where(mesh_closer, ox + dx * tm, hx)
        hy = jnp.where(mesh_closer, oy + dy * tm, hy)
        hz = jnp.where(mesh_closer, oz + dz * tm, hz)
        nx = jnp.where(mesh_closer, mnx * inv_len, nx)
        ny = jnp.where(mesh_closer, mny * inv_len, ny)
        nz = jnp.where(mesh_closer, mnz * inv_len, nz)
        # sphere winner id must not fire on mesh-won lanes (emitter-hit
        # MIS pdfs, cI routing, and the material adjoint masks key on it)
        best_p = jnp.where(mesh_closer, -1, best_p)
        # material dispatch over the (static) material table
        for mi, mt_v in enumerate(mat_types):
            m_mask = mesh_closer & (mmat == mi)
            ar = jnp.where(m_mask, matm_ref[mi, 0], ar)
            ag = jnp.where(m_mask, matm_ref[mi, 1], ag)
            ab = jnp.where(m_mask, matm_ref[mi, 2], ab)
            if mt_v in (SPECULAR, TRANSMISSIVE):
                coef = jnp.where(m_mask, matm_ref[mi, 3], coef)
        ms = jnp.zeros(shape, jnp.bool_)
        mt_b = jnp.zeros(shape, jnp.bool_)
        for mi, mt_v in enumerate(mat_types):
            if mt_v == SPECULAR:
                ms = ms | (mmat == mi)
            elif mt_v == TRANSMISSIVE:
                mt_b = mt_b | (mmat == mi)
        is_s = (is_s & ~mesh_closer) | (mesh_closer & ms)
        is_t = (is_t & ~mesh_closer) | (mesh_closer & mt_b)
        has_tex = jnp.zeros(shape, jnp.bool_)
        if tex:
            # In-kernel bilinear texture sampling — the persistent.py
            # soft-two-hot MXU contraction, op for op (same taps/weights
            # as ops/texture.sample_bilinear): a (K*TH, 128) y-two-hot
            # contracts the transposed atlas on the MXU, a (TW, 128)
            # x-two-hot reduces over sublanes. Launches 1 and 2 run this
            # identical code, so the replayed paths match bit for bit.
            texk = fzeros - 1.0
            for mi, tid in enumerate(mat_tex):
                if tid >= 0:
                    texk = jnp.where(mesh_closer & (mmat == mi),
                                     float(tid), texk)
            has_tex = texk >= 0.0
            u_w = s_u[:, :] - jnp.floor(s_u[:, :])  # wrap to [0, 1)
            v_w = s_v[:, :] - jnp.floor(s_v[:, :])
            x = u_w * tex_tw - 0.5
            y = v_w * tex_th - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            fx = x - x0
            fy = y - y0
            c0 = x0 + jnp.where(x0 < 0.0, float(tex_tw), 0.0)
            c1 = jnp.where(x0 + 1.0 >= tex_tw, x0 + 1.0 - tex_tw, x0 + 1.0)
            base = texk * float(tex_th)
            r0 = y0 + jnp.where(y0 < 0.0, float(tex_th), 0.0) + base
            r1 = (jnp.where(y0 + 1.0 >= tex_th, y0 + 1.0 - tex_th, y0 + 1.0)
                  + base)
            # untextured lanes: index -1 never matches the iota -> all-
            # zero one-hot rows -> texel 0 (masked by has_tex anyway)
            r0 = jnp.where(has_tex, r0, -1.0)
            r1 = jnp.where(has_tex, r1, -1.0)
            n_tex = jnp.sum(has_tex.astype(jnp.int32))

            @pl.when(n_tex > 0)
            def _sample_texture():
                s_i0[:, :] = r0.astype(jnp.int32)
                s_i1[:, :] = r1.astype(jnp.int32)
                s_i2[:, :] = c0.astype(jnp.int32)
                s_i3[:, :] = c1.astype(jnp.int32)
                s_w0[:, :] = fy
                s_w1[:, :] = fx
                kth = tex_k * tex_th
                iot_r = jax.lax.broadcasted_iota(
                    jnp.int32, (kth, LANES), 0)
                iot_c = jax.lax.broadcasted_iota(
                    jnp.int32, (tex_tw, LANES), 0)

                def tex_body(s, _):
                    rr0 = s_i0[pl.ds(s, 1), :]
                    rr1 = s_i1[pl.ds(s, 1), :]
                    cc0 = s_i2[pl.ds(s, 1), :]
                    cc1 = s_i3[pl.ds(s, 1), :]
                    wy = s_w0[pl.ds(s, 1), :]
                    wx = s_w1[pl.ds(s, 1), :]
                    oh1 = (jnp.where(iot_r == rr0, 1.0 - wy, 0.0)
                           + jnp.where(iot_r == rr1, wy, 0.0))
                    m1 = jax.lax.dot_general(
                        texT_ref[:, :], oh1,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (3*TW, 128): y-interpolated column profiles
                    oh2 = (jnp.where(iot_c == cc0, 1.0 - wx, 0.0)
                           + jnp.where(iot_c == cc1, wx, 0.0))
                    for ch, ref in enumerate((s_txr, s_txg, s_txb)):
                        sel = m1[ch * tex_tw:(ch + 1) * tex_tw, :] * oh2
                        ref[pl.ds(s, 1), :] = jnp.sum(
                            sel, axis=0, keepdims=True)
                    return 0

                jax.lax.fori_loop(0, rows, tex_body, 0)

            # texel MODULATES the base color (tex * A) — keeps albedo
            # linear in BOTH mat_color and the texel (adjoint routing)
            ar = jnp.where(has_tex, s_txr[:, :] * ar, ar)
            ag = jnp.where(has_tex, s_txg[:, :] * ag, ag)
            ab = jnp.where(has_tex, s_txb[:, :] * ab, ab)
        # TRI_LIGHT emission: triangles of a tri light's material emit
        # its intensity (front side gated by one_sided downstream)
        er = jnp.where(mesh_closer, 0.0, er)
        eg = jnp.where(mesh_closer, 0.0, eg)
        eb = jnp.where(mesh_closer, 0.0, eb)
        for (li, lmat, _off, _K) in tri_lights_static:
            m_mask = mesh_closer & (mmat == lmat)
            er = jnp.where(m_mask, lights_ref[li, 3], er)
            eg = jnp.where(m_mask, lights_ref[li, 4], eg)
            eb = jnp.where(m_mask, lights_ref[li, 5], eb)
        return (hit, best_p, hx, hy, hz, nx, ny, nz, ar, ag, ab, coef,
                is_s, is_t, er, eg, eb, mesh_closer, tm, mmat, has_tex)

    # ---- walk state (all VMEM-resident for the whole launch)
    Lr = fzeros; Lg = fzeros; Lb = fzeros  # per-pixel completed-path sums
    n_samp = jnp.zeros(shape, jnp.int32)
    ox = fzeros; oy = fzeros; oz = fzeros
    dx = fzeros; dy = fzeros; dz = fzeros
    Tr = fzeros; Tg = fzeros; Tb = fzeros
    Cr = fzeros; Cg = fzeros; Cb = fzeros  # current-path radiance
    bounce = jnp.zeros(shape, jnp.int32)
    alive = jnp.zeros(shape, jnp.bool_)
    prev_pdf = fzeros
    prev_delta = jnp.zeros(shape, jnp.bool_)
    if not scatter_mode:
        # in-flight per-path adjoint
        nA = [fzeros for _ in range(n_mats)]
        cA = [[fzeros, fzeros, fzeros] for _ in range(n_mats)]
        cI = [[fzeros, fzeros, fzeros] for _ in range(n_lights)]
        # completed-path gradient accumulators (suffix applied at flush)
        GA = [[fzeros, fzeros, fzeros] for _ in range(n_mats)]
        GI = [[fzeros, fzeros, fzeros] for _ in range(n_lights)]
        if tex and record_ct:
            # per-path C_tot records, slot = sample index (module
            # docstring: launch 2 needs each completed path's total)
            Ct = [[fzeros, fzeros, fzeros] for _ in range(spp)]
    else:
        # launch-2 constants: the lane-local MSE cotangent, launch 1's
        # recorded per-path totals, and its final completed counts
        g_ct = (gr_i[:, :], gg_i[:, :], gb_i[:, :])
        Ct = [[ct_refs[k * 3 + c][:, :] for c in range(3)]
              for k in range(spp)]
        nsf = nsf_ref[:, :]

        @pl.when(tile == 0)
        def _init_gT():
            gT_o[:, :] = jnp.zeros((3 * tex_tw, tex_k * tex_th),
                                   jnp.float32)

    n_live = jnp.zeros((), jnp.int32)
    kk = strat_k * strat_k
    n_draw = (4 if use_dof else 2) + 3 + (3 if use_nee else 0)

    for it_i in range(budget):
        if external_rng:
            ub = rng_ref[it_i * n_draw * rows:(it_i + 1) * n_draw * rows, :]
        else:
            ub = _rand((n_draw * rows, LANES))
        u_cam = ub[:rows]
        v_cam = ub[rows:2 * rows]
        off = 2
        if use_dof:
            u_lens = ub[off * rows:(off + 1) * rows]
            v_lens = ub[(off + 1) * rows:(off + 2) * rows]
            off += 2
        u1 = ub[off * rows:(off + 1) * rows]
        u2 = ub[(off + 1) * rows:(off + 2) * rows]
        u3 = ub[(off + 2) * rows:(off + 3) * rows]
        off += 3
        if use_nee:
            ul1 = ub[off * rows:(off + 1) * rows]
            ul2 = ub[(off + 1) * rows:(off + 2) * rows]
            usel = ub[(off + 2) * rows:(off + 3) * rows]

        # ---- regenerate: dead lanes with samples remaining start the
        # next path for their own pixel (persistent.py's scheme, gated on
        # the spp budget so the launch drains)
        regen = (~alive) & in_domain & (n_samp < spp)
        if strat_k > 1:
            cell = n_samp % kk
            ccx = (cell % strat_k).astype(jnp.float32)
            ccy = (cell // strat_k).astype(jnp.float32)
            jx = (ccx + u_cam) * (1.0 / strat_k) - 0.5
            jy = (ccy + v_cam) * (1.0 / strat_k) - 0.5
        else:
            jx = u_cam - 0.5
            jy = v_cam - 0.5
        sx = px + jx
        sy = py + jy
        gdx = cam_ref[0] - cam_ref[6] * sy + cam_ref[3] * sx
        gdy = cam_ref[1] - cam_ref[7] * sy + cam_ref[4] * sx
        gdz = cam_ref[2] - cam_ref[8] * sy + cam_ref[5] * sx
        gdx, gdy, gdz = _normalize3(gdx, gdy, gdz)
        gox = fzeros + cam_ref[9]
        goy = fzeros + cam_ref[10]
        goz = fzeros + cam_ref[11]
        if use_dof:
            lens_r = cam_ref[12] * jnp.sqrt(u_lens)
            phi_l = (2.0 * math.pi) * v_lens
            ldu = lens_r * jnp.cos(phi_l)
            ldv = lens_r * jnp.sin(phi_l)
            cos_w = (
                gdx * cam_ref[20] + gdy * cam_ref[21] + gdz * cam_ref[22]
            )
            ft = cam_ref[13] / jnp.maximum(cos_w, 1e-6)
            fpx = gox + gdx * ft
            fpy = goy + gdy * ft
            fpz = goz + gdz * ft
            gox = gox + cam_ref[14] * ldu + cam_ref[17] * ldv
            goy = goy + cam_ref[15] * ldu + cam_ref[18] * ldv
            goz = goz + cam_ref[16] * ldu + cam_ref[19] * ldv
            gdx, gdy, gdz = _normalize3(fpx - gox, fpy - goy, fpz - goz)

        ox = jnp.where(regen, gox, ox)
        oy = jnp.where(regen, goy, oy)
        oz = jnp.where(regen, goz, oz)
        dx = jnp.where(regen, gdx, dx)
        dy = jnp.where(regen, gdy, dy)
        dz = jnp.where(regen, gdz, dz)
        Tr = jnp.where(regen, 1.0, Tr)
        Tg = jnp.where(regen, 1.0, Tg)
        Tb = jnp.where(regen, 1.0, Tb)
        Cr = jnp.where(regen, 0.0, Cr)
        Cg = jnp.where(regen, 0.0, Cg)
        Cb = jnp.where(regen, 0.0, Cb)
        bounce = jnp.where(regen, 0, bounce)
        prev_pdf = jnp.where(regen, 0.0, prev_pdf)
        prev_delta = prev_delta | regen
        if not scatter_mode:
            regf = regen.astype(jnp.float32)
            keepf = 1.0 - regf
            for mi in range(n_mats):
                nA[mi] = nA[mi] * keepf
                for c in range(3):
                    cA[mi][c] = cA[mi][c] * keepf
            for li in range(n_lights):
                for c in range(3):
                    cI[li][c] = cI[li][c] * keepf
        alive = alive | regen

        n_live = n_live + jnp.sum(alive.astype(jnp.int32))

        # ---- trace the pending segment
        (hit, bp, hx, hy, hz, nx, ny, nz, ar, ag, ab, coef, is_s, is_t,
         er, eg, eb, mesh_closer, tm, mmat, has_tex) = intersect(
            ox, oy, oz, dx, dy, dz, alive)
        act = alive & hit
        if mesh:
            # Park non-acting lanes on the origin: a miss lane's hit
            # point is o + d*BIG ~ 1e30, whose square overflows f32 in
            # the vectorized NEE distance math (persistent.py has the
            # same guard; sphere-only reference scenes are closed, so
            # the unguarded form never fired there).
            actf_p = act.astype(jnp.float32)
            hx = hx * actf_p
            hy = hy * actf_p
            hz = hz * actf_p
        wox, woy, woz = dx, dy, dz

        # ---- emitter-hit term (+ MIS weight in NEE mode)
        one_sided = _dot3(nx, ny, nz, -wox, -woy, -woz) > 0.0
        take = (act & one_sided).astype(jnp.float32)
        if use_nee:
            ldp = fzeros
            for li, (ltype, lprim) in enumerate(lights_static):
                if ltype != 1 or lprim < 0:
                    continue
                m = bp == lprim
                dlx = prims_ref[lprim, 0] - ox
                dly = prims_ref[lprim, 1] - oy
                dlz = prims_ref[lprim, 2] - oz
                d2l = _dot3(dlx, dly, dlz, dlx, dly, dlz)
                rl = prims_ref[lprim, 3]
                sin2 = jnp.minimum(rl * rl / jnp.maximum(d2l, 1e-12), 1.0)
                ctm = jnp.sqrt(jnp.maximum(1.0 - sin2, 0.0))
                pc = 1.0 / (2.0 * math.pi * jnp.maximum(1.0 - ctm, 1e-12))
                pc = jnp.where(d2l > rl * rl, pc, 0.0)
                ldp = jnp.where(m, pc * lights_ref[li, 7], ldp)
            for (li, lmat, off, _K) in tri_lights_static:
                # TRI_LIGHT emitter hits: light-sampler solid-angle pdf
                # t^2/cos_l * sel/area (models/integrator.py's lp_tri)
                m = mesh_closer & (mmat == lmat)
                cos_l = jnp.abs(_dot3(nx, ny, nz, wox, woy, woz))
                tt_c = jnp.minimum(tm, 1e6)
                pc = (tt_c * tt_c / jnp.maximum(cos_l, 1e-9)
                      * (lights_ref[li, 7] / jnp.maximum(tl_ref[off, 13],
                                                         1e-20)))
                ldp = jnp.where(m, pc, ldp)
            pp2 = prev_pdf * prev_pdf
            w_emit = jnp.where(
                prev_delta, 1.0, pp2 / jnp.maximum(pp2 + ldp * ldp, 1e-20)
            )
            take = take * w_emit
        e_r = Tr * er * take
        e_g = Tg * eg * take
        e_b = Tb * eb * take
        Cr = Cr + e_r; Cg = Cg + e_g; Cb = Cb + e_b
        if not scatter_mode:
            for li, (ltype, lprim) in enumerate(lights_static):
                if ltype != 1 or lprim < 0:
                    continue
                m = (bp == lprim).astype(jnp.float32)
                cI[li][0] += e_r * m
                cI[li][1] += e_g * m
                cI[li][2] += e_b * m
            for (li, lmat, _off, _K) in tri_lights_static:
                # tri-emitter hits credit their light's intensity adjoint
                m = (mesh_closer & (mmat == lmat)).astype(jnp.float32)
                cI[li][0] += e_r * m
                cI[li][1] += e_g * m
                cI[li][2] += e_b * m

        # ---- next-event estimation (per-light; accumulates cI too)
        is_d = ~(is_s | is_t) if (any_spec or any_trans) else None
        nee_r = fzeros; nee_g = fzeros; nee_b = fzeros
        if use_nee:
            for li, (ltype, lprim) in enumerate(lights_static):
                lo = lights_ref[li, 6]
                sel = lights_ref[li, 7]
                if li == n_lights - 1:
                    m_l = usel >= lo
                else:
                    m_l = (usel >= lo) & (usel < lo + sel)
                ir_l = lights_ref[li, 3]
                ig_l = lights_ref[li, 4]
                ib_l = lights_ref[li, 5]
                if ltype == 1 and lprim >= 0:  # area (sphere) light
                    wrx = prims_ref[lprim, 0] - hx
                    wry = prims_ref[lprim, 1] - hy
                    wrz = prims_ref[lprim, 2] - hz
                    rl = prims_ref[lprim, 3]
                    d2l = _dot3(wrx, wry, wrz, wrx, wry, wrz)
                    inv_dc = jax.lax.rsqrt(jnp.maximum(d2l, 1e-20))
                    wcx = wrx * inv_dc; wcy = wry * inv_dc
                    wcz = wrz * inv_dc
                    sin2 = jnp.minimum(rl * rl / jnp.maximum(d2l, 1e-12), 1.0)
                    ctm = jnp.sqrt(jnp.maximum(1.0 - sin2, 0.0))
                    cth = 1.0 - ul1 * (1.0 - ctm)
                    sth = jnp.sqrt(jnp.maximum(1.0 - cth * cth, 0.0))
                    phi = (2.0 * math.pi) * ul2
                    usex = jnp.abs(wcx) > jnp.abs(wcz)
                    ax = jnp.where(usex, -wcy, 0.0)
                    ay = jnp.where(usex, wcx, -wcz)
                    az = jnp.where(usex, 0.0, wcy)
                    ax, ay, az = _normalize3(ax, ay, az)
                    bx = wcy * az - wcz * ay
                    by = wcz * ax - wcx * az
                    bz = wcx * ay - wcy * ax
                    cp = jnp.cos(phi) * sth
                    sp = jnp.sin(phi) * sth
                    wlx = ax * cp + bx * sp + wcx * cth
                    wly = ay * cp + by * sp + wcy * cth
                    wlz = az * cp + bz * sp + wcz * cth
                    bq = _dot3(wrx, wry, wrz, wlx, wly, wlz)
                    detq = bq * bq - d2l + rl * rl
                    thit = bq - jnp.sqrt(jnp.maximum(detq, 0.0))
                    valid = (detq >= 0.0) & (thit > tmin) & (d2l > rl * rl)
                    inv_rl = 1.0 / rl  # scalar
                    nsx = (hx + wlx * thit - prims_ref[lprim, 0]) * inv_rl
                    nsy = (hy + wly * thit - prims_ref[lprim, 1]) * inv_rl
                    nsz = (hz + wlz * thit - prims_ref[lprim, 2]) * inv_rl
                    front = _dot3(nsx, nsy, nsz, -wlx, -wly, -wlz) > 0.0
                    valid = valid & front
                    pdf_l = sel / (
                        2.0 * math.pi * jnp.maximum(1.0 - ctm, 1e-12)
                    )
                    dist_l = thit
                    rad_r, rad_g, rad_b = ir_l, ig_l, ib_l
                    is_delta = False
                elif ltype == 2:  # TRI_LIGHT (ops/lights._sample_tri_light)
                    off, K = None, 0
                    for (tli, _lm, toff, tK) in tri_lights_static:
                        if tli == li:
                            off, K = toff, tK
                    # area-weighted triangle choice via the cdf-hi chain
                    tl = lambda r_, k_: tl_ref[off + r_, k_]
                    attrs0 = [tl(0, k_) + fzeros for k_ in range(12)]
                    c_lo = fzeros
                    c_hi = fzeros + tl(0, 12)
                    for k in range(1, K):
                        m_k = ul1 > tl(k - 1, 12)
                        attrs0 = [
                            jnp.where(m_k, tl(k, k_), a)
                            for k_, a in enumerate(attrs0)
                        ]
                        c_lo = jnp.where(m_k, tl(k - 1, 12), c_lo)
                        c_hi = jnp.where(m_k, tl(k, 12), c_hi)
                    (v0x, v0y, v0z, e1x_, e1y_, e1z_, e2x_, e2y_, e2z_,
                     nlx, nly, nlz) = attrs0
                    u0r = jnp.clip(
                        (ul1 - c_lo) / jnp.maximum(c_hi - c_lo, 1e-12),
                        0.0, 1.0,
                    )
                    su = jnp.sqrt(u0r)
                    b1s = 1.0 - su
                    b2s = ul2 * su
                    psx = v0x + b1s * e1x_ + b2s * e2x_
                    psy = v0y + b1s * e1y_ + b2s * e2y_
                    psz = v0z + b1s * e1z_ + b2s * e2z_
                    wrx = psx - hx
                    wry = psy - hy
                    wrz = psz - hz
                    d2l = _dot3(wrx, wry, wrz, wrx, wry, wrz)
                    inv_dl = jax.lax.rsqrt(jnp.maximum(d2l, 1e-20))
                    dist_l = d2l * inv_dl
                    wlx = wrx * inv_dl
                    wly = wry * inv_dl
                    wlz = wrz * inv_dl
                    cos_at = -_dot3(nlx, nly, nlz, wlx, wly, wlz)
                    front = cos_at > 0.0
                    area_l = tl_ref[off, 13]
                    pdf_l = sel * d2l / jnp.maximum(
                        jnp.abs(cos_at) * jnp.maximum(area_l, 1e-20), 1e-12
                    )
                    valid = front & (dist_l > tmin)
                    rad_r, rad_g, rad_b = ir_l, ig_l, ib_l
                    is_delta = False
                else:  # point light (scene.h:153-158)
                    wrx = lights_ref[li, 0] - hx
                    wry = lights_ref[li, 1] - hy
                    wrz = lights_ref[li, 2] - hz
                    d2l = _dot3(wrx, wry, wrz, wrx, wry, wrz)
                    inv_dl = jax.lax.rsqrt(jnp.maximum(d2l, 1e-20))
                    dist_l = d2l * inv_dl
                    wlx = wrx * inv_dl; wly = wry * inv_dl
                    wlz = wrz * inv_dl
                    inv_d2 = inv_dl * inv_dl
                    rad_r = ir_l * inv_d2
                    rad_g = ig_l * inv_d2
                    rad_b = ib_l * inv_d2
                    pdf_l = sel + fzeros
                    valid = dist_l > tmin
                    is_delta = True
                smax = dist_l * (1.0 - 1e-3) - tmin
                occ = jnp.zeros(shape, jnp.bool_)
                # Skip the sampled light sphere itself: a valid cone
                # sample's first hit on it is thit > smax by construction
                # (smax = thit*(1-1e-3)-tmin), so it can never occlude —
                # dropping it is bit-identical and saves one quadratic.
                skip_pp = lprim if (ltype == 1 and lprim >= 0) else -1
                for pp in range(n_prims):
                    if pp == skip_pp:
                        continue
                    sx2 = prims_ref[pp, 0] - hx
                    sy2 = prims_ref[pp, 1] - hy
                    sz2 = prims_ref[pp, 2] - hz
                    rb = _dot3(sx2, sy2, sz2, wlx, wly, wlz)
                    rdet = (
                        rb * rb - _dot3(sx2, sy2, sz2, sx2, sy2, sz2)
                        + prims_ref[pp, 3] * prims_ref[pp, 3]
                    )
                    rsq = jnp.sqrt(jnp.maximum(rdet, 0.0))
                    rt = jnp.where(rb - rsq > tmin, rb - rsq, rb + rsq)
                    occ = occ | ((rdet >= 0.0) & (rt > tmin) & (rt < smax))
                if mesh:
                    # mesh any-hit: first occluding triangle zeroes the
                    # lane's walk t; lanes already dead/occluded/invalid
                    # start at 0 and do no box work
                    started = act & m_l & valid & ~occ & (smax > 0.0)
                    mesh_walk(hx, hy, hz, wlx, wly, wlz,
                              jnp.where(started, smax, 0.0),
                              occlusion=True)
                    occ = occ | (started & (s_t[:, :] == 0.0))
                cos_l = _dot3(wlx, wly, wlz, nx, ny, nz)
                support = (cos_l > 0.0) & (
                    _dot3(wox, woy, woz, wlx, wly, wlz) < 0.0
                )
                if any_spec or any_trans:
                    support = support & is_d
                if is_delta:
                    w_mis = 1.0
                else:
                    pdf_b_l = jnp.where(support, cos_l * INV_PI, 0.0)
                    w_mis = (pdf_l * pdf_l) / jnp.maximum(
                        pdf_l * pdf_l + pdf_b_l * pdf_b_l, 1e-20
                    )
                gate = (
                    act & m_l & valid & support & ~occ
                ).astype(jnp.float32)
                scale = gate * cos_l * w_mis / jnp.maximum(pdf_l, 1e-20)
                t_r = Tr * (ar * INV_PI) * rad_r * scale
                t_g = Tg * (ag * INV_PI) * rad_g * scale
                t_b = Tb * (ab * INV_PI) * rad_b * scale
                nee_r += t_r; nee_g += t_g; nee_b += t_b
                if not scatter_mode:
                    cI[li][0] += t_r
                    cI[li][1] += t_g
                    cI[li][2] += t_b
            Cr = Cr + nee_r; Cg = Cg + nee_g; Cb = Cb + nee_b

        # ---- BSDF sampling (scene.h:177-221; polar disk map — see
        # persistent.py's sampling block for the derivation)
        r_d = jnp.sqrt(u1)
        th = (2.0 * math.pi) * u2
        ldx = r_d * jnp.cos(th)
        ldy = r_d * jnp.sin(th)
        ldz = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
        use_x = jnp.abs(nx) > jnp.abs(nz)
        ux = jnp.where(use_x, -ny, 0.0)
        uy = jnp.where(use_x, nx, -nz)
        uz = jnp.where(use_x, 0.0, ny)
        ux, uy, uz = _normalize3(ux, uy, uz)
        vx = ny * uz - nz * uy
        vy = nz * ux - nx * uz
        vz = nx * uy - ny * ux
        wdx = ux * ldx + vx * ldy + nx * ldz
        wdy = uy * ldx + vy * ldy + ny * ldz
        wdz = uz * ldx + vz * ldy + nz * ldz
        pdf_d = jnp.where(
            _dot3(wox, woy, woz, wdx, wdy, wdz) < 0.0,
            ldz * INV_PI, 0.0,
        )

        won = _dot3(wox, woy, woz, nx, ny, nz)
        if any_spec or any_trans:
            # Mirror reflection is invariant under n -> -n (the 2(wo.n)n
            # term flips sign twice), so one reflect serves both the
            # specular lobe and the dielectric's reflected branch.
            wsx = wox - 2.0 * won * nx
            wsy = woy - 2.0 * won * ny
            wsz = woz - 2.0 * won * nz

        if any_trans:
            entering = won < 0.0
            ior = jnp.maximum(coef, 1.0)
            n1 = jnp.where(entering, 1.0, ior)
            n2 = jnp.where(entering, ior, 1.0)
            sgn = jnp.where(entering, 1.0, -1.0)
            nnx = nx * sgn; nny = ny * sgn; nnz = nz * sgn
            cos_i = -(wox * nnx + woy * nny + woz * nnz)
            eta = n1 / n2
            sin2t = eta * eta * (1.0 - cos_i * cos_i)
            cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2t, 0.0))
            r_orth = (n1 * cos_i - n2 * cos_t) / (n1 * cos_i + n2 * cos_t)
            r_par = (n2 * cos_i - n1 * cos_t) / (n2 * cos_i + n1 * cos_t)
            refl = jnp.where(sin2t > 1.0, 1.0,
                             0.5 * (r_orth * r_orth + r_par * r_par))
            do_reflect = u1 < refl
            # The refracted direction is unit by construction: with unit
            # wo and unit nn, |eta*wo + (eta*cos_i - cos_t)*nn|^2 =
            # eta^2(1-cos_i^2) + cos_t^2 = sin2t + cos_t^2 = 1 (when
            # sin2t <= 1; TIR lanes have refl == 1 so do_reflect always
            # selects the reflected branch and the non-unit tx is never
            # used). No re-normalize; reflected branch reuses ws (mirror
            # reflect is invariant under n -> -n).
            txx = wox * eta - (eta * (-cos_i) + cos_t) * nnx
            txy = woy * eta - (eta * (-cos_i) + cos_t) * nny
            txz = woz * eta - (eta * (-cos_i) + cos_t) * nnz
            wtx = jnp.where(do_reflect, wsx, txx)
            wty = jnp.where(do_reflect, wsy, txy)
            wtz = jnp.where(do_reflect, wsz, txz)

        wix, wiy, wiz = wdx, wdy, wdz
        fr, fg, fb = ar * INV_PI, ag * INV_PI, ab * INV_PI
        pdf = pdf_d
        if any_spec:
            wix = jnp.where(is_s, wsx, wix)
            wiy = jnp.where(is_s, wsy, wiy)
            wiz = jnp.where(is_s, wsz, wiz)
            fr = jnp.where(is_s, coef * ar, fr)
            fg = jnp.where(is_s, coef * ag, fg)
            fb = jnp.where(is_s, coef * ab, fb)
        if any_trans:
            wix = jnp.where(is_t, wtx, wix)
            wiy = jnp.where(is_t, wty, wiy)
            wiz = jnp.where(is_t, wtz, wiz)
            fr = jnp.where(is_t, ar, fr)
            fg = jnp.where(is_t, ag, fg)
            fb = jnp.where(is_t, ab, fb)
        if any_spec or any_trans:
            pdf = jnp.where(is_d, pdf_d, 1.0)
        f_black = (fr <= 0.0) & (fg <= 0.0) & (fb <= 0.0)
        contrib_ok = ~f_black & (pdf > 0.0)
        step_ok = act & contrib_ok

        # ---- streaming adjoint: per-path material accumulators.
        # A vertex routes to its material whether the hit is a sphere
        # (bp mask) or a mesh triangle (mmat mask) — the BSDF factor is
        # linear in the SAME mat_color either way.
        okf = step_ok.astype(jnp.float32)
        actf = act.astype(jnp.float32)
        if not scatter_mode:
            for mi, plist in enumerate(prims_by_mat):
                if not plist and mi not in mesh_mats:
                    continue
                mm = jnp.zeros(shape, jnp.bool_)
                for p in plist:
                    mm = mm | (bp == p)
                if mi in mesh_mats:
                    mm = mm | (mesh_closer & (mmat == mi))
                mf = mm.astype(jnp.float32)
                nA[mi] += mf * okf
                cA[mi][0] += (Cr * okf - nee_r * actf) * mf
                cA[mi][1] += (Cg * okf - nee_g * actf) * mf
                cA[mi][2] += (Cb * okf - nee_b * actf) * mf
        else:
            # ---- texture-gradient scatter (module docstring): at a
            # textured vertex the whole per-tap bracket is lane-local —
            # recorded C_tot (slot = current sample index), cotangent g,
            # live texel — so scatter it NOW, transposing the forward
            # soft-two-hot: per sublane row, (TW,128) x-two-hot scaled by
            # the value contracts against the (KTH,128) y-two-hot on the
            # MXU and accumulates into the VMEM-resident gT block.
            # Credit mirrors cA: ok*(C_tot - C_now) + nee*act (C_now has
            # this vertex's emit+NEE added; NEE at the vertex itself
            # carries the texel through ar, emit does not).
            Ctr = fzeros; Ctg = fzeros; Ctb = fzeros
            for k in range(spp):
                mk = n_samp == k
                Ctr = jnp.where(mk, Ct[k][0], Ctr)
                Ctg = jnp.where(mk, Ct[k][1], Ctg)
                Ctb = jnp.where(mk, Ct[k][2], Ctb)
            # only paths that completed in launch 1 recorded a C_tot;
            # in-flight leftovers are excluded from loss AND gradient
            path_rec = n_samp < nsf
            m_sc = act & has_tex & path_rec
            mscf = m_sc.astype(jnp.float32)
            # texel -> 0 forces credit -> 0 channel-wise (the factor is
            # linear in the texel), so the clamp only guards 0/0
            inv_txr = 1.0 / jnp.maximum(s_txr[:, :], 1e-8)
            inv_txg = 1.0 / jnp.maximum(s_txg[:, :], 1e-8)
            inv_txb = 1.0 / jnp.maximum(s_txb[:, :], 1e-8)
            s_vr[:, :] = (g_ct[0] * (okf * (Ctr - Cr) + nee_r * actf)
                          * inv_txr * mscf)
            s_vg[:, :] = (g_ct[1] * (okf * (Ctg - Cg) + nee_g * actf)
                          * inv_txg * mscf)
            s_vb[:, :] = (g_ct[2] * (okf * (Ctb - Cb) + nee_b * actf)
                          * inv_txb * mscf)
            n_sc = jnp.sum(m_sc.astype(jnp.int32))

            @pl.when(n_sc > 0)
            def _scatter():
                kth = tex_k * tex_th
                iot_r = jax.lax.broadcasted_iota(
                    jnp.int32, (kth, LANES), 0)
                iot_c = jax.lax.broadcasted_iota(
                    jnp.int32, (tex_tw, LANES), 0)

                def sc_body(s, _):
                    rr0 = s_i0[pl.ds(s, 1), :]
                    rr1 = s_i1[pl.ds(s, 1), :]
                    cc0 = s_i2[pl.ds(s, 1), :]
                    cc1 = s_i3[pl.ds(s, 1), :]
                    wy = s_w0[pl.ds(s, 1), :]
                    wx = s_w1[pl.ds(s, 1), :]
                    oh1 = (jnp.where(iot_r == rr0, 1.0 - wy, 0.0)
                           + jnp.where(iot_r == rr1, wy, 0.0))
                    oh2 = (jnp.where(iot_c == cc0, 1.0 - wx, 0.0)
                           + jnp.where(iot_c == cc1, wx, 0.0))
                    # stale taps (no textured lane this iteration) ride
                    # zero values -> zero contribution
                    for ch, vref in enumerate((s_vr, s_vg, s_vb)):
                        contrib = jax.lax.dot_general(
                            oh2 * vref[pl.ds(s, 1), :], oh1,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # (TW, KTH)
                        blk = gT_o[ch * tex_tw:(ch + 1) * tex_tw, :]
                        gT_o[ch * tex_tw:(ch + 1) * tex_tw, :] = (
                            blk + contrib)
                    return 0

                jax.lax.fori_loop(0, rows, sc_body, 0)

        # cos/pdf without the vector divide (see persistent.py)
        if any_spec or any_trans:
            cos_wi = jnp.abs(_dot3(wix, wiy, wiz, nx, ny, nz))
            wgt = jnp.where(is_d, math.pi, cos_wi)
        else:
            wgt = math.pi
        Tr = jnp.where(step_ok, Tr * fr * wgt, Tr)
        Tg = jnp.where(step_ok, Tg * fg * wgt, Tg)
        Tb = jnp.where(step_ok, Tb * fb * wgt, Tb)

        # ---- Russian roulette, per-lane gated on bounce depth
        do_rr = bounce > rr_start
        p_cont = jnp.minimum(0.5, jnp.maximum(Tr, jnp.maximum(Tg, Tb)))
        survive = u3 <= p_cont
        boost = step_ok & do_rr & survive & (p_cont > 0.0)
        inv_p = 1.0 / jnp.maximum(p_cont, 1e-20)
        Tr = jnp.where(boost, Tr * inv_p, Tr)
        Tg = jnp.where(boost, Tg * inv_p, Tg)
        Tb = jnp.where(boost, Tb * inv_p, Tb)

        alive_next = step_ok & (survive | ~do_rr) & (bounce < max_bounces)

        # ---- path completion: flush radiance AND adjoint sums
        died = alive & ~alive_next
        diedf = died.astype(jnp.float32)
        Lr = Lr + Cr * diedf
        Lg = Lg + Cg * diedf
        Lb = Lb + Cb * diedf
        if not scatter_mode and tex and record_ct:
            # record the completed path's total into its sample slot
            # (n_samp pre-increment == this path's index)
            for k in range(spp):
                mk = died & (n_samp == k)
                Ct[k][0] = jnp.where(mk, Cr, Ct[k][0])
                Ct[k][1] = jnp.where(mk, Cg, Ct[k][1])
                Ct[k][2] = jnp.where(mk, Cb, Ct[k][2])
        n_samp = n_samp + died.astype(jnp.int32)
        if not scatter_mode:
            for mi, plist in enumerate(prims_by_mat):
                if not plist and mi not in mesh_mats:
                    continue
                GA[mi][0] += (Cr * nA[mi] - cA[mi][0]) * diedf
                GA[mi][1] += (Cg * nA[mi] - cA[mi][1]) * diedf
                GA[mi][2] += (Cb * nA[mi] - cA[mi][2]) * diedf
            for li in range(n_lights):
                GI[li][0] += cI[li][0] * diedf
                GI[li][1] += cI[li][1] * diedf
                GI[li][2] += cI[li][2] * diedf

        # ---- pending ray for the next iteration
        ox = jnp.where(act, hx, ox)
        oy = jnp.where(act, hy, oy)
        oz = jnp.where(act, hz, oz)
        dx = jnp.where(act, wix, dx)
        dy = jnp.where(act, wiy, dy)
        dz = jnp.where(act, wiz, dz)
        prev_pdf = jnp.where(act, pdf, prev_pdf)
        new_delta = (is_s | is_t) if (any_spec or any_trans) \
            else jnp.zeros(shape, jnp.bool_)
        prev_delta = (act & new_delta) | (~act & prev_delta)
        bounce = jnp.where(act, bounce + 1, bounce)
        alive = alive_next

    if scatter_mode:
        return  # gT_o accumulated in-loop; no other outputs

    if defer_g:
        # chunked mode: emit raw per-lane sums; the pooled-mean cotangent
        # is applied outside once every chunk's counts are known
        dom_f = in_domain.astype(jnp.float32)
        for mi in range(n_mats):
            for c in range(3):
                gl_os[mi * 3 + c][:, :] = GA[mi][c]
        for li in range(n_lights):
            for c in range(3):
                gl_os[n_mats * 3 + li * 3 + c][:, :] = GI[li][c]
        lr_o[:, :] = Lr * dom_f
        lg_o[:, :] = Lg * dom_f
        lb_o[:, :] = Lb * dom_f
        ns_o[:, :] = n_samp
        nrays_o[tile, 0] = n_live
        if tex and record_ct:
            for k in range(spp):
                for c in range(3):
                    ct_o[k * 3 + c][:, :] = Ct[k][c]
        return

    # ---- MSE cotangent, lane-local (lane == pixel)
    dom_f = in_domain.astype(jnp.float32)
    have = (n_samp > 0) & in_domain
    havef = have.astype(jnp.float32)
    inv_n = havef / jnp.maximum(n_samp.astype(jnp.float32), 1.0)
    mean_r = Lr * inv_n
    mean_g = Lg * inv_n
    mean_b = Lb * inv_n
    dr = (mean_r - tr_i[:, :]) * havef
    dg = (mean_g - tg_i[:, :]) * havef
    db = (mean_b - tb_i[:, :]) * havef
    loss_o[tile, 0] = jnp.sum(dr * dr + dg * dg + db * db) * inv_loss_n
    # g folded with the 1/n of the pixel mean: each completed path's
    # gradient terms enter through mean = (1/n) sum_k C_tot^k
    gr = dr * (2.0 * inv_loss_n) * inv_n
    gg = dg * (2.0 * inv_loss_n) * inv_n
    gb = db * (2.0 * inv_loss_n) * inv_n

    for mi in range(n_mats):
        part_o[tile, mi * 3 + 0] = jnp.sum(gr * GA[mi][0])
        part_o[tile, mi * 3 + 1] = jnp.sum(gg * GA[mi][1])
        part_o[tile, mi * 3 + 2] = jnp.sum(gb * GA[mi][2])
    for li in range(n_lights):
        base = n_mats * 3 + li * 3
        part_o[tile, base + 0] = jnp.sum(gr * GI[li][0])
        part_o[tile, base + 1] = jnp.sum(gg * GI[li][1])
        part_o[tile, base + 2] = jnp.sum(gb * GI[li][2])

    lr_o[:, :] = Lr * dom_f
    lg_o[:, :] = Lg * dom_f
    lb_o[:, :] = Lb * dom_f
    ns_o[:, :] = n_samp
    nrays_o[tile, 0] = n_live
    if tex and record_ct:
        for k in range(spp):
            for c in range(3):
                ct_o[k * 3 + c][:, :] = Ct[k][c]


@functools.partial(
    jax.jit,
    static_argnames=(
        "spp", "budget", "width", "height", "max_bounces", "rr_start",
        "tile_rows", "use_nee", "use_dof", "strat_k", "interpret",
        "compute_tex_grad", "phase",
    ),
)
def persistent_replay_call(
    scene: Scene,
    cam_packed: Array,  # (24,) f32
    seed: Array,  # (2,) int32 [seed, salt]
    iteration: Array,  # () int32 RNG frame index
    target_lanes: Array,  # (rows_total, LANES, 3) per-PIXEL target
    *,
    spp: int,
    budget: int,
    width: int,
    height: int,
    max_bounces: int = 10,
    rr_start: int = 3,
    tile_rows: int = 32,
    use_nee: bool = False,
    use_dof: bool = False,
    strat_k: int = 2,
    tile_offset: Array | int = 0,
    interpret: bool = False,
    compute_tex_grad: bool = True,
    phase: str = "both",
    ext_g: tuple | None = None,  # phase="scatter": 3 (rows,LANES) planes
    ext_ct: tuple | None = None,  # phase="scatter": 3*spp C_tot planes
    ext_ns: Array | None = None,  # phase="scatter": final counts (i32)
) -> tuple[Array, Array, Array, Array, Array, Array, Array | None]:
    """One persistent fused fwd+bwd launch. Returns (L_sum_lanes
    (rows,LANES,3), n_samp_lanes, loss, gA_raw (M,3), gI_raw (NL,3),
    live_ray_count, gT). Callers divide the raw gradient partials by
    clamp(mat_color)/clamp(light_intensity), as with replay_call. gT is
    None for untextured scenes; for textured mesh scenes it is the
    FINAL dLoss/dtextures (atlas shape, cotangent folded in) from the
    second (scatter) launch — see the module docstring.

    phase selects the chunked-sample-budget protocol (spp > 32 textured
    gradients, VERDICT r4 item 4 — the per-chunk C_tot slots stay <= 32
    lane-tile-triples while the POOLED mean's cotangent is applied
    outside once all chunks have run):
      - "both" (default): adjoint walk + (textured) scatter launch, the
        single-call behavior.
      - "adjoint": adjoint walk only, with DEFERRED cotangent — returns
        (L_lanes, ns, ga_lanes (M,3,rows,LANES), gi_lanes (NL,3,...),
        live_rays, ct_lanes | None); no loss/partials.
      - "scatter": scatter launch only, replaying this call's schedule
        with the externally supplied pooled cotangent planes (ext_g),
        C_tot records (ext_ct) and final counts (ext_ns) — returns gT.
    """
    prims = pack_prims(scene)
    n_prims = int(scene.num_prims)
    if n_prims == 0:
        # sphere-less (pure-mesh) scenes: keep the SMEM operand non-empty
        # (a 0-row BlockSpec is rejected); the unrolled sphere loops
        # range over n_prims == 0 and never read it
        prims = jnp.zeros((1, 12), jnp.float32)
    spec_prims = tuple(
        i for i, t in enumerate(scene.prim_mtypes) if t == SPECULAR
    )
    trans_prims = tuple(
        i for i, t in enumerate(scene.prim_mtypes) if t == TRANSMISSIVE
    )
    n_mats = scene.mat_color.shape[0]
    mids = scene.prim_material_ids
    prims_by_mat = tuple(
        tuple(p for p in range(n_prims) if mids[p] == mi)
        for mi in range(n_mats)
    )
    lights_static = tuple(scene.light_structure)
    lights_tab = pack_lights(scene)
    n_lights = len(lights_static)

    # ---- mesh geometry: the fused walk handles triangles in-kernel, so
    # mesh-material gradients ride the SAME streaming adjoint (the last
    # estimator-class gap between the production trainer and the XLA
    # replay path). Textured materials sample the atlas in-kernel and
    # get ATLAS gradients through the two-launch scatter scheme (module
    # docstring).
    has_mesh = scene.mesh_packed is not None
    mesh_inputs = []
    mesh_specs = []
    mesh_statics = {}
    tex = has_mesh and scene.textures is not None
    tex_grad = tex and compute_tex_grad
    if has_mesh:
        pk = scene.mesh_packed
        if 36 * pk.num_nodes > mesh_kernel.SMEM_NODE_BUDGET:
            raise ValueError(
                f"persistent fused kernel: node table ({pk.num_nodes} "
                "nodes) exceeds the SMEM budget; use the XLA replay path"
            )
        matm = jnp.concatenate(
            [scene.mat_color, scene.mat_coef[:, None]], axis=1
        ).astype(jnp.float32)  # (M_pad, 4)
        mbox = pk.nodes[:, 0:6].reshape(-1)
        mmeta = pk.nodes[:, 6:9].astype(jnp.int32).reshape(-1)
        tls = []
        off = 0
        tl_rows = []
        for li, (ltype, _lp) in enumerate(lights_static):
            K = scene.tri_light_counts[li] if ltype == 2 else 0
            if ltype == 2 and K > 0:
                tls.append((li, int(scene.light_mats[li]), off, K))
                row = jnp.concatenate(
                    [
                        scene.tl_v0[li, :K], scene.tl_e1[li, :K],
                        scene.tl_e2[li, :K], scene.tl_n[li, :K],
                        scene.tl_cdf[li, :K, None],
                        jnp.broadcast_to(scene.tl_area[li], (K,))[:, None],
                    ],
                    axis=1,
                )
                tl_rows.append(row)
                off += K
        tl_tab = (jnp.concatenate(tl_rows, axis=0).astype(jnp.float32)
                  if tl_rows else jnp.zeros((1, 14), jnp.float32))
        smem = lambda arr, nd=2: pl.BlockSpec(
            arr.shape,
            (lambda i, *_: (0, 0)) if nd == 2 else (lambda i, *_: (0,)),
            memory_space=pltpu.SMEM,
        )
        mesh_inputs = [matm, mbox, mmeta, tl_tab, pk.tri_rows]
        mesh_specs = [
            smem(matm), smem(mbox, 1), smem(mmeta, 1), smem(tl_tab),
            pl.BlockSpec(pk.tri_rows.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        mesh_statics = dict(
            mesh=True,
            mesh_nodes=pk.num_nodes,
            leaf_rows=max(1, -(-pk.leaf_size // 8)),
            mat_types=tuple(scene.mat_types),
            tri_lights_static=tuple(tls),
            mesh_mats=tuple(scene.mesh_mats_static),
        )
        if tex:
            if tex_grad and spp > 32:
                raise ValueError(
                    "textured-atlas gradients record per-path totals in "
                    f"3*spp VMEM lane tiles; spp={spp} > 32 per launch — "
                    "persistent_mse_value_and_grad chunks the sample "
                    "budget automatically (phase='adjoint'/'scatter')"
                )
            # transposed atlas for the in-kernel soft-two-hot sampler:
            # texT[ch*TW + x, k*TH + y] = textures[k, y, x, ch]
            K_t, TH, TW, _ = scene.textures.shape
            texT = jnp.transpose(scene.textures, (3, 2, 0, 1)).reshape(
                3 * TW, K_t * TH
            )
            mesh_inputs.append(texT)
            mesh_specs.append(
                pl.BlockSpec(texT.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM)
            )
            mesh_statics.update(
                tex=True, tex_k=K_t, tex_th=TH, tex_tw=TW,
                mat_tex=scene.mat_textures_static,
                record_ct=tex_grad,
            )

    rows_total = target_lanes.shape[0]
    n_tiles = rows_total // tile_rows
    n_lanes = height * width
    n_pix = height * width

    external_rng = bool(interpret)
    n_draw = (4 if use_dof else 2) + 3 + (3 if use_nee else 0)
    kernel = functools.partial(
        _preplay_kernel,
        rows=tile_rows,
        budget=budget,
        spp=spp,
        n_prims=n_prims,
        emissive=tuple(scene.emissive_prims),
        spec_prims=spec_prims,
        trans_prims=trans_prims,
        prims_by_mat=prims_by_mat,
        lights_static=lights_static,
        n_mats=n_mats,
        use_nee=use_nee,
        use_dof=use_dof,
        strat_k=strat_k,
        width=width,
        max_bounces=max_bounces,
        rr_start=rr_start,
        tmin=EPSILON,
        n_lanes=n_lanes,
        inv_loss_n=1.0 / (n_pix * 3),
        external_rng=external_rng,
        defer_g=(phase == "adjoint"),
        **mesh_statics,
    )
    tile_block = lambda i, *_: (i, 0)
    lane_spec = pl.BlockSpec((tile_rows, LANES), tile_block)
    rng_inputs = []
    rng_specs = []
    if external_rng:
        # External threefry uniforms keyed by GLOBAL tile id — the Pallas
        # interpreter stubs the TPU hardware PRNG (see persistent.py).
        rkey = jax.random.fold_in(
            jax.random.fold_in(jax.random.key(2), seed[0] + 131 * seed[1]),
            iteration,
        )
        blk = budget * n_draw * tile_rows
        gtiles = jnp.int32(tile_offset) + jnp.arange(n_tiles, dtype=jnp.int32)
        blocks = jax.vmap(
            lambda t: jax.random.uniform(
                jax.random.fold_in(rkey, t), (blk, LANES), jnp.float32
            )
        )(gtiles)
        rng_inputs.append(blocks.reshape(n_tiles * blk, LANES))
        rng_specs.append(pl.BlockSpec((blk, LANES), tile_block))
    scratch_shapes = []
    if has_mesh:
        scratch_shapes = [
            pltpu.VMEM((tile_rows, LANES), jnp.float32),
            pltpu.VMEM((tile_rows, LANES), jnp.float32),
            pltpu.VMEM((tile_rows, LANES), jnp.float32),
            pltpu.VMEM((tile_rows, LANES), jnp.float32),
            pltpu.VMEM((tile_rows, LANES), jnp.int32),
        ]
        if tex:
            # s_u s_v | tap rows/cols i0-i3 (int32) | weights | texel rgb
            scratch_shapes += (
                [pltpu.VMEM((tile_rows, LANES), jnp.float32)] * 2
                + [pltpu.VMEM((tile_rows, LANES), jnp.int32)] * 4
                + [pltpu.VMEM((tile_rows, LANES), jnp.float32)] * 5
            )
    seed4 = jnp.stack(
        [seed[0], seed[1], jnp.int32(tile_offset), jnp.int32(iteration)]
    )
    k_part = n_mats * 3 + n_lights * 3
    lane_f32 = jax.ShapeDtypeStruct((rows_total, LANES), jnp.float32)
    lane_i32 = jax.ShapeDtypeStruct((rows_total, LANES), jnp.int32)
    n_gl = (n_mats + n_lights) * 3
    if phase != "scatter":
        if phase == "adjoint":
            out_specs_1 = [
                lane_spec, lane_spec, lane_spec, lane_spec,
                pl.BlockSpec(memory_space=pltpu.SMEM),
                *([lane_spec] * (3 * spp) if tex_grad else []),
                *([lane_spec] * n_gl),
            ]
            out_shape_1 = [
                lane_f32, lane_f32, lane_f32, lane_i32,
                jax.ShapeDtypeStruct((n_tiles, 1), jnp.int32),
                *([lane_f32] * (3 * spp) if tex_grad else []),
                *([lane_f32] * n_gl),
            ]
        else:
            out_specs_1 = [
                lane_spec, lane_spec, lane_spec, lane_spec,
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                *([lane_spec] * (3 * spp) if tex_grad else []),
            ]
            out_shape_1 = [
                lane_f32, lane_f32, lane_f32, lane_i32,
                jax.ShapeDtypeStruct((n_tiles, k_part), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, 1), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, 1), jnp.int32),
                *([lane_f32] * (3 * spp) if tex_grad else []),
            ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(prims.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((24,), lambda i, *_: (0,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(lights_tab.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
                *mesh_specs,
                lane_spec, lane_spec, lane_spec,
                *rng_specs,
            ],
            out_specs=out_specs_1,
            scratch_shapes=scratch_shapes,
        )
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape_1,
            interpret=(True if interpret == "generic"
                       else pltpu.InterpretParams() if interpret
                       else False),
        )(
            seed4, prims, cam_packed, lights_tab,
            *mesh_inputs,
            target_lanes[:, :, 0], target_lanes[:, :, 1],
            target_lanes[:, :, 2],
            *rng_inputs,
        )
    if phase == "adjoint":
        lr, lg, lb, ns, nrays = outs[:5]
        rest = outs[5:]
        ct_lanes = tuple(rest[:3 * spp]) if tex_grad else None
        gls = rest[3 * spp:] if tex_grad else rest
        ga_lanes = jnp.stack([
            jnp.stack(gls[mi * 3:mi * 3 + 3]) for mi in range(n_mats)
        ])  # (M, 3, rows, LANES)
        gi_lanes = jnp.stack([
            jnp.stack(gls[n_mats * 3 + li * 3:n_mats * 3 + li * 3 + 3])
            for li in range(n_lights)
        ]) if n_lights else jnp.zeros((0, 3, rows_total, LANES))
        L_lanes = jnp.stack([lr, lg, lb], axis=-1)
        return (L_lanes, ns, ga_lanes, gi_lanes, jnp.sum(nrays), ct_lanes)
    if phase != "scatter":
        lr, lg, lb, ns, partials, loss_p, nrays = outs[:7]
        part = jnp.sum(partials, axis=0)
        gA_raw = part[: n_mats * 3].reshape(n_mats, 3)
        gI_raw = part[n_mats * 3:].reshape(n_lights, 3)
        L_lanes = jnp.stack([lr, lg, lb], axis=-1)

    gT = None
    if tex_grad and phase == "scatter":
        # chunked protocol: replay THIS call's schedule with the pooled
        # cotangent and this chunk's recorded totals/counts
        ct_lanes = tuple(ext_ct)
        g_lanes = list(ext_g)
        ns = ext_ns
    if tex_grad:
        # ---- launch 2: replay the identical schedule and scatter the
        # per-vertex atlas-tap gradients (module docstring). The lane-
        # local MSE cotangent replicates the kernel epilogue's f32 math.
        if phase != "scatter":
            ct_lanes = outs[7:]
            gl = (
                jnp.arange(rows_total * LANES, dtype=jnp.int32)
                .reshape(rows_total, LANES)
                + jnp.int32(tile_offset) * (tile_rows * LANES)
            )
            havef = ((ns > 0) & (gl < n_lanes)).astype(jnp.float32)
            inv_n = havef / jnp.maximum(ns.astype(jnp.float32), 1.0)
            gscale = (2.0 / (n_pix * 3)) * inv_n
            g_lanes = [
                (lr * inv_n - target_lanes[:, :, 0]) * havef * gscale,
                (lg * inv_n - target_lanes[:, :, 1]) * havef * gscale,
                (lb * inv_n - target_lanes[:, :, 2]) * havef * gscale,
            ]
        sc_grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(prims.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((24,), lambda i, *_: (0,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(lights_tab.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.SMEM),
                *mesh_specs,
                *([lane_spec] * (3 + 3 * spp)),
                pl.BlockSpec((tile_rows, LANES), tile_block),  # nsf (i32)
                *rng_specs,
            ],
            out_specs=[
                # constant index map: the gT block stays VMEM-resident
                # and accumulates across the sequential tile grid
                pl.BlockSpec(texT.shape, lambda i, *_: (0, 0)),
            ],
            scratch_shapes=scratch_shapes + [
                pltpu.VMEM((tile_rows, LANES), jnp.float32)
                for _ in range(3)  # s_vr s_vg s_vb
            ],
        )
        (gT_flat,) = pl.pallas_call(
            functools.partial(kernel, scatter_mode=True),
            grid_spec=sc_grid_spec,
            out_shape=[jax.ShapeDtypeStruct(texT.shape, jnp.float32)],
            interpret=(True if interpret == "generic"
                   else pltpu.InterpretParams() if interpret
                   else False),
        )(
            seed4, prims, cam_packed, lights_tab,
            *mesh_inputs,
            *g_lanes,
            *ct_lanes,
            ns,
            *rng_inputs,
        )
        # texT layout -> atlas layout: gT[k, y, x, ch] = flat[ch*TW+x,
        # k*TH+y] (inverse of the transpose above). This is the FINAL
        # dLoss/dtextures — the cotangent is already folded in.
        K_t, TH, TW, _ = scene.textures.shape
        gT = jnp.transpose(
            gT_flat.reshape(3, TW, K_t, TH), (2, 3, 1, 0)
        )

    if phase == "scatter":
        return gT
    return (L_lanes, ns, jnp.sum(loss_p), gA_raw, gI_raw, jnp.sum(nrays),
            gT)


def pixel_lanes_layout(width: int, height: int, tile_rows: int = 32,
                       tiles_multiple: int = 1) -> tuple[int, int]:
    """(rows_total, n_lanes) for the lane == pixel layout."""
    n_lanes = width * height
    tile_lanes = tile_rows * LANES
    n_tiles = -(-n_lanes // tile_lanes)
    n_tiles = -(-n_tiles // tiles_multiple) * tiles_multiple
    return n_tiles * tile_rows, n_lanes


def target_to_lanes(img: Array, rows_total: int) -> Array:
    """(H, W, 3) -> (rows_total, LANES, 3) in the lane == pixel layout."""
    flat = img.reshape(-1, 3)
    pad = rows_total * LANES - flat.shape[0]
    flat = jnp.pad(flat, ((0, pad), (0, 0)))
    return flat.reshape(rows_total, LANES, 3)


def default_budget(spp: int, max_bounces: int) -> int:
    """Enough wavefront iterations to drain spp paths per pixel in
    practice: mean path length on the reference workload is ~3 segments
    (RR after bounce 3), plus slack for the long-path tail. Correctness
    does not depend on this (undrained paths are consistently excluded
    from BOTH the loss and the gradient); it only trades tail samples
    against wasted all-dead iterations."""
    return spp * 4 + max_bounces


def persistent_mse_value_and_grad(
    scene: Scene,
    camera,
    seed: Array,  # (2,) int32
    iteration: Array | int,
    target: Array,  # (H, W, 3)
    *,
    spp: int,
    budget: int | None = None,
    max_bounces: int = 10,
    rr_start: int = 3,
    tile_rows: int = 32,
    use_nee: bool = False,
    strat_k: int = 2,
    interpret: bool = False,
) -> tuple[Array, dict, Array]:
    """Loss + gradients w.r.t. {mat_color, light_intensity} for
    mean((render - target)^2) — the persistent-occupancy counterpart of
    replay_kernel.mse_value_and_grad. Returns (loss, grads, live_rays).

    Textured scenes with spp > 32 route through the CHUNKED protocol
    (persistent_replay_call phase="adjoint"/"scatter"): the per-chunk
    C_tot slot budget stays within VMEM while the pooled-mean cotangent
    is applied once across all chunks — spec-scale sampling rates no
    longer fall back to XLA (VERDICT r4 item 4)."""
    w, h = camera.width, camera.height
    textured = scene.textures is not None and (
        scene.mesh is not None or scene.mesh_packed is not None
    )
    if textured and spp > 32:
        return _chunked_mse_value_and_grad(
            scene, camera, seed, iteration, target, spp=spp,
            budget=budget, max_bounces=max_bounces, rr_start=rr_start,
            tile_rows=tile_rows, use_nee=use_nee, strat_k=strat_k,
            interpret=interpret,
        )
    rows_total, _ = pixel_lanes_layout(w, h, tile_rows)
    aux = target_to_lanes(target, rows_total)
    if budget is None:
        budget = default_budget(spp, max_bounces)
    _, _, loss, gA_raw, gI_raw, nrays, gT = persistent_replay_call(
        scene, pack_camera(camera), seed, jnp.int32(iteration), aux,
        spp=spp, budget=budget, width=w, height=h, max_bounces=max_bounces,
        rr_start=rr_start, tile_rows=tile_rows, use_nee=use_nee,
        use_dof=camera.use_dof, strat_k=strat_k, interpret=interpret,
    )
    gI_full = jnp.zeros_like(scene.light_intensity)
    gI_full = gI_full.at[: gI_raw.shape[0]].set(gI_raw)
    grads = {
        "mat_color": gA_raw / jnp.maximum(scene.mat_color, 1e-8),
        "light_intensity": gI_full / jnp.maximum(
            scene.light_intensity, 1e-8
        ),
    }
    if gT is not None:
        grads["textures"] = gT  # final dLoss/dtextures, no division
    return loss, grads, nrays


def _chunked_mse_value_and_grad(
    scene: Scene,
    camera,
    seed: Array,
    iteration: Array | int,
    target: Array,
    *,
    spp: int,
    budget: int | None,
    max_bounces: int,
    rr_start: int,
    tile_rows: int,
    use_nee: bool,
    strat_k: int,
    interpret: bool,
) -> tuple[Array, dict, Array]:
    """Chunked-sample-budget fused gradients for textured scenes with
    spp > 32 (VERDICT r4 item 4).

    The two-launch atlas scheme records each completed path's C_tot in
    3*spp VMEM lane tiles, capping one launch at spp <= 32. This driver
    splits the sample budget into <= 32-sample chunks, each walking its
    OWN RNG streams (iteration * n_chunks + r), with the cotangent
    DEFERRED (phase="adjoint"): chunks return raw per-lane GA/GI sums
    and C_tot records. The pooled mean over all chunks
    (sum_r L_r / sum_r n_r) then defines the MSE loss; its lane-local
    cotangent g = 2(mean - target)/(n_pix*3) * (1/n_total) is applied
    once — dotted with the summed GA/GI lanes for material/light
    gradients, and fed to each chunk's scatter replay (phase="scatter")
    for the atlas gradient. The estimator is exactly "MSE of the pooled
    mean over completed paths", matching the single-launch convention;
    a replica validates it at ~1e-6 (tests/test_replay_persistent.py)."""
    w, h = camera.width, camera.height
    rows_total, n_lanes = pixel_lanes_layout(w, h, tile_rows)
    aux = target_to_lanes(target, rows_total)
    cp = pack_camera(camera)
    n_chunks = -(-spp // 32)
    sizes = [32] * (spp // 32) + ([spp % 32] if spp % 32 else [])
    it = jnp.int32(iteration)
    chunks = []
    L_tot = jnp.zeros((rows_total, LANES, 3))
    n_tot = jnp.zeros((rows_total, LANES), jnp.int32)
    nrays_tot = jnp.zeros((), jnp.int32)
    gaL = None
    giL = None
    for r, c_spp in enumerate(sizes):
        it_r = it * n_chunks + r  # distinct streams per chunk AND step
        bud_r = (default_budget(c_spp, max_bounces) if budget is None
                 else max(1, -(-budget * c_spp // spp)))
        L, ns, ga, gi, nr, ct = persistent_replay_call(
            scene, cp, seed, it_r, aux, spp=c_spp, budget=bud_r,
            width=w, height=h, max_bounces=max_bounces, rr_start=rr_start,
            tile_rows=tile_rows, use_nee=use_nee, use_dof=camera.use_dof,
            strat_k=strat_k, interpret=interpret, phase="adjoint",
        )
        chunks.append((c_spp, bud_r, it_r, ns, ct))
        L_tot = L_tot + L
        n_tot = n_tot + ns
        nrays_tot = nrays_tot + nr
        gaL = ga if gaL is None else gaL + ga
        giL = gi if giL is None else giL + gi

    # pooled-mean MSE + its lane-local cotangent (the kernel epilogue's
    # f32 math with the POOLED counts)
    lane = jnp.arange(rows_total * LANES, dtype=jnp.int32).reshape(
        rows_total, LANES
    )
    havef = ((n_tot > 0) & (lane < n_lanes)).astype(jnp.float32)
    inv_n = havef / jnp.maximum(n_tot.astype(jnp.float32), 1.0)
    n_pix = w * h
    d = [(L_tot[..., c] * inv_n - aux[..., c]) * havef for c in range(3)]
    loss = sum(jnp.sum(dc * dc) for dc in d) / (n_pix * 3)
    g_lanes = tuple(dc * (2.0 / (n_pix * 3)) * inv_n for dc in d)

    gA_raw = jnp.stack([
        jnp.stack([jnp.sum(g_lanes[c] * gaL[m, c]) for c in range(3)])
        for m in range(gaL.shape[0])
    ])
    n_l = giL.shape[0]
    gI_raw = (jnp.stack([
        jnp.stack([jnp.sum(g_lanes[c] * giL[li, c]) for c in range(3)])
        for li in range(n_l)
    ]) if n_l else jnp.zeros((0, 3)))

    gT = jnp.zeros_like(scene.textures)
    for (c_spp, bud_r, it_r, ns_r, ct_r) in chunks:
        gT = gT + persistent_replay_call(
            scene, cp, seed, it_r, aux, spp=c_spp, budget=bud_r,
            width=w, height=h, max_bounces=max_bounces, rr_start=rr_start,
            tile_rows=tile_rows, use_nee=use_nee, use_dof=camera.use_dof,
            strat_k=strat_k, interpret=interpret, phase="scatter",
            ext_g=g_lanes, ext_ct=ct_r, ext_ns=ns_r,
        )

    gI_full = jnp.zeros_like(scene.light_intensity)
    gI_full = gI_full.at[:gI_raw.shape[0]].set(gI_raw)
    grads = {
        "mat_color": gA_raw / jnp.maximum(scene.mat_color, 1e-8),
        "light_intensity": gI_full / jnp.maximum(
            scene.light_intensity, 1e-8
        ),
        "textures": gT,
    }
    return loss, grads, nrays_tot
