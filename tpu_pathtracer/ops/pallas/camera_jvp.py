"""Tangent kernel: forward-mode JVP through the persistent regeneration
walk, N tangent directions per walk — camera pose AND index of
refraction (round 5: per-material IOR tangent seeds + streaming
Fresnel-score accumulator, see the tan_mats kernel statics).

Closes the ~30x gradient-speed gap for camera parameters (VERDICT r3
item 7): the material/intensity gradients ride the fused streaming
adjoint at ~2 ms/grad, while camera-pose gradients only existed on the
XLA attached-autodiff path at ~78 Mrays/s. This kernel propagates a
BATCH of packed-camera tangents (d pack_camera / d theta_j, a (T, 24)
SMEM operand computed host-side by jax.jacfwd of pack_camera) through
the SAME persistent path-regeneration schedule as the forward kernel
(ops/pallas/persistent.py) and accumulates per-pixel tangent radiance
d(sum L)/d theta_j for every direction alongside the shared primal —
one walk for the whole camera gradient.

Estimator (matches the validated XLA camera estimator,
tests/test_gradients.py::test_grad_camera_pose_matches_fd_edge_free):
  - ATTACHED sampling: the cosine-hemisphere draw is reparameterized
    through the shading frame, so the sampled direction rotates with the
    normal (d wi = d[ONB(n)] @ l with the local sample l detached); the
    diffuse cos/pdf ratio is identically 1 in this frame (cos == l_z by
    construction), so the diffuse throughput tangent is multiplicative.
  - DETACHED discrete decisions: prim selection, one-sided/support
    flags, occlusion, RR survival and the Fresnel coin are fixed; their
    motion contributes edge terms this interior estimator intentionally
    omits (the documented edge-free assumption; silhouette terms live in
    diff/geometry.py for geometry parameters).
  - Per-vertex geometry tangents follow the implicit function theorem on
    the sphere constraint: dt = -(n.do + t n.dd)/(n.d), dp = do + d dt
    + t dd, dn = dp / r.

Scope: sphere AND mesh scenes (the shared in-kernel BVH walk,
ops/pallas/_walk.py — flat triangles contribute dn = 0, so the IFT
position tangent is the only new geometry term); brute-force AND full
NEE+MIS transport with point, sphere-area and TRI_LIGHT lights
(round 5: attached cone/solid-angle sampling tangents, attached light
pdfs and MIS weights, detached occlusion/selection — the transports
every flagship scene actually uses). Not covered: DOF lens sampling
and textured materials — those route to the XLA attached-autodiff
path, which implements the identical estimator, only slower.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_pathtracer.models.scene import SPECULAR, TRANSMISSIVE, EPSILON, Scene
from tpu_pathtracer.ops.pallas import mesh_kernel
from tpu_pathtracer.ops.pallas._walk import make_mesh_walk
from tpu_pathtracer.ops.pallas.trace_kernel import (
    LANES, BIG, INV_PI,
    _dot3, _normalize3, _rand, _seed_streams,
    pack_camera, pack_lights, pack_prims,
)


def _cjvp_kernel(
    seed_ref,  # (4,) int32: [seed, salt, tile_offset, iteration]
    prims_ref,  # (P, 12) f32 SMEM
    cam_ref,  # (24,) f32 SMEM
    dcam_ref,  # (T, 24) f32 SMEM — packed-camera tangents
    lights_ref,  # (L, 8) f32 SMEM
    *refs,
    rows: int,
    budget: int,
    spp: int,
    n_tan: int,
    n_prims: int,
    emissive: tuple,
    spec_prims: tuple,
    trans_prims: tuple,
    lights_static: tuple,
    use_nee: bool,
    strat_k: int,
    width: int,
    max_bounces: int,
    rr_start: int,
    tmin: float,
    n_lanes: int,
    external_rng: bool,
    # mesh statics (mesh=False leaves every mesh block untraced). Flat
    # triangles have dn = 0 (the sphere path's dn = dp/r specializes via
    # inv_r = 0 on mesh-won lanes), so the IFT position tangent
    # dt = -(n.do + t n.dd)/(n.d) is the only new geometry term.
    mesh: bool = False,
    mesh_nodes: int = 0,
    leaf_rows: int = 1,
    mat_types: tuple = (),
    tri_lights_static: tuple = (),  # ((light_idx, mat_id, off, K), ...)
    # ---- IOR tangents (round 5, VERDICT item 3): tangent j with
    # tan_mats[j] == m >= 0 is an index-of-refraction tangent
    # d/d(mat_coef[m]) instead of a camera tangent. Its dcam row is all
    # zero (the camera does not move); instead the refract JVP gains the
    # d(eta)/d(ior) SOURCE term at material-m transmissive vertices
    # (Snell bending — diff/score.py's "attached part"), and the
    # discrete Fresnel coin u < R(ior) contributes through a streaming
    # score accumulator (score factor R'/R | -R'/(1-R), reference
    # scene.h:202-213 semantics; suffix applied at path completion like
    # the fused kernel's GA flush) — BOTH halves of the combined
    # estimator ride the same walk, so the per-pixel tangent is the
    # full d(mean image)/d(mat_coef[m]) and FD-validates against this
    # kernel's own primal.
    tan_mats: tuple = (),  # per-tangent material id, -1 = camera tangent
    tan_sphere_prims: tuple = (),  # per-tangent transmissive sphere prims
    tan_mesh: tuple = (),  # per-tangent: material m has mesh triangles
):
    if mesh:
        matm_ref, mbox_ref, mmeta_ref, tl_ref, mtris_ref = refs[:5]
        refs = refs[5:]
    rng_ref = refs[0] if external_rng else None
    n_in = 1 if external_rng else 0
    outs = refs[n_in:]
    lr_o, lg_o, lb_o = outs[0:3]
    dl_os = outs[3:3 + 3 * n_tan]  # [dlr_0, dlg_0, dlb_0, dlr_1, ...]
    ns_o = outs[3 + 3 * n_tan]
    nrays_o = outs[4 + 3 * n_tan]
    if mesh:
        walk_scratch = outs[5 + 3 * n_tan:10 + 3 * n_tan]

    tile = pl.program_id(0)
    shape = (rows, LANES)
    fzeros = jnp.zeros(shape, jnp.float32)
    T_ = n_tan
    if not tan_mats:
        tan_mats = (-1,) * T_
        tan_sphere_prims = ((),) * T_
        tan_mesh = (False,) * T_
    coef_js = tuple(j for j, m in enumerate(tan_mats) if m >= 0)
    # mesh materials can be specular/transmissive without any
    # sphere of that type: gate the delta-lobe blocks on EITHER
    any_spec = bool(spec_prims) or (mesh and SPECULAR in mat_types)
    any_trans = bool(trans_prims) or (mesh and TRANSMISSIVE in mat_types)

    if mesh:
        mesh_walk = make_mesh_walk(
            mbox_ref, mmeta_ref, mtris_ref, walk_scratch,
            shape=shape, tmin=tmin, mesh_nodes=mesh_nodes,
            leaf_rows=leaf_rows,
        )
        s_t, s_nx, s_ny, s_nz, s_m = walk_scratch

    lane = (
        jax.lax.broadcasted_iota(jnp.int32, shape, 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        + (tile + seed_ref[2]) * (rows * LANES)
    )
    in_domain = lane < n_lanes
    px = (lane % width).astype(jnp.float32)
    py = (lane // width).astype(jnp.float32)

    if not external_rng:
        _seed_streams(seed_ref[0], seed_ref[3], tile + seed_ref[2],
                      seed_ref[1], jnp.int32(1))

    def vz():
        return [fzeros for _ in range(T_)]

    def vz3():
        return vz(), vz(), vz()

    # primal accumulators + per-tangent accumulators (per pixel)
    Lr = fzeros; Lg = fzeros; Lb = fzeros
    dLr, dLg, dLb = vz3()
    n_samp = jnp.zeros(shape, jnp.int32)
    # in-flight path state (primal + per-tangent)
    ox = fzeros; oy = fzeros; oz = fzeros
    dx = fzeros; dy = fzeros; dz = fzeros + 1.0
    tox, toy, toz = vz3()  # tangent of origin
    tdx, tdy, tdz = vz3()  # tangent of direction
    Tr = fzeros; Tg = fzeros; Tb = fzeros
    tTr, tTg, tTb = vz3()
    Cr = fzeros; Cg = fzeros; Cb = fzeros
    tCr, tCg, tCb = vz3()
    if coef_js:
        # streaming score state per IOR tangent: running sum of score
        # factors and of score * C_prefix; the C_tot suffix is applied
        # at path completion (sum_b s_b (C_tot - C_b) = C_tot sS - cS)
        sS = {j: fzeros for j in coef_js}
        cSr = {j: fzeros for j in coef_js}
        cSg = {j: fzeros for j in coef_js}
        cSb = {j: fzeros for j in coef_js}
    bounce = jnp.zeros(shape, jnp.int32)
    alive = jnp.zeros(shape, jnp.bool_)
    # MIS carry (NEE transports): the BSDF pdf that produced the pending
    # ray is DETACHED (a sampling quantity, integrator.py:322), so it
    # carries no tangent; delta-ness is a flag
    prev_pdf = fzeros
    prev_delta = jnp.zeros(shape, jnp.bool_)
    n_live = jnp.zeros((), jnp.int32)
    kk = strat_k * strat_k
    n_draw = 2 + 3 + (3 if use_nee else 0)

    for it_i in range(budget):
        if external_rng:
            ub = rng_ref[it_i * n_draw * rows:(it_i + 1) * n_draw * rows, :]
        else:
            ub = _rand((n_draw * rows, LANES))
        u_cam = ub[:rows]
        v_cam = ub[rows:2 * rows]
        u1 = ub[2 * rows:3 * rows]
        u2 = ub[3 * rows:4 * rows]
        u3 = ub[4 * rows:5 * rows]
        if use_nee:
            ul1 = ub[5 * rows:6 * rows]  # noqa: F841 (stream parity)
            ul2 = ub[6 * rows:7 * rows]  # noqa: F841
            usel = ub[7 * rows:8 * rows]

        # ---- regenerate (with primary-ray tangents)
        done = n_samp >= spp
        regen = (~alive) & in_domain & ~done
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
        inv_g = jax.lax.rsqrt(
            jnp.maximum(gdx * gdx + gdy * gdy + gdz * gdz, 1e-20)
        )
        ndx = gdx * inv_g; ndy = gdy * inv_g; ndz = gdz * inv_g

        ox = jnp.where(regen, fzeros + cam_ref[9], ox)
        oy = jnp.where(regen, fzeros + cam_ref[10], oy)
        oz = jnp.where(regen, fzeros + cam_ref[11], oz)
        dx = jnp.where(regen, ndx, dx)
        dy = jnp.where(regen, ndy, dy)
        dz = jnp.where(regen, ndz, dz)
        one = jnp.where(regen, 1.0, 0.0)
        keep = 1.0 - one
        for j in range(T_):
            dc = lambda k, j=j: dcam_ref[j, k]
            tgx = dc(0) - dc(6) * sy + dc(3) * sx
            tgy = dc(1) - dc(7) * sy + dc(4) * sx
            tgz = dc(2) - dc(8) * sy + dc(5) * sx
            gdot = ndx * tgx + ndy * tgy + ndz * tgz
            # d normalize(g) = (dg - n (n.dg)) / |g|
            tox[j] = jnp.where(regen, fzeros + dc(9), tox[j])
            toy[j] = jnp.where(regen, fzeros + dc(10), toy[j])
            toz[j] = jnp.where(regen, fzeros + dc(11), toz[j])
            tdx[j] = jnp.where(regen, (tgx - ndx * gdot) * inv_g, tdx[j])
            tdy[j] = jnp.where(regen, (tgy - ndy * gdot) * inv_g, tdy[j])
            tdz[j] = jnp.where(regen, (tgz - ndz * gdot) * inv_g, tdz[j])
            tTr[j] = tTr[j] * keep; tTg[j] = tTg[j] * keep
            tTb[j] = tTb[j] * keep
            tCr[j] = tCr[j] * keep; tCg[j] = tCg[j] * keep
            tCb[j] = tCb[j] * keep
        for j in coef_js:
            sS[j] = sS[j] * keep
            cSr[j] = cSr[j] * keep
            cSg[j] = cSg[j] * keep
            cSb[j] = cSb[j] * keep
        Tr = jnp.where(regen, 1.0, Tr); Tg = jnp.where(regen, 1.0, Tg)
        Tb = jnp.where(regen, 1.0, Tb)
        Cr = Cr * keep; Cg = Cg * keep; Cb = Cb * keep
        bounce = jnp.where(regen, 0, bounce)
        prev_pdf = jnp.where(regen, 0.0, prev_pdf)
        prev_delta = prev_delta | regen  # primaries take full credit
        alive = alive | regen
        n_live = n_live + jnp.sum(alive.astype(jnp.int32))

        # ---- intersect (primal, persistent.py min-reduction form)
        best_t = fzeros + BIG
        ts = []
        for p in range(n_prims):
            opx = prims_ref[p, 0] - ox
            opy = prims_ref[p, 1] - oy
            opz = prims_ref[p, 2] - oz
            r = prims_ref[p, 3]
            b = _dot3(opx, opy, opz, dx, dy, dz)
            det = b * b - _dot3(opx, opy, opz, opx, opy, opz) + r * r
            sq = jnp.sqrt(jnp.maximum(det, 0.0))
            t0 = b - sq
            t = jnp.where(t0 > tmin, t0, b + sq)
            tv = jnp.where((det >= 0.0) & (t > tmin), t, BIG)
            ts.append(tv)
            best_t = jnp.minimum(best_t, tv)
        if mesh:
            # mesh closest-hit walk, pruned from the sphere-pass t
            t_init_m = jnp.where(alive, best_t, 0.0)
            mesh_walk(ox, oy, oz, dx, dy, dz, t_init_m, occlusion=False)
            tm = s_t[:, :]
            mesh_closer = alive & (tm < best_t) & (tm < (0.5 * BIG))
            mmat = s_m[:, :]
            best_t = jnp.where(mesh_closer, tm, best_t)
        hit = best_t < (0.5 * BIG)
        act = alive & hit
        actf = act.astype(jnp.float32)
        t_hit = jnp.where(act, best_t, 0.0)  # parked lanes at origin
        hx = ox + dx * t_hit
        hy = oy + dy * t_hit
        hz = oz + dz * t_hit
        cx = fzeros; cy = fzeros; cz = fzeros; inv_r = fzeros
        ar = fzeros; ag = fzeros; ab = fzeros
        is_ps = []
        for p in range(n_prims):
            is_p = ts[p] == best_t
            is_ps.append(is_p)
            cx = jnp.where(is_p, prims_ref[p, 0], cx)
            cy = jnp.where(is_p, prims_ref[p, 1], cy)
            cz = jnp.where(is_p, prims_ref[p, 2], cz)
            inv_r = jnp.where(is_p, 1.0 / prims_ref[p, 3], inv_r)
            ar = jnp.where(is_p, prims_ref[p, 4], ar)
            ag = jnp.where(is_p, prims_ref[p, 5], ag)
            ab = jnp.where(is_p, prims_ref[p, 6], ab)
        nx = (hx - cx) * inv_r
        ny = (hy - cy) * inv_r
        nz = (hz - cz) * inv_r
        coef = fzeros
        for p in (*spec_prims, *trans_prims):
            coef = jnp.where(is_ps[p], prims_ref[p, 7], coef)
        er = fzeros; eg = fzeros; eb = fzeros
        for p in emissive:
            is_p = is_ps[p]
            er = jnp.where(is_p, prims_ref[p, 9], er)
            eg = jnp.where(is_p, prims_ref[p, 10], eg)
            eb = jnp.where(is_p, prims_ref[p, 11], eb)
        is_s = jnp.zeros(shape, jnp.bool_)
        for p in spec_prims:
            is_s = is_s | is_ps[p]
        is_t = jnp.zeros(shape, jnp.bool_)
        for p in trans_prims:
            is_t = is_t | is_ps[p]
        if mesh:
            # merge mesh attributes: normalized geometric normal wins on
            # mesh lanes; inv_r stays 0 there, so dn = dp * inv_r = 0
            # (flat triangle) falls out of the sphere formula below.
            # Sphere winner masks is_ps are naturally all-false on mesh
            # lanes (best_t = tm < every sphere tv).
            mnx, mny, mnz = s_nx[:, :], s_ny[:, :], s_nz[:, :]
            inv_len = jax.lax.rsqrt(
                jnp.maximum(mnx * mnx + mny * mny + mnz * mnz, 1e-20)
            )
            nx = jnp.where(mesh_closer, mnx * inv_len, nx)
            ny = jnp.where(mesh_closer, mny * inv_len, ny)
            nz = jnp.where(mesh_closer, mnz * inv_len, nz)
            for mi, mt_v in enumerate(mat_types):
                m_mask = mesh_closer & (mmat == mi)
                ar = jnp.where(m_mask, matm_ref[mi, 0], ar)
                ag = jnp.where(m_mask, matm_ref[mi, 1], ag)
                ab = jnp.where(m_mask, matm_ref[mi, 2], ab)
                if mt_v in (SPECULAR, TRANSMISSIVE):
                    coef = jnp.where(m_mask, matm_ref[mi, 3], coef)
            ms_ = jnp.zeros(shape, jnp.bool_)
            mt_ = jnp.zeros(shape, jnp.bool_)
            for mi, mt_v in enumerate(mat_types):
                if mt_v == SPECULAR:
                    ms_ = ms_ | (mmat == mi)
                elif mt_v == TRANSMISSIVE:
                    mt_ = mt_ | (mmat == mi)
            is_s = (is_s & ~mesh_closer) | (mesh_closer & ms_)
            is_t = (is_t & ~mesh_closer) | (mesh_closer & mt_)
            er = jnp.where(mesh_closer, 0.0, er)
            eg = jnp.where(mesh_closer, 0.0, eg)
            eb = jnp.where(mesh_closer, 0.0, eb)
            for (li, lmat, _off, _K) in tri_lights_static:
                m_mask = mesh_closer & (mmat == lmat)
                er = jnp.where(m_mask, lights_ref[li, 3], er)
                eg = jnp.where(m_mask, lights_ref[li, 4], eg)
                eb = jnp.where(m_mask, lights_ref[li, 5], eb)

        # per-IOR-tangent vertex mask: this material's transmissive hits
        # (sphere winners or mesh triangles), live lanes only; the
        # ior = max(coef, 1) clamp kills the derivative at coef <= 1
        if coef_js:
            tmaskf = {}
            for j in coef_js:
                mm = jnp.zeros(shape, jnp.bool_)
                for p in tan_sphere_prims[j]:
                    mm = mm | is_ps[p]
                if mesh and tan_mesh[j]:
                    mm = mm | (mesh_closer & (mmat == tan_mats[j]))
                tmaskf[j] = ((mm & act) & (coef > 1.0)).astype(jnp.float32)

        # ---- geometry tangents (IFT on the winner's sphere constraint)
        nd = _dot3(nx, ny, nz, dx, dy, dz)
        nd_safe = jnp.where(
            jnp.abs(nd) > 1e-6, nd, jnp.where(nd >= 0, 1e-6, -1e-6)
        )
        dpx, dpy, dpz = vz3()
        dnx, dny, dnz = vz3()
        for j in range(T_):
            n_do = _dot3(nx, ny, nz, tox[j], toy[j], toz[j])
            n_dd = _dot3(nx, ny, nz, tdx[j], tdy[j], tdz[j])
            dt = -(n_do + t_hit * n_dd) / nd_safe * actf
            dpx[j] = (tox[j] + dx * dt + tdx[j] * t_hit) * actf
            dpy[j] = (toy[j] + dy * dt + tdy[j] * t_hit) * actf
            dpz[j] = (toz[j] + dz * dt + tdz[j] * t_hit) * actf
            dnx[j] = dpx[j] * inv_r
            dny[j] = dpy[j] * inv_r
            dnz[j] = dpz[j] * inv_r

        wox, woy, woz = dx, dy, dz
        twx, twy, twz = tdx, tdy, tdz  # tangents of wo (aliases)

        # ---- emitter-hit with MIS (persistent.py:621-657 semantics).
        # The light sampler's counter-pdf for the incoming direction is
        # ATTACHED for sphere-area lights (it moves with the previous
        # vertex, whose tangent rides the carried origin tangents); the
        # carried BSDF pdf is detached, and tri-emitter counter-pdfs are
        # detached like the integrator's lp_tri (integrator.py:202).
        one_sided = _dot3(nx, ny, nz, -wox, -woy, -woz) > 0.0
        take = (act & one_sided).astype(jnp.float32)
        w_emit = fzeros + 1.0
        dw_emit = vz()
        if use_nee:
            ldp = fzeros
            dldp = vz()
            for li, (ltype, lprim) in enumerate(lights_static):
                if ltype != 1 or lprim < 0:
                    continue
                m = is_ps[lprim]
                elx = prims_ref[lprim, 0] - ox
                ely = prims_ref[lprim, 1] - oy
                elz = prims_ref[lprim, 2] - oz
                e2l = _dot3(elx, ely, elz, elx, ely, elz)
                rl = prims_ref[lprim, 3]
                sin2 = jnp.minimum(rl * rl / jnp.maximum(e2l, 1e-12), 1.0)
                ctm = jnp.sqrt(jnp.maximum(1.0 - sin2, 0.0))
                omc = jnp.maximum(1.0 - ctm, 1e-12)
                pc = 1.0 / (2.0 * math.pi * omc)
                outside = e2l > rl * rl
                pc = jnp.where(outside, pc, 0.0)
                ldp = jnp.where(m, pc * lights_ref[li, 7], ldp)
                for j in range(T_):
                    # prev vertex = the carried origin; d(e) = -do
                    de2l = -2.0 * _dot3(elx, ely, elz,
                                        tox[j], toy[j], toz[j])
                    dsin2 = jnp.where(
                        sin2 < 1.0,
                        -(rl * rl) / jnp.maximum(e2l * e2l, 1e-12) * de2l,
                        0.0,
                    )
                    dctm = jnp.where(
                        ctm > 1e-6, -0.5 * dsin2 / jnp.maximum(ctm, 1e-6),
                        0.0,
                    )
                    dpc = jnp.where(outside, pc / omc * dctm, 0.0)
                    dldp[j] = jnp.where(
                        m, dpc * lights_ref[li, 7], dldp[j]
                    )
            if mesh:
                for (li, lmat, off, _K) in tri_lights_static:
                    # tri emitter hits: detached counter-pdf (lp_tri)
                    m = mesh_closer & (mmat == lmat)
                    cos_le = jnp.abs(_dot3(nx, ny, nz, wox, woy, woz))
                    tt_c = jnp.minimum(tm, 1e6)
                    pc = (tt_c * tt_c / jnp.maximum(cos_le, 1e-9)
                          * (lights_ref[li, 7]
                             / jnp.maximum(tl_ref[off, 13], 1e-20)))
                    ldp = jnp.where(m, pc, ldp)
                    for j in range(T_):
                        dldp[j] = jnp.where(m, 0.0, dldp[j])
            pp2 = prev_pdf * prev_pdf
            denom = jnp.maximum(pp2 + ldp * ldp, 1e-20)
            w_emit = jnp.where(prev_delta, 1.0, pp2 / denom)
            for j in range(T_):
                # stable form d[a/(a+b)] = -w * db/(a+b): a squared
                # denominator overflows f32 when ldp is huge (receiver
                # grazing a light sphere makes the cone pdf ~1e11)
                dw_emit[j] = jnp.where(
                    prev_delta, 0.0,
                    -w_emit * (2.0 * ldp * dldp[j]) / denom,
                )
        Cr = Cr + Tr * er * take * w_emit
        Cg = Cg + Tg * eg * take * w_emit
        Cb = Cb + Tb * eb * take * w_emit
        for j in range(T_):
            tCr[j] = tCr[j] + er * take * (
                tTr[j] * w_emit + Tr * dw_emit[j]
            )
            tCg[j] = tCg[j] + eg * take * (
                tTg[j] * w_emit + Tg * dw_emit[j]
            )
            tCb[j] = tCb[j] + eb * take * (
                tTb[j] * w_emit + Tb * dw_emit[j]
            )

        # ---- NEE (point + sphere-area + TRI_LIGHT, scene.h:150-170 live)
        # with full interior tangents: the light sample is reparameterized
        # through the shading point (attached cone/solid-angle sampling),
        # pdfs and MIS weights carry their motion; occlusion / selection /
        # one-sidedness are detached decisions (edge terms omitted by the
        # documented interior estimator).
        is_d = ~(is_s | is_t) if (any_spec or any_trans) else None
        if use_nee:
            n_lights_s = len(lights_static)
            for li, (ltype, lprim) in enumerate(lights_static):
                lo = lights_ref[li, 6]
                sel = lights_ref[li, 7]
                if li == n_lights_s - 1:
                    m_l = usel >= lo
                else:
                    m_l = (usel >= lo) & (usel < lo + sel)
                ir_l = lights_ref[li, 3]
                ig_l = lights_ref[li, 4]
                ib_l = lights_ref[li, 5]
                dwlx_t, dwly_t, dwlz_t = vz3()
                dpdf_l = vz()
                dfac = vz()  # tangent of the radiance scale factor
                is_delta = False
                if ltype == 1 and lprim >= 0:
                    # sphere-area light: attached cone sampling toward
                    # the sphere (persistent.py:673-715 primal)
                    wrx = prims_ref[lprim, 0] - hx
                    wry = prims_ref[lprim, 1] - hy
                    wrz = prims_ref[lprim, 2] - hz
                    rl = prims_ref[lprim, 3]
                    d2l = _dot3(wrx, wry, wrz, wrx, wry, wrz)
                    inv_dc = jax.lax.rsqrt(jnp.maximum(d2l, 1e-20))
                    wcx = wrx * inv_dc; wcy = wry * inv_dc
                    wcz = wrz * inv_dc
                    sin2 = jnp.minimum(
                        rl * rl / jnp.maximum(d2l, 1e-12), 1.0
                    )
                    ctm = jnp.sqrt(jnp.maximum(1.0 - sin2, 0.0))
                    omc = jnp.maximum(1.0 - ctm, 1e-12)
                    cth = 1.0 - ul1 * (1.0 - ctm)
                    sth = jnp.sqrt(jnp.maximum(1.0 - cth * cth, 0.0))
                    phi = (2.0 * math.pi) * ul2
                    usex = jnp.abs(wcx) > jnp.abs(wcz)
                    gax = jnp.where(usex, -wcy, fzeros)
                    gay = jnp.where(usex, wcx, -wcz)
                    gaz = jnp.where(usex, fzeros, wcy)
                    inv_a = jax.lax.rsqrt(jnp.maximum(
                        gax * gax + gay * gay + gaz * gaz, 1e-20
                    ))
                    ax = gax * inv_a; ay = gay * inv_a; az = gaz * inv_a
                    bx_ = wcy * az - wcz * ay
                    by_ = wcz * ax - wcx * az
                    bz_ = wcx * ay - wcy * ax
                    cphi = jnp.cos(phi)
                    sphi = jnp.sin(phi)
                    cp = cphi * sth
                    sp = sphi * sth
                    wlx = ax * cp + bx_ * sp + wcx * cth
                    wly = ay * cp + by_ * sp + wcy * cth
                    wlz = az * cp + bz_ * sp + wcz * cth
                    bq = _dot3(wrx, wry, wrz, wlx, wly, wlz)
                    detq = bq * bq - d2l + rl * rl
                    sq_d = jnp.sqrt(jnp.maximum(detq, 1e-12))
                    thit = bq - jnp.sqrt(jnp.maximum(detq, 0.0))
                    valid = (detq >= 0.0) & (thit > tmin) & (d2l > rl * rl)
                    inv_rl = 1.0 / rl  # scalar
                    nsx = (hx + wlx * thit - prims_ref[lprim, 0]) * inv_rl
                    nsy = (hy + wly * thit - prims_ref[lprim, 1]) * inv_rl
                    nsz = (hz + wlz * thit - prims_ref[lprim, 2]) * inv_rl
                    front = _dot3(nsx, nsy, nsz,
                                  -wlx, -wly, -wlz) > 0.0
                    valid = valid & front
                    pdf_l = sel / (2.0 * math.pi * omc)
                    dist_l = thit
                    fac = fzeros + 1.0
                    for j in range(T_):
                        # d(wr) = -dp (light center fixed)
                        dd2l = -2.0 * _dot3(wrx, wry, wrz,
                                            dpx[j], dpy[j], dpz[j])
                        dinv_dc = -0.5 * inv_dc * inv_dc * inv_dc * dd2l
                        dwcx = -dpx[j] * inv_dc + wrx * dinv_dc
                        dwcy = -dpy[j] * inv_dc + wry * dinv_dc
                        dwcz = -dpz[j] * inv_dc + wrz * dinv_dc
                        dsin2 = jnp.where(
                            sin2 < 1.0,
                            -(rl * rl) / jnp.maximum(d2l * d2l, 1e-12)
                            * dd2l,
                            0.0,
                        )
                        dctm = jnp.where(
                            ctm > 1e-6,
                            -0.5 * dsin2 / jnp.maximum(ctm, 1e-6), 0.0,
                        )
                        dcth = ul1 * dctm
                        dsth = jnp.where(
                            sth > 1e-6,
                            -cth * dcth / jnp.maximum(sth, 1e-6), 0.0,
                        )
                        # ONB tangents (same pattern as the diffuse
                        # bounce frame)
                        dgax = jnp.where(usex, -dwcy, fzeros)
                        dgay = jnp.where(usex, dwcx, -dwcz)
                        dgaz = jnp.where(usex, fzeros, dwcy)
                        a_dg = ax * dgax + ay * dgay + az * dgaz
                        dax = (dgax - ax * a_dg) * inv_a
                        day = (dgay - ay * a_dg) * inv_a
                        daz = (dgaz - az * a_dg) * inv_a
                        dbx = dwcy * az + wcy * daz - dwcz * ay - wcz * day
                        dby = dwcz * ax + wcz * dax - dwcx * az - wcx * daz
                        dbz = dwcx * ay + wcx * day - dwcy * ax - wcy * dax
                        dcp = cphi * dsth
                        dsp = sphi * dsth
                        dwlx = (dax * cp + ax * dcp + dbx * sp + bx_ * dsp
                                + dwcx * cth + wcx * dcth)
                        dwly = (day * cp + ay * dcp + dby * sp + by_ * dsp
                                + dwcy * cth + wcy * dcth)
                        dwlz = (daz * cp + az * dcp + dbz * sp + bz_ * dsp
                                + dwcz * cth + wcz * dcth)
                        dwlx_t[j] = dwlx
                        dwly_t[j] = dwly
                        dwlz_t[j] = dwlz
                        dpdf_l[j] = pdf_l / omc * dctm
                if ltype == 2 and mesh:
                    # TRI_LIGHT: the sampled point is camera-independent
                    # (dps = 0); tangents flow through the shading point
                    # only (persistent.py:716-763 primal)
                    off, K = None, 0
                    for (tli, _lm, toff, tK) in tri_lights_static:
                        if tli == li:
                            off, K = toff, tK
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
                    abs_ca = jnp.maximum(jnp.abs(cos_at), 1e-9)
                    pdf_l = sel * d2l / jnp.maximum(
                        abs_ca * jnp.maximum(area_l, 1e-20), 1e-12
                    )
                    valid = front & (dist_l > tmin)
                    fac = fzeros + 1.0
                    sgn_ca = jnp.sign(cos_at)
                    for j in range(T_):
                        dd2l = -2.0 * _dot3(wrx, wry, wrz,
                                            dpx[j], dpy[j], dpz[j])
                        dinv_dl = -0.5 * inv_dl * inv_dl * inv_dl * dd2l
                        dwlx = -dpx[j] * inv_dl + wrx * dinv_dl
                        dwly = -dpy[j] * inv_dl + wry * dinv_dl
                        dwlz = -dpz[j] * inv_dl + wrz * dinv_dl
                        dcos_at = -_dot3(nlx, nly, nlz, dwlx, dwly, dwlz)
                        dwlx_t[j] = dwlx
                        dwly_t[j] = dwly
                        dwlz_t[j] = dwlz
                        dpdf_l[j] = pdf_l * (
                            dd2l / jnp.maximum(d2l, 1e-12)
                            - sgn_ca * dcos_at / abs_ca
                        )
                elif ltype == 2:
                    continue  # tri lights need the mesh tables
                if ltype == 0:
                    # point light (scene.h:153-158): delta, 1/d^2 falloff
                    wrx = lights_ref[li, 0] - hx
                    wry = lights_ref[li, 1] - hy
                    wrz = lights_ref[li, 2] - hz
                    d2l = _dot3(wrx, wry, wrz, wrx, wry, wrz)
                    inv_dl = jax.lax.rsqrt(jnp.maximum(d2l, 1e-20))
                    dist_l = d2l * inv_dl
                    wlx = wrx * inv_dl; wly = wry * inv_dl
                    wlz = wrz * inv_dl
                    fac = inv_dl * inv_dl
                    pdf_l = sel + fzeros
                    valid = dist_l > tmin
                    is_delta = True
                    for j in range(T_):
                        dd2l = -2.0 * _dot3(wrx, wry, wrz,
                                            dpx[j], dpy[j], dpz[j])
                        dfac[j] = -fac * fac * dd2l
                        wl_dwr = -_dot3(wlx, wly, wlz,
                                        dpx[j], dpy[j], dpz[j])
                        dwlx_t[j] = (-dpx[j] - wlx * wl_dwr) * inv_dl
                        dwly_t[j] = (-dpy[j] - wly * wl_dwr) * inv_dl
                        dwlz_t[j] = (-dpz[j] - wlz * wl_dwr) * inv_dl
                # ---- shared tail: occlusion (detached), receiver cosine,
                # MIS weight, contribution — all with tangents
                smax = dist_l * (1.0 - 1e-3) - tmin
                occ = jnp.zeros(shape, jnp.bool_)
                skip_pp = lprim if (ltype == 1 and lprim >= 0) else -1
                for pp in range(n_prims):
                    if pp == skip_pp:
                        continue
                    sx2 = prims_ref[pp, 0] - hx
                    sy2 = prims_ref[pp, 1] - hy
                    sz2 = prims_ref[pp, 2] - hz
                    rb = _dot3(sx2, sy2, sz2, wlx, wly, wlz)
                    ts_ = jnp.clip(rb, tmin, smax)
                    d2s = (
                        _dot3(sx2, sy2, sz2, sx2, sy2, sz2)
                        - ts_ * (2.0 * rb - ts_)
                    )
                    occ = occ | (d2s < prims_ref[pp, 3] * prims_ref[pp, 3])
                if mesh:
                    # mesh any-hit (primal only — occlusion is a detached
                    # decision in this estimator)
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
                gate = (act & m_l & valid & support).astype(jnp.float32)
                n_live = n_live + jnp.sum((gate > 0).astype(jnp.int32))
                gate = gate * (~occ).astype(jnp.float32)
                ipl = 1.0 / jnp.maximum(pdf_l, 1e-20)
                if is_delta:
                    w_mis = fzeros + 1.0
                else:
                    pdf_b_l = jnp.where(support, cos_l * INV_PI, 0.0)
                    mden = jnp.maximum(
                        pdf_l * pdf_l + pdf_b_l * pdf_b_l, 1e-20
                    )
                    w_mis = (pdf_l * pdf_l) / mden
                scale = gate * cos_l * w_mis * ipl
                fr_d = ar * INV_PI; fg_d = ag * INV_PI; fb_d = ab * INV_PI
                Cr = Cr + Tr * fr_d * ir_l * fac * scale
                Cg = Cg + Tg * fg_d * ig_l * fac * scale
                Cb = Cb + Tb * fb_d * ib_l * fac * scale
                for j in range(T_):
                    dcos_l = (
                        _dot3(dwlx_t[j], dwly_t[j], dwlz_t[j], nx, ny, nz)
                        + _dot3(wlx, wly, wlz, dnx[j], dny[j], dnz[j])
                    )
                    if is_delta:
                        dw_mis = fzeros
                    else:
                        dpdf_b = jnp.where(support, dcos_l * INV_PI, 0.0)
                        # w = a/(a+b): dw = ((1-w) da - w db)/(a+b) —
                        # the squared-denominator form overflows f32 at
                        # grazing-light cone pdfs (~1e11 -> mden^2 inf)
                        dw_mis = (
                            (1.0 - w_mis) * 2.0 * pdf_l * dpdf_l[j]
                            - w_mis * 2.0 * pdf_b_l * dpdf_b
                        ) / mden
                    dscale = gate * (
                        dcos_l * w_mis * ipl + cos_l * dw_mis * ipl
                        - cos_l * w_mis * dpdf_l[j] * ipl * ipl
                    )
                    tCr[j] = tCr[j] + fr_d * ir_l * (
                        tTr[j] * fac * scale + Tr * dfac[j] * scale
                        + Tr * fac * dscale
                    )
                    tCg[j] = tCg[j] + fg_d * ig_l * (
                        tTg[j] * fac * scale + Tg * dfac[j] * scale
                        + Tg * fac * dscale
                    )
                    tCb[j] = tCb[j] + fb_d * ib_l * (
                        tTb[j] * fac * scale + Tb * dfac[j] * scale
                        + Tb * fac * dscale
                    )

        # ---- attached diffuse bounce: wi = ONB(n) @ l, l detached
        r_d = jnp.sqrt(u1)
        th = (2.0 * math.pi) * u2
        ldx = r_d * jnp.cos(th)
        ldy = r_d * jnp.sin(th)
        ldz = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
        use_x = jnp.abs(nx) > jnp.abs(nz)
        gux = jnp.where(use_x, -ny, fzeros)
        guy = jnp.where(use_x, nx, -nz)
        guz = jnp.where(use_x, fzeros, ny)
        inv_u = jax.lax.rsqrt(
            jnp.maximum(gux * gux + guy * guy + guz * guz, 1e-20)
        )
        ux = gux * inv_u; uy = guy * inv_u; uz = guz * inv_u
        vx = ny * uz - nz * uy
        vy = nz * ux - nx * uz
        vz_ = nx * uy - ny * ux
        wdx = ux * ldx + vx * ldy + nx * ldz
        wdy = uy * ldx + vy * ldy + ny * ldz
        wdz = uz * ldx + vz_ * ldy + nz * ldz
        pdf_d = jnp.where(
            _dot3(wox, woy, woz, wdx, wdy, wdz) < 0.0, ldz * INV_PI, 0.0
        )
        twdx, twdy, twdz = vz3()
        for j in range(T_):
            dgux = jnp.where(use_x, -dny[j], fzeros)
            dguy = jnp.where(use_x, dnx[j], -dnz[j])
            dguz = jnp.where(use_x, fzeros, dny[j])
            u_dg = ux * dgux + uy * dguy + uz * dguz
            dux = (dgux - ux * u_dg) * inv_u
            duy = (dguy - uy * u_dg) * inv_u
            duz = (dguz - uz * u_dg) * inv_u
            dvx = dny[j] * uz + ny * duz - dnz[j] * uy - nz * duy
            dvy = dnz[j] * ux + nz * dux - dnx[j] * uz - nx * duz
            dvz = dnx[j] * uy + nx * duy - dny[j] * ux - ny * dux
            twdx[j] = dux * ldx + dvx * ldy + dnx[j] * ldz
            twdy[j] = duy * ldx + dvy * ldy + dny[j] * ldz
            twdz[j] = duz * ldx + dvz * ldy + dnz[j] * ldz

        won = _dot3(wox, woy, woz, nx, ny, nz)
        if any_spec or any_trans:
            wsx = wox - 2.0 * won * nx
            wsy = woy - 2.0 * won * ny
            wsz = woz - 2.0 * won * nz
            twsx, twsy, twsz = vz3()
            for j in range(T_):
                dwon = (
                    _dot3(twx[j], twy[j], twz[j], nx, ny, nz)
                    + _dot3(wox, woy, woz, dnx[j], dny[j], dnz[j])
                )
                twsx[j] = twx[j] - 2.0 * (dwon * nx + won * dnx[j])
                twsy[j] = twy[j] - 2.0 * (dwon * ny + won * dny[j])
                twsz[j] = twz[j] - 2.0 * (dwon * nz + won * dnz[j])

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
            cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2t, 1e-12))
            r_orth = (n1 * cos_i - n2 * cos_t) / (n1 * cos_i + n2 * cos_t)
            r_par = (n2 * cos_i - n1 * cos_t) / (n2 * cos_i + n1 * cos_t)
            refl = jnp.where(sin2t > 1.0, 1.0,
                             0.5 * (r_orth * r_orth + r_par * r_par))
            do_reflect = u1 < refl  # detached coin
            fac = eta * (-cos_i) + cos_t
            txx = wox * eta - fac * nnx
            txy = woy * eta - fac * nny
            txz = woz * eta - fac * nnz
            wtx = jnp.where(do_reflect, wsx, txx)
            wty = jnp.where(do_reflect, wsy, txy)
            wtz = jnp.where(do_reflect, wsz, txz)
            twtx, twty, twtz = vz3()
            for j in range(T_):
                dnnx = dnx[j] * sgn; dnny = dny[j] * sgn
                dnnz = dnz[j] * sgn
                dcos_i = -(
                    twx[j] * nnx + wox * dnnx + twy[j] * nny + woy * dnny
                    + twz[j] * nnz + woz * dnnz
                )
                dsin2t = eta * eta * (-2.0 * cos_i * dcos_i)
                if tan_mats[j] >= 0:
                    # IOR tangent source: d(ior) = 1 at this material's
                    # vertices (zero elsewhere via the mask); eta = n1/n2
                    # moves, feeding Snell's bend into the chain
                    dn1 = jnp.where(entering, 0.0, tmaskf[j])
                    dn2 = jnp.where(entering, tmaskf[j], 0.0)
                    deta = (dn1 * n2 - n1 * dn2) / (n2 * n2)
                    dsin2t = dsin2t + 2.0 * eta * deta * (1.0 - cos_i * cos_i)
                dcos_t = -0.5 * dsin2t / cos_t
                dfac = eta * (-dcos_i) + dcos_t
                dtxx = twx[j] * eta - dfac * nnx - fac * dnnx
                dtxy = twy[j] * eta - dfac * nny - fac * dnny
                dtxz = twz[j] * eta - dfac * nnz - fac * dnnz
                if tan_mats[j] >= 0:
                    dfac_e = deta * (-cos_i)
                    dtxx = dtxx + wox * deta - dfac_e * nnx
                    dtxy = dtxy + woy * deta - dfac_e * nny
                    dtxz = dtxz + woz * deta - dfac_e * nnz
                twtx[j] = jnp.where(do_reflect, twsx[j], dtxx)
                twty[j] = jnp.where(do_reflect, twsy[j], dtxy)
                twtz[j] = jnp.where(do_reflect, twsz[j], dtxz)

            if coef_js:
                # ---- streaming score term for the detached Fresnel coin
                # (diff/score.py): dR/d(ior) by analytic differentiation
                # of the unpolarized Fresnel above (n1, n2 move with ior;
                # the geometry cos_i is fixed at this vertex for the
                # DISCRETE choice's probability). TIR lanes sit on the
                # R == 1 plateau (dR = 0).
                dn1s = jnp.where(entering, 0.0, 1.0)
                dn2s = jnp.where(entering, 1.0, 0.0)
                detas = (dn1s * n2 - n1 * dn2s) / (n2 * n2)
                dsin2ts = 2.0 * eta * detas * (1.0 - cos_i * cos_i)
                dcos_ts = -0.5 * dsin2ts / cos_t
                ao = n1 * cos_i - n2 * cos_t
                bo = n1 * cos_i + n2 * cos_t
                dao = dn1s * cos_i - dn2s * cos_t - n2 * dcos_ts
                dbo = dn1s * cos_i + dn2s * cos_t + n2 * dcos_ts
                bsafe = jnp.maximum(bo, 1e-9)  # bo > 0 away from grazing
                dro = (dao * bo - ao * dbo) / (bsafe * bsafe)
                cp_ = n2 * cos_i - n1 * cos_t
                dp_ = n2 * cos_i + n1 * cos_t
                dcp = dn2s * cos_i - dn1s * cos_t - n1 * dcos_ts
                ddp = dn2s * cos_i + dn1s * cos_t + n1 * dcos_ts
                dsafe = jnp.maximum(dp_, 1e-9)
                drp = (dcp * dp_ - cp_ * ddp) / (dsafe * dsafe)
                dRv = r_orth * dro + r_par * drp
                dRv = jnp.where(sin2t > 1.0, 0.0, dRv)
                scf = jnp.where(
                    do_reflect,
                    dRv / jnp.maximum(refl, 1e-6),
                    -dRv / jnp.maximum(1.0 - refl, 1e-6),
                )
                for j in coef_js:
                    sc = scf * tmaskf[j]
                    sS[j] += sc
                    # C here includes this vertex's emit+NEE terms, which
                    # do not depend on the coin — the suffix splits after
                    # them (diff/score.py's recurrence)
                    cSr[j] += sc * Cr
                    cSg[j] += sc * Cg
                    cSb[j] += sc * Cb

        wix, wiy, wiz = wdx, wdy, wdz
        twix, twiy, twiz = twdx, twdy, twdz
        fr = ar * INV_PI; fg = ag * INV_PI; fb = ab * INV_PI
        pdf = pdf_d
        if any_spec:
            wix = jnp.where(is_s, wsx, wix)
            wiy = jnp.where(is_s, wsy, wiy)
            wiz = jnp.where(is_s, wsz, wiz)
            for j in range(T_):
                twix[j] = jnp.where(is_s, twsx[j], twix[j])
                twiy[j] = jnp.where(is_s, twsy[j], twiy[j])
                twiz[j] = jnp.where(is_s, twsz[j], twiz[j])
            fr = jnp.where(is_s, coef * ar, fr)
            fg = jnp.where(is_s, coef * ag, fg)
            fb = jnp.where(is_s, coef * ab, fb)
        if any_trans:
            wix = jnp.where(is_t, wtx, wix)
            wiy = jnp.where(is_t, wty, wiy)
            wiz = jnp.where(is_t, wtz, wiz)
            for j in range(T_):
                twix[j] = jnp.where(is_t, twtx[j], twix[j])
                twiy[j] = jnp.where(is_t, twty[j], twiy[j])
                twiz[j] = jnp.where(is_t, twtz[j], twiz[j])
            fr = jnp.where(is_t, ar, fr)
            fg = jnp.where(is_t, ag, fg)
            fb = jnp.where(is_t, ab, fb)
        if any_spec or any_trans:
            pdf = jnp.where(is_d, pdf_d, 1.0)
        f_black = (fr <= 0.0) & (fg <= 0.0) & (fb <= 0.0)
        contrib_ok = ~f_black & (pdf > 0.0)

        # throughput update: diffuse weight = pi*f = albedo (tangent-free
        # in the attached frame, cos == l_z); delta lobes weight = f*cos
        # with cos attached
        step_ok = act & contrib_ok
        if any_spec or any_trans:
            cos_dot = _dot3(wix, wiy, wiz, nx, ny, nz)
            cos_wi = jnp.abs(cos_dot)
            sign_c = jnp.sign(cos_dot)
            wgt = jnp.where(is_d, math.pi, cos_wi)
            for j in range(T_):
                dcos_wi = sign_c * (
                    _dot3(twix[j], twiy[j], twiz[j], nx, ny, nz)
                    + _dot3(wix, wiy, wiz, dnx[j], dny[j], dnz[j])
                )
                dwgt = jnp.where(is_d, 0.0, dcos_wi)
                tTr[j] = jnp.where(step_ok,
                                   tTr[j] * fr * wgt + Tr * fr * dwgt,
                                   tTr[j])
                tTg[j] = jnp.where(step_ok,
                                   tTg[j] * fg * wgt + Tg * fg * dwgt,
                                   tTg[j])
                tTb[j] = jnp.where(step_ok,
                                   tTb[j] * fb * wgt + Tb * fb * dwgt,
                                   tTb[j])
        else:
            wgt = fzeros + math.pi
            for j in range(T_):
                tTr[j] = jnp.where(step_ok, tTr[j] * fr * wgt, tTr[j])
                tTg[j] = jnp.where(step_ok, tTg[j] * fg * wgt, tTg[j])
                tTb[j] = jnp.where(step_ok, tTb[j] * fb * wgt, tTb[j])
        Tr = jnp.where(step_ok, Tr * fr * wgt, Tr)
        Tg = jnp.where(step_ok, Tg * fg * wgt, Tg)
        Tb = jnp.where(step_ok, Tb * fb * wgt, Tb)

        # ---- RR (detached decision, detached boost factor)
        do_rr = bounce > rr_start
        p_cont = jnp.minimum(0.5, jnp.maximum(Tr, jnp.maximum(Tg, Tb)))
        survive = u3 <= p_cont
        boost = step_ok & do_rr & survive & (p_cont > 0.0)
        inv_p = 1.0 / jnp.maximum(p_cont, 1e-20)
        Tr = jnp.where(boost, Tr * inv_p, Tr)
        Tg = jnp.where(boost, Tg * inv_p, Tg)
        Tb = jnp.where(boost, Tb * inv_p, Tb)
        for j in range(T_):
            tTr[j] = jnp.where(boost, tTr[j] * inv_p, tTr[j])
            tTg[j] = jnp.where(boost, tTg[j] * inv_p, tTg[j])
            tTb[j] = jnp.where(boost, tTb[j] * inv_p, tTb[j])

        alive_next = step_ok & (survive | ~do_rr) & (bounce < max_bounces)

        died = alive & ~alive_next
        diedf = died.astype(jnp.float32)
        Lr = Lr + Cr * diedf; Lg = Lg + Cg * diedf; Lb = Lb + Cb * diedf
        for j in range(T_):
            dLr[j] = dLr[j] + tCr[j] * diedf
            dLg[j] = dLg[j] + tCg[j] * diedf
            dLb[j] = dLb[j] + tCb[j] * diedf
        for j in coef_js:
            # score flush: sum_b s_b (C_tot - C_b) = C_tot sS - cS
            dLr[j] = dLr[j] + (Cr * sS[j] - cSr[j]) * diedf
            dLg[j] = dLg[j] + (Cg * sS[j] - cSg[j]) * diedf
            dLb[j] = dLb[j] + (Cb * sS[j] - cSb[j]) * diedf
        n_samp = n_samp + died.astype(jnp.int32)

        ox = jnp.where(act, hx, ox); oy = jnp.where(act, hy, oy)
        oz = jnp.where(act, hz, oz)
        dx = jnp.where(act, wix, dx); dy = jnp.where(act, wiy, dy)
        dz = jnp.where(act, wiz, dz)
        for j in range(T_):
            tox[j] = jnp.where(act, dpx[j], tox[j])
            toy[j] = jnp.where(act, dpy[j], toy[j])
            toz[j] = jnp.where(act, dpz[j], toz[j])
            tdx[j] = jnp.where(act, twix[j], tdx[j])
            tdy[j] = jnp.where(act, twiy[j], tdy[j])
            tdz[j] = jnp.where(act, twiz[j], tdz[j])
        # MIS carry for the next bounce's emitter hits (detached pdf)
        prev_pdf = jnp.where(act, pdf, prev_pdf)
        new_delta = (is_s | is_t) if (any_spec or any_trans) \
            else jnp.zeros(shape, jnp.bool_)
        prev_delta = (act & new_delta) | (~act & prev_delta)
        bounce = jnp.where(act, bounce + 1, bounce)
        alive = alive_next

    dom = in_domain.astype(jnp.float32)
    lr_o[:, :] = Lr * dom; lg_o[:, :] = Lg * dom; lb_o[:, :] = Lb * dom
    for j in range(T_):
        dl_os[3 * j + 0][:, :] = dLr[j] * dom
        dl_os[3 * j + 1][:, :] = dLg[j] * dom
        dl_os[3 * j + 2][:, :] = dLb[j] * dom
    ns_o[:, :] = n_samp
    nrays_o[tile, 0] = n_live


@functools.partial(
    jax.jit,
    static_argnames=("spp", "budget", "width", "height", "max_bounces",
                     "rr_start", "tile_rows", "use_nee", "strat_k",
                     "interpret", "coef_mats"),
)
def camera_jvp_call(
    scene: Scene,
    cam_packed: Array,  # (24,) f32
    dcam: Array,  # (24,) or (T, 24) f32 packed-camera tangent(s)
    seed: Array,  # (2,) int32
    iteration: Array,
    *,
    spp: int,
    budget: int,
    width: int,
    height: int,
    max_bounces: int = 10,
    rr_start: int = 3,
    tile_rows: int = 32,
    use_nee: bool = False,
    strat_k: int = 2,
    tile_offset: Array | int = 0,
    interpret: bool = False,
    coef_mats: tuple = (),
) -> tuple[Array, Array, Array, Array]:
    """One persistent camera-JVP launch, T tangents per walk. Returns
    (L_sum (rows,LANES,3), dL_sum (T,rows,LANES,3), n_samp, live_rays):
    per-pixel primal radiance sums, their directional derivatives along
    each dcam row, and completed-sample counts.

    coef_mats appends one IOR tangent per listed material id AFTER the
    dcam rows: tangent row len(dcam)+k is the full (attached Snell +
    streaming Fresnel score) d(L)/d(mat_coef[coef_mats[k]])."""
    if scene.textures is not None:
        raise ValueError("camera-jvp kernel: textured scenes use the XLA "
                         "path (the interior estimator would need the "
                         "texture's uv-motion term)")
    if dcam.ndim == 1:
        dcam = dcam[None, :]
    if coef_mats:
        dcam = jnp.concatenate(
            [dcam, jnp.zeros((len(coef_mats), 24), dcam.dtype)], axis=0
        )
    n_tan = dcam.shape[0]
    prims = pack_prims(scene)
    n_prims = int(scene.num_prims)
    if n_prims == 0:
        prims = jnp.zeros((1, 12), jnp.float32)  # non-empty SMEM operand
    spec_prims = tuple(
        i for i, t in enumerate(scene.prim_mtypes) if t == SPECULAR
    )
    trans_prims = tuple(
        i for i, t in enumerate(scene.prim_mtypes) if t == TRANSMISSIVE
    )
    lights_static = tuple(scene.light_structure)
    lights_tab = pack_lights(scene)
    n_lanes = width * height
    tile_lanes = tile_rows * LANES
    n_tiles = -(-n_lanes // tile_lanes)
    rows_total = n_tiles * tile_rows

    # mesh geometry: shared in-kernel walk (ops/pallas/_walk.py); flat-
    # triangle tangents need no extra tables (dn = 0), just the walk +
    # material dispatch + TRI emission intensities
    has_mesh = scene.mesh_packed is not None
    if scene.mesh is not None and not has_mesh:
        raise ValueError(
            "camera-jvp kernel walks the packed mesh in-kernel: pack it "
            "first with models.scene.with_packet_mesh(scene)"
        )
    mesh_inputs = []
    mesh_specs = []
    mesh_statics = {}
    if has_mesh:
        pk = scene.mesh_packed
        if 36 * pk.num_nodes > mesh_kernel.SMEM_NODE_BUDGET:
            raise ValueError(
                f"camera-jvp kernel: node table ({pk.num_nodes} nodes) "
                "exceeds the SMEM budget; use the XLA path"
            )
        matm = jnp.concatenate(
            [scene.mat_color, scene.mat_coef[:, None]], axis=1
        ).astype(jnp.float32)
        mbox = pk.nodes[:, 0:6].reshape(-1)
        mmeta = pk.nodes[:, 6:9].astype(jnp.int32).reshape(-1)
        # tri-light rows: [v0(3) e1(3) e2(3) n(3) cdf_hi area] per REAL
        # triangle of each TRI_LIGHT, in light order (static offsets) —
        # same table as the persistent forward kernel
        tls = []
        tl_off = 0
        tl_rows = []
        for li, (ltype, _lp) in enumerate(lights_static):
            K = scene.tri_light_counts[li] if ltype == 2 else 0
            if ltype == 2 and K > 0:
                tls.append((li, int(scene.light_mats[li]), tl_off, K))
                tl_rows.append(jnp.concatenate(
                    [
                        scene.tl_v0[li, :K], scene.tl_e1[li, :K],
                        scene.tl_e2[li, :K], scene.tl_n[li, :K],
                        scene.tl_cdf[li, :K, None],
                        jnp.broadcast_to(scene.tl_area[li], (K,))[:, None],
                    ],
                    axis=1,
                ))
                tl_off += K
        tls = tuple(tls)
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
            tri_lights_static=tls,
        )

    tan_statics = {}
    if coef_mats:
        mids = scene.prim_material_ids
        mesh_trans = set()
        if has_mesh:
            for mi in scene.mesh_mats_static:
                if scene.mat_types[mi] == TRANSMISSIVE:
                    mesh_trans.add(mi)
        n_cam = n_tan - len(coef_mats)
        tan_statics = dict(
            tan_mats=(-1,) * n_cam + tuple(int(m) for m in coef_mats),
            tan_sphere_prims=((),) * n_cam + tuple(
                tuple(p for p in trans_prims if mids[p] == mi)
                for mi in coef_mats
            ),
            tan_mesh=((False,) * n_cam
                      + tuple(mi in mesh_trans for mi in coef_mats)),
        )

    external_rng = bool(interpret)
    n_draw = 2 + 3 + (3 if use_nee else 0)
    kernel = functools.partial(
        _cjvp_kernel,
        rows=tile_rows, budget=budget, spp=spp, n_tan=n_tan,
        n_prims=n_prims,
        emissive=tuple(scene.emissive_prims),
        spec_prims=spec_prims, trans_prims=trans_prims,
        lights_static=lights_static, use_nee=use_nee, strat_k=strat_k,
        width=width, max_bounces=max_bounces, rr_start=rr_start,
        tmin=EPSILON, n_lanes=n_lanes, external_rng=external_rng,
        **mesh_statics,
        **tan_statics,
    )
    tile_block = lambda i, *_: (i, 0)
    lane_spec = pl.BlockSpec((tile_rows, LANES), tile_block)
    rng_inputs = []
    rng_specs = []
    if external_rng:
        rkey = jax.random.fold_in(
            jax.random.fold_in(jax.random.key(3), seed[0] + 131 * seed[1]),
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
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(prims.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((24,), lambda i, *_: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec(dcam.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(lights_tab.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            *mesh_specs,
            *rng_specs,
        ],
        out_specs=[
            *([lane_spec] * (3 + 3 * n_tan + 1)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=scratch_shapes,
    )
    seed4 = jnp.stack(
        [seed[0], seed[1], jnp.int32(tile_offset), jnp.int32(iteration)]
    )
    lane_f32 = jax.ShapeDtypeStruct((rows_total, LANES), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            *([lane_f32] * (3 + 3 * n_tan)),
            jax.ShapeDtypeStruct((rows_total, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, 1), jnp.int32),
        ],
        interpret=(True if interpret == "generic"
                   else pltpu.InterpretParams() if interpret
                   else False),
    )(seed4, prims, cam_packed, dcam, lights_tab, *mesh_inputs,
      *rng_inputs)
    lr, lg, lb = outs[0:3]
    dls = outs[3:3 + 3 * n_tan]
    ns = outs[3 + 3 * n_tan]
    nrays = outs[4 + 3 * n_tan]
    L = jnp.stack([lr, lg, lb], axis=-1)
    dL = jnp.stack(
        [jnp.stack(dls[3 * j:3 * j + 3], axis=-1) for j in range(n_tan)]
    )
    return L, dL, ns, jnp.sum(nrays)


def camera_weighted_grad(
    scene: Scene,
    camera,
    seed: Array,
    weights: Array,  # (H, W, 3) adjoint image (dLoss/dpixel)
    *,
    spp: int,
    max_bounces: int = 10,
    rr_start: int = 3,
    budget: int | None = None,
    tile_rows: int = 32,
    use_nee: bool = False,
    strat_k: int = 2,
    iteration: Array | int = 0,
    params: tuple = ("pos",),
    interpret: bool = False,
) -> tuple[Array, dict]:
    """sum(weights * image) and its gradient w.r.t. the named camera
    fields — ONE tangent-batched kernel walk per field (all of a field's
    scalar components ride the same walk). Returns (value, {name: grad}).

    The camera enters through pack_camera: d(packed)/d(param) is a tiny
    host-side jacfwd; the kernel propagates every packed-camera tangent
    row alongside the shared primal."""
    w, h = camera.width, camera.height
    if budget is None:
        budget = spp * 4 + max_bounces
    call = functools.partial(
        camera_jvp_call,
        spp=spp, budget=budget, width=w, height=h,
        max_bounces=max_bounces, rr_start=rr_start, tile_rows=tile_rows,
        use_nee=use_nee, strat_k=strat_k, interpret=interpret,
    )
    grads = {}
    value = None
    it = jnp.int32(iteration)
    for name in params:
        base = getattr(camera, name)
        flat = jnp.ravel(jnp.asarray(base, jnp.float32))

        def packed_of(v, name=name, base=base):
            return pack_camera(
                camera.replace(**{name: jnp.reshape(v, jnp.shape(base))})
            )

        jac = jax.jacfwd(packed_of)(flat)  # (24, n)
        L, dL, ns, _ = call(
            scene, pack_camera(camera), jac.T, seed, it
        )
        nsafe = jnp.maximum(ns, 1).astype(jnp.float32)[..., None]
        mean = (L / nsafe).reshape(-1, 3)[: w * h].reshape(h, w, 3)
        if value is None:
            value = jnp.sum(weights * mean)
        g = []
        for jj in range(flat.shape[0]):
            dmean = (dL[jj] / nsafe).reshape(-1, 3)[: w * h].reshape(h, w, 3)
            g.append(jnp.sum(weights * dmean))
        grads[name] = jnp.stack(g).reshape(jnp.shape(base))
    return value, grads


def transmissive_mats(scene: Scene) -> tuple[int, ...]:
    """Material ids with transmissive geometry (spheres or mesh
    triangles) — the materials whose mat_coef (index of refraction)
    has a nonzero gradient."""
    mids = scene.prim_material_ids
    tmats = {
        int(mids[p]) for p, t in enumerate(scene.prim_mtypes)
        if t == TRANSMISSIVE
    }
    if scene.mesh_packed is not None or scene.mesh is not None:
        tmats |= {
            int(mi) for mi in scene.mesh_mats_static
            if scene.mat_types[mi] == TRANSMISSIVE
        }
    return tuple(sorted(tmats))


def ior_weighted_grad(
    scene: Scene,
    camera,
    seed: Array,
    weights: Array,  # (H, W, 3) adjoint image (dLoss/dpixel)
    *,
    spp: int,
    max_bounces: int = 10,
    rr_start: int = 3,
    budget: int | None = None,
    tile_rows: int = 32,
    use_nee: bool = False,
    strat_k: int = 2,
    iteration: Array | int = 0,
    interpret: bool = False,
) -> tuple[Array, Array]:
    """sum(weights * image) and its FULL gradient w.r.t. scene.mat_coef
    (M,) — attached Snell bending + streaming Fresnel score in ONE
    tangent-batched kernel walk (diff/score.py's combined estimator at
    kernel speed). Non-transmissive materials get zero; raises if the
    scene has no transmissive material at all."""
    w, h = camera.width, camera.height
    if budget is None:
        budget = spp * 4 + max_bounces
    tmats = transmissive_mats(scene)
    if not tmats:
        raise ValueError("ior_weighted_grad: scene has no transmissive "
                         "material — mat_coef has no ior gradient")
    L, dL, ns, _ = camera_jvp_call(
        scene, pack_camera(camera), jnp.zeros((0, 24), jnp.float32),
        seed, jnp.int32(iteration),
        spp=spp, budget=budget, width=w, height=h,
        max_bounces=max_bounces, rr_start=rr_start, tile_rows=tile_rows,
        use_nee=use_nee, strat_k=strat_k, interpret=interpret,
        coef_mats=tmats,
    )
    nsafe = jnp.maximum(ns, 1).astype(jnp.float32)[..., None]
    mean = (L / nsafe).reshape(-1, 3)[: w * h].reshape(h, w, 3)
    value = jnp.sum(weights * mean)
    M = scene.mat_coef.shape[0]
    g = jnp.zeros((M,))
    for k, mi in enumerate(tmats):
        dmean = (dL[k] / nsafe).reshape(-1, 3)[: w * h].reshape(h, w, 3)
        g = g.at[mi].set(jnp.sum(weights * dmean))
    return value, g


def ior_mse_grad(
    scene: Scene,
    camera,
    seed: Array,
    target: Array,  # (H, W, 3)
    *,
    spp: int,
    max_bounces: int = 10,
    rr_start: int = 3,
    budget: int | None = None,
    tile_rows: int = 32,
    use_nee: bool = False,
    strat_k: int = 2,
    iteration: Array | int = 0,
    interpret: bool = False,
) -> Array:
    """d/d(mat_coef) of mean((image - target)^2) in ONE tangent walk (M,).

    The MSE cotangent 2*(mean - target)/(n_pix*3) comes from the walk's
    OWN primal mean — the same plain-stochastic-MSE convention as
    make_train_step (the Cov(estimate, gradient) term is shared). Used by
    diff.inverse.kernel_loss_and_grads to let mat_coef join the trainer's
    param dict for glass scenes."""
    w, h = camera.width, camera.height
    if budget is None:
        budget = spp * 4 + max_bounces
    tmats = transmissive_mats(scene)
    if not tmats:
        raise ValueError("ior_mse_grad: scene has no transmissive "
                         "material — mat_coef has no ior gradient")
    L, dL, ns, _ = camera_jvp_call(
        scene, pack_camera(camera), jnp.zeros((0, 24), jnp.float32),
        seed, jnp.int32(iteration),
        spp=spp, budget=budget, width=w, height=h,
        max_bounces=max_bounces, rr_start=rr_start, tile_rows=tile_rows,
        use_nee=use_nee, strat_k=strat_k, interpret=interpret,
        coef_mats=tmats,
    )
    nsafe = jnp.maximum(ns, 1).astype(jnp.float32)[..., None]
    mean = (L / nsafe).reshape(-1, 3)[: w * h].reshape(h, w, 3)
    weights = 2.0 * (mean - target) / (h * w * 3)
    M = scene.mat_coef.shape[0]
    g = jnp.zeros((M,))
    for k, mi in enumerate(tmats):
        dmean = (dL[k] / nsafe).reshape(-1, 3)[: w * h].reshape(h, w, 3)
        g = g.at[mi].set(jnp.sum(weights * dmean))
    return g
