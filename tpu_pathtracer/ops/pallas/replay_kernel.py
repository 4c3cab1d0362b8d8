"""Fused value-and-gradient Pallas kernel: fwd+bwd in ONE path walk.

Round 1's differentiable path ran on the XLA wavefront (~50-100 Mrays/s
fwd+bwd on a v5e; benchmarks/bench_fwdbwd.py) because path-replay backprop
re-traces every path: primal walk + adjoint walk = 2x the forward cost,
each at wavefront speed. This kernel collapses BOTH passes into a single
fused walk with a STREAMING adjoint — no second traversal, no per-bounce
residuals — so differentiating a render costs about the same as rendering.

The streaming-adjoint identity (for the detached-sampling estimator,
diff/replay.py's math): every BSDF factor and NEE/emitter term is LINEAR
in its material color A_m / light intensity I_l, so with per-path prefix
L_b (radiance accumulated through vertex b) and totals L_tot:

    dLoss/dA_m = sum_lanes g * ( L_tot * nA_m - cA_m ) / A_m
        nA_m = #bounces at material m (factor applied),     per lane
        cA_m = sum_b [ L_after_b * ok_b - nee_b * neeok_b ] * 1[mid_b = m]
    dLoss/dI_l = sum_lanes g * cI_l / I_l
        cI_l = sum_b (emitter-hit + NEE terms owned by light l)

nA/cA/cI are tiny per-lane running sums updated as the walk proceeds; the
suffix L_tot - L_after_b needed by path-replay appears only after the walk
finishes, factored out of the bounce loop by linearity. The upstream
cotangent g is applied at the END of the walk — which is what makes the
single pass possible: in MSE mode the kernel derives g from the target
image in-VMEM (pixel means over the spp sub-lanes via lane rolls), fusing
loss + backward into the same launch (jax.value_and_grad in one kernel).

Layout: lane = (pixel, sample), lane_id = pix * spp + s with spp | 128, so
a pixel's samples sit in adjacent lanes of one row and the pixel mean is a
log-free lane-roll reduction. Bounces are unrolled (static RR gate /
bounce cap like trace_kernel.py); integrator math is bounce-for-bounce the
XLA estimator's (reference pathtracer.cu:112-170 + live NEE/MIS from the
dead scene.h:110-170 machinery).

Validated on CPU (interpret mode + external threefry uniforms) against
jax.grad of a pure-JAX replica fed the same uniforms
(tests/test_replay_kernel.py).
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
from tpu_pathtracer.ops.pallas.trace_kernel import (
    LANES, BIG, INV_PI,
    _dot3, _normalize3, _rand, _seed_streams,
    pack_camera, pack_lights, pack_prims,
)


def _replay_kernel(
    # scalar prefetch: [seed, iteration, salt, tile_offset]
    seed_ref,
    # SMEM operands
    prims_ref,  # (P, 12) f32
    cam_ref,  # (24,) f32 pack_camera layout
    lights_ref,  # (L, 8) f32
    *refs,
    rows: int,
    n_prims: int,
    emissive: tuple,
    spec_prims: tuple,
    trans_prims: tuple,
    prims_by_mat: tuple,  # tuple[m] = tuple of prim ids with material m
    lights_static: tuple,
    n_mats: int,
    spp: int,
    use_nee: bool,
    use_dof: bool,
    strat_k: int,
    width: int,
    max_bounces: int,
    rr_start: int,
    tmin: float,
    n_lanes: int,
    inv_loss_n: float,  # 1 / (n_pix * 3) MSE normalizer (mse mode)
    mode: str,  # "mse" (target in, loss out) | "vjp" (g in, L out)
    external_rng: bool,
):
    # refs layout: [tr_, tg_, tb_ (target or g lanes)], [rng?],
    #              then outputs [lr_o, lg_o, lb_o, partials, loss_o, nrays_o]
    gr_i, gg_i, gb_i = refs[0], refs[1], refs[2]
    idx = 3
    rng_ref = refs[idx] if external_rng else None
    idx += 1 if external_rng else 0
    lr_o, lg_o, lb_o, part_o, loss_o, nrays_o = refs[idx:idx + 6]

    n_lights = len(lights_static)
    tile = pl.program_id(0)
    shape = (rows, LANES)
    fzeros = jnp.zeros(shape, jnp.float32)

    lane = (
        jax.lax.broadcasted_iota(jnp.int32, shape, 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        + (tile + seed_ref[3]) * (rows * LANES)
    )
    in_domain = lane < n_lanes
    pix = lane // spp
    s_id = lane % spp
    px = (pix % width).astype(jnp.float32)
    py = (pix // width).astype(jnp.float32)

    _seed_streams(
        seed_ref[0], seed_ref[1], tile + seed_ref[3], seed_ref[2],
        jnp.int32(0),
    )

    n_draw_cam = 4 if use_dof else 2
    n_draw_b = 3 + (3 if use_nee else 0)
    if external_rng:
        draw_count = [0]

        def draw():
            k = draw_count[0]
            draw_count[0] = k + 1
            return rng_ref[k * rows:(k + 1) * rows, :]
    else:
        def draw():
            return _rand(shape)

    def intersect(ox, oy, oz, dx, dy, dz):
        """Unrolled closest-hit over the sphere scene (scene.h:71-94)."""
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
            # scalar reciprocal once per prim; vector divides are multi-op
            # on the VPU and this loop runs every replay step
            inv_r = 1.0 / prims_ref[p, 3]
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
        return (hit, best_p, hx, hy, hz, nx, ny, nz, ar, ag, ab, coef,
                is_s, is_t, er, eg, eb)

    # ---- camera ray generation (one path per lane)
    u_cam = draw()
    v_cam = draw()
    if use_dof:
        u_lens = draw()
        v_lens = draw()
    kk = strat_k * strat_k
    cell = s_id % kk
    ccx = (cell % strat_k).astype(jnp.float32)
    ccy = (cell // strat_k).astype(jnp.float32)
    jx = (ccx + u_cam) / strat_k - 0.5
    jy = (ccy + v_cam) / strat_k - 0.5
    sx = px + jx
    sy = py + jy
    dx = cam_ref[0] - cam_ref[6] * sy + cam_ref[3] * sx
    dy = cam_ref[1] - cam_ref[7] * sy + cam_ref[4] * sx
    dz = cam_ref[2] - cam_ref[8] * sy + cam_ref[5] * sx
    dx, dy, dz = _normalize3(dx, dy, dz)
    ox = fzeros + cam_ref[9]
    oy = fzeros + cam_ref[10]
    oz = fzeros + cam_ref[11]
    if use_dof:
        lens_r = cam_ref[12] * jnp.sqrt(u_lens)
        phi_l = (2.0 * math.pi) * v_lens
        ldu = lens_r * jnp.cos(phi_l)
        ldv = lens_r * jnp.sin(phi_l)
        cos_w = dx * cam_ref[20] + dy * cam_ref[21] + dz * cam_ref[22]
        ft = cam_ref[13] / jnp.maximum(cos_w, 1e-6)
        fpx = ox + dx * ft
        fpy = oy + dy * ft
        fpz = oz + dz * ft
        ox = ox + cam_ref[14] * ldu + cam_ref[17] * ldv
        oy = oy + cam_ref[15] * ldu + cam_ref[18] * ldv
        oz = oz + cam_ref[16] * ldu + cam_ref[19] * ldv
        dx, dy, dz = _normalize3(fpx - ox, fpy - oy, fpz - oz)

    # ---- walk state
    Lr = fzeros; Lg = fzeros; Lb = fzeros
    Tr = fzeros + 1.0; Tg = fzeros + 1.0; Tb = fzeros + 1.0
    alive = in_domain
    prev_pdf = fzeros
    prev_delta = in_domain | True  # all-True (primaries take full credit)
    # streaming-adjoint accumulators
    nA = [fzeros for _ in range(n_mats)]
    cA = [[fzeros, fzeros, fzeros] for _ in range(n_mats)]
    cI = [[fzeros, fzeros, fzeros] for _ in range(n_lights)]
    n_live = jnp.zeros((), jnp.int32)

    for bounce in range(max_bounces + 1):
        u1 = draw(); u2 = draw(); u3 = draw()
        if use_nee:
            ul1 = draw(); ul2 = draw(); usel = draw()

        (hit, bp, hx, hy, hz, nx, ny, nz, ar, ag, ab, coef, is_s, is_t,
         er, eg, eb) = intersect(ox, oy, oz, dx, dy, dz)
        act = alive & hit
        n_live = n_live + jnp.sum(act.astype(jnp.int32))
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
            pp2 = prev_pdf * prev_pdf
            w_emit = jnp.where(
                prev_delta, 1.0, pp2 / jnp.maximum(pp2 + ldp * ldp, 1e-20)
            )
            take = take * w_emit
        e_r = Tr * er * take
        e_g = Tg * eg * take
        e_b = Tb * eb * take
        Lr = Lr + e_r; Lg = Lg + e_g; Lb = Lb + e_b
        # route the emitter term to its owning light (linear in I)
        for li, (ltype, lprim) in enumerate(lights_static):
            if ltype != 1 or lprim < 0:
                continue
            m = (bp == lprim).astype(jnp.float32)
            cI[li][0] += e_r * m
            cI[li][1] += e_g * m
            cI[li][2] += e_b * m

        # ---- next-event estimation (per-light, accumulates cI too)
        is_d = ~(is_s | is_t) if (spec_prims or trans_prims) else None
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
                else:  # point light (scene.h:153-158)
                    wrx = lights_ref[li, 0] - hx
                    wry = lights_ref[li, 1] - hy
                    wrz = lights_ref[li, 2] - hz
                    d2l = _dot3(wrx, wry, wrz, wrx, wry, wrz)
                    # rsqrt once: direction, distance, and 1/d^2 falloff
                    # all follow by multiplies (d2l ~ 0 is killed by the
                    # dist_l > tmin gate below, so the clamp is safe)
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
                cos_l = _dot3(wlx, wly, wlz, nx, ny, nz)
                support = (cos_l > 0.0) & (
                    _dot3(wox, woy, woz, wlx, wly, wlz) < 0.0
                )
                if spec_prims or trans_prims:
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
                cI[li][0] += t_r
                cI[li][1] += t_g
                cI[li][2] += t_b
            Lr = Lr + nee_r; Lg = Lg + nee_g; Lb = Lb + nee_b

        # ---- BSDF sampling (scene.h:177-221, masked lanes)
        # Polar disk map, same as ops/pallas/persistent.py: identical
        # cosine-hemisphere distribution to the XLA path's concentric map
        # through a cheaper warping; the local frame is orthonormal so the
        # result is unit without a re-normalize and its cosine IS ldz.
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
        if spec_prims or trans_prims:
            # Mirror reflection is invariant under n -> -n (the 2(wo.n)n
            # term flips sign twice), so one reflect serves both the
            # specular lobe and the dielectric's reflected branch.
            wsx = wox - 2.0 * won * nx
            wsy = woy - 2.0 * won * ny
            wsz = woz - 2.0 * won * nz

        if trans_prims:
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
        if spec_prims:
            wix = jnp.where(is_s, wsx, wix)
            wiy = jnp.where(is_s, wsy, wiy)
            wiz = jnp.where(is_s, wsz, wiz)
            fr = jnp.where(is_s, coef * ar, fr)
            fg = jnp.where(is_s, coef * ag, fg)
            fb = jnp.where(is_s, coef * ab, fb)
        if trans_prims:
            wix = jnp.where(is_t, wtx, wix)
            wiy = jnp.where(is_t, wty, wiy)
            wiz = jnp.where(is_t, wtz, wiz)
            fr = jnp.where(is_t, ar, fr)
            fg = jnp.where(is_t, ag, fg)
            fb = jnp.where(is_t, ab, fb)
        if spec_prims or trans_prims:
            pdf = jnp.where(is_d, pdf_d, 1.0)
        f_black = (fr <= 0.0) & (fg <= 0.0) & (fb <= 0.0)
        contrib_ok = ~f_black & (pdf > 0.0)
        step_ok = act & contrib_ok

        # ---- streaming adjoint: material accumulators
        # contrib at this vertex = g*[(L_tot - L_after)*ok + nee*neeok]/A
        # -> nA += ok;  cA += L_after*ok - nee*neeok  (per material mask)
        okf = step_ok.astype(jnp.float32)
        actf = act.astype(jnp.float32)
        for mi, plist in enumerate(prims_by_mat):
            if not plist:
                continue
            mm = jnp.zeros(shape, jnp.bool_)
            for p in plist:
                mm = mm | (bp == p)
            mf = mm.astype(jnp.float32)
            nA[mi] += mf * okf
            cA[mi][0] += (Lr * okf - nee_r * actf) * mf
            cA[mi][1] += (Lg * okf - nee_g * actf) * mf
            cA[mi][2] += (Lb * okf - nee_b * actf) * mf

        # cos/pdf without the vector divide: diffuse lanes have
        # cos = ldz and pdf = ldz/pi, so the weight is exactly pi
        # (lanes with pdf_d == 0 are killed by contrib_ok regardless);
        # delta lanes have pdf == 1, so the weight is just |cos|.
        if spec_prims or trans_prims:
            cos_wi = jnp.abs(_dot3(wix, wiy, wiz, nx, ny, nz))
            wgt = jnp.where(is_d, math.pi, cos_wi)
        else:
            wgt = math.pi
        Tr = jnp.where(step_ok, Tr * fr * wgt, Tr)
        Tg = jnp.where(step_ok, Tg * fg * wgt, Tg)
        Tb = jnp.where(step_ok, Tb * fb * wgt, Tb)

        # ---- Russian roulette (static gate: all lanes share the depth)
        if bounce > rr_start:
            p_cont = jnp.minimum(0.5, jnp.maximum(Tr, jnp.maximum(Tg, Tb)))
            survive = u3 <= p_cont
            boost = step_ok & survive & (p_cont > 0.0)
            inv_p = 1.0 / jnp.maximum(p_cont, 1e-20)
            Tr = jnp.where(boost, Tr * inv_p, Tr)
            Tg = jnp.where(boost, Tg * inv_p, Tg)
            Tb = jnp.where(boost, Tb * inv_p, Tb)
            alive = step_ok & survive & (bounce < max_bounces)
        else:
            alive = step_ok & (bounce < max_bounces)

        # masked: dead lanes keep their last finite ray (unmasked garbage
        # positions blow up through the NEE geometry into masked-NaN taint)
        ox = jnp.where(act, hx, ox)
        oy = jnp.where(act, hy, oy)
        oz = jnp.where(act, hz, oz)
        dx = jnp.where(act, wix, dx)
        dy = jnp.where(act, wiy, dy)
        dz = jnp.where(act, wiz, dz)
        prev_pdf = pdf
        new_delta = (is_s | is_t) if (spec_prims or trans_prims) \
            else jnp.zeros(shape, jnp.bool_)
        prev_delta = new_delta  # act lanes; dead lanes' value is unused

    # ---- cotangent g per lane
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    dom_f = in_domain.astype(jnp.float32)
    if mode == "mse":
        # pixel mean over the spp adjacent lanes via lane rolls
        sum_r = Lr; sum_g = Lg; sum_b = Lb
        for s in range(1, spp):
            # roll by LANES - s == roll by -s (wrap never crosses a pixel
            # group: spp | LANES and groups are spp-aligned)
            sum_r = sum_r + pltpu.roll(Lr, LANES - s, 1)
            sum_g = sum_g + pltpu.roll(Lg, LANES - s, 1)
            sum_b = sum_b + pltpu.roll(Lb, LANES - s, 1)
        at0 = ((col % spp) == 0).astype(jnp.float32) * dom_f
        mean_r = sum_r / spp
        mean_g = sum_g / spp
        mean_b = sum_b / spp
        dr = (mean_r - gr_i[:, :]) * at0
        dg = (mean_g - gg_i[:, :]) * at0
        db = (mean_b - gb_i[:, :]) * at0
        loss_o[tile, 0] = jnp.sum(dr * dr + dg * dg + db * db) * inv_loss_n
        g0r = dr * (2.0 * inv_loss_n / spp)
        g0g = dg * (2.0 * inv_loss_n / spp)
        g0b = db * (2.0 * inv_loss_n / spp)
        gr = g0r; gg = g0g; gb = g0b
        for s in range(1, spp):
            gr = gr + pltpu.roll(g0r, s, 1)
            gg = gg + pltpu.roll(g0g, s, 1)
            gb = gb + pltpu.roll(g0b, s, 1)
    else:  # vjp: upstream cotangent supplied per lane
        gr = gr_i[:, :] * dom_f
        gg = gg_i[:, :] * dom_f
        gb = gb_i[:, :] * dom_f
        loss_o[tile, 0] = jnp.float32(0.0)

    # ---- apply g: per-tile gradient partials (divide by A/I outside)
    for mi in range(n_mats):
        part_o[tile, mi * 3 + 0] = jnp.sum(gr * (Lr * nA[mi] - cA[mi][0]))
        part_o[tile, mi * 3 + 1] = jnp.sum(gg * (Lg * nA[mi] - cA[mi][1]))
        part_o[tile, mi * 3 + 2] = jnp.sum(gb * (Lb * nA[mi] - cA[mi][2]))
    for li in range(n_lights):
        base = n_mats * 3 + li * 3
        part_o[tile, base + 0] = jnp.sum(gr * cI[li][0])
        part_o[tile, base + 1] = jnp.sum(gg * cI[li][1])
        part_o[tile, base + 2] = jnp.sum(gb * cI[li][2])

    lr_o[:, :] = Lr * dom_f
    lg_o[:, :] = Lg * dom_f
    lb_o[:, :] = Lb * dom_f
    nrays_o[tile, 0] = n_live


@functools.partial(
    jax.jit,
    static_argnames=(
        "spp", "width", "height", "max_bounces", "rr_start", "tile_rows",
        "use_nee", "use_dof", "strat_k", "mode", "interpret",
    ),
)
def replay_call(
    scene: Scene,
    cam_packed: Array,  # (24,) f32
    seed: Array,  # (2,) int32 [seed, salt]
    iteration: Array,  # () int32 RNG frame index
    aux_lanes: Array,  # (rows_total, LANES, 3): target (mse) or g (vjp)
    *,
    spp: int,
    width: int,
    height: int,
    max_bounces: int = 10,
    rr_start: int = 3,
    tile_rows: int = 16,
    use_nee: bool = False,
    use_dof: bool = False,
    strat_k: int = 2,
    mode: str = "mse",
    tile_offset: Array | int = 0,
    interpret: bool = False,
) -> tuple[Array, Array, Array, Array, Array]:
    """One fused fwd+bwd walk. Returns (L_lanes (rows,LANES,3), loss,
    gA_raw (M,3), gI_raw (NL,3), live_ray_count). Callers divide the raw
    gradient partials by clamp(mat_color)/clamp(light_intensity)."""
    if LANES % spp:
        raise ValueError(f"spp={spp} must divide {LANES}")
    prims = pack_prims(scene)
    n_prims = int(scene.num_prims)
    spec_prims = tuple(
        i for i, t in enumerate(scene.prim_mtypes) if t == SPECULAR
    )
    trans_prims = tuple(
        i for i, t in enumerate(scene.prim_mtypes) if t == TRANSMISSIVE
    )
    n_mats = scene.mat_color.shape[0]
    mids = scene.prim_material_ids  # static structure (models/scene.py)
    prims_by_mat = tuple(
        tuple(p for p in range(n_prims) if mids[p] == mi)
        for mi in range(n_mats)
    )
    lights_static = tuple(scene.light_structure)
    lights_tab = pack_lights(scene)
    n_lights = len(lights_static)

    rows_total = aux_lanes.shape[0]
    n_tiles = rows_total // tile_rows
    n_lanes = height * width * spp
    n_pix = height * width

    external_rng = bool(interpret)
    n_draw = (4 if use_dof else 2) + (max_bounces + 1) * (
        3 + (3 if use_nee else 0)
    )
    kernel = functools.partial(
        _replay_kernel,
        rows=tile_rows,
        n_prims=n_prims,
        emissive=tuple(scene.emissive_prims),
        spec_prims=spec_prims,
        trans_prims=trans_prims,
        prims_by_mat=prims_by_mat,
        lights_static=lights_static,
        n_mats=n_mats,
        spp=spp,
        use_nee=use_nee,
        use_dof=use_dof,
        strat_k=strat_k,
        width=width,
        max_bounces=max_bounces,
        rr_start=rr_start,
        tmin=EPSILON,
        n_lanes=n_lanes,
        inv_loss_n=1.0 / (n_pix * 3),
        mode=mode,
        external_rng=external_rng,
    )
    tile_block = lambda i, *_: (i, 0)
    lane_spec = pl.BlockSpec((tile_rows, LANES), tile_block)
    rng_inputs = []
    rng_specs = []
    if external_rng:
        rkey = jax.random.fold_in(
            jax.random.fold_in(jax.random.key(1), seed[0] + 131 * seed[1]),
            iteration,
        )
        blk = n_draw * tile_rows
        gtiles = jnp.int32(tile_offset) + jnp.arange(n_tiles, dtype=jnp.int32)
        blocks = jax.vmap(
            lambda t: jax.random.uniform(
                jax.random.fold_in(rkey, t), (blk, LANES), jnp.float32
            )
        )(gtiles)
        rng_inputs.append(blocks.reshape(n_tiles * blk, LANES))
        rng_specs.append(pl.BlockSpec((blk, LANES), tile_block))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((n_prims, 12), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((24,), lambda i, *_: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec(lights_tab.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            lane_spec, lane_spec, lane_spec,
            *rng_specs,
        ],
        out_specs=[
            lane_spec, lane_spec, lane_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
    )
    seed4 = jnp.stack(
        [seed[0], jnp.int32(iteration), seed[1], jnp.int32(tile_offset)]
    )
    k_part = n_mats * 3 + n_lights * 3
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows_total, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows_total, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows_total, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, k_part), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1), jnp.int32),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        seed4, prims, cam_packed, lights_tab,
        aux_lanes[:, :, 0], aux_lanes[:, :, 1], aux_lanes[:, :, 2],
        *rng_inputs,
    )
    lr, lg, lb, partials, loss_p, nrays = outs
    part = jnp.sum(partials, axis=0)
    gA_raw = part[: n_mats * 3].reshape(n_mats, 3)
    gI_raw = part[n_mats * 3:].reshape(n_lights, 3)
    L_lanes = jnp.stack([lr, lg, lb], axis=-1)
    return L_lanes, jnp.sum(loss_p), gA_raw, gI_raw, jnp.sum(nrays)


def lanes_layout(width: int, height: int, spp: int,
                 tile_rows: int = 16,
                 tiles_multiple: int = 1) -> tuple[int, int]:
    """(rows_total, n_lanes) for the (pixel, sample) lane layout.
    tiles_multiple pads the tile count so rows shard evenly over a mesh."""
    n_lanes = width * height * spp
    tile_lanes = tile_rows * LANES
    n_tiles = -(-n_lanes // tile_lanes)
    n_tiles = -(-n_tiles // tiles_multiple) * tiles_multiple
    return n_tiles * tile_rows, n_lanes


def broadcast_pixels_to_lanes(img: Array, spp: int, rows_total: int) -> Array:
    """(H, W, 3) -> (rows_total, LANES, 3), each pixel repeated spp times
    (matching the kernel's lane = pix * spp + s layout; padding zeros)."""
    flat = jnp.repeat(img.reshape(-1, 3), spp, axis=0)
    pad = rows_total * LANES - flat.shape[0]
    flat = jnp.pad(flat, ((0, pad), (0, 0)))
    return flat.reshape(rows_total, LANES, 3)


def mse_value_and_grad(
    scene: Scene,
    camera,
    seed: Array,  # (2,) int32
    iteration: Array | int,
    target: Array,  # (H, W, 3)
    *,
    spp: int,
    max_bounces: int = 10,
    rr_start: int = 3,
    tile_rows: int = 16,
    use_nee: bool = False,
    strat_k: int = 2,
    interpret: bool = False,
) -> tuple[Array, dict, Array]:
    """Loss + gradients w.r.t. {mat_color, light_intensity} for
    mean((render - target)^2), in ONE kernel walk. Returns
    (loss, grads dict, live_ray_count)."""
    w, h = camera.width, camera.height
    rows_total, _ = lanes_layout(w, h, spp, tile_rows)
    aux = broadcast_pixels_to_lanes(target, spp, rows_total)
    _, loss, gA_raw, gI_raw, nrays = replay_call(
        scene, pack_camera(camera), seed, jnp.int32(iteration), aux,
        spp=spp, width=w, height=h, max_bounces=max_bounces,
        rr_start=rr_start, tile_rows=tile_rows, use_nee=use_nee,
        use_dof=camera.use_dof, strat_k=strat_k, mode="mse",
        interpret=interpret,
    )
    # the scene's light table is padded; the kernel only produces rows for
    # the live lights — pad the rest with zeros (their gradient IS zero)
    gI_full = jnp.zeros_like(scene.light_intensity)
    gI_full = gI_full.at[: gI_raw.shape[0]].set(gI_raw)
    grads = {
        "mat_color": gA_raw / jnp.maximum(scene.mat_color, 1e-8),
        "light_intensity": gI_full / jnp.maximum(
            scene.light_intensity, 1e-8
        ),
    }
    return loss, grads, nrays
