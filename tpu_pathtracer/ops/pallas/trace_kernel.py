"""Fused path-trace Pallas kernel: the whole bounce loop on-chip.

This is the performance path (SURVEY.md §7 stage 5). Where the XLA
wavefront (models/integrator.py) materializes the full SoA carry to HBM
between bounce steps, this kernel keeps every lane's path state (origin,
direction, throughput, radiance, liveness) in VMEM for ALL bounces of a
lane tile — the TPU-native answer to the reference's megakernel
(pathtracer.cu:112-170): per-tile megakernel, per-lane wavefront.

Layout: lanes are tiled (tile_rows, 128) per vec component (true SoA —
x/y/z as separate 2D tiles), the natural VPU shape. The primitive loop is
UNROLLED over the scene — each sphere's params are scalars from SMEM
broadcast against lane tiles, so no (N, P) buffer ever exists.

RNG: the TPU hardware PRNG (pltpu.prng_seed/prng_random_bits), seeded per
(seed, iteration, tile, salt, bounce) via a murmur-style fold —
deterministic for a fixed tile size, replayable per bounce (the property
path-replay backprop needs). Streams differ from the XLA threefry path,
so images agree with the XLA integrator in distribution (MC tolerance),
not bit-for-bit.

Parity: integrator math is identical to models/integrator.py (emitter-hit
accumulation, cosine/specular/dielectric BSDFs, Russian roulette after
rr_start with p = min(0.5, max(T)), bounce cap, miss termination).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_pathtracer.models.scene import (
    SPECULAR, TRANSMISSIVE, EPSILON, Scene, prim_attrs,
)

LANES = 128  # VPU lane width: last dim of every tile
BIG = 1e30
INV_PI = 1.0 / math.pi

def _bits_to_uniform(bits):
    """random bits -> float32 in [0, 1): take the top 24 bits.

    prng_random_bits yields SIGNED int32; bitcast to uint32 first so the
    shift is logical, not arithmetic (else uniforms land in [-0.5, 0.5]).
    """
    ubits = pltpu.bitcast(bits, jnp.uint32) >> jnp.uint32(8)
    # Mosaic can't cast uint32->f32; the top-24-bit value fits int32 exactly.
    return pltpu.bitcast(ubits, jnp.int32).astype(jnp.float32) * jnp.float32(
        1.0 / (1 << 24)
    )


def _mix32(a, b):
    """Murmur3-style finalizer mix of two int32 scalars -> one int32.

    The TPU PRNG seed op takes at most 2 words; this folds the stream
    coordinates (seed, iteration, tile, salt, bounce) down to 2 well-mixed
    words so distinct coordinates get decorrelated streams.
    """
    c1 = jnp.uint32(np.uint32(0x9E3779B1))
    c2 = jnp.uint32(np.uint32(0x85EBCA6B))
    c3 = jnp.uint32(np.uint32(0xC2B2AE35))
    h = a.astype(jnp.uint32) ^ (b.astype(jnp.uint32) * c1)
    h = h ^ (h >> jnp.uint32(16))
    h = h * c2
    h = h ^ (h >> jnp.uint32(13))
    h = h * c3
    h = h ^ (h >> jnp.uint32(16))
    return h.astype(jnp.int32)


def _seed_streams(seed, iteration, tile, salt, stream):
    """Seed the hardware PRNG for one (frame, tile, bounce/stream)."""
    w1 = _mix32(_mix32(seed, iteration), tile)
    w2 = _mix32(_mix32(salt, stream), _mix32(tile, iteration))
    pltpu.prng_seed(w1, w2)


def _rand(shape):
    return _bits_to_uniform(pltpu.prng_random_bits(shape))


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _normalize3(x, y, z):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-20))
    return x * inv, y * inv, z * inv


def _trace_kernel(
    # scalar-prefetch operand
    seed_ref,  # (3,) int32: [seed, iteration, salt]
    # SMEM operands
    prims_ref,  # (P, 12) f32: cx cy cz r ax ay az coef mtype ex ey ez
    cam_ref,  # (24,) f32 packed camera (pack_camera layout)
    lights_ref,  # (L, 8) f32: pos3 intensity3 cdf_lo sel_pdf
    # outputs
    lr_ref, lg_ref, lb_ref,  # (ROWS, 128) radiance per channel
    nrays_ref,  # (n_tiles, 1) int32 live-ray counters
    *,
    rows: int,
    n_prims: int,
    emissive: tuple,
    spec_prims: tuple,
    trans_prims: tuple,
    lights_static: tuple,  # ((type, prim_or_-1), ...) scene structure
    use_nee: bool,
    spp: int,
    width: int,
    max_bounces: int,
    rr_start: int,
    tmin: float,
    n_lanes: int,
):
    tile = pl.program_id(0)
    shape = (rows, LANES)
    fzeros = jnp.zeros(shape, jnp.float32)

    # ---- lane ids -> pixel coords (integrator.trace_pixels lane layout)
    lane = (
        jax.lax.broadcasted_iota(jnp.int32, shape, 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        + tile * (rows * LANES)
    )
    s = lane % spp
    pix = lane // spp
    px = (pix % width).astype(jnp.float32)
    py = (pix // width).astype(jnp.float32)

    # ---- camera ray generation (camera.h:66-72 semantics)
    # One PRNG seed per (frame, tile); all draws stream sequentially from
    # it (camera jitter first, then 3 per bounce). Deterministic per
    # (seed, iteration, tile) and identically replayable — per-bounce
    # addressability is unnecessary inside a fused kernel that always
    # replays the whole path.
    _seed_streams(seed_ref[0], seed_ref[1], tile, seed_ref[2], jnp.int32(0))
    uv_cam = _rand((2 * rows, LANES))
    u_cam = uv_cam[:rows]
    v_cam = uv_cam[rows:]
    k = int(round(spp ** 0.5))
    if k * k == spp and k > 1:
        cx = (s % k).astype(jnp.float32)
        cy = (s // k).astype(jnp.float32)
        jx = (cx + u_cam) / k - 0.5
        jy = (cy + v_cam) / k - 0.5
    else:
        jx = u_cam - 0.5
        jy = v_cam - 0.5
    sx = px + jx
    sy = py + jy
    dx = cam_ref[0] - cam_ref[6] * sy + cam_ref[3] * sx
    dy = cam_ref[1] - cam_ref[7] * sy + cam_ref[4] * sx
    dz = cam_ref[2] - cam_ref[8] * sy + cam_ref[5] * sx
    dx, dy, dz = _normalize3(dx, dy, dz)
    ox = fzeros + cam_ref[9]
    oy = fzeros + cam_ref[10]
    oz = fzeros + cam_ref[11]

    def intersect(ox, oy, oz, dx, dy, dz):
        """Unrolled closest-hit over the scene (scene.h:71-94 semantics)."""
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
            # reference primitive.h:44 root selection, algebraically
            # reduced: pick t0 if t0>tmin else t1; then one validity test
            # (t0>tmin but t0>=tmax misses WITHOUT falling through to t1,
            # exactly like the reference)
            t = jnp.where(t0 > tmin, t0, b + sq)
            closer = (det >= 0.0) & (t > tmin) & (t < best_t)
            best_t = jnp.where(closer, t, best_t)
            best_p = jnp.where(closer, p, best_p)
        hit = best_t < (0.5 * BIG)
        hx = ox + dx * best_t
        hy = oy + dy * best_t
        hz = oz + dz * best_t
        # gather per-prim attrs by unrolled select; kernel is specialized
        # on the scene STRUCTURE (static emissive/specular/transmissive
        # prim sets), so emission/coef selects only touch the prims that
        # need them and material type becomes precomputed lane masks.
        nx = fzeros; ny = fzeros; nz = fzeros
        ar = fzeros; ag = fzeros; ab = fzeros
        for p in range(n_prims):
            is_p = best_p == p
            nx = jnp.where(is_p, (hx - prims_ref[p, 0]) / prims_ref[p, 3], nx)
            ny = jnp.where(is_p, (hy - prims_ref[p, 1]) / prims_ref[p, 3], ny)
            nz = jnp.where(is_p, (hz - prims_ref[p, 2]) / prims_ref[p, 3], nz)
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

    h0 = intersect(ox, oy, oz, dx, dy, dz)
    (hit, bp, hx, hy, hz, nx, ny, nz, ar, ag, ab, coef, is_s, is_t,
     er, eg, eb) = h0

    Lr = fzeros; Lg = fzeros; Lb = fzeros
    Tr = fzeros + 1.0; Tg = fzeros + 1.0; Tb = fzeros + 1.0
    alive = hit & (lane < n_lanes)  # padded tail lanes never trace
    wox, woy, woz = dx, dy, dz
    n_live = jnp.sum((lane < n_lanes).astype(jnp.int32))  # primary rays
    # MIS state: origin of the incoming ray, pdf of the BSDF draw that
    # produced this hit, and whether it was a delta lobe (primaries = yes)
    pox, poy, poz = ox, oy, oz
    prev_pdf = fzeros
    prev_delta = jnp.ones(shape, jnp.bool_)

    for bounce in range(max_bounces + 1):
        # ---- per-bounce uniforms (bsdf u, v, rr) — one batched draw
        ub = _rand((3 * rows, LANES))
        u1 = ub[:rows]
        u2 = ub[rows:2 * rows]
        u3 = ub[2 * rows:]

        # ---- emitter-hit accumulation (pathtracer.cu:134-137)
        one_sided = _dot3(nx, ny, nz, -wox, -woy, -woz) > 0.0
        take = (alive & one_sided).astype(jnp.float32)
        if use_nee:
            # MIS counterweight: pdf the light sampler assigns to this
            # direction (cone pdf from the previous vertex x selection)
            ldp = fzeros
            for li, (ltype, lprim) in enumerate(lights_static):
                if ltype != 1 or lprim < 0:  # area lights only
                    continue
                m = bp == lprim
                dlx = prims_ref[lprim, 0] - pox
                dly = prims_ref[lprim, 1] - poy
                dlz = prims_ref[lprim, 2] - poz
                d2l = _dot3(dlx, dly, dlz, dlx, dly, dlz)
                rl = prims_ref[lprim, 3]
                sin2 = jnp.minimum(rl * rl / jnp.maximum(d2l, 1e-12), 1.0)
                ctm = jnp.sqrt(jnp.maximum(1.0 - sin2, 0.0))
                pc = 1.0 / (2.0 * math.pi * jnp.maximum(1.0 - ctm, 1e-12))
                pc = jnp.where(d2l > rl * rl, pc, 0.0)  # inside: bsdf-only
                ldp = jnp.where(m, pc * lights_ref[li, 7], ldp)
            pp2 = prev_pdf * prev_pdf
            w_emit = jnp.where(
                prev_delta, 1.0, pp2 / jnp.maximum(pp2 + ldp * ldp, 1e-20)
            )
            take = take * w_emit
        Lr = Lr + Tr * er * take
        Lg = Lg + Tg * eg * take
        Lb = Lb + Tb * eb * take

        # ---- next-event estimation (live scene.h:150-170, in-kernel)
        is_d = ~(is_s | is_t) if (spec_prims or trans_prims) else None
        if use_nee:
            un = _rand((3 * rows, LANES))
            ul1 = un[:rows]
            ul2 = un[rows:2 * rows]
            usel = un[2 * rows:]
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
                if ltype == 1 and lprim >= 0:  # area (sphere) light
                    wrx = prims_ref[lprim, 0] - hx
                    wry = prims_ref[lprim, 1] - hy
                    wrz = prims_ref[lprim, 2] - hz
                    rl = prims_ref[lprim, 3]
                    d2l = _dot3(wrx, wry, wrz, wrx, wry, wrz)
                    distc = jnp.sqrt(jnp.maximum(d2l, 1e-20))
                    wcx = wrx / distc; wcy = wry / distc; wcz = wrz / distc
                    sin2 = jnp.minimum(rl * rl / jnp.maximum(d2l, 1e-12), 1.0)
                    ctm = jnp.sqrt(jnp.maximum(1.0 - sin2, 0.0))
                    cth = 1.0 - ul1 * (1.0 - ctm)
                    sth = jnp.sqrt(jnp.maximum(1.0 - cth * cth, 0.0))
                    phi = (2.0 * math.pi) * ul2
                    # ONB around wc
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
                    # front-face emission (ns.(-wl) > 0)
                    nsx = (hx + wlx * thit - prims_ref[lprim, 0]) / rl
                    nsy = (hy + wly * thit - prims_ref[lprim, 1]) / rl
                    nsz = (hz + wlz * thit - prims_ref[lprim, 2]) / rl
                    front = _dot3(nsx, nsy, nsz, -wlx, -wly, -wlz) > 0.0
                    valid = valid & front
                    pdf_l = sel / (2.0 * math.pi * jnp.maximum(1.0 - ctm, 1e-12))
                    dist_l = thit
                    rad_r, rad_g, rad_b = ir_l, ig_l, ib_l
                    is_delta = False
                else:  # point light (scene.h:153-158)
                    wrx = lights_ref[li, 0] - hx
                    wry = lights_ref[li, 1] - hy
                    wrz = lights_ref[li, 2] - hz
                    d2l = _dot3(wrx, wry, wrz, wrx, wry, wrz)
                    dist_l = jnp.sqrt(jnp.maximum(d2l, 1e-20))
                    wlx = wrx / dist_l; wly = wry / dist_l; wlz = wrz / dist_l
                    inv_d2 = 1.0 / jnp.maximum(d2l, 1e-12)
                    rad_r = ir_l * inv_d2
                    rad_g = ig_l * inv_d2
                    rad_b = ib_l * inv_d2
                    pdf_l = sel + fzeros
                    valid = dist_l > tmin
                    is_delta = True
                # shadow any-hit over the sphere scene (scene.h:101-108)
                smax = dist_l * (1.0 - 1e-3) - tmin
                occ = jnp.zeros(shape, jnp.bool_)
                for pp in range(n_prims):
                    sx2 = prims_ref[pp, 0] - hx
                    sy2 = prims_ref[pp, 1] - hy
                    sz2 = prims_ref[pp, 2] - hz
                    rb = _dot3(sx2, sy2, sz2, wlx, wly, wlz)
                    rdet = rb * rb - _dot3(sx2, sy2, sz2, sx2, sy2, sz2)                         + prims_ref[pp, 3] * prims_ref[pp, 3]
                    rsq = jnp.sqrt(jnp.maximum(rdet, 0.0))
                    rt = jnp.where(rb - rsq > tmin, rb - rsq, rb + rsq)
                    occ = occ | ((rdet >= 0.0) & (rt > tmin) & (rt < smax))
                # diffuse-only direct light with MIS (montecarlo.h:156-159)
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
                    alive & m_l & valid & support & ~occ
                ).astype(jnp.float32)
                scale = gate * cos_l * w_mis / jnp.maximum(pdf_l, 1e-20)
                Lr = Lr + Tr * (ar * INV_PI) * rad_r * scale
                Lg = Lg + Tg * (ag * INV_PI) * rad_g * scale
                Lb = Lb + Tb * (ab * INV_PI) * rad_b * scale

        # ---- BSDF sampling (scene.h:177-221, masked lanes)

        # diffuse: concentric disk -> cosine hemisphere in the n frame
        sx_ = 2.0 * u1 - 1.0
        sy_ = 2.0 * u2 - 1.0
        in_r12 = sx_ >= -sy_
        in_r1 = in_r12 & (sx_ > sy_)
        in_r2 = in_r12 & ~in_r1
        in_r3 = ~in_r12 & (sx_ <= sy_)
        safe = lambda a, b: a / jnp.where(jnp.abs(b) > 0.0, b, 1.0)
        rr_ = jnp.where(in_r1, sx_,
              jnp.where(in_r2, sy_, jnp.where(in_r3, -sx_, -sy_)))
        th = jnp.where(in_r1, safe(sy_, sx_),
             jnp.where(in_r2, 2.0 - safe(sx_, sy_),
             jnp.where(in_r3, 4.0 + safe(sy_, sx_), 6.0 - safe(sx_, sy_))))
        th = th * (math.pi / 4.0)
        degen = (sx_ == 0.0) & (sy_ == 0.0)
        ldx = jnp.where(degen, 0.0, rr_ * jnp.cos(th))
        ldy = jnp.where(degen, 0.0, rr_ * jnp.sin(th))
        ldz = jnp.sqrt(jnp.maximum(1.0 - ldx * ldx - ldy * ldy, 0.0))
        # ONB around n (normalized tangent, vecmath.orthonormal_basis)
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
        wdx, wdy, wdz = _normalize3(wdx, wdy, wdz)
        cos_d = _dot3(wdx, wdy, wdz, nx, ny, nz)
        pdf_d = jnp.where(
            _dot3(wox, woy, woz, wdx, wdy, wdz) < 0.0,
            jnp.abs(cos_d) * INV_PI, 0.0,
        )

        # specular mirror (only compiled into scenes that have one)
        won = _dot3(wox, woy, woz, nx, ny, nz)
        if spec_prims or trans_prims:
            # Mirror reflection is invariant under n -> -n (the 2(wo.n)n
            # term flips sign twice), so one reflect serves both the
            # specular lobe and the dielectric's reflected branch.
            wsx = wox - 2.0 * won * nx
            wsy = woy - 2.0 * won * ny
            wsz = woz - 2.0 * won * nz

        # dielectric (scene.h:194-218 + globals.h:111-126), compiled only
        # into scenes that contain a transmissive prim
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

        # lane select: wi, f, pdf — only the lobes this scene contains
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

        cos_wi = jnp.abs(_dot3(wix, wiy, wiz, nx, ny, nz))
        wgt = cos_wi / jnp.maximum(pdf, 1e-20)
        step_ok = alive & contrib_ok
        Tr = jnp.where(step_ok, Tr * fr * wgt, Tr)
        Tg = jnp.where(step_ok, Tg * fg * wgt, Tg)
        Tb = jnp.where(step_ok, Tb * fb * wgt, Tb)

        # ---- Russian roulette (pathtracer.cu:152-159)
        if bounce > rr_start:
            p_cont = jnp.minimum(0.5, jnp.maximum(Tr, jnp.maximum(Tg, Tb)))
            survive = u3 <= p_cont
            boost = step_ok & survive & (p_cont > 0.0)
            inv_p = 1.0 / jnp.maximum(p_cont, 1e-20)
            Tr = jnp.where(boost, Tr * inv_p, Tr)
            Tg = jnp.where(boost, Tg * inv_p, Tg)
            Tb = jnp.where(boost, Tb * inv_p, Tb)
            alive = step_ok & survive
        else:
            alive = step_ok
        if bounce == max_bounces:
            alive = jnp.zeros_like(alive)

        n_live = n_live + jnp.sum(alive.astype(jnp.int32))

        if bounce < max_bounces:
            # ---- next segment
            pox, poy, poz = hx, hy, hz
            prev_pdf = pdf
            prev_delta = (is_s | is_t) if (spec_prims or trans_prims) \
                else jnp.zeros(shape, jnp.bool_)
            (hit, bp, hx, hy, hz, nx, ny, nz, ar, ag, ab, coef, is_s, is_t,
             er, eg, eb) = intersect(hx, hy, hz, wix, wiy, wiz)
            alive = alive & hit
            wox, woy, woz = wix, wiy, wiz

    lr_ref[:, :] = Lr
    lg_ref[:, :] = Lg
    lb_ref[:, :] = Lb
    nrays_ref[tile, 0] = n_live


@functools.partial(
    jax.jit,
    static_argnames=("spp", "width", "height", "max_bounces", "rr_start",
                     "tile_rows", "use_nee", "interpret"),
)
def pallas_render(
    scene: Scene,
    cam_packed: Array,  # (24,) f32 pack_camera layout
    seed: Array,  # (3,) int32 [seed, iteration, salt]
    *,
    spp: int,
    width: int,
    height: int,
    max_bounces: int = 10,
    rr_start: int = 3,
    tile_rows: int = 16,
    use_nee: bool = False,
    interpret: bool = False,
):
    """Render via the fused kernel. Returns ((H, W, 3) image, rays traced).

    interpret=True runs through the Pallas TPU interpreter (CPU suite
    smoke path); the interpreter stubs the hardware PRNG to zeros, so the
    image is a deterministic all-zero-uniform render — structurally
    complete, statistically meaningless. Real validation is the TPU run.
    """
    prims = pack_prims(scene)
    n_prims = int(scene.num_prims)

    n_lanes = height * width * spp
    tile_lanes = tile_rows * LANES
    n_tiles = -(-n_lanes // tile_lanes)
    rows_total = n_tiles * tile_rows

    spec_prims = tuple(
        i for i, t in enumerate(scene.prim_mtypes) if t == SPECULAR
    )
    trans_prims = tuple(
        i for i, t in enumerate(scene.prim_mtypes) if t == TRANSMISSIVE
    )
    lights_static = tuple(scene.light_structure)
    lights_tab = pack_lights(scene)
    kernel = functools.partial(
        _trace_kernel,
        rows=tile_rows,
        n_prims=n_prims,
        emissive=tuple(scene.emissive_prims),
        spec_prims=spec_prims,
        trans_prims=trans_prims,
        lights_static=lights_static,
        use_nee=use_nee,
        spp=spp,
        width=width,
        max_bounces=max_bounces,
        rr_start=rr_start,
        tmin=EPSILON,
        n_lanes=n_lanes,
    )
    out_shape = [
        jax.ShapeDtypeStruct((rows_total, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows_total, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows_total, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, 1), jnp.int32),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # seed triple
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((n_prims, 12), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((24,), lambda i, *_: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec(lights_tab.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_rows, LANES), lambda i, *_: (i, 0)),
            pl.BlockSpec((tile_rows, LANES), lambda i, *_: (i, 0)),
            pl.BlockSpec((tile_rows, LANES), lambda i, *_: (i, 0)),
            # whole counter array stays resident; each tile writes its slot
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
    )
    lr, lg, lb, nrays = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, prims, cam_packed, lights_tab)

    lanes_r = lr.reshape(-1)[:n_lanes]
    lanes_g = lg.reshape(-1)[:n_lanes]
    lanes_b = lb.reshape(-1)[:n_lanes]
    img = jnp.stack([lanes_r, lanes_g, lanes_b], axis=-1)
    img = img.reshape(height, width, spp, 3).mean(axis=2)
    return img, jnp.sum(nrays)


def pack_camera(camera) -> Array:
    """Pack the camera's ray-gen basis for SMEM (generate_rays semantics).

    Layout (24 f32): first_ray_dir[0:3], px_x[3:6], px_y[6:9], pos[9:12],
    lens_radius[12], focal_distance[13], then the view axes u[14:17],
    v[17:20], w[20:23] (needed for the in-kernel thin-lens DOF path),
    pad[23]. Kernels that predate DOF read only the first 12 slots.
    """
    return jnp.concatenate(
        [
            camera.first_ray_dir,
            camera.px_x,
            camera.px_y,
            camera.pos,
            camera.lens_radius[None],
            camera.focal_distance[None],
            camera.view[0],
            camera.view[1],
            camera.view[2],
            jnp.zeros((1,), jnp.float32),
        ]
    ).astype(jnp.float32)


def pack_prims(scene: Scene) -> Array:
    """Per-prim SMEM table: cx cy cz r ax ay az coef mtype ex ey ez."""
    attrs = prim_attrs(scene)
    n_prims = int(scene.num_prims)
    return jnp.concatenate(
        [
            scene.centers[:n_prims],
            scene.radii[:n_prims, None],
            attrs.albedo[:n_prims],
            attrs.coef[:n_prims, None],
            attrs.mtype[:n_prims, None].astype(jnp.float32),
            attrs.emission[:n_prims],
        ],
        axis=1,
    )


def pack_lights(scene: Scene) -> Array:
    """Light table for in-kernel NEE: pos3 intensity3 cdf_lo sel_pdf.

    Power-proportional selection probabilities matching ops/lights.py
    (the reference's dead Distribution1D, live — scene.h:150-170).
    """
    lights_static = tuple(scene.light_structure)
    if not lights_static:
        return jnp.zeros((1, 8), jnp.float32)
    rows_l = []
    powers = []
    lum_w = jnp.asarray([0.212671, 0.715160, 0.072169])
    for li, (ltype, lprim) in enumerate(lights_static):
        inten = scene.light_intensity[li]
        lum = jnp.sum(inten * lum_w)
        if ltype == 1 and lprim >= 0:
            r = scene.radii[lprim]
            powers.append(lum * 4.0 * jnp.pi * r * r)
            pos = scene.centers[lprim]
        elif ltype == 2:
            # TRI_LIGHT: power = luminance x total emissive area (same
            # weighting as ops/lights.light_selection_dist)
            powers.append(lum * scene.tl_area[li])
            pos = scene.light_pos[li]
        else:
            powers.append(lum)
            pos = scene.light_pos[li]
        rows_l.append((pos, inten))
    pw = jnp.stack(powers)
    total = jnp.maximum(jnp.sum(pw), 1e-20)
    sel = pw / total
    cdf_lo = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(sel)[:-1]])
    return jnp.stack(
        [
            jnp.concatenate([pos, inten, cdf_lo[li, None], sel[li, None]])
            for li, (pos, inten) in enumerate(rows_l)
        ]
    ).astype(jnp.float32)
