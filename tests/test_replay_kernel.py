"""Fused value-and-grad replay kernel (ops/pallas/replay_kernel).

Runs on CPU through the Pallas interpreter with external uniforms. The
oracle is jax.grad of a pure-JAX REPLICA of the kernel's forward walk fed
the SAME uniform stream: the kernel's streaming adjoint (applied after the
walk by linearity) must match reverse-mode autodiff of the identical
detached-sampling estimator to float tolerance.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pathtracer.models import camera as cm, scene as sc
from tpu_pathtracer.models.scene import EPSILON, prim_attrs
from tpu_pathtracer.ops import bsdf, vecmath as vm
from tpu_pathtracer.ops.intersect import intersect, intersect_p
from tpu_pathtracer.ops.pallas.replay_kernel import (
    broadcast_pixels_to_lanes, lanes_layout, mse_value_and_grad, replay_call,
)
from tpu_pathtracer.ops.pallas.trace_kernel import LANES, pack_camera
from kernel_ref import kernel_bsdf_sample as _kernel_bsdf_sample

W, H, SPP, TR = 16, 12, 4, 8
MB, RRS = 3, 3


def _uniform_stream(seed, iteration, n_draw, n_tiles):
    """The kernel's external-RNG blocks, flattened to (n_draw, lanes)."""
    rkey = jax.random.fold_in(
        jax.random.fold_in(jax.random.key(1), seed[0] + 131 * seed[1]),
        iteration,
    )
    blk = n_draw * TR
    out = []
    for t in range(n_tiles):
        u = jax.random.uniform(jax.random.fold_in(rkey, t), (blk, LANES))
        out.append(np.asarray(u).reshape(n_draw, TR * LANES))
    return jnp.asarray(np.concatenate(out, axis=1))  # (n_draw, lanes_total)


def _replica_radiance(scene, camera, U, use_nee):
    """Differentiable pure-JAX forward matching the kernel walk: per-lane
    radiance as a function of (mat_color, light_intensity)."""
    n_lanes_tot = U.shape[1]
    n_lanes = W * H * SPP
    lane = jnp.arange(n_lanes_tot, dtype=jnp.int32)
    in_domain = lane < n_lanes
    pix = jnp.clip(lane // SPP, 0, W * H - 1)
    s_id = lane % SPP
    px = pix % W
    py = pix // W
    attrs = prim_attrs(scene)
    P = scene.centers.shape[0]

    cell = s_id % 4
    jx = ((cell % 2).astype(jnp.float32) + U[0]) / 2.0 - 0.5
    jy = ((cell // 2).astype(jnp.float32) + U[1]) / 2.0 - 0.5
    o, d = cm.generate_rays(camera, px, py, jx, jy)

    L = jnp.zeros((n_lanes_tot, 3))
    T = jnp.ones((n_lanes_tot, 3))
    alive = in_domain
    prev_pdf = jnp.zeros(n_lanes_tot)
    prev_delta = jnp.ones(n_lanes_tot, bool)
    di = 2
    sg = jax.lax.stop_gradient

    for b in range(MB + 1):
        u1, u2, u3 = U[di], U[di + 1], U[di + 2]
        di += 3
        if use_nee:
            ul1, ul2, usel = U[di], U[di + 1], U[di + 2]
            di += 3
        h = intersect(scene, attrs, o, d, tmin=EPSILON)
        act = alive & h.hit
        wo = d
        one_sided = vm.dot(h.n, -wo) > 0.0
        take = (act & one_sided).astype(jnp.float32)
        if use_nee:
            # kernel's inline MIS counter-pdf (sphere-light cone pdf)
            ldp = jnp.zeros(n_lanes_tot)
            for li, (ltype, lprim) in enumerate(scene.light_structure):
                if ltype != 1 or lprim < 0:
                    continue
                sel = _sel_pdf(scene, li)
                dl = scene.centers[lprim] - o
                d2l = vm.length_sq(dl)
                rl = scene.radii[lprim]
                ctm = jnp.sqrt(jnp.maximum(
                    1.0 - jnp.minimum(rl * rl / jnp.maximum(d2l, 1e-12), 1.0),
                    0.0))
                pc = 1.0 / (2.0 * jnp.pi * jnp.maximum(1.0 - ctm, 1e-12))
                pc = jnp.where(d2l > rl * rl, pc, 0.0)
                ldp = jnp.where(h.prim == lprim, pc * sel, ldp)
            pp2 = sg(prev_pdf * prev_pdf)
            ldp = sg(ldp)
            w_emit = jnp.where(
                prev_delta, 1.0, pp2 / jnp.maximum(pp2 + ldp * ldp, 1e-20)
            )
            take = take * w_emit
        L = L + T * h.emission * take[:, None]

        if use_nee:
            for li, (ltype, lprim) in enumerate(scene.light_structure):
                lo, sel = _sel_range(scene, li)
                n_lights = len(scene.light_structure)
                if li == n_lights - 1:
                    m_l = usel >= lo
                else:
                    m_l = (usel >= lo) & (usel < lo + sel)
                I_l = scene.light_intensity[li]
                if ltype == 1 and lprim >= 0:
                    wr = scene.centers[lprim] - h.p
                    rl = scene.radii[lprim]
                    d2l = vm.length_sq(wr)
                    distc = jnp.sqrt(jnp.maximum(d2l, 1e-20))
                    wc = wr / distc[:, None]
                    ctm = jnp.sqrt(jnp.maximum(
                        1.0 - jnp.minimum(
                            rl * rl / jnp.maximum(d2l, 1e-12), 1.0),
                        0.0))
                    cth = 1.0 - ul1 * (1.0 - ctm)
                    sth = jnp.sqrt(jnp.maximum(1.0 - cth * cth, 0.0))
                    phi = 2.0 * jnp.pi * ul2
                    usex = jnp.abs(wc[:, 0]) > jnp.abs(wc[:, 2])
                    a = jnp.where(
                        usex[:, None],
                        jnp.stack([-wc[:, 1], wc[:, 0],
                                   jnp.zeros_like(cth)], -1),
                        jnp.stack([jnp.zeros_like(cth), -wc[:, 2],
                                   wc[:, 1]], -1),
                    )
                    a = vm.normalize(a)
                    bv = jnp.cross(wc, a)
                    wl = (a * (jnp.cos(phi) * sth)[:, None]
                          + bv * (jnp.sin(phi) * sth)[:, None]
                          + wc * cth[:, None])
                    bq = vm.dot(wr, wl)
                    detq = bq * bq - d2l + rl * rl
                    thit = bq - jnp.sqrt(jnp.maximum(detq, 0.0))
                    valid = (detq >= 0.0) & (thit > EPSILON) & (d2l > rl * rl)
                    ns = (h.p + wl * thit[:, None]
                          - scene.centers[lprim]) / rl
                    valid = valid & (vm.dot(ns, -wl) > 0.0)
                    pdf_l = sel / (2.0 * jnp.pi * jnp.maximum(1.0 - ctm,
                                                              1e-12))
                    dist_l = thit
                    rad = jnp.broadcast_to(I_l, (n_lanes_tot, 3))
                    is_delta = False
                else:
                    wr = scene.light_pos[li] - h.p
                    d2l = vm.length_sq(wr)
                    dist_l = jnp.sqrt(jnp.maximum(d2l, 1e-20))
                    wl = wr / dist_l[:, None]
                    rad = I_l / jnp.maximum(d2l, 1e-12)[:, None]
                    pdf_l = jnp.full(n_lanes_tot, sel)
                    valid = dist_l > EPSILON
                    is_delta = True
                smax = dist_l * (1.0 - 1e-3) - EPSILON
                occ = intersect_p(scene, h.p, wl, tmin=EPSILON, tmax=smax)
                cos_l = vm.dot(wl, h.n)
                support = (cos_l > 0.0) & (vm.dot(wo, wl) < 0.0)
                support = support & (h.mtype == 0)
                if is_delta:
                    w_mis = 1.0
                else:
                    pdf_b_l = jnp.where(support, cos_l / jnp.pi, 0.0)
                    w_mis = sg((pdf_l * pdf_l) / jnp.maximum(
                        pdf_l * pdf_l + pdf_b_l * pdf_b_l, 1e-20))
                gate = (act & m_l & valid & support & ~occ
                        ).astype(jnp.float32)
                scale = gate * cos_l * w_mis / jnp.maximum(sg(pdf_l), 1e-20)
                L = L + T * (h.albedo / jnp.pi) * rad * scale[:, None]

        f_val, wi, pdf = _kernel_bsdf_sample(
            h.mtype, h.albedo, h.coef, wo, h.n, u1, u2
        )
        wi = sg(wi)
        pdf = sg(pdf)
        contrib_ok = ~vm.is_black(f_val) & (pdf > 0.0)
        cos_wi = jnp.abs(vm.dot(wi, h.n))
        weight = f_val * (cos_wi / jnp.maximum(pdf, 1e-20))[:, None]
        step_ok = act & contrib_ok
        T = jnp.where(step_ok[:, None], T * weight, T)
        if b > RRS:
            p_cont = sg(jnp.minimum(0.5, jnp.max(T, axis=-1)))
            survive = u3 <= p_cont
            boost = step_ok & survive & (p_cont > 0.0)
            T = jnp.where(boost[:, None],
                          T / jnp.maximum(p_cont, 1e-20)[:, None], T)
            alive = step_ok & survive & (b < MB)
        else:
            alive = step_ok & (b < MB)
        o = jnp.where(act[:, None], h.p, o)
        d = jnp.where(act[:, None], wi, d)
        prev_pdf = pdf
        prev_delta = h.mtype != 0
    return L


def _sel_pdf(scene, li):
    """Power-proportional selection prob of light li (pack_lights col 7).
    Detached: the kernel reads it from an SMEM table (no gradient)."""
    from tpu_pathtracer.ops.pallas.trace_kernel import pack_lights

    return jax.lax.stop_gradient(pack_lights(scene)[li, 7])


def _sel_range(scene, li):
    from tpu_pathtracer.ops.pallas.trace_kernel import pack_lights

    tab = jax.lax.stop_gradient(pack_lights(scene))
    return tab[li, 6], tab[li, 7]


@pytest.fixture(scope="module")
def cornell():
    scene, cs = sc.cornell_spheres()
    camera = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], W, H,
                            cs["fov"])
    return scene, camera


@pytest.mark.parametrize("nee", [False, True])
def test_grads_match_replica_autodiff(cornell, nee):
    """Kernel streaming adjoint == jax.grad of the replica on the SAME
    uniforms, for the MSE loss — the core correctness of the fused
    fwd+bwd pass."""
    scene, camera = cornell
    seed = jnp.asarray([2, 9], jnp.int32)
    rows_total, n_lanes = lanes_layout(W, H, SPP, TR)
    n_tiles = rows_total // TR
    n_draw = 2 + (MB + 1) * (3 + (3 if nee else 0))
    U = _uniform_stream((2, 9), 0, n_draw, n_tiles)

    rng = np.random.default_rng(3)
    target = jnp.asarray(rng.random((H, W, 3), np.float32))

    loss_k, grads_k, nrays = mse_value_and_grad(
        scene, camera, seed, 0, target, spp=SPP, max_bounces=MB,
        rr_start=RRS, tile_rows=TR, use_nee=nee, interpret=True,
    )
    assert int(nrays) > 0

    def replica_loss(mat_color, light_intensity):
        s = scene.replace(mat_color=mat_color,
                          light_intensity=light_intensity)
        Ll = _replica_radiance(s, camera, U, nee)[:n_lanes]
        img = Ll.reshape(H * W, SPP, 3).mean(axis=1).reshape(H, W, 3)
        return jnp.mean((img - target) ** 2)

    loss_r, (gA_r, gI_r) = jax.value_and_grad(
        replica_loss, argnums=(0, 1)
    )(scene.mat_color, scene.light_intensity)

    np.testing.assert_allclose(float(loss_k), float(loss_r), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(grads_k["mat_color"]), np.asarray(gA_r),
        rtol=2e-3, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(grads_k["light_intensity"]), np.asarray(gI_r),
        rtol=2e-3, atol=1e-7,
    )
    assert np.abs(np.asarray(grads_k["mat_color"])).max() > 0
    assert np.abs(np.asarray(grads_k["light_intensity"])).max() > 0


def test_vjp_mode_matches_mse_g(cornell):
    """vjp mode with the MSE cotangent reproduces mse-mode gradients."""
    scene, camera = cornell
    seed = jnp.asarray([5, 1], jnp.int32)
    rows_total, n_lanes = lanes_layout(W, H, SPP, TR)
    rng = np.random.default_rng(1)
    target = jnp.asarray(rng.random((H, W, 3), np.float32))

    loss, grads, _ = mse_value_and_grad(
        scene, camera, seed, 0, target, spp=SPP, max_bounces=MB,
        rr_start=RRS, tile_rows=TR, interpret=True,
    )
    # derive g from the primal lanes, feed it back through vjp mode
    aux_t = broadcast_pixels_to_lanes(target, SPP, rows_total)
    L_lanes, _, _, _, _ = replay_call(
        scene, pack_camera(camera), seed, jnp.int32(0), aux_t,
        spp=SPP, width=W, height=H, max_bounces=MB, rr_start=RRS,
        tile_rows=TR, mode="mse", interpret=True,
    )
    img = np.asarray(L_lanes).reshape(-1, 3)[:n_lanes]
    img = img.reshape(H * W, SPP, 3).mean(axis=1).reshape(H, W, 3)
    g_pix = 2.0 * (img - np.asarray(target)) / (H * W * 3)
    g_lanes = broadcast_pixels_to_lanes(
        jnp.asarray(g_pix / SPP), SPP, rows_total
    )
    _, _, gA_raw, gI_raw, _ = replay_call(
        scene, pack_camera(camera), seed, jnp.int32(0), g_lanes,
        spp=SPP, width=W, height=H, max_bounces=MB, rr_start=RRS,
        tile_rows=TR, mode="vjp", interpret=True,
    )
    gA = np.asarray(gA_raw / jnp.maximum(scene.mat_color, 1e-8))
    gI_full = jnp.zeros_like(scene.light_intensity)
    gI_full = gI_full.at[: gI_raw.shape[0]].set(gI_raw)
    gI = np.asarray(gI_full / jnp.maximum(scene.light_intensity, 1e-8))
    np.testing.assert_allclose(gA, np.asarray(grads["mat_color"]),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(gI, np.asarray(grads["light_intensity"]),
                               rtol=1e-5, atol=1e-8)


def test_sharded_kernel_grads_bit_identical(cornell):
    """kernel_loss_and_grads under a (tile, sample) mesh == single-device:
    global-tile RNG addressing makes the sharded walk trace the SAME paths,
    and the psum of per-tile partials is the same sum."""
    from tpu_pathtracer.diff.inverse import kernel_loss_and_grads, params_of
    from tpu_pathtracer.parallel.mesh import make_mesh

    scene, camera = cornell
    seed = jnp.asarray([4, 2], jnp.int32)
    rng = np.random.default_rng(7)
    target = jnp.asarray(rng.random((H, W, 3), np.float32))
    params = params_of(scene)

    mesh = make_mesh(jax.devices(), n_tile=4, n_sample=2)
    loss_s, grads_s = kernel_loss_and_grads(
        params, scene, camera, target, seed, 0, spp=SPP, max_bounces=MB,
        rr_start=RRS, tile_rows=TR, mesh=mesh, engine="sample",
        interpret=True,
    )
    loss_1, grads_1 = kernel_loss_and_grads(
        params, scene, camera, target, seed, 0, spp=SPP, max_bounces=MB,
        rr_start=RRS, tile_rows=TR, mesh=None, engine="sample",
        interpret=True,
    )
    np.testing.assert_allclose(float(loss_s), float(loss_1), rtol=1e-6)
    for k in grads_1:
        np.testing.assert_allclose(
            np.asarray(grads_s[k]), np.asarray(grads_1[k]),
            rtol=1e-5, atol=1e-8,
        )


def test_kernel_train_step_reduces_loss(cornell):
    """A few fused-kernel adam steps on a perturbed albedo move the loss
    down (same-seed inverse rendering, config-5 smoke)."""
    import optax

    from tpu_pathtracer.diff.inverse import (
        TrainState, init_state, make_kernel_train_step,
    )
    from tpu_pathtracer.models.integrator import RenderConfig
    from tpu_pathtracer.ops.pallas.replay_kernel import replay_call
    from tpu_pathtracer.ops.pallas.trace_kernel import pack_camera

    scene, camera = cornell
    config = RenderConfig(spp=SPP, max_bounces=MB)
    seed = jnp.asarray([11, 0], jnp.int32)

    # target: kernel's own forward at the true params, fixed iteration
    rows_total, n_lanes = lanes_layout(W, H, SPP, TR)
    aux0 = jnp.zeros((rows_total, LANES, 3), jnp.float32)
    L_lanes, *_ = replay_call(
        scene, pack_camera(camera), seed, jnp.int32(0), aux0,
        spp=SPP, width=W, height=H, max_bounces=MB, rr_start=RRS,
        tile_rows=TR, mode="vjp", interpret=True,
    )
    img = np.asarray(L_lanes).reshape(-1, 3)[:n_lanes]
    target = jnp.asarray(
        img.reshape(H * W, SPP, 3).mean(axis=1).reshape(H, W, 3)
    )

    optimizer = optax.adam(5e-2)
    perturbed = scene.replace(
        mat_color=jnp.clip(scene.mat_color * 0.6 + 0.1, 0.0, 1.0)
    )
    state = init_state(perturbed, optimizer)
    step = make_kernel_train_step(
        perturbed, camera, config, optimizer, fixed_iteration=0,
        tile_rows=TR, engine="sample", interpret=True,
    )
    _, loss0 = step(state, target.reshape(-1, 3), seed)
    for _ in range(4):
        state, loss = step(state, target.reshape(-1, 3), seed)
    assert float(loss) < float(loss0)
