"""Camera-pose tangent kernel (ops/pallas/camera_jvp.py) vs finite
differences and the XLA attached-autodiff estimator.

The kernel propagates one packed-camera tangent through the persistent
regeneration walk (attached sampling, detached discrete decisions) — the
same interior/edge-free estimator class as
test_gradients.py::test_grad_camera_pose_matches_fd_edge_free. FD runs
against the kernel's OWN primal at the SAME seeds: on the edge-free
fixture (floor + point light, 1 bounce) the estimate is a continuous
function of camera position under fixed uniforms, so per-seed FD is
well-defined. The z (depth) component's FD quotient is f32-noise-bound
(the value's relative noise ~1e-3 swamps 2*eps*grad at small eps), so it
gets a wider eps and an absolute tolerance.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pathtracer.models import camera as cm, scene as sc
from tpu_pathtracer.ops.pallas.camera_jvp import (
    camera_jvp_call, camera_weighted_grad,
)
from tpu_pathtracer.ops.pallas.trace_kernel import pack_camera

W, H, TR = 16, 12, 8
SPP, MB, BUD = 2, 1, 5


def _fixture():
    scene = sc.make_scene(
        [sc.sphere([0, -1e4, 0], 1e4, 0)],
        [sc.diffuse([0.8, 0.8, 0.8])],
        [sc.point_light([2, 4, 1], [30, 30, 30])],
    )
    cam = cm.make_camera([0, 3, 6], [0, 0, 0], [0, 1, 0], W, H, 45.0)
    w = jnp.asarray(np.random.default_rng(1).random((H, W, 3), np.float32))
    return scene, cam, w


def _primal(scene, cam, w, seed, use_nee):
    L, _dL, ns, _ = camera_jvp_call(
        scene, pack_camera(cam), jnp.zeros(24), seed, jnp.int32(0),
        spp=SPP, budget=BUD, width=W, height=H, max_bounces=MB,
        tile_rows=TR, use_nee=use_nee, interpret=True,
    )
    nsafe = jnp.maximum(ns, 1).astype(jnp.float32)[..., None]
    mean = (L / nsafe).reshape(-1, 3)[: W * H].reshape(H, W, 3)
    return float(jnp.sum(w * mean))


@pytest.mark.parametrize("use_nee", [True])
def test_camera_pos_grad_matches_fd(use_nee):
    # NEE-only: the edge-free fixture's only illumination is the point
    # light, which brute force can never hit (delta emitter) — brute-mode
    # tangents are exercised by test_camera_grad_finite_on_cornell.
    scene, cam, w = _fixture()
    seed = jnp.asarray([5, 2], jnp.int32)
    val, g = camera_weighted_grad(
        scene, cam, seed, w, spp=SPP, max_bounces=MB, budget=BUD,
        tile_rows=TR, use_nee=use_nee, interpret=True,
    )
    g = np.asarray(g["pos"])
    assert np.isfinite(g).all() and np.abs(g).max() > 1.0

    p0 = np.asarray(cam.pos)

    def f(pos):
        return _primal(scene, cam.replace(pos=jnp.asarray(pos, jnp.float32)),
                       w, seed, use_nee)

    # x/y: strong gradients, tight FD
    for i, eps in ((0, 8e-3), (1, 8e-3)):
        dp = np.zeros(3)
        dp[i] = eps
        fd = (f(p0 + dp) - f(p0 - dp)) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=2e-2, atol=1e-2)
    # z: f32 value noise bounds the quotient — wide eps, absolute band
    dp = np.zeros(3)
    dp[2] = 3e-2
    fd_z = (f(p0 + dp) - f(p0 - dp)) / (2 * 3e-2)
    np.testing.assert_allclose(g[2], fd_z, rtol=0.2, atol=0.5)


def _mesh_fixture():
    """Edge-free MESH fixture: a quad floor (2 triangles, in-kernel BVH
    walk) + point light — the mesh analogue of _fixture(); flat-triangle
    tangents (dn = 0) and the IFT position tangent are the terms under
    test."""
    from tpu_pathtracer.models import meshes
    from tpu_pathtracer.models.mesh import build_bvh

    v, f, uv = meshes.quad([-10, 0, -10], [-10, 0, 10], [10, 0, 10],
                           [10, 0, -10])
    mesh = build_bvh(v, f, uv, 0)
    scene = sc.make_scene(
        [], [sc.diffuse([0.8, 0.8, 0.8])],
        [sc.point_light([2, 4, 1], [30, 30, 30])],
        mesh=mesh,
    )
    scene = sc.with_packet_mesh(scene)
    cam = cm.make_camera([0, 3, 6], [0, 0, 0], [0, 1, 0], W, H, 45.0)
    w = jnp.asarray(np.random.default_rng(3).random((H, W, 3), np.float32))
    return scene, cam, w


def test_camera_pos_grad_matches_fd_mesh():
    """MESH-scene camera-position gradients through the tangent kernel's
    in-kernel BVH walk match finite differences of the kernel's own
    primal (same seeds) — closes the 'sphere scenes only' scope note."""
    scene, cam, w = _mesh_fixture()
    seed = jnp.asarray([9, 4], jnp.int32)
    val, g = camera_weighted_grad(
        scene, cam, seed, w, spp=SPP, max_bounces=MB, budget=BUD,
        tile_rows=TR, use_nee=True, interpret=True,
    )
    g = np.asarray(g["pos"])
    assert np.isfinite(g).all() and np.abs(g).max() > 1.0

    p0 = np.asarray(cam.pos)

    def f(pos):
        return _primal(scene, cam.replace(pos=jnp.asarray(pos, jnp.float32)),
                       w, seed, True)

    for i, eps in ((0, 8e-3), (1, 8e-3)):
        dp = np.zeros(3)
        dp[i] = eps
        fd = (f(p0 + dp) - f(p0 - dp)) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=2e-2, atol=1e-2)
    dp = np.zeros(3)
    dp[2] = 3e-2
    fd_z = (f(p0 + dp) - f(p0 - dp)) / (2 * 3e-2)
    np.testing.assert_allclose(g[2], fd_z, rtol=0.2, atol=0.5)


def test_camera_grad_finite_on_cornell():
    """Mirror + dielectric lanes through the tangent chain (reflect /
    refract JVPs) stay finite and nonzero on the production scene."""
    scene, cs = sc.cornell_spheres()
    cam = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], W, H, cs["fov"])
    w = jnp.ones((H, W, 3)) / (H * W * 3)
    _, g = camera_weighted_grad(
        scene, cam, jnp.asarray([7, 1], jnp.int32), w, spp=SPP,
        max_bounces=4, budget=8, tile_rows=TR, use_nee=False,
        interpret=True,
    )
    g = np.asarray(g["pos"])
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def _area_fixture():
    """Edge-free fixture with a sphere AREA light out of frame: floor
    sphere fills the view, the light hangs above/behind the camera —
    camera motion moves no silhouette through a pixel, so per-seed FD of
    the kernel's own primal is well-defined for the attached-cone NEE
    tangents (light-sample reparameterization, pdf + MIS motion)."""
    scene = sc.make_scene(
        [sc.sphere([0, -1e4, 0], 1e4, 0),
         sc.sphere([2, 6, 4], 0.8, 1, light=0)],
        [sc.diffuse([0.8, 0.8, 0.8]), sc.diffuse([0, 0, 0])],
        [sc.area_light(1, [40, 40, 40])],
    )
    cam = cm.make_camera([0, 3, 6], [0, 0, -2], [0, 1, 0], W, H, 45.0)
    w = jnp.asarray(np.random.default_rng(7).random((H, W, 3), np.float32))
    return scene, cam, w


def test_camera_pos_grad_matches_fd_area_nee():
    """Sphere-area NEE tangents (VERDICT r4 item 2): the attached cone
    sample, its pdf and the MIS weight all move with the camera; FD of
    the kernel's own primal at the same seeds must match."""
    scene, cam, w = _area_fixture()
    seed = jnp.asarray([11, 6], jnp.int32)
    val, g = camera_weighted_grad(
        scene, cam, seed, w, spp=SPP, max_bounces=MB, budget=BUD,
        tile_rows=TR, use_nee=True, interpret=True,
    )
    g = np.asarray(g["pos"])
    assert np.isfinite(g).all() and np.abs(g).max() > 0.1

    p0 = np.asarray(cam.pos)

    def f(pos):
        return _primal(scene, cam.replace(pos=jnp.asarray(pos, jnp.float32)),
                       w, seed, True)

    for i, eps in ((0, 8e-3), (1, 8e-3)):
        dp = np.zeros(3)
        dp[i] = eps
        fd = (f(p0 + dp) - f(p0 - dp)) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=2e-2, atol=1e-2)
    dp = np.zeros(3)
    dp[2] = 3e-2
    fd_z = (f(p0 + dp) - f(p0 - dp)) / (2 * 3e-2)
    np.testing.assert_allclose(g[2], fd_z, rtol=0.2, atol=0.5)


def _tri_fixture():
    """Edge-free TRI_LIGHT fixture: quad floor mesh + emissive quad out
    of frame (the mesh analogue of _area_fixture)."""
    from tpu_pathtracer.models import meshes
    from tpu_pathtracer.models.mesh import build_bvh

    v, fc, uv = meshes.quad([-10, 0, -10], [-10, 0, 10], [10, 0, 10],
                            [10, 0, -10])
    lv, lf, luv = meshes.quad([1, 6, 3], [3, 6, 3], [3, 6, 5], [1, 6, 5])
    mesh = build_bvh(*meshes.merge((v, fc, uv, 0), (lv, lf, luv, 1)))
    scene = sc.make_scene(
        [], [sc.diffuse([0.8, 0.8, 0.8]), sc.diffuse([0, 0, 0])],
        [sc.tri_light(1, [40, 40, 40])],
        mesh=mesh,
    )
    scene = sc.with_packet_mesh(scene)
    cam = cm.make_camera([0, 3, 6], [0, 0, -2], [0, 1, 0], W, H, 45.0)
    w = jnp.asarray(np.random.default_rng(9).random((H, W, 3), np.float32))
    return scene, cam, w


def test_camera_pos_grad_matches_fd_tri_nee():
    """TRI_LIGHT NEE tangents (VERDICT r4 item 2): the sampled emitter
    point is camera-independent, so tangents flow only through the
    shading point (distance, direction, pdf, MIS); FD-validated against
    the kernel's own primal."""
    scene, cam, w = _tri_fixture()
    seed = jnp.asarray([13, 8], jnp.int32)
    val, g = camera_weighted_grad(
        scene, cam, seed, w, spp=SPP, max_bounces=MB, budget=BUD,
        tile_rows=TR, use_nee=True, interpret=True,
    )
    g = np.asarray(g["pos"])
    assert np.isfinite(g).all() and np.abs(g).max() > 0.1

    p0 = np.asarray(cam.pos)

    def f(pos):
        return _primal(scene, cam.replace(pos=jnp.asarray(pos, jnp.float32)),
                       w, seed, True)

    for i, eps in ((0, 8e-3), (1, 8e-3)):
        dp = np.zeros(3)
        dp[i] = eps
        fd = (f(p0 + dp) - f(p0 - dp)) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=2e-2, atol=1e-2)
    dp = np.zeros(3)
    dp[2] = 3e-2
    fd_z = (f(p0 + dp) - f(p0 - dp)) / (2 * 3e-2)
    np.testing.assert_allclose(g[2], fd_z, rtol=0.2, atol=0.5)


def test_camera_grad_finite_on_cornell_nee():
    """The quality-default transport on the flagship scene: area-light
    NEE+MIS through the tangent chain stays finite and nonzero (the
    round-4 kernel refused this configuration outright)."""
    scene, cs = sc.cornell_spheres()
    cam = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], W, H, cs["fov"])
    w = jnp.ones((H, W, 3)) / (H * W * 3)
    _, g = camera_weighted_grad(
        scene, cam, jnp.asarray([7, 1], jnp.int32), w, spp=SPP,
        max_bounces=4, budget=8, tile_rows=TR, use_nee=True,
        interpret=True,
    )
    g = np.asarray(g["pos"])
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0
