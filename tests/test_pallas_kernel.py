"""Tests for the fused Pallas trace kernel (legacy per-sample kernel).

The statistical tests are TPU-only (the kernel draws from the TPU
hardware PRNG, which the Pallas interpreter stubs to zeros): on a TPU
chip, the kernel must agree with the XLA wavefront integrator in
distribution (same estimator, different RNG streams) and be
deterministic. Run manually on TPU:
  python -m pytest tests/test_pallas_kernel.py --no-header
(without the conftest CPU override:  TPUPT_TPU_TESTS=1)

The CPU suite still EXECUTES the whole kernel through the interpreter
(test_interpret_smoke): with all-zero uniforms the image is
deterministic and statistically meaningless, but every code path —
ray gen, the bounce unroll, all three BSDFs, NEE, accumulation —
lowers and runs, so structural regressions surface without a chip.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

tpu_only = pytest.mark.skipif(
    jax.devices()[0].platform == "cpu",
    reason="distribution tests need the TPU hardware PRNG",
)

from tpu_pathtracer.models import camera as cm, scene as sc
from tpu_pathtracer.models.integrator import RenderConfig, render_image
from tpu_pathtracer.ops.pallas.trace_kernel import pallas_render, pack_camera


def test_interpret_smoke():
    """The full kernel executes on CPU via the Pallas interpreter: finite
    image of the right shape, ray counter >= the primary count (zeros-PRNG
    render; statistical agreement is the TPU-only tests below)."""
    scene, cs = sc.cornell_spheres()
    W, H, SPP = 32, 24, 2
    cam = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], W, H, cs["fov"])
    for nee in (False, True):
        img, nrays = pallas_render(
            scene, pack_camera(cam), jnp.asarray([1, 0, 0], jnp.int32),
            spp=SPP, width=W, height=H, max_bounces=3, tile_rows=8,
            use_nee=nee, interpret=True,
        )
        img = np.asarray(img)
        assert img.shape == (H, W, 3)
        assert np.isfinite(img).all()
        assert int(nrays) >= W * H * SPP


@tpu_only
def test_matches_xla_integrator_in_distribution():
    scene, cs = sc.cornell_spheres()
    W, H, SPP, MB = 64, 48, 4, 10
    cam = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], W, H, cs["fov"])
    acc_p = acc_x = 0.0
    for it in range(15):
        ip, _ = pallas_render(
            scene, pack_camera(cam), jnp.asarray([0, it, 7], jnp.int32),
            spp=SPP, width=W, height=H, max_bounces=MB,
        )
        acc_p += float(jnp.mean(ip))
        acc_x += float(
            jnp.mean(render_image(scene, cam, jax.random.key(0),
                                  RenderConfig(spp=SPP, max_bounces=MB),
                                  iteration=it))
        )
    assert abs(acc_p / acc_x - 1.0) < 0.03


@tpu_only
def test_deterministic_and_iteration_decorrelated():
    scene, cs = sc.single_sphere()
    cam = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], 32, 32, cs["fov"])
    kw = dict(spp=4, width=32, height=32, max_bounces=3)
    a, na = pallas_render(scene, pack_camera(cam), jnp.asarray([0, 0, 7], jnp.int32), **kw)
    b, _ = pallas_render(scene, pack_camera(cam), jnp.asarray([0, 0, 7], jnp.int32), **kw)
    c, _ = pallas_render(scene, pack_camera(cam), jnp.asarray([0, 1, 7], jnp.int32), **kw)
    assert np.array_equal(np.array(a), np.array(b))
    assert not np.array_equal(np.array(a), np.array(c))
    assert int(na) >= 32 * 32 * 4  # at least the primary rays


@tpu_only
def test_tile_size_invariance():
    """Same seed, different tile_rows -> different streams per tile, but the
    estimator mean must agree within MC tolerance."""
    scene, cs = sc.cornell_spheres()
    cam = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], 64, 48, cs["fov"])
    means = []
    for rows in (8, 32):
        acc = 0.0
        for it in range(10):
            img, _ = pallas_render(
                scene, pack_camera(cam), jnp.asarray([0, it, 7], jnp.int32),
                spp=4, width=64, height=48, max_bounces=10, tile_rows=rows,
            )
            acc += float(jnp.mean(img))
        means.append(acc / 10)
    assert abs(means[0] / means[1] - 1.0) < 0.05


@tpu_only
def test_nee_kernel_matches_xla_nee():
    """In-kernel NEE+MIS agrees with the XLA NEE integrator (MC tolerance;
    30 iterations — at 10 the two independent RNG streams still differ by
    several percent on the sparse single-sphere image)."""
    for name in ("single-sphere", "small"):
        scene, cs = sc.BUILTIN_SCENES[name]()
        cam = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], 48, 36, cs["fov"])
        acc_p = acc_x = 0.0
        for it in range(30):
            ip, _ = pallas_render(
                scene, pack_camera(cam), jnp.asarray([91, it, 7], jnp.int32),
                spp=4, width=48, height=36, max_bounces=5, use_nee=True,
            )
            acc_p += float(jnp.mean(ip))
            acc_x += float(jnp.mean(render_image(
                scene, cam, jax.random.key(91),
                RenderConfig(spp=4, max_bounces=5, use_nee=True), iteration=it)))
        assert abs(acc_p / acc_x - 1.0) < 0.05, (name, acc_p / acc_x)


@tpu_only
def test_nee_kernel_point_light():
    scene = sc.make_scene(
        [sc.sphere([0, -1e4 - 1, 0], 1e4, 0)],
        [sc.diffuse([0.7, 0.7, 0.7])],
        [sc.point_light([0, 3, 0], [40.0, 40.0, 40.0])],
    )
    cam = cm.make_camera([0, 2, 8], [0, 0, 0], [0, 1, 0], 32, 32, 60.0)
    img, _ = pallas_render(
        scene, pack_camera(cam), jnp.asarray([17, 0, 7], jnp.int32),
        spp=4, width=32, height=32, max_bounces=3, use_nee=True,
    )
    assert float(jnp.max(img)) > 0.1  # point light visible via NEE


@tpu_only
def test_packet_traversal_matches_xla():
    from tpu_pathtracer.models import meshes
    from tpu_pathtracer.models.mesh import build_bvh
    from tpu_pathtracer.ops.pallas.mesh_kernel import (
        intersect_mesh_packet, pack_mesh,
    )
    from tpu_pathtracer.ops.triangle import BIG, intersect_mesh

    v, f, uv = meshes.terrain(n=48, extent=80, height=10)
    mesh = build_bvh(v, f, uv, leaf_size=32)
    packed = pack_mesh(mesh)
    rng = np.random.default_rng(0)
    n = 2048
    o = jnp.asarray(np.stack([rng.uniform(-40, 40, n), rng.uniform(15, 30, n),
                              rng.uniform(-40, 40, n)], -1), jnp.float32)
    dd = rng.normal(size=(n, 3))
    dd[:, 1] = -np.abs(dd[:, 1]) - 0.2
    dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
    d = jnp.asarray(dd, jnp.float32)
    for sort in (False, True):
        ph = intersect_mesh_packet(packed, o, d, tmin=1e-3, sort=sort)
        ref = intersect_mesh(mesh, o, d, tmin=1e-3)
        tp_n, tx_n = np.array(ph.t), np.array(ref.t)
        hit_p, hit_x = tp_n < BIG / 2, tx_n < BIG / 2
        assert (hit_p == hit_x).all(), sort
        both = hit_p & hit_x
        np.testing.assert_allclose(tp_n[both], tx_n[both], rtol=1e-5)
        np.testing.assert_array_equal(np.array(ph.tri)[both],
                                      np.array(ref.tri)[both])


@tpu_only
def test_packet_scene_render_matches_xla_mesh_path():
    from tpu_pathtracer.models import meshes
    from tpu_pathtracer.models.mesh import build_bvh
    from tpu_pathtracer.models.scene import with_packet_mesh

    v, f, uv = meshes.quad([-10, 0, 10], [10, 0, 10], [10, 0, -10], [-10, 0, -10])
    mesh = build_bvh(v, f, uv, material_id=0, leaf_size=32)
    scene = sc.make_scene(
        [sc.sphere([0, 15, 0], 3.0, 1, 0)],
        [sc.diffuse([0.6, 0.6, 0.6]), sc.diffuse([1, 1, 1])],
        [sc.area_light(0, [40, 40, 40])],
        mesh=mesh,
    )
    cam = cm.make_camera([0, 12, 12], [0, 0, 0], [0, 1, 0], 32, 24, 60.0)
    cfg = RenderConfig(spp=2, max_bounces=2, use_nee=True)
    a = render_image(scene, cam, jax.random.key(0), cfg)
    b = render_image(with_packet_mesh(scene), cam, jax.random.key(0), cfg)
    # identical RNG + equivalent traversal -> identical images (fp-tolerant)
    np.testing.assert_allclose(np.array(a), np.array(b), rtol=1e-4, atol=1e-5)
