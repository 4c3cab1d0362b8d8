"""Integration tests for the wavefront integrator.

Strategy per SURVEY.md §4: (a) a straightforward per-bounce Python oracle
that follows the reference megakernel's control flow literally
(pathtracer.cu:112-170) and must agree with the lax.scan wavefront
machinery bit-for-bit on the same RNG streams; (b) physical invariants
(direct emitter visibility, non-negativity, reproducibility); (c) a golden
snapshot of BASELINE config 1.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pathtracer.models import camera as cm, scene as sc
from tpu_pathtracer.models.integrator import RenderConfig, render_image, trace
from tpu_pathtracer.models.scene import prim_attrs
from tpu_pathtracer.ops import bsdf, vecmath as vm
from tpu_pathtracer.ops.intersect import intersect
from tpu_pathtracer.utils import rng

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def oracle_trace(scene, o, d, lane_ids, it_key, max_bounces, rr_start=3):
    """Python-loop transcription of the reference Trace control flow.

    Uses the same component ops (intersect / bsdf.sample / rng) as the
    production integrator but wires them with eager per-bounce Python,
    mirroring pathtracer.cu:112-170 statement by statement.
    """
    attrs = prim_attrs(scene)
    n_rays = o.shape[0]
    L = np.zeros((n_rays, 3), np.float32)
    T = np.ones((n_rays, 3), np.float32)

    hit = intersect(scene, attrs, o, d)
    alive = np.array(hit.hit)
    wo = d
    for bounce in range(max_bounces + 1):
        u = np.array(rng.bounce_uniforms(it_key, bounce, lane_ids))
        hn, hp = np.array(hit.n), np.array(hit.p)
        emission = np.array(hit.emission)
        one_sided = np.array(vm.dot(hit.n, -wo)) > 0
        add = alive & one_sided
        L[add] += T[add] * emission[add]

        f, wi, pdf = bsdf.sample(
            hit.mtype, hit.albedo, hit.coef, wo,
            hit.n, jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]),
        )
        fn, pdfn = np.array(f), np.array(pdf)
        contrib_ok = ~(fn <= 0).all(-1) & (pdfn > 0)
        cos_wi = np.abs(np.array(vm.dot(wi, hit.n)))
        w = fn * (cos_wi / np.maximum(pdfn, 1e-20))[:, None]
        step_ok = alive & contrib_ok
        T[step_ok] *= w[step_ok]

        if bounce > rr_start:
            p_cont = np.minimum(0.5, T.max(-1))
            survive = u[:, 2] <= p_cont
            boost = step_ok & survive & (p_cont > 0)
            T[boost] /= p_cont[boost][:, None]
        else:
            survive = np.ones(n_rays, bool)

        alive = step_ok & survive & (bounce < max_bounces)
        hit = intersect(scene, attrs, jnp.asarray(hp), wi)
        alive = alive & np.array(hit.hit)
        wo = wi
    return L


@pytest.mark.parametrize("scene_name", ["single-sphere", "cornell"])
def test_wavefront_matches_reference_control_flow(scene_name):
    scene, cs = sc.BUILTIN_SCENES[scene_name]()
    cam = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], 16, 12, cs["fov"])
    it_key = rng.iteration_key(jax.random.key(7), 0)
    n = 16 * 12
    lane_ids = jnp.arange(n, dtype=jnp.int32)
    xs, ys = cm.pixel_grid(cam)
    o, d = cm.generate_rays(
        cam, xs.reshape(-1), ys.reshape(-1), jnp.zeros(n), jnp.zeros(n)
    )
    cfg = RenderConfig(spp=1, max_bounces=6, detach_sampling=False, remat=False)
    got = np.array(trace(scene, o, d, lane_ids, it_key, cfg))
    want = oracle_trace(scene, o, d, lane_ids, it_key, max_bounces=6)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_direct_emitter_visibility_equals_intensity():
    """A camera ray that hits the emitter front-face must read exactly the
    light intensity (pathtracer.cu:134-137 + light.h:43-45)."""
    scene = sc.make_scene(
        [sc.sphere([0, 0, -5], 1.0, 0, 0)],
        [sc.diffuse([1, 1, 1])],
        [sc.area_light(0, [11.0, 12.0, 13.0])],
    )
    cam = cm.make_camera([0, 0, 0], [0, 0, -5], [0, 1, 0], 8, 8, 40.0)
    img = np.array(render_image(scene, cam, jax.random.key(0), RenderConfig(spp=4, max_bounces=2)))
    center = img[4, 4]
    np.testing.assert_allclose(center, [11.0, 12.0, 13.0], rtol=1e-4)


def test_miss_is_black():
    scene = sc.make_scene(
        [sc.sphere([0, 0, -5], 0.1, 0)], [sc.diffuse([1, 1, 1])], []
    )
    cam = cm.make_camera([0, 0, 0], [0, 0, 5], [0, 1, 0], 8, 8, 60.0)  # look away
    img = np.array(render_image(scene, cam, jax.random.key(0), RenderConfig(spp=2, max_bounces=3)))
    np.testing.assert_array_equal(img, np.zeros_like(img))


def test_reproducible_and_iteration_decorrelated():
    scene, cs = sc.single_sphere()
    cam = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], 32, 32, cs["fov"])
    cfg = RenderConfig(spp=2, max_bounces=3)
    a = np.array(render_image(scene, cam, jax.random.key(0), cfg, iteration=0))
    b = np.array(render_image(scene, cam, jax.random.key(0), cfg, iteration=0))
    c = np.array(render_image(scene, cam, jax.random.key(0), cfg, iteration=1))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_outputs_finite_nonnegative():
    for name in ("cornell", "small", "single-sphere"):
        scene, cs = sc.BUILTIN_SCENES[name]()
        cam = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], 24, 18, cs["fov"])
        img = np.array(
            render_image(scene, cam, jax.random.key(3), RenderConfig(spp=2, max_bounces=10))
        )
        assert np.all(np.isfinite(img)), name
        assert np.all(img >= 0), name


def test_golden_config1():
    """BASELINE config 1 snapshot: single diffuse sphere + area light."""
    scene, cs = sc.single_sphere()
    cam = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], 128, 128, cs["fov"])
    cfg = RenderConfig(spp=16, max_bounces=2)
    img = np.array(render_image(scene, cam, jax.random.key(42), cfg))
    path = os.path.join(GOLDEN_DIR, "config1_128_16spp.npy")
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.save(path, img)
        pytest.skip("golden image generated; rerun to compare")
    want = np.load(path)
    np.testing.assert_allclose(img, want, rtol=1e-4, atol=1e-5)


def test_progressive_accumulation_converges_means():
    from tpu_pathtracer.models import progressive as prog

    scene, cs = sc.single_sphere()
    cam = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], 16, 16, cs["fov"])
    cfg = RenderConfig(spp=2, max_bounces=2)
    key = jax.random.key(5)
    state = prog.init_state(16, 16)
    frames = []
    for it in range(3):
        frames.append(
            np.array(render_image(scene, cam, key, cfg, iteration=it))
        )
        state = prog.step(state, scene, cam, key, cfg)
    np.testing.assert_allclose(
        np.array(prog.image(state)), np.mean(frames, axis=0), rtol=1e-5, atol=1e-6
    )
    assert int(state.iteration) == 3
    state = prog.reset(state)
    assert int(state.iteration) == 0
    assert float(np.abs(np.array(state.radiance_sum)).max()) == 0.0


def test_golden_cornell_nee():
    """Regression snapshot of the Cornell scene with NEE (config 2/3 class)."""
    scene, cs = sc.cornell_spheres()
    cam = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], 64, 48, cs["fov"])
    cfg = RenderConfig(spp=4, max_bounces=6, use_nee=True)
    img = np.array(render_image(scene, cam, jax.random.key(123), cfg))
    path = os.path.join(GOLDEN_DIR, "cornell_nee_64_4spp.npy")
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.save(path, img)
        pytest.skip("golden image generated; rerun to compare")
    want = np.load(path)
    np.testing.assert_allclose(img, want, rtol=1e-4, atol=1e-5)


def test_golden_cornell_boxes():
    """Regression snapshot of the triangle-mesh Cornell box (config 2)."""
    scene, cs = sc.cornell_boxes()
    cam = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], 48, 36, cs["fov"])
    cfg = RenderConfig(spp=2, max_bounces=4, use_nee=True)
    img = np.array(render_image(scene, cam, jax.random.key(5), cfg))
    path = os.path.join(GOLDEN_DIR, "cornell_boxes_48_2spp.npy")
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.save(path, img)
        pytest.skip("golden image generated; rerun to compare")
    want = np.load(path)
    np.testing.assert_allclose(img, want, rtol=1e-4, atol=1e-5)


def test_golden_cornell_glass():
    """Regression snapshot of config 3 proper: triangle-quad Cornell
    walls + mirror/glass spheres — the one fixture exercising mesh +
    dielectric together (paths refract through the glass ball and then
    hit triangle geometry)."""
    scene, cs = sc.cornell_glass()
    cam = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], 48, 36, cs["fov"])
    cfg = RenderConfig(spp=2, max_bounces=6, use_nee=True)
    img = np.array(render_image(scene, cam, jax.random.key(9), cfg))
    assert np.all(np.isfinite(img)) and np.all(img >= 0)
    # Distinct fixture semantics: colored side walls (camera-left is the
    # +x red wall), and the center rows are lit (not a black render).
    mid = img[12:24]
    assert mid.mean() > 1e-3
    left, right = img[:, :16].mean(axis=(0, 1)), img[:, 32:].mean(axis=(0, 1))
    assert left[0] > left[2], "camera-left should tint red"
    assert right[2] > right[0], "camera-right should tint blue"
    path = os.path.join(GOLDEN_DIR, "cornell_glass_48_2spp.npy")
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.save(path, img)
        pytest.skip("golden image generated; rerun to compare")
    want = np.load(path)
    np.testing.assert_allclose(img, want, rtol=1e-4, atol=1e-5)


def test_spp_nine_stratification():
    """Non-4 square spp (3x3 grid) renders and stays stratified."""
    scene, cs = sc.single_sphere()
    cam = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], 16, 16, cs["fov"])
    img = np.array(render_image(scene, cam, jax.random.key(0),
                                RenderConfig(spp=9, max_bounces=2, use_nee=True)))
    assert np.isfinite(img).all() and img.max() > 0


def test_zero_prim_padding_only_scene():
    """A scene whose padded rows dominate still renders (all misses black)."""
    scene = sc.make_scene([sc.sphere([0, 0, -500], 0.1, 0)],
                          [sc.diffuse([1, 1, 1])], [])
    cam = cm.make_camera([0, 0, 0], [0, 0, -1], [0, 1, 0], 8, 8, 30.0)
    img = np.array(render_image(scene, cam, jax.random.key(0),
                                RenderConfig(spp=2, max_bounces=2)))
    assert np.isfinite(img).all()


def test_progressive_plus_sharded_consistency():
    """Progressive accumulation of sharded frames equals accumulation of
    single-device frames (lane-keyed RNG makes the frames identical)."""
    from tpu_pathtracer.parallel.mesh import make_mesh
    from tpu_pathtracer.parallel.sharding import render_sharded_jit

    scene, cs = sc.single_sphere()
    cam = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], 16, 16, cs["fov"])
    cfg = RenderConfig(spp=4, max_bounces=2)
    mesh = make_mesh(jax.devices(), n_tile=4, n_sample=2)
    key = jax.random.key(8)
    acc_single = acc_shard = 0
    for it in range(3):
        acc_single = acc_single + np.array(
            render_image(scene, cam, key, cfg, iteration=it))
        acc_shard = acc_shard + np.array(
            render_sharded_jit(scene, cam, key, cfg, mesh, iteration=it))
    np.testing.assert_array_equal(acc_single, acc_shard)
