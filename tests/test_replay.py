"""Path-replay backprop vs the autodiff estimator.

Both differentiate the SAME detached-sampling estimator, so their
gradients must agree to float tolerance — but replay stores no per-bounce
residuals (its backward is a second forward walk).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pathtracer.diff.replay import render_replay, trace_replay
from tpu_pathtracer.models import camera as cm, scene as sc
from tpu_pathtracer.models.integrator import RenderConfig, render


def setup(name="cornell", w=12, h=10, spp=2, bounces=3, nee=False):
    scene, cs = sc.BUILTIN_SCENES[name]()
    cam = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], w, h, cs["fov"])
    cfg = RenderConfig(spp=spp, max_bounces=bounces, detach_sampling=True,
                       use_nee=nee)
    return scene, cam, cfg


def grads_autodiff(scene, cam, cfg, key, weights):
    def f(params):
        s = scene.replace(mat_color=params[0], light_intensity=params[1])
        return jnp.sum(render(s, cam, key, cfg) * weights)

    return jax.grad(f)((scene.mat_color, scene.light_intensity))


def grads_replay(scene, cam, cfg, key, weights):
    def f(params):
        s = scene.replace(mat_color=params[0], light_intensity=params[1])
        return jnp.sum(render_replay(s, cam, key, cfg) * weights)

    return jax.grad(f)((scene.mat_color, scene.light_intensity))


@pytest.mark.parametrize("bounces,nee", [(1, False), (3, False), (6, False),
                                         (1, True), (3, True)])
def test_replay_matches_autodiff(bounces, nee):
    scene, cam, cfg = setup(bounces=bounces, nee=nee)
    key = jax.random.key(4)
    rng = np.random.default_rng(0)
    weights = jnp.asarray(
        rng.random((cam.height, cam.width, 3), np.float32)
    )
    gA_a, gI_a = grads_autodiff(scene, cam, cfg, key, weights)
    gA_r, gI_r = grads_replay(scene, cam, cfg, key, weights)
    np.testing.assert_allclose(
        np.array(gA_r), np.array(gA_a), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.array(gI_r), np.array(gI_a), rtol=2e-3, atol=2e-5
    )
    assert np.abs(np.array(gA_r)).max() > 0
    assert np.abs(np.array(gI_r)).max() > 0


@pytest.mark.parametrize("name,nee", [
    ("cornell-boxes", False), ("cornell-boxes", True),
    ("cornell-quad", False), ("cornell-quad", True),
])
def test_replay_matches_autodiff_mesh(name, nee):
    """Mesh scenes route the albedo adjoint through the unified Hit.mat id
    and TRI_LIGHT emitter hits through the material->light map — gradients
    must equal autodiff of the same detached estimator (XLA traversal)."""
    scene, cam, cfg = setup(name=name, bounces=3, nee=nee)
    key = jax.random.key(9)
    rng = np.random.default_rng(1)
    weights = jnp.asarray(
        rng.random((cam.height, cam.width, 3), np.float32)
    )
    gA_a, gI_a = grads_autodiff(scene, cam, cfg, key, weights)
    gA_r, gI_r = grads_replay(scene, cam, cfg, key, weights)
    np.testing.assert_allclose(
        np.array(gA_r), np.array(gA_a), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.array(gI_r), np.array(gI_a), rtol=2e-3, atol=2e-5
    )
    assert np.abs(np.array(gA_r)).max() > 0
    assert np.abs(np.array(gI_r)).max() > 0


@pytest.mark.parametrize("nee", [False, True])
def test_replay_primal_matches_render(nee):
    scene, cam, cfg = setup(bounces=5, nee=nee)
    key = jax.random.key(7)
    a = np.array(render(scene, cam, key, cfg))
    b = np.array(render_replay(scene, cam, key, cfg))
    # Same estimator, same streams — but separately-fused XLA programs
    # (render's scan is intersect-first), so float contraction differs at
    # the last few ulps of the accumulated radiance.
    np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-6)


def test_replay_with_rr_finite():
    """Deep bounces with Russian roulette active: gradients stay finite and
    match autodiff (both use the same detached RR decisions)."""
    scene, cam, cfg = setup(bounces=8)
    key = jax.random.key(2)
    weights = jnp.ones((cam.height, cam.width, 3))
    gA_a, gI_a = grads_autodiff(scene, cam, cfg, key, weights)
    gA_r, gI_r = grads_replay(scene, cam, cfg, key, weights)
    assert np.all(np.isfinite(np.array(gA_r)))
    np.testing.assert_allclose(np.array(gA_r), np.array(gA_a), rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.array(gI_r), np.array(gI_a), rtol=5e-3, atol=5e-5)
