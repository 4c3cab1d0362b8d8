"""Gradient correctness: autodiff vs central finite differences.

BASELINE.json north star: "gradient allclose (rtol 1e-2) vs finite
differences on the Cornell-box scene". With detached sampling and a fixed
RNG key, the rendered image is a deterministic, piecewise-smooth function
of albedo / emission intensity, so central differences of the SAME
estimator are well-defined and must match reverse-mode gradients.

RR is excluded from the FD configs (max_bounces <= rr_start) because the
roulette accept/reject makes the estimator discontinuous in throughput —
the detached estimator differentiates through a fixed decision set, which
FD with a throughput-perturbing step would not (documented estimator
choice; score-function handling is future work).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pathtracer.diff import inverse
from tpu_pathtracer.models import camera as cm, scene as sc
from tpu_pathtracer.models.integrator import RenderConfig, render


def scalar_render(scene, cam, key, cfg, weights):
    img = render(scene, cam, key, cfg)
    return jnp.sum(img * weights)


def fd_check(scene, cam, cfg, get_set, eps, rtol, atol=1e-4, seed=0):
    """Compare d(scalar image functional)/d(param) autodiff vs central FD."""
    key = jax.random.key(seed)
    rng = np.random.default_rng(1)
    weights = jnp.asarray(rng.random((cam.height, cam.width, 3), np.float32))

    getter, setter, shape = get_set
    p0 = getter(scene)

    def f(p):
        return scalar_render(setter(scene, p), cam, key, cfg, weights)

    g_auto = np.array(jax.grad(f)(p0))

    flat_idx = [tuple(i) for i in np.ndindex(*shape)]
    g_fd = np.zeros(shape, np.float64)
    for idx in flat_idx:
        dp = np.zeros(shape, np.float32)
        dp[idx] = eps
        dp = jnp.asarray(dp)
        g_fd[idx] = (float(f(p0 + dp)) - float(f(p0 - dp))) / (2 * eps)
    np.testing.assert_allclose(g_auto, g_fd, rtol=rtol, atol=atol)
    return g_auto


def cornell_small():
    scene, cs = sc.cornell_spheres()
    cam = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], 12, 10, cs["fov"])
    cfg = RenderConfig(spp=2, max_bounces=3)  # below rr_start: no RR
    return scene, cam, cfg


def test_grad_albedo_matches_fd():
    scene, cam, cfg = cornell_small()
    # One diffuse material (grey walls, id 3) — the dominant throughput path.
    get_set = (
        lambda s: s.mat_color[3],
        lambda s, p: s.replace(mat_color=s.mat_color.at[3].set(p)),
        (3,),
    )
    g = fd_check(scene, cam, cfg, get_set, eps=5e-3, rtol=1e-2, atol=2e-3)
    assert np.abs(g).max() > 1e-3  # gradient is not trivially zero


def test_grad_light_intensity_matches_fd():
    scene, cam, cfg = cornell_small()
    get_set = (
        lambda s: s.light_intensity[0],
        lambda s, p: s.replace(light_intensity=s.light_intensity.at[0].set(p)),
        (3,),
    )
    g = fd_check(scene, cam, cfg, get_set, eps=5e-2, rtol=1e-2, atol=2e-3)
    # Emission gradient must be strictly positive somewhere (more light ->
    # more radiance, linearly: L is linear in intensity).
    assert np.all(np.array(g) >= 0) and np.abs(g).max() > 1e-4


def test_grad_red_wall_color_single_channel():
    scene, cam, cfg = cornell_small()
    get_set = (
        lambda s: s.mat_color[1],
        lambda s, p: s.replace(mat_color=s.mat_color.at[1].set(p)),
        (3,),
    )
    fd_check(scene, cam, cfg, get_set, eps=5e-3, rtol=1e-2, atol=2e-3)


def test_grad_camera_params_finite_nonzero():
    """Camera gradients flow (no FD assertion — sampling detach makes the
    detached estimator differ from the primal beyond first order in pose)."""
    scene, cam, cfg = cornell_small()
    key = jax.random.key(0)

    def f(pos):
        return jnp.mean(render(scene, cam.replace(pos=pos), key, cfg))

    g = np.array(jax.grad(f)(cam.pos))
    assert np.all(np.isfinite(g)) and np.abs(g).max() > 0


def test_grad_with_rr_and_deep_bounces_finite():
    """Full config (RR active, specular+glass) must still produce finite
    gradients — no NaN leaks through sqrt/refract/division branches."""
    scene, cs = sc.cornell_spheres()
    cam = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], 8, 8, cs["fov"])
    cfg = RenderConfig(spp=2, max_bounces=8)
    key = jax.random.key(2)

    def f(params):
        s = inverse.apply_params(scene, params)
        return jnp.mean(render(s, cam, key, cfg))

    g = jax.grad(f)(inverse.params_of(scene))
    for k, v in g.items():
        assert np.all(np.isfinite(np.array(v))), k


def test_inverse_rendering_recovers_albedo():
    """Config 5 end-to-end: perturb the grey-wall albedo, run the sharded
    trainer, and verify the loss drops and albedo moves toward truth."""
    from tpu_pathtracer.parallel.mesh import make_mesh

    scene, cs = sc.cornell_spheres()
    cam = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], 16, 16, cs["fov"])
    cfg = RenderConfig(spp=4, max_bounces=3)
    mesh = make_mesh(jax.devices(), n_tile=4, n_sample=2)
    key = jax.random.key(0)

    # Same-seed formulation: target and estimate share RNG streams, so the
    # loss is exactly zero at the true parameters (no correlated-noise bias).
    target = inverse.render_target(scene, cam, key, cfg, n_iterations=1,
                                   base_iteration=0)

    true_albedo = np.array(scene.mat_color[3])
    params0 = inverse.params_of(scene)
    params0 = dict(params0)
    params0["mat_color"] = scene.mat_color.at[3].set(jnp.asarray([0.3, 0.3, 0.3]))

    optimizer = inverse.make_optimizer(lr=5e-2)
    state = inverse.init_state(scene, optimizer, params0)
    step_fn = inverse.make_train_step(scene, cam, cfg, mesh, optimizer,
                                      fixed_iteration=0)

    losses = []
    for _ in range(12):
        state, loss = step_fn(state, target, key)
        losses.append(float(loss))
    # The stochastic loss has an MC-noise floor (spp=4 estimator variance);
    # assert the average dropped, not a hard ratio on single evaluations.
    assert np.mean(losses[-4:]) < losses[0], losses
    got = np.array(state.params["mat_color"][3])
    # The optimized albedo moved measurably toward the true value from 0.3.
    d0 = np.linalg.norm(np.full(3, 0.3) - true_albedo)
    d1 = np.linalg.norm(got - true_albedo)
    assert d1 < 0.7 * d0, (got, true_albedo, d0, d1)


def test_inverse_rendering_recovers_mesh_albedo_via_replay():
    """Config 5 on real triangle geometry: perturb cornell-boxes' red-wall
    material and recover it by gradient descent through render_replay —
    the O(1)-memory path-replay adjoint routed via the unified Hit.mat id
    (mesh lanes included)."""
    import optax

    from tpu_pathtracer.diff.replay import render_replay

    scene, cs = sc.BUILTIN_SCENES["cornell-boxes"]()
    cam = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], 16, 12,
                         cs["fov"])
    # NEE: at this tiny size/spp the brute-force estimator's red-wall
    # paths never reach the emitter (image independent of the material);
    # direct-light sampling gives every diffuse hit a gradient signal.
    cfg = RenderConfig(spp=2, max_bounces=3, detach_sampling=True,
                       use_nee=True)
    key = jax.random.key(5)
    target = render(scene, cam, key, cfg, iteration=0)

    true_albedo = np.array(scene.mat_color[1])  # the red wall material

    def loss_fn(mat_color):
        s = scene.replace(mat_color=mat_color)
        img = render_replay(s, cam, key, cfg, iteration=0)
        return jnp.mean((img - target) ** 2)

    vg = jax.jit(jax.value_and_grad(loss_fn))
    opt = optax.adam(5e-2)
    mc = scene.mat_color.at[1].set(jnp.asarray([0.4, 0.55, 0.4]))
    opt_state = opt.init(mc)
    losses = []
    for _ in range(12):
        loss, g = vg(mc)
        up, opt_state = opt.update(g, opt_state)
        mc = jnp.clip(optax.apply_updates(mc, up), 0.0, 1.0)
        losses.append(float(loss))
    assert np.mean(losses[-4:]) < losses[0], losses
    got = np.array(mc[1])
    d0 = np.linalg.norm(np.array([0.4, 0.55, 0.4]) - true_albedo)
    d1 = np.linalg.norm(got - true_albedo)
    assert d1 < 0.7 * d0, (got, true_albedo, d0, d1)


def test_grad_camera_pose_matches_fd_edge_free():
    """Camera-pose gradients, FD-validated with ATTACHED sampling
    (detach_sampling=False -> the cosine-hemisphere draw is reparameterized
    through the normal) on an edge-free view: the floor fills the frame, a
    point light gives a smooth 1/d^2 field, so the integrand has no
    visibility discontinuities in pose. (With silhouettes in frame, FD
    picks up edge terms the interior gradient intentionally omits —
    SURVEY.md hard parts: edge-free assumption, documented.)"""
    scene = sc.make_scene(
        [sc.sphere([0, -1e4, 0], 1e4, 0)],
        [sc.diffuse([0.8, 0.8, 0.8])],
        [sc.point_light([2, 4, 1], [30, 30, 30])],
    )
    cam = cm.make_camera([0, 3, 6], [0, 0, 0], [0, 1, 0], 16, 12, 45.0)
    cfg = RenderConfig(spp=4, max_bounces=1, use_nee=True,
                       detach_sampling=False)
    key = jax.random.key(3)
    w = jnp.asarray(np.random.default_rng(1).random((12, 16, 3), np.float32))

    def f(pos):
        return jnp.sum(render(scene, cam.replace(pos=pos), key, cfg) * w)

    g = np.array(jax.grad(f)(cam.pos))
    eps = 8e-3  # below this, f32 evaluation noise dominates the quotient
    fd = np.zeros(3)
    for i in range(3):
        dp = jnp.zeros(3).at[i].set(eps)
        fd[i] = (float(f(cam.pos + dp)) - float(f(cam.pos - dp))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=2e-2, atol=1e-3)
    assert np.abs(g).max() > 1.0  # a real gradient, not a degenerate zero
