"""Inverse rendering: recover scene parameters by pixel-gradient descent.

BASELINE.json config 5: optimize Cornell-box albedo + light intensity to
match a target image, sharded over a device mesh. The reference has no
differentiability at all — this subsystem is the capability the TPU build
adds on top of forward parity (north star: "differentiable end-to-end,
detached-sampling / path-replay backprop").

Design:
  - Optimizable parameters are the scene's normalized tables
    (mat_color, light_intensity) — gradients flow through the in-jit
    denormalization (scene.prim_attrs) and the integrator's throughput
    products into the tables.
  - The loss is computed under shard_map over the (tile, sample) mesh:
    each shard renders its pixel/sample block, pmean over the sample axis
    forms the per-pixel estimate, a psum over the mesh forms the scalar
    loss — so jax.grad of the whole thing yields gradients whose
    all-reduce rides the same collectives (XLA inserts the transposed
    psum for the replicated params).
  - Sampling decisions are detached (RenderConfig.detach_sampling), the
    detached-sampling estimator validated against finite differences in
    tests/test_gradients.py.
"""
from __future__ import annotations

from functools import partial
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax import Array
from jax.sharding import PartitionSpec as P
from jax import shard_map

from tpu_pathtracer.models.camera import Camera
from tpu_pathtracer.models.integrator import RenderConfig, render, trace_pixels
from tpu_pathtracer.models.scene import Scene
from tpu_pathtracer.parallel.mesh import SAMPLE_AXIS, TILE_AXIS
from tpu_pathtracer.parallel.sharding import _lane_matrix
from tpu_pathtracer.utils import rng


@flax.struct.dataclass
class TrainState:
    params: dict  # {"mat_color": (M,3), "light_intensity": (L,3)}
    opt_state: Any
    step: Array


def params_of(scene: Scene, *, ior: bool = False) -> dict:
    """ior=True adds mat_coef (index of refraction) to the optimizable
    set — its gradient rides the fused IOR tangent kernel
    (ops/pallas/camera_jvp.ior_mse_grad) in kernel_loss_and_grads."""
    p = {
        "mat_color": scene.mat_color,
        "light_intensity": scene.light_intensity,
    }
    if scene.textures is not None:
        p["textures"] = scene.textures
    if ior:
        p["mat_coef"] = scene.mat_coef
    return p


def apply_params(scene: Scene, params: dict) -> Scene:
    """Clamp-free param injection; callers clamp post-update if desired."""
    scene = scene.replace(
        mat_color=params["mat_color"],
        light_intensity=params["light_intensity"],
    )
    if "textures" in params:
        scene = scene.replace(textures=params["textures"])
    if "mat_coef" in params:
        scene = scene.replace(mat_coef=params["mat_coef"])
    return scene


def _clamp_params(params: dict) -> dict:
    """Physical clamps: albedo/texels in [0,1], intensity >= 0, ior >= 1."""
    out = {
        "mat_color": jnp.clip(params["mat_color"], 0.0, 1.0),
        "light_intensity": jnp.maximum(params["light_intensity"], 0.0),
    }
    if "textures" in params:
        out["textures"] = jnp.clip(params["textures"], 0.0, 1.0)
    if "mat_coef" in params:
        out["mat_coef"] = jnp.maximum(params["mat_coef"], 1.0)
    return out


def make_optimizer(lr: float = 2e-2) -> optax.GradientTransformation:
    return optax.adam(lr)


def init_state(scene: Scene, optimizer: optax.GradientTransformation,
               init_params: dict | None = None) -> TrainState:
    params = init_params if init_params is not None else params_of(scene)
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def sharded_loss(
    params: dict,
    scene: Scene,
    camera: Camera,
    target: Array,  # (H*W, 3) flattened target image
    key: Array,
    config: RenderConfig,
    mesh: jax.sharding.Mesh,
    iteration: Array | int,
) -> Array:
    """Mean-squared pixel loss, computed fully on-mesh. Returns scalar."""
    spp = config.spp
    it_key = rng.iteration_key(key, iteration)
    lanes = _lane_matrix(camera, spp)
    n_pix = camera.height * camera.width

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(TILE_AXIS, SAMPLE_AXIS), P(TILE_AXIS)),
        out_specs=P(),
    )
    def block_loss(params_rep, scene_rep, camera_rep, lane_block, target_block):
        scene_p = apply_params(scene_rep, params_rep)
        rad = trace_pixels(
            scene_p, camera_rep, lane_block.reshape(-1), it_key, config
        ).reshape(lane_block.shape + (3,))
        est = jax.lax.pmean(rad.mean(axis=1), SAMPLE_AXIS)  # (pix_local, 3)
        partial_sse = jnp.sum((est - target_block) ** 2)
        # Sample-axis shards all hold the same partial after pmean; psum over
        # tile only, then normalize to the global mean.
        return jax.lax.psum(partial_sse, TILE_AXIS) / (n_pix * 3)

    return block_loss(params, scene, camera, lanes, target)


def make_train_step(
    scene: Scene,
    camera: Camera,
    config: RenderConfig,
    mesh: jax.sharding.Mesh,
    optimizer: optax.GradientTransformation,
    fixed_iteration: int | None = None,
):
    """Build the jitted sharded training step (loss + grad + adam update).

    Gradient all-reduce across the mesh is XLA-inserted as the transpose of
    the replicated-parameter broadcast into shard_map — it rides ICI
    alongside the backward pass (SURVEY.md §5 plan).

    fixed_iteration: if set, every step reuses the SAME RNG streams (pass
    the iteration the target was rendered with). With a target rendered at
    identical seeds this makes the loss exactly zero at the true parameters
    ("same-seed" inverse rendering), removing the Cov(estimate, gradient)
    bias that plain stochastic MSE has under heavy MC noise. If None, each
    step draws fresh paths (iteration = optimizer step).
    """

    @jax.jit
    def train_step(state: TrainState, target: Array, key: Array) -> tuple[TrainState, Array]:
        it = state.step if fixed_iteration is None else fixed_iteration

        def loss_fn(params):
            return sharded_loss(
                params, scene, camera, target, key, config, mesh, it
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = _clamp_params(optax.apply_updates(state.params, updates))
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            loss,
        )

    return train_step


def kernel_loss_and_grads(
    params: dict,
    scene: Scene,
    camera: Camera,
    target: Array,  # (H, W, 3)
    seed: Array,  # (2,) int32
    iteration: Array | int,
    *,
    spp: int,
    max_bounces: int = 10,
    rr_start: int = 3,
    tile_rows: int | None = None,
    use_nee: bool = False,
    strat_k: int = 2,
    mesh: jax.sharding.Mesh | None = None,
    engine: str = "persistent",
    budget: int | None = None,
    interpret: bool = False,
) -> tuple[Array, dict]:
    """MSE loss + gradients via a fused value-and-grad Pallas kernel:
    loss AND both parameter gradients in ONE path walk — no separate
    backward pass at all.

    engine selects the fused kernel:
      - "persistent" (default, the production path): path-regeneration
        occupancy, lane == pixel, dead lanes start their pixel's next
        sample (ops/pallas/replay_persistent.py) — the fastest measured
        gradient walk (BASELINE.md fwd+bwd row).
      - "sample": the per-sample fused kernel, lane == (pixel, sample)
        (ops/pallas/replay_kernel.py) — kept as the cross-check oracle.

    With a mesh, lane rows shard over the flattened (tile, sample) axes
    exactly like the forward persistent kernel (global-tile RNG
    addressing, parallel/persistent_sharded.py), and the per-tile
    gradient partials psum across shards — sharded gradients equal
    single-device (sums of the same per-tile partials).
    """
    from tpu_pathtracer.ops.pallas.trace_kernel import pack_camera

    scene_p = apply_params(scene, params)
    w, h = camera.width, camera.height
    n_dev = mesh.devices.size if mesh is not None else 1
    cam_packed = pack_camera(camera)
    it = jnp.int32(iteration)
    axes = (TILE_AXIS, SAMPLE_AXIS)

    if engine == "persistent":
        from tpu_pathtracer.ops.pallas.replay_persistent import (
            default_budget, persistent_replay_call, pixel_lanes_layout,
            target_to_lanes,
        )

        if scene.mesh is not None and scene.mesh_packed is None:
            raise ValueError(
                "engine='persistent' walks the packed mesh in-kernel: "
                "pack it first with models.scene.with_packet_mesh(scene)"
            )
        tr = 32 if tile_rows is None else tile_rows
        rows_total, _ = pixel_lanes_layout(w, h, tr, tiles_multiple=n_dev)
        aux = target_to_lanes(target, rows_total)
        call = partial(
            persistent_replay_call,
            spp=spp,
            budget=default_budget(spp, max_bounces) if budget is None
            else budget,
            width=w, height=h, max_bounces=max_bounces,
            rr_start=rr_start, tile_rows=tr, use_nee=use_nee,
            use_dof=camera.use_dof, strat_k=strat_k, interpret=interpret,
        )

        textured = scene.textures is not None and scene.mesh is not None
        if textured and spp > 32:
            # chunked pooled-mean protocol (replay_persistent docstring):
            # per-launch C_tot slots cap at 32 samples; the driver splits
            # the budget and pools the cotangent. Single-device (the
            # chunk launches already fill the chip; shard across STEPS
            # instead for data-parallel training).
            if mesh is not None:
                raise ValueError(
                    "textured gradients with spp > 32 use the chunked "
                    "single-device driver; drop the mesh sharding or "
                    "keep spp <= 32 per step"
                )
            from tpu_pathtracer.ops.pallas.replay_persistent import (
                persistent_mse_value_and_grad,
            )

            loss, grads, _ = persistent_mse_value_and_grad(
                scene_p, camera, seed, it, target, spp=spp, budget=budget,
                max_bounces=max_bounces, rr_start=rr_start, tile_rows=tr,
                use_nee=use_nee, strat_k=strat_k, interpret=interpret,
            )
            if "mat_coef" in params:
                raise ValueError(
                    "mat_coef gradients are untextured-scene only (the "
                    "tangent kernel does not trace textured materials)"
                )
            return loss, grads
        if mesh is None:
            _, _, loss, gA_raw, gI_raw, _, gT = call(
                scene_p, cam_packed, seed, it, aux
            )
        else:
            tiles_local = (rows_total // tr) // n_dev

            @partial(
                shard_map,
                mesh=mesh,
                in_specs=(P(), P(), P(), P(axes)),
                out_specs=(P(), P(), P(), P()) if textured
                else (P(), P(), P()),
                check_vma=False,
            )
            def psharded(scene_rep, cp_rep, seed_rep, aux_block):
                shard = (
                    jax.lax.axis_index(TILE_AXIS) * mesh.shape[SAMPLE_AXIS]
                    + jax.lax.axis_index(SAMPLE_AXIS)
                )
                _, _, l_p, gA_p, gI_p, _, gT_p = call(
                    scene_rep, cp_rep, seed_rep, it, aux_block,
                    tile_offset=shard * tiles_local,
                )
                out = (
                    jax.lax.psum(l_p, axes),
                    jax.lax.psum(gA_p, axes),
                    jax.lax.psum(gI_p, axes),
                )
                if gT_p is not None:
                    out = out + (jax.lax.psum(gT_p, axes),)
                return out

            if textured:
                loss, gA_raw, gI_raw, gT = psharded(
                    scene_p, cam_packed, seed, aux
                )
            else:
                loss, gA_raw, gI_raw = psharded(
                    scene_p, cam_packed, seed, aux
                )
                gT = None

    elif engine == "sample":
        from tpu_pathtracer.ops.pallas.replay_kernel import (
            broadcast_pixels_to_lanes, lanes_layout, replay_call,
        )

        if scene.mesh is not None:
            raise ValueError(
                "engine='sample' does not trace mesh geometry; use "
                "engine='persistent' (in-kernel BVH walk) for mesh scenes"
            )

        gT = None
        tr = 16 if tile_rows is None else tile_rows
        rows_total, _ = lanes_layout(w, h, spp, tr, tiles_multiple=n_dev)
        aux = broadcast_pixels_to_lanes(target, spp, rows_total)
        call = partial(
            replay_call,
            spp=spp, width=w, height=h, max_bounces=max_bounces,
            rr_start=rr_start, tile_rows=tr, use_nee=use_nee,
            use_dof=camera.use_dof, strat_k=strat_k, mode="mse",
            interpret=interpret,
        )

        if mesh is None:
            _, loss, gA_raw, gI_raw, _ = call(
                scene_p, cam_packed, seed, it, aux
            )
        else:
            tiles_local = (rows_total // tr) // n_dev

            @partial(
                shard_map,
                mesh=mesh,
                in_specs=(P(), P(), P(), P(axes)),
                out_specs=(P(), P(), P()),
                check_vma=False,
            )
            def sharded(scene_rep, cp_rep, seed_rep, aux_block):
                shard = (
                    jax.lax.axis_index(TILE_AXIS) * mesh.shape[SAMPLE_AXIS]
                    + jax.lax.axis_index(SAMPLE_AXIS)
                )
                _, l_p, gA_p, gI_p, _ = call(
                    scene_rep, cp_rep, seed_rep, it, aux_block,
                    tile_offset=shard * tiles_local,
                )
                return (
                    jax.lax.psum(l_p, axes),
                    jax.lax.psum(gA_p, axes),
                    jax.lax.psum(gI_p, axes),
                )

            loss, gA_raw, gI_raw = sharded(scene_p, cam_packed, seed, aux)
    else:
        raise ValueError(f"unknown engine {engine!r}")

    gI_full = jnp.zeros_like(scene_p.light_intensity)
    gI_full = gI_full.at[: gI_raw.shape[0]].set(gI_raw)
    grads = {
        "mat_color": gA_raw / jnp.maximum(scene_p.mat_color, 1e-8),
        "light_intensity": gI_full / jnp.maximum(
            scene_p.light_intensity, 1e-8
        ),
    }
    if "mat_coef" in params:
        # index-of-refraction gradients: ONE fused tangent walk carrying
        # the attached Snell bending AND the streaming Fresnel-score
        # term (ops/pallas/camera_jvp.py, diff/score.py's combined
        # estimator at kernel speed). The walk draws its own paths, so
        # it composes with any engine; it runs replicated under a mesh
        # (the ior walk is a small fraction of the fused-gradient cost).
        if scene_p.textures is not None:
            raise ValueError(
                "mat_coef gradients use the tangent kernel, which does "
                "not trace textured materials — drop 'textures'/"
                "'mat_coef' from params or use the XLA score path "
                "(diff.score.ior_value_and_grad)"
            )
        from tpu_pathtracer.ops.pallas.camera_jvp import ior_mse_grad

        grads["mat_coef"] = ior_mse_grad(
            scene_p, camera, seed, target, spp=spp,
            max_bounces=max_bounces, rr_start=rr_start,
            use_nee=use_nee, strat_k=strat_k, iteration=it,
            tile_rows=32 if tile_rows is None else tile_rows,
            budget=budget, interpret=interpret,
        )
    if gT is not None:
        # already the full dLoss/dtextures (scatter launch folds the
        # cotangent and the 1/texel in-kernel) — no division here
        grads["textures"] = gT
    elif "textures" in params:
        # An optimizer fed all-zero texture gradients would silently
        # freeze the atlas; fail loudly instead (ADVICE r4). The fused
        # atlas gradient needs engine="persistent" AND a packed mesh
        # (UVs only exist on triangles); otherwise use the XLA autodiff
        # path (make_train_step) or drop "textures" from params.
        raise ValueError(
            "params include 'textures' but the selected engine cannot "
            f"produce atlas gradients (engine={engine!r}, "
            f"mesh={'present' if scene.mesh is not None else 'absent'}): "
            "use engine='persistent' with a packed triangle mesh, or "
            "remove 'textures' from params / use the XLA train step"
        )
    return loss, grads


def make_kernel_train_step(
    scene: Scene,
    camera: Camera,
    config: RenderConfig,
    optimizer: optax.GradientTransformation,
    *,
    mesh: jax.sharding.Mesh | None = None,
    fixed_iteration: int | None = None,
    tile_rows: int | None = None,
    engine: str = "persistent",
    budget: int | None = None,
    interpret: bool = False,
):
    """Fused-kernel analogue of make_train_step: each step is ONE kernel
    walk (loss + grads), then the adam update — inverse rendering at
    forward-render speed. The default engine is the persistent
    path-regeneration fused kernel (the fastest measured gradient walk);
    see kernel_loss_and_grads. Seeds derive from the step counter (or
    fixed_iteration for same-seed optimization)."""

    @jax.jit
    def train_step(state: TrainState, target: Array,
                   seed: Array) -> tuple[TrainState, Array]:
        it = state.step if fixed_iteration is None else fixed_iteration
        loss, grads = kernel_loss_and_grads(
            state.params, scene, camera,
            target.reshape(camera.height, camera.width, 3), seed, it,
            spp=config.spp, max_bounces=config.max_bounces,
            rr_start=config.rr_start, use_nee=config.use_nee,
            tile_rows=tile_rows, mesh=mesh, engine=engine, budget=budget,
            interpret=interpret,
        )
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = _clamp_params(optax.apply_updates(state.params, updates))
        return (
            TrainState(params=params, opt_state=opt_state,
                       step=state.step + 1),
            loss,
        )

    return train_step


def render_target(
    scene: Scene, camera: Camera, key: Array, config: RenderConfig,
    n_iterations: int = 4, base_iteration: int = 1000,
) -> Array:
    """Render a (H*W, 3) reference target by averaging a few iterations.

    For same-seed inverse rendering pass n_iterations=1 and
    base_iteration == the fixed_iteration given to make_train_step.
    """
    acc = jnp.zeros((camera.height * camera.width, 3))
    for it in range(n_iterations):
        img = render(scene, camera, key, config, iteration=base_iteration + it)
        acc = acc + img.reshape(-1, 3)
    return acc / n_iterations


def render_target_kernel(
    scene: Scene, camera: Camera, seed: Array, config: RenderConfig,
    *, iteration: int = 0, tile_rows: int | None = None,
    engine: str = "persistent", budget: int | None = None,
    interpret: bool = False,
) -> Array:
    """(H*W, 3) target rendered by the fused kernel's OWN forward walk.

    For same-seed inverse rendering with make_kernel_train_step the
    target must come from the SAME engine's estimator (RNG streams,
    regeneration schedule and polar warpings differ between the engines
    and the XLA path), rendered at the same fixed iteration — then the
    loss is exactly zero at the true parameters."""
    from tpu_pathtracer.ops.pallas.trace_kernel import pack_camera

    w, h = camera.width, camera.height
    if engine == "persistent":
        from tpu_pathtracer.ops.pallas.replay_persistent import (
            default_budget, persistent_replay_call, pixel_lanes_layout,
            target_to_lanes,
        )

        tr = 32 if tile_rows is None else tile_rows
        rows_total, n_lanes = pixel_lanes_layout(w, h, tr)
        aux0 = jnp.zeros((rows_total, 128, 3), jnp.float32)
        L_lanes, ns, *_ = persistent_replay_call(
            scene, pack_camera(camera), seed, jnp.int32(iteration), aux0,
            spp=config.spp,
            budget=default_budget(config.spp, config.max_bounces)
            if budget is None else budget,
            width=w, height=h, max_bounces=config.max_bounces,
            rr_start=config.rr_start, use_nee=config.use_nee,
            use_dof=camera.use_dof, tile_rows=tr, interpret=interpret,
            compute_tex_grad=False,  # forward-only: skip the scatter pass
        )
        lanes = L_lanes.reshape(-1, 3)[:n_lanes]
        n = jnp.maximum(ns.reshape(-1)[:n_lanes], 1)[:, None]
        return lanes / n

    from tpu_pathtracer.ops.pallas.replay_kernel import (
        lanes_layout, replay_call,
    )

    tr = 16 if tile_rows is None else tile_rows
    rows_total, n_lanes = lanes_layout(w, h, config.spp, tr)
    aux0 = jnp.zeros((rows_total, 128, 3), jnp.float32)
    L_lanes, *_ = replay_call(
        scene, pack_camera(camera), seed, jnp.int32(iteration), aux0,
        spp=config.spp, width=w, height=h, max_bounces=config.max_bounces,
        rr_start=config.rr_start, use_nee=config.use_nee,
        use_dof=camera.use_dof, tile_rows=tr, mode="vjp",
        interpret=interpret,
    )
    lanes = L_lanes.reshape(-1, 3)[:n_lanes]
    return lanes.reshape(h * w, config.spp, 3).mean(axis=1)
