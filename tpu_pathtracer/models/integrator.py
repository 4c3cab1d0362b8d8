"""Wavefront path-tracing integrator.

TPU-native inversion of the reference's megakernel `Trace`
(reference pathtracer.cu:112-170): instead of a divergent per-thread bounce
loop, ALL paths advance in lockstep through a bounded `lax.scan` over
bounce index, with liveness tracked as a lane mask. Dead lanes keep
computing (masked out) — the wavefront trade that XLA/TPU vector hardware
demands (SURVEY.md §7).

Math parity with the reference integrator, bounce by bounce:
  - brute-force emitter-hit accumulation: L += T * Le on every light hit
    (pathtracer.cu:134-137; NEE/MIS was dead code in the reference and is
    implemented live here behind `use_nee`);
  - BSDF importance sampling + throughput update T *= f*|wi·n|/pdf
    (pathtracer.cu:141-149);
  - Russian roulette after bounce 3 with p = min(0.5, max(T)) and
    throughput compensation (pathtracer.cu:152-159);
  - hard bounce cap (pathtracer.cu:160-161), miss termination
    (pathtracer.cu:163-165).

RNG uses counter-based streams per (sample, bounce) — see utils/rng.py —
so the backward pass can replay paths without storing the sample buffer.
"""
from __future__ import annotations

from functools import partial

import flax.struct
import jax
import jax.numpy as jnp
from jax import Array, lax

from tpu_pathtracer.models import camera as cam_mod
from tpu_pathtracer.models.camera import Camera
from tpu_pathtracer.models.scene import EPSILON, Scene, prim_attrs
from tpu_pathtracer.ops import bsdf, lights, sampling, vecmath as vm
from tpu_pathtracer.ops.intersect import intersect, intersect_p
from tpu_pathtracer.utils import rng


@flax.struct.dataclass
class RenderConfig:
    """Static render settings (the reference's #defines and ctor args,
    globals.h:49-54 / main.cpp:177, as data)."""

    spp: int = flax.struct.field(pytree_node=False, default=4)
    max_bounces: int = flax.struct.field(pytree_node=False, default=10)
    rr_start: int = flax.struct.field(pytree_node=False, default=3)
    tmin: float = flax.struct.field(pytree_node=False, default=EPSILON)
    # Detach sampling decisions/pdfs from the autodiff graph
    # (detached-sampling estimator; BASELINE.json north star).
    detach_sampling: bool = flax.struct.field(pytree_node=False, default=True)
    # Next-event estimation + MIS (live implementation of the reference's
    # dead machinery, scene.h:110-170). Off = reference-parity brute force.
    use_nee: bool = flax.struct.field(pytree_node=False, default=False)
    # Remat the bounce body to bound autodiff memory on large renders.
    remat: bool = flax.struct.field(pytree_node=False, default=True)
    # Make trace() also return the traced-ray count (bench instrumentation).
    count_rays: bool = flax.struct.field(pytree_node=False, default=False)
    # Packet-mesh scenes: give the NEE shadow wave its own coherence sort
    # (key on origin = hit.p) instead of riding the bounce-level carry
    # order, which is keyed on the INCOMING segment and says nothing about
    # where the segments landed. Costs one argsort + one packed (N,7) row
    # gather per shadow wave; measured A/B on config 4 (bench_mesh
    # --no-shadow-sort for the off state).
    shadow_self_sort: bool = flax.struct.field(pytree_node=False, default=True)
    # Keep the |wi.n| cosine ATTACHED in the diffuse throughput update
    # (as cos/sg(cos): primal-identical, so images don't change). The
    # default closed form bakes cos/pdf = pi, which is exact but erases
    # the shading normal's parameter dependence — geometry gradients
    # (diff/geometry.py interior term) need it kept.
    attached_geom: bool = flax.struct.field(pytree_node=False, default=False)


def _maybe_detach(x: Array, detach: bool) -> Array:
    return lax.stop_gradient(x) if detach else x


def trace(
    scene: Scene,
    o: Array,
    d: Array,
    lane_ids: Array,
    it_key: Array,
    config: RenderConfig,
) -> Array:
    """Estimate radiance along N rays. o, d: (N,3); lane_ids: (N,) global
    path-sample indices that key the per-lane RNG streams. Returns (N,3).

    Wavefront equivalent of __device__ Trace (pathtracer.cu:112-170).
    """
    attrs = prim_attrs(scene)
    detach = config.detach_sampling
    # Bounce-level ray sorting (packet-mesh scenes): lanes are permuted
    # ONCE per bounce by ray-coherence key — the shadow wave and the
    # closest-hit wave then run pre-sorted, instead of each paying its own
    # argsort + 15-plane permute round trip inside intersect_mesh_packet
    # (~7-9 ms per wave at config-4 scale, about half the frame;
    # benchmarks/profile_mesh_pieces.py). Lane-keyed counter RNG
    # (utils/rng.py) makes the permutation invisible to the estimate: the
    # carried lane ids keep every lane on its own stream, and the image is
    # unscattered once at the end — bit-identical to the unsorted render.
    # With a COARSE tree (two-pass binned traversal) each wave instead
    # sorts in-call on its own nearest-cell binning — a wave-specific key
    # the bounce-level permute cannot provide — so the carry permute is
    # skipped entirely.
    bounce_sort = (scene.mesh_packed is not None
                   and scene.mesh_packed_coarse is None)

    L0 = jnp.zeros_like(o)
    T0 = jnp.ones_like(o)
    # MIS state: pdf of the BSDF sample that produced the current hit, and
    # whether it was a delta lobe (primary rays count as delta: full emitter
    # credit at bounce 0 — the reference's commented specularBounce logic,
    # pathtracer.cu:117,133,148, implemented live).
    # Derive from o (not fresh constants) so the values carry shard_map's
    # varying-axes tag and match the scan body's output types under pjit.
    prev_pdf0 = o[:, 0] * 0.0
    alive0 = prev_pdf0 <= 0.0  # all-True, varying
    prev_delta0 = alive0
    # Local array positions for the final unscatter. lane_ids are GLOBAL
    # path-sample indices (sharded callers pass pix*spp+s per shard), so
    # they cannot serve as scatter positions; positions are carried
    # separately. The +lane_ids*0 stamps shard_map's varying-axes tag on
    # the iota so the scan carry types match the body outputs.
    pos0 = jnp.arange(o.shape[0], dtype=jnp.int32) + lane_ids * 0
    carry0 = (L0, T0, alive0, o, d, prev_pdf0, prev_delta0, lane_ids, pos0)

    def body(carry, bounce, do_sort=bounce_sort):
        # Intersect-FIRST structure: the segment produced by the previous
        # bounce (or the primary rays) is traced at the top, so the scan
        # performs exactly max_bounces+1 scene traversals — the trailing
        # never-shaded intersect of the hit-carrying formulation is gone
        # (one whole BVH wave saved per frame on mesh scenes). Caller-dead
        # lanes are passed to intersect, which lets the packet mesh kernel
        # skip them (whole-tile skips at deep bounces under RR).
        # do_sort=False is the bounce-0 specialization: primary rays come
        # in raster order (a tile = consecutive scanlines), which is
        # already packet-coherent — the argsort+permute would be wasted
        # (still presorted=True for intersect: don't re-sort in-call).
        L, T, alive_in, prev_o, wo, prev_pdf, prev_delta, lids, pos = carry
        if do_sort:
            from tpu_pathtracer.ops.pallas.mesh_kernel import packet_sort_key

            perm = jnp.argsort(packet_sort_key(prev_o, wo, alive=alive_in))
            # One packed (N, 17) row gather instead of 17 separate 1-D
            # gathers — the whole carry rides a single row permute.
            # lids/pos ride as bitcasts (exact for any int32); bools 0/1.
            packed = jnp.concatenate(
                [
                    L, T, prev_o, wo,
                    alive_in.astype(jnp.float32)[:, None],
                    prev_pdf[:, None],
                    prev_delta.astype(jnp.float32)[:, None],
                    lax.bitcast_convert_type(lids, jnp.float32)[:, None],
                    lax.bitcast_convert_type(pos, jnp.float32)[:, None],
                ],
                axis=1,
            )
            packed = jnp.take(packed, perm, axis=0)
            L, T = packed[:, 0:3], packed[:, 3:6]
            prev_o, wo = packed[:, 6:9], packed[:, 9:12]
            alive_in = packed[:, 12] > 0.5
            prev_pdf = packed[:, 13]
            prev_delta = packed[:, 14] > 0.5
            lids = lax.bitcast_convert_type(packed[:, 15], jnp.int32)
            pos = lax.bitcast_convert_type(packed[:, 16], jnp.int32)
        hit = intersect(scene, attrs, prev_o, wo, tmin=config.tmin,
                        alive=alive_in, presorted=bounce_sort)
        # Segments actually traced this bounce (honest rays/sec metric).
        live_rays = jnp.sum(alive_in.astype(jnp.int32))
        alive = alive_in & hit.hit
        u = rng.bounce_uniforms(it_key, bounce, lids)

        # -- emitter-hit contribution (pathtracer.cu:134-137 + light.h:43-45)
        one_sided = vm.dot(hit.n, -wo) > 0.0
        take_le = alive & one_sided
        if config.use_nee:
            # MIS: weight BSDF-sampled emitter hits against the light
            # sampler's pdf for the same direction (PowerHeuristic,
            # montecarlo.h:156-159 — dead in the reference, live here).
            is_light = ~vm.is_black(hit.emission)
            lp = lights.light_dir_pdf(
                scene, prev_o, wo, hit.center, hit.radius, is_light,
                hit_prim=hit.prim,
            )
            if scene.has_tri_lights:
                # TRI_LIGHT emitter hits: the light sampler's solid-angle
                # pdf for this direction is t^2/cos_l * sel_pdf/A_total
                # (area-to-solid-angle; tri_sel_over_area_by_mat). Detached
                # like every MIS pdf; t clamped so miss lanes (t=BIG)
                # cannot overflow f32 in the untaken where branch.
                is_tri_hit = hit.prim >= scene.centers.shape[0]
                fac = jnp.take(
                    lights.tri_sel_over_area_by_mat(scene, lp.dtype),
                    jnp.clip(hit.mat, 0, scene.mat_color.shape[0] - 1),
                )
                tt = jnp.minimum(hit.t, 1e6)
                cos_l = jnp.abs(vm.dot(hit.n, wo))
                lp_tri = tt * tt / jnp.maximum(cos_l, 1e-9) * fac
                lp = jnp.where(
                    is_tri_hit, lax.stop_gradient(lp_tri), lp
                )
            w_emit = jnp.where(
                prev_delta, 1.0, sampling.power_heuristic(1.0, prev_pdf, 1.0, lp)
            )
        else:
            w_emit = jnp.ones_like(prev_pdf)
        L = L + T * hit.emission * (
            take_le.astype(T.dtype) * w_emit
        )[:, None]

        # -- next-event estimation (live version of scene.h:150-170)
        if config.use_nee:
            ul = rng.light_uniforms(it_key, bounce, lids)
            ls = lights.sample_lights(scene, hit.p, ul, tmin=config.tmin)
            f_l = bsdf.f(hit.mtype, hit.albedo, wo, ls.wi, hit.n)
            pdf_b = bsdf.pdf(hit.mtype, wo, ls.wi, hit.n)
            # Visibility segment. The reference's dead code shrinks the far
            # end RELATIVELY (maxt = dist*(1-eps), light.h:27) — at its
            # Cornell scale that cuts 3% of a ~500-unit segment and would
            # miss occluders hugging the light (the ceiling the emitter
            # pokes through). Use a tight shrink instead: enough to exclude
            # the light surface itself (f32 quadratic error on giant
            # spheres), not enough to skip real occluders.
            vis_tmax = ls.dist * (1.0 - 1e-3) - EPSILON
            # See RenderConfig.shadow_self_sort: the shadow wave sorts on
            # its OWN key (origin = hit.p, direction = to-light) instead
            # of the stale carry order.
            occluded = intersect_p(
                scene, hit.p, ls.wi, tmin=config.tmin, tmax=vis_tmax,
                mask=alive & ls.valid,
                presorted=bounce_sort and not config.shadow_self_sort,
            )
            w_l = jnp.where(
                ls.is_delta,
                1.0,
                sampling.power_heuristic(1.0, ls.pdf, 1.0, pdf_b),
            )
            cos_l = jnp.abs(vm.dot(ls.wi, hit.n))
            take_nee = alive & ls.valid & ~occluded
            contrib = (
                f_l
                * ls.radiance
                * jnp.where(
                    ls.pdf > 0.0,
                    cos_l * w_l / jnp.where(ls.pdf > 0.0, ls.pdf, 1.0),
                    0.0,
                )[:, None]
            )
            L = L + T * contrib * take_nee[:, None].astype(T.dtype)

        # -- BSDF sampling (pathtracer.cu:141-149)
        f_val, wi, pdf = bsdf.sample(
            hit.mtype, hit.albedo, hit.coef, wo, hit.n, u[:, 0], u[:, 1]
        )
        wi = _maybe_detach(wi, detach)
        pdf = _maybe_detach(pdf, detach)
        contrib_ok = ~vm.is_black(f_val) & (pdf > 0.0)
        cos_wi = jnp.abs(vm.dot(wi, hit.n))
        # Per-lobe CLOSED FORM of f*|wi.n|/pdf — no division:
        #   diffuse    (albedo/pi)*cos / (cos/pi) = albedo
        #   specular / transmissive: pdf = 1       -> f*cos
        # The generic ratio is exact only analytically; numerically its
        # backward blows up (-cos/pdf^2 -> inf at denormal grazing cos)
        # and poisons attached-sampling gradients (tests/test_score.py).
        # Masked lanes (pdf == 0) are excluded by step_ok as before.
        if config.attached_geom:
            # detached-pdf estimator with the cosine attached: the pdf is
            # the sampling-time constant cos0/pi, so the diffuse weight is
            # (albedo/pi) * cos / (cos0/pi) = albedo * cos/cos0 with
            # cos0 = sg(cos). Primal ratio is exactly 1; the gradient
            # carries d cos(wi, n)/d geometry (diff/geometry.py interior).
            cos0 = jnp.maximum(lax.stop_gradient(cos_wi), 1e-6)
            diff_w = hit.albedo * jnp.where(
                lax.stop_gradient(cos_wi) > 1e-6, cos_wi / cos0, 1.0
            )[:, None]
        else:
            diff_w = hit.albedo
        weight = jnp.where(
            bsdf.is_specular_type(hit.mtype)[:, None],
            f_val * cos_wi[:, None],
            diff_w,
        )
        step_ok = alive & contrib_ok
        T = jnp.where(step_ok[:, None], T * weight, T)

        # -- Russian roulette (pathtracer.cu:152-159)
        do_rr = bounce > config.rr_start
        # RR is ALWAYS detached, even in attached-sampling mode: the
        # continuation probability is a discrete decision's parameter (the
        # documented estimator treats RR decisions as fixed), and an
        # attached p_cont additionally leaks inf into the backward through
        # the masked 1/p boost on near-dead lanes.
        p_cont = lax.stop_gradient(
            jnp.minimum(0.5, vm.max_component(T))
        )
        survive = u[:, 2] <= p_cont
        boost = step_ok & do_rr & survive & (p_cont > 0.0)
        T = jnp.where(
            boost[:, None], T / jnp.maximum(p_cont, 1e-20)[:, None], T
        )
        rr_ok = jnp.logical_or(~do_rr, survive)

        # -- termination + next segment (pathtracer.cu:160-168)
        alive = step_ok & rr_ok & (bounce < config.max_bounces)
        new_prev_delta = bsdf.is_specular_type(hit.mtype)
        # Dead lanes park on a fixed finite ray instead of carrying their
        # garbage state forward: a miss-lane normal (p-center)/r grows the
        # ray coordinates exponentially bounce over bounce until f32
        # overflow, and the resulting inf/NaN — though masked out of L —
        # poisons gradients through the masked where-branches (the same
        # hazard the Pallas replay kernel masks; found by
        # tests/test_score.py at depth >= 5).
        av = alive[:, None]
        park_d = jnp.zeros_like(wi).at[:, 2].set(1.0)
        safe_o = jnp.where(av, hit.p, jnp.zeros_like(hit.p))
        safe_d = jnp.where(av, wi, park_d)
        # The MIS-state pdf is a sampling quantity: detached in the carry
        # even under attached sampling (the next bounce's power-heuristic
        # weight must not be differentiated).
        return (
            (L, T, alive, safe_o, safe_d, lax.stop_gradient(pdf),
             new_prev_delta, lids, pos),
            live_rays,
        )

    # bind do_sort statically BEFORE any remat wrap: jax.checkpoint traces
    # explicitly-passed args, and the flag gates Python control flow
    body0 = partial(body, do_sort=False)
    if config.remat:
        body = jax.checkpoint(body)
        body0 = jax.checkpoint(body0)

    bounces = jnp.arange(config.max_bounces + 1)
    if config.detach_sampling:
        if bounce_sort:
            # Peel bounce 0 (no permute — raster order is coherent), scan
            # the sorted body over the rest, then restore lane order with
            # one scatter for the whole render (by the carried LOCAL
            # positions — lane_ids are global and shard-relative).
            carry1, y0 = body0(carry0, bounces[0])
            (L, *rest), live_tail = lax.scan(body, carry1, bounces[1:])
            live_counts = jnp.concatenate([y0[None], live_tail])
            L = jnp.zeros_like(L).at[rest[-1]].set(L)
        else:
            (L, *rest), live_counts = lax.scan(body, carry0, bounces)
    else:
        # Attached sampling unrolls the bounce loop: lax.scan's transpose
        # materializes zero cotangents for every carry element and
        # multiplies them against the full body Jacobian — whose masked
        # branches contain inf/NaN partials at degenerate lanes (grazing
        # Fresnel, near-zero pdfs). The unrolled loop lets reverse-mode
        # keep those cotangents symbolically zero. Depth is <= ~10, so
        # code size stays bounded; detached mode (the default, hot path)
        # keeps the scan.
        carry, ys = carry0, []
        for b in range(config.max_bounces + 1):
            fn = body0 if (bounce_sort and b == 0) else body
            carry, y = fn(carry, bounces[b])
            ys.append(y)
        L = carry[0]
        if bounce_sort:
            L = jnp.zeros_like(L).at[carry[-1]].set(L)
        live_counts = jnp.stack(ys)
    if config.count_rays:
        # every traced segment, primaries included (counted at the top of
        # each scan body — the bounce-b count IS the segments bounce b
        # traces, so nothing wasted is counted and nothing traced is not)
        return L, jnp.sum(live_counts)
    return L


def render(
    scene: Scene,
    camera: Camera,
    key: Array,
    config: RenderConfig,
    iteration: Array | int = 0,
) -> Array:
    """Render one progressive iteration: (H, W, 3) mean radiance over spp.

    Equivalent of one GenerateRayPool + RenderKernel pass
    (pathtracer.cu:62-110) minus the running-mean accumulation, which lives
    in models/progressive.py.
    """
    H, W, spp = camera.height, camera.width, config.spp
    it_key = rng.iteration_key(key, iteration)
    lane_ids = jnp.arange(H * W * spp, dtype=jnp.int32)

    out = trace_pixels(scene, camera, lane_ids, it_key, config)
    if config.count_rays:
        radiance, n_rays = out
        return radiance.reshape(H, W, spp, 3).mean(axis=2), n_rays
    return out.reshape(H, W, spp, 3).mean(axis=2)


def trace_pixels(
    scene: Scene,
    camera: Camera,
    lane_ids: Array,
    it_key: Array,
    config: RenderConfig,
) -> Array:
    """Generate primary rays for the given lanes and trace them.

    A "lane" is one path sample: lane = (py*W + px)*spp + s. Because ray
    setup and RNG depend only on the global lane id, this function can be
    `shard_map`ped over any partition of the lane axis (see
    parallel/sharding.py) with results identical to a single-device run.
    """
    W, spp = camera.width, config.spp
    s = lane_ids % spp
    pix = lane_ids // spp
    px = pix % W
    py = pix // W

    u = rng.camera_uniforms(it_key, lane_ids)  # (n,2)
    ox, oy = sampling.stratified_jitter_for_sample(u[:, 0], u[:, 1], s, spp)
    if camera.use_dof:
        lu = rng.lens_uniforms(it_key, lane_ids)
        o, d = cam_mod.generate_rays(camera, px, py, ox, oy, lu[:, 0], lu[:, 1])
    else:
        o, d = cam_mod.generate_rays(camera, px, py, ox, oy)
    # Keep ray generation as its own fusion island: fusing it into the first
    # bounce-scan intersect SIGILLs this environment's TPU compiler (remote
    # tpu_compile_helper crash, reproducible). The barrier only materializes
    # (o, d) once — the reference does the same split for its own reasons
    # (GenerateRayPool vs RenderKernel, pathtracer.cu:232-238).
    o, d = jax.lax.optimization_barrier((o, d))
    return trace(scene, o, d, lane_ids, it_key, config)


@partial(jax.jit, static_argnames=("config",))
def render_image(
    scene: Scene,
    camera: Camera,
    key: Array,
    config: RenderConfig,
    iteration: Array | int = 0,
) -> Array:
    """Jitted single-iteration render."""
    return render(scene, camera, key, config, iteration)
