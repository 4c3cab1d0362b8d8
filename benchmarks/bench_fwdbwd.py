"""Fwd+bwd throughput: rays/sec for a differentiated render (the
BASELINE.json tracked metric "rays/sec/chip fwd+bwd", absent in round 1).

Workload: Cornell-spheres (reference main.cpp:152-164), gradient of an MSE
loss w.r.t. (mat_color, light_intensity) — the inverse-rendering parameter
set (config 5). Two estimators:

  - ``replay``  : path-replay custom_vjp (diff/replay.py) — 2 walks
                  (primal + adjoint re-trace), O(1) memory;
  - ``autodiff``: plain autodiff through the bounce scan with remat
                  (models/integrator.py);
  - ``kernel``  : fused value-and-grad Pallas kernel with a streaming
                  adjoint (ops/pallas/replay_kernel.py) — loss AND both
                  gradients in ONE walk (fwd+bwd ~= fwd cost);
  - ``pkernel`` : the persistent fused kernel (replay_persistent.py) —
                  the same streaming adjoint at path-regeneration
                  occupancy (dead lanes start their pixel's next sample).

Ray counting is HONEST and comparable with bench.py: a "ray" is a live
path segment actually traced. The fwd pass traces S segments; replay's
backward re-traces the same S segments (adjoint walk), so fwd+bwd counts
2S for replay and S for autodiff (its backward replays residuals, not
rays). S is measured exactly via the integrator's count_rays
instrumentation on identical RNG streams (replay and the integrator draw
the same per-(lane,bounce) uniforms).

Protocol: same slope timing as bench.py (K grads inside one jitted scan,
elapsed(K)-elapsed(1), min over repeats per endpoint — tunnel RTT noise
is additive-positive — salted seeds).

Usage: python benchmarks/bench_fwdbwd.py [--size 640x480] [--spp 1]
       [--estimator replay|autodiff] [--iters 8]
"""
from __future__ import annotations

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tpupt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tpu_pathtracer.diff.replay import render_replay
from tpu_pathtracer.models import camera as cm, scene as sc
from tpu_pathtracer.models.integrator import RenderConfig, render


REPEATS = 4  # min over repeats strips additive RTT noise (see bench.py)


def _slope(timed, iters, salt):
    """min-over-repeats slope between 1 and `iters` scan lengths."""
    timed(1, salt + 1)
    timed(iters, salt + 2)  # compile both
    t1s, tns = [], []
    last = None
    for rep in range(REPEATS):
        t1, _ = timed(1, salt + 3 + 2 * rep)
        tn, last = timed(iters, salt + 4 + 2 * rep)
        t1s.append(t1)
        tns.append(tn)
    return max(min(tns) - min(t1s), 1e-9), last


def measure_kernel(width: int, height: int, spp: int, max_bounces: int,
                   iters: int, persistent: bool) -> tuple[float, float, int]:
    """Fused fwd+bwd kernel: one walk = loss + grads. Segs counted by the
    kernel's own live-lane counter (same honest definition as bench.py)."""
    from tpu_pathtracer.ops.pallas.replay_kernel import mse_value_and_grad
    from tpu_pathtracer.ops.pallas.replay_persistent import (
        persistent_mse_value_and_grad,
    )

    scene, cs = sc.cornell_spheres()
    camera = cm.make_camera(
        cs["eye"], cs["look_at"], cs["up"], width, height, cs["fov"]
    )
    target = jnp.zeros((height, width, 3), jnp.float32)
    seed = jnp.asarray([7, 0], jnp.int32)
    vag = persistent_mse_value_and_grad if persistent else mse_value_and_grad

    @partial(jax.jit, static_argnames=("k",))
    def grads(salt, k):
        def body(acc, i):
            loss, g, nrays = vag(
                scene, camera, seed, salt + i, target, spp=spp,
                max_bounces=max_bounces,
            )
            return (acc[0] + loss, acc[1] + g["mat_color"].sum(),
                    acc[2] + nrays), None

        init = (jnp.float32(0), jnp.float32(0), jnp.int32(0))
        (l, g, n), _ = jax.lax.scan(
            body, init, jnp.arange(k, dtype=jnp.int32)
        )
        return l + g, n

    salt = jnp.int32(time.time_ns() & 0x0FFFFFF)

    def timed(k, s):
        t0 = time.perf_counter()
        out, n = grads(s, k)
        float(out)
        return time.perf_counter() - t0, int(n)

    elapsed, n_tot = _slope(timed, iters, salt)
    segs_per_grad = n_tot // iters
    rays_per_sec = segs_per_grad * (iters - 1) / elapsed
    ms = elapsed / (iters - 1) * 1e3
    return rays_per_sec, ms, segs_per_grad


def measure(width: int, height: int, spp: int, max_bounces: int,
            estimator: str, iters: int) -> tuple[float, float, int]:
    if estimator in ("kernel", "pkernel"):
        return measure_kernel(width, height, spp, max_bounces, iters,
                              persistent=estimator == "pkernel")
    scene, cs = sc.cornell_spheres()
    camera = cm.make_camera(
        cs["eye"], cs["look_at"], cs["up"], width, height, cs["fov"]
    )
    config = RenderConfig(spp=spp, max_bounces=max_bounces)

    # Exact segment count S for one iteration (same streams as the walk).
    count_cfg = RenderConfig(spp=spp, max_bounces=max_bounces,
                             count_rays=True)
    key = jax.random.key(0)
    _, nseg = render(scene, camera, key, count_cfg, iteration=0)
    S = int(nseg)
    segs_per_grad = 2 * S if estimator == "replay" else S

    target = jnp.zeros((height, width, 3), jnp.float32)
    render_fn = render_replay if estimator == "replay" else render

    def loss_fn(mat_color, light_intensity, it):
        s = scene.replace(mat_color=mat_color,
                          light_intensity=light_intensity)
        img = render_fn(s, camera, key, config, iteration=it)
        return jnp.mean((img - target) ** 2)

    grad_fn = jax.grad(loss_fn, argnums=(0, 1))

    @partial(jax.jit, static_argnames=("k",))
    def grads(salt, k):
        def body(acc, i):
            gA, gI = grad_fn(scene.mat_color, scene.light_intensity,
                             salt + i)
            return (acc[0] + gA, acc[1] + gI), None

        init = (jnp.zeros_like(scene.mat_color),
                jnp.zeros_like(scene.light_intensity))
        (gA, gI), _ = jax.lax.scan(body, init,
                                   jnp.arange(k, dtype=jnp.int32))
        return gA.sum() + gI.sum()

    salt = jnp.int32(time.time_ns() & 0x0FFFFFF)

    def timed(k, s):
        t0 = time.perf_counter()
        float(grads(s, k))
        return time.perf_counter() - t0

    elapsed, _ = _slope(lambda k, s: (timed(k, s), 0), iters, salt)
    rays_per_sec = segs_per_grad * (iters - 1) / elapsed
    ms = elapsed / (iters - 1) * 1e3
    return rays_per_sec, ms, segs_per_grad


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="640x480")
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--bounces", type=int, default=10)
    ap.add_argument("--estimator", default="pkernel",
                    choices=["replay", "autodiff", "kernel", "pkernel"],
                    help="pkernel (default) is the production trainer "
                         "path (diff/inverse engine='persistent')")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.lower().split("x"))
    print(f"devices: {jax.devices()}")
    rps, ms, segs = measure(w, h, args.spp, args.bounces, args.estimator,
                            args.iters)
    print(
        f"{args.estimator} fwd+bwd {w}x{h}x{args.spp}spp: "
        f"{rps / 1e6:.1f} Mrays/s  ({ms:.1f} ms/grad, {segs} segs/grad)",
        flush=True,
    )


if __name__ == "__main__":
    main()
