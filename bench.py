"""Benchmark: forward path-tracing throughput on the reference workload.

Workload = the reference renderer's per-frame budget (BASELINE.md):
Cornell-spheres scene (9 spheres, 6 materials, 1 area light,
reference main.cpp:152-164), 640x480, 4 spp, max 10 bounces, Russian
roulette after bounce 3.

Metric: rays/sec, counted HONESTLY as the rays a megakernel would trace —
primary rays + live secondary segments per bounce (the kernel counts its
own live lanes; dead wavefront lanes burn flops but are excluded). The
baseline ratio is against the BASELINE.json north-star target of 5 Grays/s
forward on one chip.

Kernel under test: the persistent path-regeneration kernel
(ops/pallas/persistent.py) — lane = pixel, dead lanes immediately start
their pixel's next sample, path state carried across invocations in HBM,
so occupancy is ~100% (vs ~42% for the round-1 per-sample unrolled
kernel). Because every counted ray is a live path segment, rays/sec here
is directly comparable with round 1's number.

Measurement protocol (important in this environment — the TPU is behind a
remote tunnel with ~30-60 ms round-trip latency and terminal-side
memoization of repeated executions):
  - K frames run inside ONE jitted lax.scan (fresh seeds each), with a
    single device->host fetch as the sync point;
  - elapsed(K) - elapsed(1) cancels the fixed round-trip/dispatch cost, so
    the metric is pure sustained device throughput — what a progressive
    renderer achieves when frames pipeline;
  - the RTT noise (tens of ms) is additive-positive, so each endpoint is
    measured several times and the MINIMUM elapsed is used — the device
    time is the floor of the distribution; K is large enough (120 frames)
    that the device window dwarfs residual jitter;
  - seeds are salted per run so terminal memoization can never serve a
    cached execution.

Prints exactly one JSON line:
  {"metric": "rays/sec", "value": N, "unit": "rays/s", "vs_baseline": N/5e9}
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

# Cache TPU compiles across processes (the remote-compile tunnel in this
# environment is slow; recompiling the scan every run would dominate).
jax.config.update("jax_compilation_cache_dir", "/tmp/tpupt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tpu_pathtracer.models import camera as cm, scene as sc
from tpu_pathtracer.ops.pallas.persistent import (
    init_state, persistent_step, state_image,
)
from tpu_pathtracer.ops.pallas.trace_kernel import pack_camera

TARGET_RAYS_PER_SEC = 5e9  # BASELINE.json north star (1x v5p chip)

WIDTH, HEIGHT, SPP, MAX_BOUNCES = 640, 480, 4, 10
ITERS = 120  # frames in the long window (~80 ms device time >> RTT jitter)
REPEATS = 5  # per-endpoint repeats; min() strips additive RTT noise
TILE_ROWS = 32  # best measured tile size on v5e
BUDGET = 16  # best measured (robust sweep, round 3)


def measure(use_nee: bool) -> float:
    """Sustained rays/sec (slope protocol) for one transport mode.

    With use_nee, shadow segments count as traced rays (the kernel's
    live counter includes every needed visibility segment) — the NEE
    number is directly comparable to the brute-force one."""
    from functools import partial

    scene, cs = sc.cornell_spheres()
    camera = cm.make_camera(
        cs["eye"], cs["look_at"], cs["up"], WIDTH, HEIGHT, cs["fov"]
    )
    cp = pack_camera(camera)

    @partial(jax.jit, static_argnames=("k",))
    def frames(salt, k):
        st0 = init_state(WIDTH, HEIGHT, TILE_ROWS)

        def body(carry, i):
            st, rays = carry
            st, nr = persistent_step(
                scene, cp, jnp.stack([salt, i]), st,
                budget=BUDGET, width=WIDTH, height=HEIGHT,
                max_bounces=MAX_BOUNCES, tile_rows=TILE_ROWS,
                use_nee=use_nee,
            )
            return (st, rays + nr), None

        (st, rays), _ = jax.lax.scan(
            body, (st0, jnp.int32(0)), jnp.arange(k, dtype=jnp.int32)
        )
        return state_image(st, WIDTH, HEIGHT).mean(), rays

    salt = jnp.int32((os.getpid() ^ time.time_ns()) & 0x0FFFFFFF)

    def timed(k, s):
        t0 = time.perf_counter()
        acc, rays = frames(s, k)
        float(acc)  # device->host fetch is the true sync point here
        return time.perf_counter() - t0, int(rays)

    # compile both variants
    timed(1, salt + 1)
    timed(ITERS, salt + 2)
    # measure: slope between 1 and ITERS frames cancels fixed latency.
    # RTT noise is additive-positive -> min over repeats per endpoint.
    t1s, tns = [], []
    r1 = rn = 0
    for rep in range(REPEATS):
        t1, r1 = timed(1, salt + 3 + 2 * rep)
        tn, rn = timed(ITERS, salt + 4 + 2 * rep)
        t1s.append(t1)
        tns.append(tn)
    elapsed = max(min(tns) - min(t1s), 1e-9)
    return (rn - r1) / elapsed


def main() -> None:
    rays_per_sec = measure(use_nee=False)
    nee_rays_per_sec = measure(use_nee=True)
    print(
        json.dumps(
            {
                "metric": "rays/sec",
                "value": rays_per_sec,
                "unit": "rays/s",
                "vs_baseline": rays_per_sec / TARGET_RAYS_PER_SEC,
                "nee_rays_per_sec": nee_rays_per_sec,
                "nee_vs_baseline": nee_rays_per_sec / TARGET_RAYS_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
