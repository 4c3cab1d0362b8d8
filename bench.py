"""Benchmark: forward path-tracing throughput on the reference workload.

Workload = the reference renderer's per-frame budget (BASELINE.md):
Cornell-spheres scene (9 spheres, 6 materials, 1 area light,
reference main.cpp:152-164), 640x480, 4 spp, max 10 bounces, Russian
roulette after bounce 3.

Metric: rays/sec, counted HONESTLY as the rays a megakernel would trace —
primary rays + live secondary segments per bounce (dead wavefront lanes
are excluded from the count even though they burn flops). The baseline
ratio is against the BASELINE.json north-star target of 5 Grays/s forward
on one chip.

Prints exactly one JSON line:
  {"metric": "rays/sec", "value": N, "unit": "rays/s", "vs_baseline": N/5e9}
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# Cache TPU compiles across processes (the remote-compile tunnel in this
# environment is slow; recompiling the scan every run would dominate).
jax.config.update("jax_compilation_cache_dir", "/tmp/tpupt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tpu_pathtracer.models import camera as cm, scene as sc
from tpu_pathtracer.ops.pallas.trace_kernel import pallas_render, pack_camera

TARGET_RAYS_PER_SEC = 5e9  # BASELINE.json north star (1x v5p chip)

WIDTH, HEIGHT, SPP, MAX_BOUNCES = 640, 480, 4, 10
WARMUP, ITERS = 2, 10
TILE_ROWS = 32  # best measured tile size on v5e


def main() -> None:
    scene, cs = sc.cornell_spheres()
    camera = cm.make_camera(
        cs["eye"], cs["look_at"], cs["up"], WIDTH, HEIGHT, cs["fov"]
    )
    cp = pack_camera(camera)

    def frame(it: int):
        return pallas_render(
            scene, cp, jnp.asarray([0, it, 7], jnp.int32),
            spp=SPP, width=WIDTH, height=HEIGHT,
            max_bounces=MAX_BOUNCES, tile_rows=TILE_ROWS,
        )

    # Count rays for the iterations we will time (RR makes it
    # data-dependent), and warm up the compile.
    total_rays = 0
    for it in range(ITERS):
        _, nrays = frame(it)
        total_rays += int(nrays)
    for it in range(WARMUP):
        img, _ = frame(1000 + it)
    img.block_until_ready()

    t0 = time.perf_counter()
    for it in range(ITERS):
        img, _ = frame(it)
    img.block_until_ready()
    elapsed = time.perf_counter() - t0

    rays_per_sec = total_rays / elapsed
    print(
        json.dumps(
            {
                "metric": "rays/sec",
                "value": rays_per_sec,
                "unit": "rays/s",
                "vs_baseline": rays_per_sec / TARGET_RAYS_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
