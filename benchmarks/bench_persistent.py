"""Throughput of the persistent path-regeneration kernel vs the round-1
per-sample kernel, on the reference workload (640x480, 10 bounces, RR
after 3 — reference pathtracer.cu:222-243 budget).

Protocol identical to bench.py (slope timing inside one jitted lax.scan,
salted seeds; see bench.py's docstring for why). Sweeps the per-invocation
iteration budget and tile size.

Usage: python benchmarks/bench_persistent.py [--budgets 8,16,24] [--tiles 16,32]
"""
from __future__ import annotations

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tpupt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tpu_pathtracer.models import camera as cm, scene as sc
from tpu_pathtracer.ops.pallas.persistent import (
    init_state, persistent_step, state_image,
)
from tpu_pathtracer.ops.pallas.trace_kernel import pack_camera

WIDTH, HEIGHT, MAX_BOUNCES = 640, 480, 10


def measure(budget: int, tile_rows: int, iters: int = 20,
            use_nee: bool = False) -> tuple[float, float]:
    scene, cs = sc.cornell_spheres()
    camera = cm.make_camera(
        cs["eye"], cs["look_at"], cs["up"], WIDTH, HEIGHT, cs["fov"]
    )
    cp = pack_camera(camera)

    @partial(jax.jit, static_argnames=("k",))
    def frames(salt, k):
        st = init_state(WIDTH, HEIGHT, tile_rows)

        def body(carry, i):
            st, rays = carry
            st, nr = persistent_step(
                scene, cp, jnp.stack([salt, i]), st,
                budget=budget, width=WIDTH, height=HEIGHT,
                max_bounces=MAX_BOUNCES, tile_rows=tile_rows,
                use_nee=use_nee,
            )
            return (st, rays + nr), None

        (st, rays), _ = jax.lax.scan(
            body, (st, jnp.int32(0)), jnp.arange(k, dtype=jnp.int32)
        )
        return state_image(st, WIDTH, HEIGHT).mean(), rays

    salt = jnp.int32(time.time_ns() & 0x0FFFFFFF)

    def timed(k, s):
        t0 = time.perf_counter()
        acc, rays = frames(s, k)
        float(acc)
        return time.perf_counter() - t0, int(rays)

    timed(1, salt + 1)
    timed(iters, salt + 2)
    # min over repeats per endpoint: RTT noise is additive-positive
    t1s, tns = [], []
    r1 = rn = 0
    for rep in range(3):
        t1, r1 = timed(1, salt + 3 + 2 * rep)
        tn, rn = timed(iters, salt + 4 + 2 * rep)
        t1s.append(t1)
        tns.append(tn)
    elapsed = max(min(tns) - min(t1s), 1e-9)
    rays_per_sec = (rn - r1) / elapsed
    ms_per_step = elapsed / (iters - 1) * 1e3
    return rays_per_sec, ms_per_step


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--budgets", default="8,16,24")
    ap.add_argument("--tiles", default="32")
    ap.add_argument("--nee", action="store_true")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}")
    for tr in (int(x) for x in args.tiles.split(",")):
        for b in (int(x) for x in args.budgets.split(",")):
            rps, ms = measure(b, tr, use_nee=args.nee)
            print(
                f"tile_rows={tr} budget={b:3d} nee={args.nee}: "
                f"{rps / 1e9:.3f} Grays/s  ({ms:.2f} ms/step)",
                flush=True,
            )


if __name__ == "__main__":
    main()
