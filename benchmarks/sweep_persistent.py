"""Sweep (tile_rows, budget) for the persistent kernel on the reference
workload (bench.py constants). Slope protocol; prints live-segments/s."""
from __future__ import annotations

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

W, H, MB = 640, 480, 10
ITERS = 60
REPEATS = 3  # min over repeats strips additive RTT noise (see bench.py)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    scene, cs = sc.cornell_spheres()
    cam = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], W, H, cs["fov"])
    cp = pack_camera(cam)

    def mk(tile_rows, budget):
        @partial(jax.jit, static_argnames=("k",))
        def frames(salt, k):
            st0 = init_state(W, H, tile_rows)

            def body(carry, i):
                st, rays = carry
                st, nr = persistent_step(
                    scene, cp, jnp.stack([salt, i]), st, budget=budget,
                    width=W, height=H, max_bounces=MB, tile_rows=tile_rows,
                )
                return (st, rays + nr), None

            (st, rays), _ = jax.lax.scan(
                body, (st0, jnp.int32(0)), jnp.arange(k, dtype=jnp.int32)
            )
            return state_image(st, W, H).mean(), rays
        return frames

    def measure(frames):
        salt = jnp.int32(time.time_ns() & 0x0FFFFFFF)

        def timed(k, s):
            t0 = time.perf_counter()
            acc, rays = frames(s, k)
            float(acc)
            return time.perf_counter() - t0, int(rays)

        timed(1, salt + 1)
        timed(ITERS, salt + 2)
        t1s, tns = [], []
        r1 = rn = 0
        for rep in range(REPEATS):
            t1, r1 = timed(1, salt + 3 + 2 * rep)
            tn, rn = timed(ITERS, salt + 4 + 2 * rep)
            t1s.append(t1)
            tns.append(tn)
        return (rn - r1) / max(min(tns) - min(t1s), 1e-9)

    for tr in (16, 32, 64):
        for b in (16, 32, 64):
            try:
                g = measure(mk(tr, b)) / 1e9
                print(f"tile_rows={tr:2d} budget={b:2d}: {g:5.2f} Grays/s",
                      flush=True)
            except Exception as e:
                print(f"tile_rows={tr:2d} budget={b:2d}: FAIL "
                      f"{type(e).__name__}: {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
