"""Textured-atlas gradient timing: the fused two-launch scatter scheme
(ops/pallas/replay_persistent.py) vs the same walk without the atlas
gradient, on the config-4-style textured terrain.

Three rows:
  - tex-grad   : loss + grads w.r.t. (mat_color, light_intensity,
                 TEXTURE ATLAS) — launch 1 (adjoint walk + C_tot
                 records) + launch 2 (replayed walk + per-vertex tap
                 scatter);
  - no-tex-grad: the same textured scene, compute_tex_grad=False —
                 one adjoint walk, atlas sampled forward-only (the
                 pre-existing capability, for overhead isolation);
  - xla-autodiff: jax.grad of the XLA wavefront through the texture
                 sampler (the previous production route for textured
                 scenes), measured once (it is ~2 orders slower).

Protocol: bench.py's slope timing (K grads in one jitted scan,
min-over-repeats endpoints, salted seeds).

Usage: python -m benchmarks.bench_tex_grad [--size 640x480] [--spp 4]
       [--terrain 32] [--iters 8] [--skip-xla]
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
from tpu_pathtracer.models.integrator import RenderConfig
from tpu_pathtracer.ops.pallas.replay_persistent import (
    default_budget, persistent_replay_call, pixel_lanes_layout,
    target_to_lanes,
)
from tpu_pathtracer.ops.pallas.trace_kernel import pack_camera

REPEATS = 4


def _slope(timed, iters, salt):
    timed(1, salt + 1)
    timed(iters, salt + 2)
    t1s, tns = [], []
    for rep in range(REPEATS):
        t1s.append(timed(1, salt + 3 + 2 * rep))
        tns.append(timed(iters, salt + 4 + 2 * rep))
    return max(min(tns) - min(t1s), 1e-9)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="640x480")
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--bounces", type=int, default=10)
    ap.add_argument("--terrain", type=int, default=32)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--skip-xla", action="store_true")
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.lower().split("x"))
    print(f"devices: {jax.devices()}")

    scene, cs = sc.terrain_textured(n=args.terrain)
    scene = sc.with_packet_mesh(scene)
    camera = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], w, h,
                            cs["fov"])
    cp = pack_camera(camera)
    rows_total, _ = pixel_lanes_layout(w, h, 32)
    target = target_to_lanes(jnp.zeros((h, w, 3), jnp.float32), rows_total)
    budget = default_budget(args.spp, args.bounces)

    def measure(label, tex_grad):
        @partial(jax.jit, static_argnames=("k",))
        def grads(salt, k):
            def body(acc, i):
                seed = jnp.stack([salt + i, jnp.int32(0)])
                _, _, loss, gA, gI, _, gT = persistent_replay_call(
                    scene, cp, seed, salt + i, target, spp=args.spp,
                    budget=budget, width=w, height=h,
                    max_bounces=args.bounces, use_nee=True,
                    compute_tex_grad=tex_grad,
                )
                acc = acc + loss + gA.sum() + gI.sum()
                if gT is not None:
                    acc = acc + gT.sum()
                return acc, None

            out, _ = jax.lax.scan(
                body, jnp.float32(0), jnp.arange(k, dtype=jnp.int32))
            return out

        salt = jnp.int32(time.time_ns() & 0x0FFFFFF)

        def timed(k, s):
            t0 = time.perf_counter()
            float(grads(jnp.int32(s), k))
            return time.perf_counter() - t0

        elapsed = _slope(timed, args.iters, salt)
        ms = elapsed / (args.iters - 1) * 1e3
        print(f"{label}: {ms:.2f} ms/grad", flush=True)
        return ms

    ms_tex = measure("tex-grad    (loss+mat+light+ATLAS)", True)
    ms_fwd = measure("no-tex-grad (loss+mat+light)      ", False)
    print(f"atlas-gradient overhead: {ms_tex / ms_fwd:.2f}x")

    if not args.skip_xla:
        from tpu_pathtracer.models.integrator import render

        config = RenderConfig(spp=args.spp, max_bounces=args.bounces,
                              use_nee=True)
        key = jax.random.key(0)
        tgt = jnp.zeros((h, w, 3), jnp.float32)

        @jax.jit
        def xla_grad(textures):
            s = scene.replace(textures=textures)
            img = render(s, camera, key, config, iteration=0)
            return jnp.mean((img.reshape(h, w, 3) - tgt) ** 2)

        g = jax.grad(xla_grad)
        jax.block_until_ready(g(scene.textures))  # compile
        t0 = time.perf_counter()
        jax.block_until_ready(g(scene.textures))
        ms_xla = (time.perf_counter() - t0) * 1e3
        print(f"xla-autodiff atlas grad: {ms_xla:.1f} ms/grad "
              f"({ms_xla / ms_tex:.0f}x the fused path)")


if __name__ == "__main__":
    main()
