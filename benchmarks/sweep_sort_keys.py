"""Sweep ray-coherence sort keys for the packet kernel on an incoherent
bounce-style wave (the dominant cost in config-4 frames — bounces 1-2 are
~45/28 ms of a ~100 ms frame; benchmarks/bench_mesh.py --bounces N).

Each variant re-sorts the same wave with a different key and times the
full sorted walk (slope protocol). The kernel itself is identical — only
the lane grouping changes, i.e. this measures how tight each key packs
tile frustums.
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tpupt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tpu_pathtracer.models import scene as sc
from tpu_pathtracer.ops.pallas.mesh_kernel import intersect_mesh_packet

N = 256 * 192 * 2


def timed(fn, k, salt):
    t0 = time.perf_counter()
    out = fn(salt, k)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def slope(fn, iters=6):
    s = int(time.time_ns() & 0xFFFFF)
    timed(fn, 1, s + 1)
    timed(fn, iters, s + 2)
    t1 = timed(fn, 1, s + 3)
    tn = timed(fn, iters, s + 4)
    return (tn - t1) / (iters - 1) * 1e3


def oct_of(d):
    return (
        (d[:, 0] < 0).astype(jnp.int32) * 4
        + (d[:, 1] < 0).astype(jnp.int32) * 2
        + (d[:, 2] < 0).astype(jnp.int32)
    )


def cell_of(o, bits):
    n = 1 << bits
    lo = jnp.min(o, axis=0)
    hi = jnp.max(o, axis=0)
    q = jnp.clip(
        ((o - lo) / jnp.maximum(hi - lo, 1e-6) * (n - 1)).astype(jnp.int32),
        0, n - 1,
    )
    return q


def morton3(q, bits):
    out = jnp.zeros_like(q[:, 0])
    for b in range(bits):
        for a in range(3):
            out = out | (((q[:, a] >> b) & 1) << (3 * b + a))
    return out


def dir_bin(d, k):
    """Quantize direction within its octant: k x k bins over the two
    minor-axis slopes relative to the dominant axis."""
    ax = jnp.abs(d)
    dom = jnp.argmax(ax, axis=-1)
    m = jnp.take_along_axis(ax, dom[:, None], axis=-1)[:, 0]
    s = ax / jnp.maximum(m, 1e-9)[:, None]  # in [0,1], dom axis = 1
    # the two non-dominant slopes
    i0 = (dom + 1) % 3
    i1 = (dom + 2) % 3
    s0 = jnp.take_along_axis(s, i0[:, None], axis=-1)[:, 0]
    s1 = jnp.take_along_axis(s, i1[:, None], axis=-1)[:, 0]
    q0 = jnp.clip((s0 * k).astype(jnp.int32), 0, k - 1)
    q1 = jnp.clip((s1 * k).astype(jnp.int32), 0, k - 1)
    return dom * k * k + q0 * k + q1  # 3*k^2 classes


KEYS = {
    "A oct | cell16 (current)": lambda o, d: oct_of(d) * 4096
    + (lambda q: (q[:, 0] * 16 + q[:, 2]) * 16 + q[:, 1])(cell_of(o, 4)),
    "B cell16 | oct": lambda o, d: (lambda q: (q[:, 0] * 16 + q[:, 2]) * 16
                                    + q[:, 1])(cell_of(o, 4)) * 8 + oct_of(d),
    "C oct+dirbin4 | cell8": lambda o, d: (oct_of(d) * 48 + dir_bin(d, 4))
    * 512 + (lambda q: (q[:, 0] * 8 + q[:, 2]) * 8 + q[:, 1])(cell_of(o, 3)),
    "D morton5 | oct": lambda o, d: morton3(cell_of(o, 5), 5) * 8 + oct_of(d),
    "E oct | morton5": lambda o, d: oct_of(d) * 32768 + morton3(cell_of(o, 5), 5),
    "F oct+dirbin2 | cell16": lambda o, d: (oct_of(d) * 12 + dir_bin(d, 2))
    * 4096 + (lambda q: (q[:, 0] * 16 + q[:, 2]) * 16 + q[:, 1])(cell_of(o, 4)),
}


def main():
    print(f"devices: {jax.devices()}", flush=True)
    scene, cs = sc.terrain_textured()
    scene = sc.with_packet_mesh(scene)
    packed = scene.mesh_packed

    key = jax.random.key(0)
    k2, k3 = jax.random.split(key)
    # bounce-style incoherent wave: origins on the terrain, random dirs
    o_inc = jax.random.uniform(
        k2, (N, 3), minval=jnp.asarray([-100.0, 0.0, -100.0]),
        maxval=jnp.asarray([100.0, 14.0, 100.0]))
    d_inc = jax.random.normal(k3, (N, 3))
    d_inc = d_inc / jnp.linalg.norm(d_inc, axis=-1, keepdims=True)

    def wave(keyfn):
        @partial(jax.jit, static_argnames=("k",))
        def fn(salt, k):
            def body(acc, i):
                oo = o_inc + (salt + i).astype(jnp.float32) * 1e-6
                kv = keyfn(oo, d_inc)
                perm = jnp.argsort(kv)
                ph = intersect_mesh_packet(
                    packed, jnp.take(oo, perm, axis=0),
                    jnp.take(d_inc, perm, axis=0), tmin=3e-2, sort=False)
                return acc + jnp.sum(ph.uv[:, 0]) + ph.t[0], None
            out, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(k, dtype=jnp.int32))
            return out
        return fn

    for label, keyfn in KEYS.items():
        print(f"{label:28s}: {slope(wave(keyfn)):6.1f} ms", flush=True)


if __name__ == "__main__":
    main()
