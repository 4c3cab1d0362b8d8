"""Split the two-pass sort machinery into its pieces (config-4 wave
size, N=98304): argsort, inverse scatter, packed (N,7) row gather,
un-permute takes — measured separately, slope protocol."""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tpupt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N = 98304


def slope(fn, iters=8):
    s = int(time.time_ns() & 0xFFFFF)

    def timed(k, ss):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(ss, k))
        return time.perf_counter() - t0

    timed(1, s + 1)
    timed(iters, s + 2)
    t1 = min(timed(1, s + 3 + i) for i in range(3))
    tn = min(timed(iters, s + 9 + i) for i in range(3))
    return (tn - t1) / (iters - 1) * 1e3


def scan_over(body):
    @partial(jax.jit, static_argnames=("k",))
    def fn(salt, k):
        def b(acc, i):
            return acc + body(salt + i), None
        out, _ = jax.lax.scan(b, jnp.float32(0),
                              jnp.arange(k, dtype=jnp.int32))
        return out
    return fn


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    key0 = jnp.asarray(rng.integers(0, 1 << 20, N), jnp.int32)
    payload = jnp.asarray(rng.random((N, 7), np.float32))
    t_arr = jnp.asarray(rng.random(N, np.float32))
    idx_arr = jnp.asarray(rng.integers(0, 1 << 20, N), jnp.int32)
    perm0 = jnp.asarray(rng.permutation(N), jnp.int32)

    pieces = {
        "argsort(key)": lambda s: jnp.sum(
            jnp.argsort(key0 + s).astype(jnp.float32)),
        "inv scatter": lambda s: jnp.sum(
            jnp.zeros_like(perm0).at[(perm0 + s) % N].set(
                jnp.arange(N, dtype=jnp.int32)).astype(jnp.float32)),
        "packed (N,7) take": lambda s: jnp.sum(
            jnp.take(payload, (perm0 + s) % N, axis=0)),
        "unperm t (take N)": lambda s: jnp.sum(
            jnp.take(t_arr, (perm0 + s) % N)),
        "unperm t+idx 2 takes": lambda s: jnp.sum(
            jnp.take(t_arr, (perm0 + s) % N))
        + jnp.sum(jnp.take(idx_arr, (perm0 + s) % N).astype(jnp.float32)),
        "unperm t+idx packed": lambda s: jnp.sum(jnp.take(
            jnp.stack(
                [t_arr,
                 jax.lax.bitcast_convert_type(idx_arr, jnp.float32)],
                axis=1),
            (perm0 + s) % N, axis=0)),
        "sort_kv(key,(N,7))": lambda s: jnp.sum(
            jax.lax.sort([key0 + s] + [payload[:, i] for i in range(7)],
                         num_keys=1)[1]),
    }
    for name, body in pieces.items():
        print(f"{name:22s}: {slope(scan_over(body)):6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
