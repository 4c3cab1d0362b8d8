"""Microbench: per-node-step cost of the threaded-DFS walk structure.

Hypothesis: the walk's per-step cost is dominated not by the 12-op box
test but by the vector->scalar any-lane reduction (jnp.sum over a
(16,128) predicate) that the next-node decision depends on — a full
vector-pipeline drain per step.

Variants:
  reduce      — production shape: SMEM scalar box loads, vector box
                test, any-lane reduce, data-dependent next node
  noreduce    — same vector work, next node from a precomputed SMEM
                walk order (no vector->scalar dependency)
  reduce_x2/4 — TWO/FOUR independent interleaved walks per kernel
                instance (separate ray tiles + node cursors): vector
                work of one walk issues while the other's reduction
                drains
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/tpupt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

LANES = 128
ROWS = 16
STEPS = 2000
M = 4096  # node table size
NTILES = 8


def make_kernel(variant: str):
    nway = {"reduce": 1, "noreduce": 1, "reduce_x2": 2,
            "reduce_x4": 4}[variant]

    def kernel(box_ref, meta_ref, *refs):
        o = [[refs[6 * w + k][:, :] for k in range(3)] for w in range(nway)]
        dv = [[refs[6 * w + 3 + k][:, :] for k in range(3)]
              for w in range(nway)]
        out_refs = refs[6 * nway:]

        def box_test(w, n):
            b6 = n * 6
            ox, oy, oz = o[w]
            dx, dy, dz = dv[w]
            tx0 = (box_ref[b6 + 0] - ox) * dx
            tx1 = (box_ref[b6 + 3] - ox) * dx
            ty0 = (box_ref[b6 + 1] - oy) * dy
            ty1 = (box_ref[b6 + 4] - oy) * dy
            tz0 = (box_ref[b6 + 2] - oz) * dz
            tz1 = (box_ref[b6 + 5] - oz) * dz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.minimum(tz0, tz1))
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.maximum(tz0, tz1))
            return (tn <= tf) & (tf > 0.0)

        if variant == "noreduce":
            def body(i, carry):
                n, acc = carry
                hit = box_test(0, n)
                acc = acc + hit.astype(jnp.float32)
                n = meta_ref[n]  # scalar-only chain, no vector drain
                return n, acc

            n, acc = jax.lax.fori_loop(
                0, STEPS, body, (jnp.int32(0),
                                 jnp.zeros((ROWS, LANES), jnp.float32)))
            out_refs[0][:, :] = acc + n.astype(jnp.float32)
        else:
            def body(i, carry):
                ns, accs = carry
                new_ns = []
                new_accs = []
                for w in range(nway):
                    hit = box_test(w, ns[w])
                    anyhit = jnp.sum(hit.astype(jnp.int32)) > 0
                    new_accs.append(accs[w] + hit.astype(jnp.float32))
                    new_ns.append(jnp.where(anyhit, ns[w] + 1,
                                            meta_ref[ns[w]]))
                return tuple(new_ns), tuple(new_accs)

            ns0 = tuple(jnp.int32(w) for w in range(nway))
            accs0 = tuple(jnp.zeros((ROWS, LANES), jnp.float32)
                          for _ in range(nway))
            ns, accs = jax.lax.fori_loop(0, STEPS // nway, body,
                                         (ns0, accs0))
            for w in range(nway):
                out_refs[w][:, :] = accs[w] + ns[w].astype(jnp.float32)

    return kernel, nway


def run(variant: str):
    rng = np.random.default_rng(0)
    kernel, nway = make_kernel(variant)
    box = jnp.asarray(rng.random(M * 6, np.float32))
    meta = jnp.asarray(rng.integers(0, M, M), jnp.int32)
    planes = [jnp.asarray(rng.random((NTILES * ROWS, LANES), np.float32)
                          + 0.5)
              for _ in range(6 * nway)]
    lane_spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0))
    smem = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,),
                                    memory_space=pltpu.SMEM)
    fn = pl.pallas_call(
        kernel,
        grid=(NTILES,),
        in_specs=[smem(box), smem(meta)] + [lane_spec] * (6 * nway),
        out_specs=[lane_spec] * nway,
        out_shape=[jax.ShapeDtypeStruct((NTILES * ROWS, LANES), jnp.float32)
                   ] * nway,
    )

    @partial(jax.jit, static_argnames=("k",))
    def many(salt, k):
        def body(acc, i):
            outs = fn(box, meta,
                      *[p + (salt + i).astype(jnp.float32) * 1e-6
                        for p in planes])
            return acc + outs[0][0, 0], None
        out, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(k, dtype=jnp.int32))
        return out

    def timed(k, ss):
        t0 = time.perf_counter()
        jax.block_until_ready(many(ss, k))
        return time.perf_counter() - t0

    s = int(time.time_ns() & 0xFFFFF)
    timed(1, s + 1)
    timed(4, s + 2)
    t1 = min(timed(1, s + 3 + i) for i in range(3))
    tn = min(timed(4, s + 9 + i) for i in range(3))
    ms = (tn - t1) / 3 * 1e3
    per_step = ms * 1e6 / (NTILES * STEPS)
    print(f"{variant:10s}: {ms:7.2f} ms/call = {per_step:6.1f} ns/node-step"
          f"  ({nway} interleaved)", flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    for v in ("reduce", "noreduce", "reduce_x2", "reduce_x4"):
        run(v)
