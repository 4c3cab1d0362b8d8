"""Probe the QUEUE-BATCH walk structure: the descent loop only queues
leaf node ids (conditional SMEM scalar write — no conditional VECTOR
region in the loop), leaves are processed afterwards in one uniform
vector batch. Does the descent step, freed of the pl.when leaf region,
reach the ~73 ns/step that paired pure-dataflow walks showed?

Variants (all pair=2 interleaved descent):
  queued_x2  — descent queues, batch processes after the loop
  inline_x2  — current production structure (pl.when leaf inline)
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
M = 4096
NTILES = 8
QCAP = 512  # queue slots per walk (probe: no pause/resume)

from benchmarks._step_probe2 import box_test_fn, leaf_math


def make_kernel(variant: str, nway: int):
    def kernel(box_ref, meta_ref, tris_ref, *refs):
        o = [[refs[6 * w + k][:, :] for k in range(3)] for w in range(nway)]
        dv = [[refs[6 * w + 3 + k][:, :] for k in range(3)]
              for w in range(nway)]
        rest = refs[6 * nway:]
        out_ref = rest[0]
        out_ref[:, :] = jnp.full((nway * ROWS, LANES), 1e30, jnp.float32)
        if variant.startswith("queued"):
            queues = rest[1:1 + nway]

        def t_slot(w):
            return out_ref, (pl.ds(w * ROWS, ROWS), slice(None))

        if variant.startswith("queued"):
            treg = variant == "queued_treg"

            def body(i, carry):
                ns, qis, tcs = carry
                new_ns, new_qis = [], []
                for w in range(nway):
                    hit = box_test_fn(box_ref, o[w], dv[w], ns[w])
                    if variant == "queued_tref":
                        r, slx = t_slot(w)
                        hit = hit & (r[slx] > 0.5)
                    elif treg:
                        hit = hit & (tcs[w] > 0.5)
                    anyhit = jnp.sum(hit.astype(jnp.int32)) > 0
                    is_leaf = (ns[w] & 3) == 0
                    put = anyhit & is_leaf

                    @pl.when(put)
                    def _q(w=w, n=ns[w], qi=qis[w]):
                        queues[w][qi] = n

                    new_qis.append(qis[w] + put.astype(jnp.int32))
                    new_ns.append(jnp.where(anyhit, ns[w] + 1,
                                            meta_ref[ns[w]]))
                return tuple(new_ns), tuple(new_qis), tcs

            ns0 = tuple(jnp.int32(w) for w in range(nway))
            qi0 = tuple(jnp.int32(0) for _ in range(nway))
            tc0 = tuple(
                jnp.full((ROWS, LANES), 1e30, jnp.float32)
                for _ in range(nway))
            (ns, qis, _) = jax.lax.fori_loop(0, STEPS // nway, body,
                                             (ns0, qi0, tc0))
            # batch leaf processing: uniform vector work, no reduces
            for w in range(nway):
                r, sl = t_slot(w)

                def leaf_body(qj, tb, w=w):
                    n = queues[w][qj]
                    return leaf_math(tris_ref, o[w], dv[w], n % 64, tb, n)

                tb = jax.lax.fori_loop(0, qis[w], leaf_body, r[sl])
                r[sl] = tb + ns[w].astype(jnp.float32) * 0.0
        else:
            def body(i, ns):
                new_ns = []
                for w in range(nway):
                    r, sl = t_slot(w)
                    hit = box_test_fn(box_ref, o[w], dv[w], ns[w])
                    anyhit = jnp.sum(hit.astype(jnp.int32)) > 0
                    is_leaf = (ns[w] & 3) == 0

                    @pl.when(anyhit & is_leaf)
                    def _leaf(w=w, r=r, sl=sl, n=ns[w]):
                        r[sl] = leaf_math(tris_ref, o[w], dv[w],
                                          n % 64, r[sl], n)

                    new_ns.append(jnp.where(anyhit, ns[w] + 1,
                                            meta_ref[ns[w]]))
                return tuple(new_ns)

            ns0 = tuple(jnp.int32(w) for w in range(nway))
            ns = jax.lax.fori_loop(0, STEPS // nway, body, ns0)

    return kernel


def run(variant: str, nway: int):
    rng = np.random.default_rng(0)
    kernel = make_kernel(variant, nway)
    box = jnp.asarray(rng.random(M * 6, np.float32))
    meta = jnp.asarray(rng.integers(0, M, M), jnp.int32)
    tris = jnp.asarray(rng.random((64, 128), np.float32))
    planes = [jnp.asarray(rng.random((NTILES * ROWS, LANES), np.float32)
                          + 0.5)
              for _ in range(6 * nway)]
    lane_spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0))
    out_spec = pl.BlockSpec((nway * ROWS, LANES), lambda i: (i, 0))
    smem = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,),
                                    memory_space=pltpu.SMEM)
    scratch = ([pltpu.SMEM((QCAP,), jnp.int32)] * nway
               if variant.startswith("queued") else [])
    fn = pl.pallas_call(
        kernel,
        grid=(NTILES,),
        in_specs=[smem(box), smem(meta),
                  pl.BlockSpec(tris.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)]
        + [lane_spec] * (6 * nway),
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((NTILES * nway * ROWS, LANES),
                                       jnp.float32),
        scratch_shapes=scratch,
    )

    @partial(jax.jit, static_argnames=("k",))
    def many(salt, k):
        def body(acc, i):
            out = fn(box, meta, tris,
                     *[p + (salt + i).astype(jnp.float32) * 1e-6
                       for p in planes])
            return acc + out[0, 0], None
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
    print(f"{variant:10s} x{nway}: {ms:7.2f} ms/call "
          f"= {per_step:6.1f} ns/node-step (incl. leaf batch)",
          flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    run("queued_tref", 2)
    run("queued_treg", 2)
