"""Why didn't pairing help the real walk? The real kernel differs from
_step_probe's register-carried toy: per step it READS t from an output
ref, and leaves conditionally WRITE refs under pl.when. Test variants:

  regcarry_x2   — t carried in while-loop registers (toy, known 2.3x)
  sharedref_x2  — t in ONE output ref, walks at different row slices
                  (the real kernel's structure)
  scratchref_x2 — t in per-walk separate VMEM scratch refs
  sharedref_x1  — shared-ref structure, single walk (baseline)

Each step: SMEM box loads, vector box test, any-lane reduce, and a
conditional 8-tri "leaf" body under pl.when; next node data-dependent.
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


def box_test_fn(box_ref, o, d, n):
    b6 = n * 6
    ox, oy, oz = o
    dx, dy, dz = d
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


def leaf_math(tris_ref, o, d, base, t_best, n):
    ox, oy, oz = o
    dx, dy, dz = d
    trs = tris_ref[pl.ds(base, 1), :]
    for j in range(8):
        c0 = j * 16
        v0x, v0y, v0z = trs[0, c0], trs[0, c0 + 1], trs[0, c0 + 2]
        e1x, e1y, e1z = trs[0, c0 + 3], trs[0, c0 + 4], trs[0, c0 + 5]
        e2x, e2y, e2z = trs[0, c0 + 6], trs[0, c0 + 7], trs[0, c0 + 8]
        px_ = dy * e2z - dz * e2y
        py_ = dz * e2x - dx * e2z
        pz_ = dx * e2y - dy * e2x
        det = e1x * px_ + e1y * py_ + e1z * pz_
        inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
        tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
        uu = (tvx * px_ + tvy * py_ + tvz * pz_) * inv_det
        qx = tvy * e1z - tvz * e1y
        qy = tvz * e1x - tvx * e1z
        qz = tvx * e1y - tvy * e1x
        vv = (dx * qx + dy * qy + dz * qz) * inv_det
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        valid = ((uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                 & (tt > 3e-2) & (tt < t_best))
        t_best = jnp.where(valid, tt, t_best)
    return t_best


def make_kernel(variant: str, nway: int):
    def kernel(box_ref, meta_ref, tris_ref, *refs):
        o = [[refs[6 * w + k][:, :] for k in range(3)] for w in range(nway)]
        dv = [[refs[6 * w + 3 + k][:, :] for k in range(3)]
              for w in range(nway)]
        rest = refs[6 * nway:]
        if variant == "scratchref":
            out_ref = rest[0]
            t_scr = rest[1:1 + nway]
            for w in range(nway):
                t_scr[w][:, :] = jnp.full((ROWS, LANES), 1e30, jnp.float32)
        else:
            out_ref = rest[0]
            out_ref[:, :] = jnp.full((nway * ROWS, LANES), 1e30,
                                     jnp.float32)

        def t_slot(w):
            if variant == "scratchref":
                return t_scr[w], (slice(None), slice(None))
            return out_ref, (pl.ds(w * ROWS, ROWS), slice(None))

        if variant == "regcarry":
            def body(i, carry):
                ns, ts = carry
                new_ns, new_ts = [], []
                for w in range(nway):
                    hit = box_test_fn(box_ref, o[w], dv[w], ns[w])
                    anyhit = jnp.sum(hit.astype(jnp.int32)) > 0
                    is_leaf = (ns[w] & 3) == 0
                    tb = ts[w]
                    tb = jnp.where(
                        anyhit & is_leaf,
                        leaf_math(tris_ref, o[w], dv[w],
                                  ns[w] % 64, tb, ns[w]),
                        tb)
                    new_ts.append(tb)
                    new_ns.append(jnp.where(anyhit, ns[w] + 1,
                                            meta_ref[ns[w]]))
                return tuple(new_ns), tuple(new_ts)

            ns0 = tuple(jnp.int32(w) for w in range(nway))
            ts0 = tuple(jnp.full((ROWS, LANES), 1e30, jnp.float32)
                        for _ in range(nway))
            ns, ts = jax.lax.fori_loop(0, STEPS // nway, body, (ns0, ts0))
            for w in range(nway):
                r, sl = t_slot(w)
                r[sl] = ts[w] + ns[w].astype(jnp.float32) * 0.0
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
            if variant == "scratchref":
                for w in range(nway):
                    out_ref[pl.ds(w * ROWS, ROWS), :] = (
                        t_scr[w][:, :] + ns[w].astype(jnp.float32) * 0.0)

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
    scratch = ([pltpu.VMEM((ROWS, LANES), jnp.float32)] * nway
               if variant == "scratchref" else [])
    fn = pl.pallas_call(
        kernel,
        grid=(NTILES // nway if False else NTILES,),
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
          f"= {per_step:6.1f} ns/node-step", flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    run("sharedref", 1)
    run("sharedref", 2)
    run("scratchref", 2)
    run("regcarry", 2)
