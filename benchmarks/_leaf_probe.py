"""Microbench: the leaf loop's per-triangle cost in isolation.

Variants:
  mt       — current production structure: dynamic-row VMEM tri slots,
             per-field lane extracts + Moller-Trumbore (mesh_kernel
             _packet_kernel leaf loop, defer_attrs form)
  mt_const — same math, tri fields as compile-time constants (isolates
             the extract cost)
  planes   — precomputed plane form (Havel-Herout style): 12 fields per
             tri, no cross products in the hot loop
  planes_const — plane form with constant fields

Grid iterates V leaf visits per tile; each visit reads 8 slot rows at a
dynamic base (cycling through a VMEM tri table) and tests 64 tris
against the tile's (16,128) rays.
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
V = 512          # leaf visits per call
TRI_ROWS = 64    # VMEM tri table rows (8 tris each)
NTILES = 8


def make_kernel(variant: str):
    def kernel(tris_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               t_ref):
        ox, oy, oz = ox_ref[:, :], oy_ref[:, :], oz_ref[:, :]
        dx, dy, dz = dx_ref[:, :], dy_ref[:, :], dz_ref[:, :]
        t_best = jnp.full((ROWS, LANES), 1e30, jnp.float32)
        idx_b = jnp.zeros((ROWS, LANES), jnp.int32)

        def visit(vi, carry):
            t_best, idx_b = carry
            base = (vi * 8) % TRI_ROWS
            trs = tris_ref[pl.ds(base, 8), :]
            for j in range(64):
                r = j // 8
                c0 = (j % 8) * 16
                if variant in ("mt", "planes"):
                    fld = lambda k: trs[r, c0 + k]
                else:
                    fld = lambda k: np.float32(0.1 + 0.01 * (j + k))
                if variant.startswith("mt"):
                    v0x, v0y, v0z = fld(0), fld(1), fld(2)
                    e1x, e1y, e1z = fld(3), fld(4), fld(5)
                    e2x, e2y, e2z = fld(6), fld(7), fld(8)
                    px_ = dy * e2z - dz * e2y
                    py_ = dz * e2x - dx * e2z
                    pz_ = dx * e2y - dy * e2x
                    det = e1x * px_ + e1y * py_ + e1z * pz_
                    ok = jnp.abs(det) > 1e-12
                    inv_det = 1.0 / jnp.where(ok, det, 1.0)
                    tvx = ox - v0x
                    tvy = oy - v0y
                    tvz = oz - v0z
                    uu = (tvx * px_ + tvy * py_ + tvz * pz_) * inv_det
                    qx = tvy * e1z - tvz * e1y
                    qy = tvz * e1x - tvx * e1z
                    qz = tvx * e1y - tvy * e1x
                    vv = (dx * qx + dy * qy + dz * qz) * inv_det
                    tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                    valid = (ok & (uu >= 0.0) & (vv >= 0.0)
                             & (uu + vv <= 1.0)
                             & (tt > 3e-2) & (tt < t_best))
                else:
                    nx_, ny_, nz_ = fld(0), fld(1), fld(2)
                    d0 = fld(3)
                    n1x, n1y, n1z = fld(4), fld(5), fld(6)
                    d1 = fld(7)
                    n2x, n2y, n2z = fld(8), fld(9), fld(10)
                    d2 = fld(11)
                    den = nx_ * dx + ny_ * dy + nz_ * dz
                    ok = jnp.abs(den) > 1e-12
                    num = d0 - (nx_ * ox + ny_ * oy + nz_ * oz)
                    tt = num / jnp.where(ok, den, 1.0)
                    hx = ox + tt * dx
                    hy = oy + tt * dy
                    hz = oz + tt * dz
                    uu = n1x * hx + n1y * hy + n1z * hz + d1
                    vv = n2x * hx + n2y * hy + n2z * hz + d2
                    valid = (ok & (uu >= 0.0) & (vv >= 0.0)
                             & (uu + vv <= 1.0)
                             & (tt > 3e-2) & (tt < t_best))
                t_best = jnp.where(valid, tt, t_best)
                idx_b = jnp.where(valid, vi * 64 + j, idx_b)
            return t_best, idx_b

        t_best, idx_b = jax.lax.fori_loop(0, V, visit, (t_best, idx_b))
        t_ref[:, :] = t_best + idx_b.astype(jnp.float32) * 1e-30

    return kernel


def run(variant: str):
    rng = np.random.default_rng(0)
    tris = jnp.asarray(rng.random((TRI_ROWS, LANES), np.float32))
    planes = [jnp.asarray(rng.random((NTILES * ROWS, LANES), np.float32))
              for _ in range(6)]
    lane_spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0))
    fn = pl.pallas_call(
        make_kernel(variant),
        grid=(NTILES,),
        in_specs=[pl.BlockSpec(tris.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] + [lane_spec] * 6,
        out_specs=lane_spec,
        out_shape=jax.ShapeDtypeStruct((NTILES * ROWS, LANES), jnp.float32),
    )

    @partial(jax.jit, static_argnames=("k",))
    def many(salt, k):
        def body(acc, i):
            out = fn(tris, *[p + (salt + i).astype(jnp.float32) * 1e-6
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
    per_tri = ms * 1e6 / (NTILES * V * 64)
    print(f"{variant:13s}: {ms:7.2f} ms/call  = {per_tri:6.1f} ns/tri-visit",
          flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    for v in ("mt", "mt_const", "planes", "planes_const"):
        run(v)
