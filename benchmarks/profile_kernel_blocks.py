"""Ablation profile of the persistent kernel: where do the VPU slots go?

Times seconds per lane-iteration for source-patched variants of
ops/pallas/persistent.py (a block stubbed out = its cost). Correctness of
the IMAGE is irrelevant here — every lane executes every block every
iteration regardless of liveness, so per-iteration wall time is purely
structural. Patches are exact-substring replacements against the current
source; a failed match raises, so this can't silently drift.

Usage (TPU): python -m benchmarks.profile_kernel_blocks
"""
from __future__ import annotations

import importlib
import time
import types
from functools import partial

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tpupt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import tpu_pathtracer.ops.pallas.persistent as pk
from tpu_pathtracer.models import camera as cm, scene as sc
from tpu_pathtracer.ops.pallas.trace_kernel import pack_camera

W, H, MB = 640, 480, 10
TR, BUD = 32, 16
ITERS = 60
REPEATS = 3
LANES_TOTAL = 2400 * 128

PATCHES = {
    "baseline": [],
    "no_trig": [(
        "        r_d = jnp.sqrt(u1)\n"
        "        th = (2.0 * math.pi) * u2\n"
        "        ldx = r_d * jnp.cos(th)\n"
        "        ldy = r_d * jnp.sin(th)\n"
        "        ldz = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))\n",
        "        ldx = u1 - 0.5\n"
        "        ldy = u2 - 0.5\n"
        "        ldz = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))\n",
    )],
    "no_onb": [(
        "        use_x = jnp.abs(nx) > jnp.abs(nz)\n"
        "        ux = jnp.where(use_x, -ny, 0.0)\n"
        "        uy = jnp.where(use_x, nx, -nz)\n"
        "        uz = jnp.where(use_x, 0.0, ny)\n"
        "        ux, uy, uz = _normalize3(ux, uy, uz)\n"
        "        vx = ny * uz - nz * uy\n"
        "        vy = nz * ux - nx * uz\n"
        "        vz = nx * uy - ny * ux\n",
        "        ux = nx + 1.0; uy = ny; uz = nz\n"
        "        vx = nx; vy = ny + 1.0; vz = nz\n",
    )],
    # branchless Frisvad ONB (no normalize, one reciprocal) — candidate
    # replacement for the pick-axis + normalize construction
    "frisvad_onb": [(
        "        use_x = jnp.abs(nx) > jnp.abs(nz)\n"
        "        ux = jnp.where(use_x, -ny, 0.0)\n"
        "        uy = jnp.where(use_x, nx, -nz)\n"
        "        uz = jnp.where(use_x, 0.0, ny)\n"
        "        ux, uy, uz = _normalize3(ux, uy, uz)\n"
        "        vx = ny * uz - nz * uy\n"
        "        vy = nz * ux - nx * uz\n"
        "        vz = nx * uy - ny * ux\n",
        "        sgn_o = jnp.where(nz >= 0.0, 1.0, -1.0)\n"
        "        a_o = -1.0 / (sgn_o + nz)\n"
        "        onb_b = nx * ny * a_o\n"
        "        ux = 1.0 + sgn_o * nx * nx * a_o\n"
        "        uy = sgn_o * onb_b\n"
        "        uz = -sgn_o * nx\n"
        "        vx = onb_b\n"
        "        vy = sgn_o + ny * ny * a_o\n"
        "        vz = -ny\n",
    )],
    # sqrt-free any-hit: the shadow occlusion boolean phrased in compares
    # against e^2 instead of computing sqrt(det) + root selection
    "anyhit_sqrtfree": [(
        "                for pp in range(n_prims):\n"
        "                    sx2 = prims_ref[pp, 0] - hx\n"
        "                    sy2 = prims_ref[pp, 1] - hy\n"
        "                    sz2 = prims_ref[pp, 2] - hz\n"
        "                    rb = _dot3(sx2, sy2, sz2, wlx, wly, wlz)\n"
        "                    rdet = (\n"
        "                        rb * rb - _dot3(sx2, sy2, sz2, sx2, sy2, sz2)\n"
        "                        + prims_ref[pp, 3] * prims_ref[pp, 3]\n"
        "                    )\n"
        "                    rsq = jnp.sqrt(jnp.maximum(rdet, 0.0))\n"
        "                    rt = jnp.where(rb - rsq > tmin, rb - rsq, rb + rsq)\n"
        "                    occ = occ | ((rdet >= 0.0) & (rt > tmin) & (rt < smax))\n",
        "                e1s = -(tmin + 0.0)\n"
        "                for pp in range(n_prims):\n"
        "                    sx2 = prims_ref[pp, 0] - hx\n"
        "                    sy2 = prims_ref[pp, 1] - hy\n"
        "                    sz2 = prims_ref[pp, 2] - hz\n"
        "                    rb = _dot3(sx2, sy2, sz2, wlx, wly, wlz)\n"
        "                    rdet = (\n"
        "                        rb * rb - _dot3(sx2, sy2, sz2, sx2, sy2, sz2)\n"
        "                        + prims_ref[pp, 3] * prims_ref[pp, 3]\n"
        "                    )\n"
        "                    e1 = rb + e1s\n"
        "                    e2 = rb - smax\n"
        "                    q1 = e1 * e1\n"
        "                    q2 = e2 * e2\n"
        "                    A = (e1 > 0.0) & (rdet < q1)\n"
        "                    B = (e2 < 0.0) | (rdet > q2)\n"
        "                    Cc = (e1 > 0.0) | (rdet > q1)\n"
        "                    Dd = (e2 < 0.0) & (rdet < q2)\n"
        "                    occ = occ | ((rdet >= 0.0) & ((A & B) | (~A & Cc & Dd)))\n",
    )],
    "no_campixel": [(
        "        gdx = cam_ref[0] - cam_ref[6] * sy + cam_ref[3] * sx\n"
        "        gdy = cam_ref[1] - cam_ref[7] * sy + cam_ref[4] * sx\n"
        "        gdz = cam_ref[2] - cam_ref[8] * sy + cam_ref[5] * sx\n"
        "        gdx, gdy, gdz = _normalize3(gdx, gdy, gdz)\n",
        "        gdx = sx * 1e-6\n"
        "        gdy = sy * 1e-6 + 0.3\n"
        "        gdz = gdx - 0.95\n",
    )],
    "no_rr": [(
        "        do_rr = bounce > rr_start\n"
        "        p_cont = jnp.minimum(0.5, jnp.maximum(Tr, jnp.maximum(Tg, Tb)))\n"
        "        survive = u3 <= p_cont\n"
        "        boost = step_ok & do_rr & survive & (p_cont > 0.0)\n"
        "        inv_p = 1.0 / jnp.maximum(p_cont, 1e-20)\n"
        "        Tr = jnp.where(boost, Tr * inv_p, Tr)\n"
        "        Tg = jnp.where(boost, Tg * inv_p, Tg)\n"
        "        Tb = jnp.where(boost, Tb * inv_p, Tb)\n",
        "        do_rr = bounce > rr_start\n"
        "        survive = u3 <= 0.6\n",
    )],
    "no_emit": [(
        "        one_sided = _dot3(nx, ny, nz, -wox, -woy, -woz) > 0.0\n",
        "        one_sided = nx > -2.0\n",
    )],
}


def load_variant(name: str) -> types.ModuleType:
    spec = importlib.util.find_spec("tpu_pathtracer.ops.pallas.persistent")
    src = open(spec.origin).read()
    for old, new in PATCHES[name]:
        if old not in src:
            raise RuntimeError(f"patch {name!r}: source block not found")
        src = src.replace(old, new)
    mod = types.ModuleType(f"persistent_variant_{name}")
    mod.__file__ = spec.origin + f"#{name}"
    import sys
    # flax.struct.dataclass resolves the defining module via sys.modules
    sys.modules[mod.__name__] = mod
    exec(compile(src, mod.__file__, "exec"), mod.__dict__)
    return mod


def measure(mod, scene, cp, nee=False) -> float:
    @partial(jax.jit, static_argnames=("k",))
    def frames(salt, k):
        st0 = mod.init_state(W, H, TR)

        def body(carry, i):
            st, rays = carry
            st, nr = mod.persistent_step(
                scene, cp, jnp.stack([salt, i]), st, budget=BUD,
                width=W, height=H, max_bounces=MB, tile_rows=TR,
                use_nee=nee,
            )
            return (st, rays + nr), None

        (st, rays), _ = jax.lax.scan(
            body, (st0, jnp.int32(0)), jnp.arange(k, dtype=jnp.int32)
        )
        return mod.state_image(st, W, H).mean(), rays

    salt = jnp.int32(time.time_ns() & 0x0FFFFFFF)

    def timed(k, s):
        t0 = time.perf_counter()
        acc, _ = frames(s, k)
        float(acc)
        return time.perf_counter() - t0

    timed(1, salt + 1)
    timed(ITERS, salt + 2)
    t1s, tns = [], []
    for rep in range(REPEATS):
        t1s.append(timed(1, salt + 3 + 2 * rep))
        tns.append(timed(ITERS, salt + 4 + 2 * rep))
    el = max(min(tns) - min(t1s), 1e-9)
    lane_iters = LANES_TOTAL * BUD * (ITERS - 1)
    return lane_iters / el


def main() -> None:
    scene, cs = sc.cornell_spheres()
    cam = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], W, H,
                         cs["fov"])
    cp = pack_camera(cam)
    # all-diffuse twin of the Cornell scene: compiles without the
    # specular + transmissive BSDF blocks (static structure)
    mats_d = [sc.diffuse(m["color"]) for m in sc.reference_materials()]
    import numpy as np
    n_p = int(scene.num_prims)
    spheres = [
        sc.sphere(list(c), float(r), int(m), int(l))
        for c, r, m, l in zip(
            np.asarray(scene.centers)[:n_p].tolist(),
            np.asarray(scene.radii)[:n_p].tolist(),
            np.asarray(scene.prim_material_ids)[:n_p].tolist(),
            np.asarray(scene.light_id)[:n_p].tolist(),
        )
    ]
    lights = [sc.area_light(8, [12.0, 12.0, 12.0])]
    scene_alldiff = sc.make_scene(spheres, mats_d, lights)
    # 3-prim scene: per-prim intersect slope
    scene_3 = sc.make_scene(spheres[6:9], mats_d, [sc.area_light(2, [12.0] * 3)])

    base = measure(pk, scene, cp)
    print(f"baseline             : {base/1e9:6.2f} G lane-iter/s "
          f"({1e12/base:6.1f} ps/lane-iter)", flush=True)

    rows = [
        ("all-diffuse (no spec/trans blocks)", pk, scene_alldiff, False),
        ("3 prims (all-diffuse)", pk, scene_3, False),
        ("nee on (cornell)", pk, scene, True),
    ]
    for name in ("no_trig", "no_onb", "no_campixel", "no_rr", "no_emit"):
        rows.append((name, load_variant(name), scene, False))
    for name, mod, scn, nee in rows:
        r = measure(mod, scn, cp, nee)
        d = 1e12 / r - 1e12 / base
        print(f"{name:35s}: {r/1e9:6.2f} G lane-iter/s "
              f"(delta {d:+7.1f} ps/lane-iter)", flush=True)


if __name__ == "__main__":
    main()
