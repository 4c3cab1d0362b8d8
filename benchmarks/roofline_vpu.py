"""VPU roofline probe: sustained elementwise f32 throughput on one chip.

The path-tracing kernels are VPU-bound (the integrator is selects,
quadratics, and transcendentals over (rows, 128) registers — there are
no matmuls to feed the MXU), so the relevant speed-of-light is the
sustained f32 FMA rate of the vector unit, not the headline bf16 MXU
TFLOPs. This kernel measures it directly: a chain of `x = x * a + b`
over a VMEM-resident block, long enough that loads/stores amortize to
nothing. Comparing the render kernel's (ops/iteration x iterations/s)
against this number says how far from speed-of-light the integrator
runs — the honest efficiency metric for BASELINE.md.

Usage (TPU): python -m benchmarks.roofline_vpu
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
CHAIN = 512  # FMAs per element per kernel pass (unrolled)


def _kernel(x_ref, o_ref, *, chain: int):
    x = x_ref[:, :]
    # two independent chains so the VPU pipeline isn't serialized on one
    # dependency chain; constants prevent constant-folding collapse
    y = x * 1.0000001 + 0.0000003
    for _ in range(chain // 2):
        x = x * 1.0000002 + 0.0000001
        y = y * 0.9999999 + 0.0000002
    o_ref[:, :] = x + y


@functools.partial(jax.jit, static_argnames=("rows", "chain", "passes",
                                             "interpret"))
def _run(x, salt, rows: int, chain: int, passes: int,
         interpret: bool = False):
    # salt the block so no two invocations share an input hash — the
    # remote terminal memoizes repeated executions (docs/STATUS.md)
    x = x + salt.astype(jnp.float32) * 1e-12
    call = pl.pallas_call(
        functools.partial(_kernel, chain=chain),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        interpret=pltpu.InterpretParams() if interpret else False,
    )

    def body(v, _):
        return call(v), None

    out, _ = jax.lax.scan(body, x, None, length=passes)
    # scalar result: the host-side fetch of this value is the only
    # reliable sync point through the remote tunnel (block_until_ready
    # returns before device completion there)
    return out.sum()


def measure(rows: int = 2048, passes: int = 64, interpret: bool = False):
    x = jnp.ones((rows, LANES), jnp.float32) * 0.5
    fmas_per_pass = rows * LANES * (CHAIN + 2)

    salt = [int(time.time() * 1e6) % (1 << 30)]

    def timed(p):
        salt[0] += 1
        s = jnp.int32(salt[0])
        t0 = time.perf_counter()
        float(_run(x, s, rows, CHAIN, p, interpret))
        return time.perf_counter() - t0

    timed(1)
    timed(passes)  # compile both
    t1 = timed(1)
    tn = timed(passes)
    elapsed = max(tn - t1, 1e-9)
    fma_rate = fmas_per_pass * (passes - 1) / elapsed
    return fma_rate


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2048)
    ap.add_argument("--passes", type=int, default=64)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    rate = measure(args.rows, args.passes, args.interpret)
    print(json.dumps({
        "metric": "vpu_fma_rate",
        "value": rate,
        "unit": "FMA/s (f32, elementwise)",
    }))


if __name__ == "__main__":
    main()
