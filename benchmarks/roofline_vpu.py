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


N_CHAINS = 8  # independent dependency chains to cover the FMA latency


def _kernel(x_ref, o_ref, *, chain: int):
    x = x_ref[:, :]
    # independent chains so the VPU pipeline isn't serialized on one
    # dependency chain; constants prevent constant-folding collapse
    ys = [x * (1.0 + 1e-7 * (i + 1)) + 1e-7 * i for i in range(N_CHAINS)]
    for _ in range(chain // N_CHAINS):
        ys = [y * (1.0 - 1e-7 * (i + 1)) + 2e-7 * (i + 1)
              for i, y in enumerate(ys)]
    acc = ys[0]
    for y in ys[1:]:
        acc = acc + y
    o_ref[:, :] = acc


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


def measure(rows: int = 2048, passes: int = 1024, interpret: bool = False):
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
    # RTT noise is additive-positive: min over repeats per endpoint
    # (same protocol as bench.py)
    t1 = min(timed(1) for _ in range(5))
    tn = min(timed(passes) for _ in range(5))
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
