"""Shared pure-JAX mirror of the Pallas kernels' BSDF sampling.

The persistent and fused-replay kernels draw the diffuse direction
through the POLAR disk map (r = sqrt(u1), theta = 2*pi*u2, z = sqrt(1-u1))
in the reference CoordinateSystem frame with an rsqrt-normalized tangent
and NO world-space re-normalize — the same distribution as the library's
concentric map, a different warping. Kernel-vs-replica tests feed both
sides the same uniforms, so the replica must mirror this exact transform;
keeping it in one place means a kernel sampling change is synced once.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_pathtracer.models.scene import DIFFUSE
from tpu_pathtracer.ops import bsdf, vecmath as vm


def kernel_bsdf_sample(mtype, albedo, coef, wo, n, u1, u2):
    """bsdf.sample with the KERNEL's diffuse draw substituted in."""
    f_val, wi, pdf_val = bsdf.sample(mtype, albedo, coef, wo, n, u1, u2)
    r_d = jnp.sqrt(u1)
    th = 2.0 * jnp.pi * u2
    ldx = r_d * jnp.cos(th)
    ldy = r_d * jnp.sin(th)
    ldz = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    nx, ny, nz = n[:, 0], n[:, 1], n[:, 2]
    use_x = jnp.abs(nx) > jnp.abs(nz)
    u = jnp.stack(
        [jnp.where(use_x, -ny, 0.0), jnp.where(use_x, nx, -nz),
         jnp.where(use_x, 0.0, ny)], axis=-1)
    # exact mirror of the kernels' _normalize3 (rsqrt, not sqrt+divide —
    # the roundings differ and these tests demand uniform-for-uniform match)
    u = u * jax.lax.rsqrt(jnp.maximum(vm.dot(u, u), 1e-20))[:, None]
    v = jnp.cross(n, u)
    wi_d = u * ldx[:, None] + v * ldy[:, None] + n * ldz[:, None]
    pdf_d = jnp.where(vm.dot(wo, wi_d) < 0.0, ldz * (1.0 / jnp.pi), 0.0)
    is_d = mtype == DIFFUSE
    wi = jnp.where(is_d[:, None], wi_d, wi)
    pdf_val = jnp.where(is_d, pdf_d, pdf_val)
    return f_val, wi, pdf_val
