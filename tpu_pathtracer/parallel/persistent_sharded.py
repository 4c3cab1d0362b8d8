"""Multi-chip persistent path tracing: the fused kernel under shard_map.

Round 1 left two render stacks: the fast fused Pallas kernel and a slower
XLA wavefront that alone composed with sharding/progressive/checkpointing.
This module closes that seam for the persistent path-regeneration kernel
(ops/pallas/persistent.py): the per-lane `PathState` rows are sharded over
the flattened (tile, sample) device mesh and every shard runs the SAME
kernel a single device would run on its global tiles.

Determinism across mesh shapes comes from global-tile addressing: each
shard passes its first global tile id as `tile_offset`, so lane->pixel
mapping and the per-tile PRNG streams (hardware-seeded on TPU, threefry
blocks in interpret mode) are functions of the GLOBAL tile id alone. A
sharded run is therefore bit-identical to the single-device run for any
mesh shape — the same property tests/test_sharding.py asserts for the XLA
path, now for the kernel path (tests/test_persistent.py).

The scene/camera/seed are replicated (KB-scale, like the reference's
device copy at pathtracer.cu:176-204); the only collective is a psum of
the live-ray counter. Image readout stays sharded — `state_image` on the
gathered state, or per-shard for tiled writeback.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import Array
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from tpu_pathtracer.models.scene import Scene
from tpu_pathtracer.ops.pallas.persistent import (
    PathState, init_state, persistent_step,
)
from tpu_pathtracer.parallel.mesh import SAMPLE_AXIS, TILE_AXIS

_AXES = (TILE_AXIS, SAMPLE_AXIS)


def init_state_sharded(
    width: int, height: int, mesh: jax.sharding.Mesh, tile_rows: int = 32
) -> PathState:
    """A PathState whose lane rows are placed shard-major over the mesh."""
    n_dev = mesh.devices.size
    state = init_state(width, height, tile_rows, tiles_multiple=n_dev)
    row_sharding = NamedSharding(mesh, P(_AXES))
    rep = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.device_put(x, rep if x.ndim == 0 else row_sharding),
        state,
    )


def persistent_step_sharded(
    scene: Scene,
    cam_packed: Array,
    seed: Array,
    state: PathState,
    mesh: jax.sharding.Mesh,
    *,
    budget: int = 16,
    width: int,
    height: int,
    max_bounces: int = 10,
    rr_start: int = 3,
    tile_rows: int = 32,
    use_nee: bool = False,
    use_dof: bool = False,
    strat_k: int = 2,
    interpret: bool = False,
) -> tuple[PathState, Array]:
    """One persistent_step, sharded over the mesh. Returns
    (new_state, total_live_rays). Bit-identical to the single-device step
    for any mesh shape (global-tile RNG/pixel addressing)."""
    rows_total = state.lr.shape[0]
    n_dev = mesh.devices.size
    n_tiles = rows_total // tile_rows
    if n_tiles % n_dev:
        raise ValueError(
            f"{n_tiles} tiles do not divide over {n_dev} devices; build the "
            f"state with init_state_sharded(..., mesh)"
        )
    tiles_local = n_tiles // n_dev

    state_specs = jax.tree.map(lambda x: P() if x.ndim == 0 else P(_AXES),
                               state)
    step = partial(
        persistent_step,
        budget=budget, width=width, height=height,
        max_bounces=max_bounces, rr_start=rr_start, tile_rows=tile_rows,
        use_nee=use_nee, use_dof=use_dof, strat_k=strat_k,
        interpret=interpret,
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), state_specs),
        out_specs=(state_specs, P()),
        check_vma=False,
    )
    def sharded(scene_rep, cp_rep, seed_rep, st):
        shard = (
            jax.lax.axis_index(TILE_AXIS) * mesh.shape[SAMPLE_AXIS]
            + jax.lax.axis_index(SAMPLE_AXIS)
        )
        new_st, nrays = step(
            scene_rep, cp_rep, seed_rep, st,
            tile_offset=shard * tiles_local,
        )
        return new_st, jax.lax.psum(nrays, _AXES)

    return sharded(scene, cam_packed, seed, state)


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "budget", "width", "height", "max_bounces", "rr_start",
        "tile_rows", "use_nee", "use_dof", "strat_k", "interpret",
    ),
    donate_argnames=("state",),
)
def persistent_step_sharded_jit(
    scene, cam_packed, seed, state, mesh, **kw
) -> tuple[PathState, Array]:
    return persistent_step_sharded(scene, cam_packed, seed, state, mesh, **kw)
