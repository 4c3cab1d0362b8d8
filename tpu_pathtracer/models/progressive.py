"""Progressive (interactive-style) rendering: accumulate, reset on change.

TPU-native equivalent of the reference's frame loop state: the running-mean
framebuffer update `buf = (buf*(n-1) + c)/n` (reference pathtracer.cu:104-109),
the iteration counter (pathtracer.h:58), and reset-on-camera-change
(main.cpp:209 -> pathtracer.cu:245-247).

The accumulator state is a pytree (sum image + iteration count), so it can
be checkpointed with orbax for preemption-safe long renders (SURVEY.md §5
"Checkpoint / resume") — the reference kept this state only in GPU memory.
We store the SUM rather than the running mean: mathematically equivalent
read-side (mean = sum/n), but the sum form is exact in accumulation and
maps onto psum-reductions when sample-sharded across chips.
"""
from __future__ import annotations

from functools import partial

import flax.struct
import jax
import jax.numpy as jnp
from jax import Array

from tpu_pathtracer.models.camera import Camera
from tpu_pathtracer.models.integrator import RenderConfig, render
from tpu_pathtracer.models.scene import Scene


@flax.struct.dataclass
class AccumulatorState:
    """Persistent progressive-render state (pathtracer.h:52-58 analogue)."""

    radiance_sum: Array  # (H, W, 3) sum of per-iteration mean radiance
    iteration: Array  # () int32 — number of accumulated iterations


def init_state(height: int, width: int) -> AccumulatorState:
    return AccumulatorState(
        radiance_sum=jnp.zeros((height, width, 3), jnp.float32),
        iteration=jnp.zeros((), jnp.int32),
    )


def reset(state: AccumulatorState) -> AccumulatorState:
    """Restart accumulation (reference Pathtracer::Reset, pathtracer.cu:245)."""
    return AccumulatorState(
        radiance_sum=jnp.zeros_like(state.radiance_sum),
        iteration=jnp.zeros_like(state.iteration),
    )


@partial(jax.jit, static_argnames=("config",))
def step(
    state: AccumulatorState,
    scene: Scene,
    camera: Camera,
    key: Array,
    config: RenderConfig,
) -> AccumulatorState:
    """One progressive iteration (reference Pathtracer::Run, pathtracer.cu:222).

    The per-iteration RNG stream is keyed on the iteration counter, matching
    the reference's regenerate-every-frame cuRAND discipline
    (pathtracer.cu:224) but reproducibly.
    """
    it = state.iteration
    frame = render(scene, camera, key, config, iteration=it)
    return AccumulatorState(
        radiance_sum=state.radiance_sum + frame,
        iteration=it + 1,
    )


def image(state: AccumulatorState) -> Array:
    """Current progressive estimate = running mean of accumulated frames."""
    n = jnp.maximum(state.iteration, 1).astype(jnp.float32)
    return state.radiance_sum / n


# Persistent-kernel vs XLA-wavefront crossover for mesh scenes. The
# persistent kernel's whole-tile in-kernel walk pays every visited leaf
# for all of a tile's lanes; past this triangle count the two-pass
# binned packet traversal (XLA wavefront) wins on incoherent waves
# (config-4 scale — A/B numbers in BASELINE.md). One policy for CLI and
# viewer (VERDICT r4 item 6).
BIG_MESH_TRIS = 10_000


def auto_backend(scene: Scene) -> str:
    """Shared backend auto-routing: "pallas" (persistent kernel) on
    accelerators for sphere scenes and small/medium meshes, "xla"
    (wavefront + packet BVH) on CPU and for big meshes."""
    if jax.devices()[0].platform == "cpu":
        return "xla"
    if scene.mesh is not None and int(scene.mesh.num_tris) > BIG_MESH_TRIS:
        return "xla"
    return "pallas"


class PersistentRenderer:
    """Progressive renderer over the persistent path-regeneration kernel
    (ops/pallas/persistent.py) — the fast path's analogue of
    ProgressiveRenderer, with the same host-side surface (step / image /
    iteration / update_camera-resets, reference main.cpp Display/Idle
    semantics).

    The kernel's PathState IS the progressive accumulator (per-pixel
    radiance sums + completed-sample counts carried in HBM across steps),
    so accumulation never leaves the device, checkpoints are the plain
    pytree snapshot (utils/checkpoint), and a mesh shards the state rows
    over chips with bit-identical results (parallel/persistent_sharded).

    ``iteration`` reports min-completed-samples // spp: the count of
    reference-equivalent frames (pathtracer.h:58) every pixel has finished.
    """

    def __init__(self, scene: Scene, camera: Camera, config: RenderConfig,
                 seed: int = 0, *, budget: int = 32, tile_rows: int = 32,
                 mesh=None, interpret: bool = False):
        from tpu_pathtracer.ops.pallas.persistent import init_state
        from tpu_pathtracer.ops.pallas.trace_kernel import pack_camera

        if scene.mesh is not None:
            # One render stack for ALL geometry (the reference's single
            # integrator over its PrimitiveList, scene.h:71-94): the
            # kernel walks the packed BVH in-kernel; textured materials
            # sample the atlas in-kernel too (soft-two-hot MXU bilinear,
            # ops/pallas/persistent.py).
            if scene.mesh_packed is None:
                from tpu_pathtracer.models.scene import with_packet_mesh

                scene = with_packet_mesh(scene)
        self.scene = scene
        self.camera = camera
        self.config = config
        self.seed = seed
        self.budget = budget
        self.tile_rows = tile_rows
        self.mesh = mesh
        self.interpret = interpret
        self._salt = 0
        self._cp = pack_camera(camera)
        if mesh is not None:
            from tpu_pathtracer.parallel.persistent_sharded import (
                init_state_sharded,
            )

            self.state = init_state_sharded(camera.width, camera.height,
                                            mesh, tile_rows)
        else:
            self.state = init_state(camera.width, camera.height, tile_rows)

    def step(self) -> int:
        """Advance all lanes by ``budget`` wavefront iterations; returns
        the number of live ray segments traced."""
        import jax.numpy as jnp

        from tpu_pathtracer.ops.pallas.persistent import persistent_step

        seed = jnp.asarray([self.seed, self._salt], jnp.int32)
        kw = dict(
            budget=self.budget, width=self.camera.width,
            height=self.camera.height,
            max_bounces=self.config.max_bounces,
            rr_start=self.config.rr_start, tile_rows=self.tile_rows,
            use_nee=self.config.use_nee,
            use_dof=self.camera.use_dof,
            interpret=self.interpret,
        )
        if self.mesh is not None:
            from tpu_pathtracer.parallel.persistent_sharded import (
                persistent_step_sharded,
            )

            self.state, nrays = persistent_step_sharded(
                self.scene, self._cp, seed, self.state, self.mesh, **kw
            )
        else:
            self.state, nrays = persistent_step(
                self.scene, self._cp, seed, self.state, **kw
            )
        return int(nrays)

    def render_to(self, target_spp: int, max_steps: int = 10_000) -> int:
        """Step until every pixel has >= target_spp completed samples
        (adaptive: fast pixels keep sampling while slow ones catch up).
        Returns total live rays traced."""
        total = 0
        for _ in range(max_steps):
            total += self.step()
            if self.min_samples >= target_spp:
                break
        return total

    def image(self):
        from tpu_pathtracer.ops.pallas.persistent import state_image

        return state_image(self.state, self.camera.width, self.camera.height)

    @property
    def min_samples(self) -> int:
        from tpu_pathtracer.ops.pallas.persistent import state_min_samples

        return int(state_min_samples(self.state, self.camera.width,
                                     self.camera.height))

    @property
    def iteration(self) -> int:
        """Completed reference-equivalent frames (min samples // spp)."""
        return self.min_samples // max(self.config.spp, 1)

    def reset(self) -> None:
        """Restart accumulation (pathtracer.cu:245 semantics). Bumps the
        RNG salt so the restart draws fresh streams rather than replaying
        the pre-reset paths."""
        from tpu_pathtracer.ops.pallas.persistent import init_state

        self._salt += 1
        if self.mesh is not None:
            from tpu_pathtracer.parallel.persistent_sharded import (
                init_state_sharded,
            )

            self.state = init_state_sharded(
                self.camera.width, self.camera.height, self.mesh,
                self.tile_rows,
            )
        else:
            self.state = init_state(self.camera.width, self.camera.height,
                                    self.tile_rows)

    def update_camera(self, camera: Camera) -> None:
        """Camera motion restarts accumulation (main.cpp:209 semantics)."""
        from tpu_pathtracer.ops.pallas.trace_kernel import pack_camera

        self.camera = camera
        self._cp = pack_camera(camera)
        self.reset()


class ProgressiveRenderer:
    """Convenience host-side driver mirroring the reference's app loop
    (main.cpp Display/Idle): step(), image(), and camera updates that reset
    accumulation. Functional core, thin stateful shell.
    """

    def __init__(self, scene: Scene, camera: Camera, config: RenderConfig,
                 seed: int = 0):
        self.scene = scene
        self.camera = camera
        self.config = config
        self.key = jax.random.key(seed)
        self.state = init_state(camera.height, camera.width)

    def step(self) -> None:
        self.state = step(self.state, self.scene, self.camera, self.key,
                          self.config)

    def image(self):
        return image(self.state)

    @property
    def iteration(self) -> int:
        return int(self.state.iteration)

    def reset(self) -> None:
        """Restart accumulation (pathtracer.cu:245 semantics)."""
        self.state = reset(self.state)

    def update_camera(self, camera: Camera) -> None:
        """Camera motion restarts accumulation (main.cpp:209 semantics)."""
        self.camera = camera
        self.state = reset(self.state)
