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

    def update_camera(self, camera: Camera) -> None:
        """Camera motion restarts accumulation (main.cpp:209 semantics)."""
        self.camera = camera
        self.state = reset(self.state)
