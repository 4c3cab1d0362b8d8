"""tpu-pathtracer: a TPU-native differentiable Monte Carlo path tracer.

Built from scratch in JAX/XLA/Pallas with the capabilities of the CUDA
reference renderer mightycid/CUDA-pathtracer (see SURVEY.md), re-designed
TPU-first: SoA wavefront integration instead of a divergent megakernel,
MXU-matmul ray-primitive sweeps instead of per-thread linear scans,
counter-based RNG instead of a cuRAND batch, and `shard_map` over device
meshes instead of single-GPU kernel launches.
"""

from tpu_pathtracer.models.camera import Camera, make_camera
from tpu_pathtracer.models.scene import BUILTIN_SCENES, Scene, make_scene
from tpu_pathtracer.models.integrator import RenderConfig, render, render_image
from tpu_pathtracer.models.progressive import ProgressiveRenderer

__version__ = "0.1.0"

__all__ = [
    "BUILTIN_SCENES",
    "Camera",
    "Scene",
    "make_camera",
    "make_scene",
    "RenderConfig",
    "render",
    "render_image",
    "ProgressiveRenderer",
]
