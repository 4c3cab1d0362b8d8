"""Render metrics: rays/sec and spp/sec counters.

Structured replacement for the reference's window-title FPS readout
(reference main.cpp:366-380): per-iteration wall time, rays traced, and a
one-line status string. The counters are host-side (wrapped around
`block_until_ready`), matching how the reference's 1-second FPS window
measured wall clock across its cudaThreadSynchronize calls
(pathtracer.cu:233,241).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class RenderMeter:
    lanes_per_iteration: int
    total_time: float = 0.0
    total_rays: int = 0
    iterations: int = 0
    window: list = field(default_factory=list)

    def update(self, seconds: float, rays: int | None) -> None:
        self.total_time += seconds
        self.iterations += 1
        if rays is not None:
            self.total_rays += rays
        self.window.append((seconds, rays))
        if len(self.window) > 10:
            self.window.pop(0)

    @property
    def ips(self) -> float:
        """Iterations (progressive frames) per second, recent window."""
        t = sum(w[0] for w in self.window)
        return len(self.window) / t if t > 0 else 0.0

    @property
    def rays_per_sec(self) -> float:
        t = sum(w[0] for w in self.window)
        r = sum(w[1] or 0 for w in self.window)
        return r / t if t > 0 else 0.0

    def status(self, iteration: int) -> str:
        """One-line progress string (the reference's title-bar format was
        'Pathtracer (%.4f sps : %u)', main.cpp:377)."""
        parts = [f"iter {iteration}", f"{self.ips:.2f} it/s"]
        if self.total_rays:
            parts.append(f"{self.rays_per_sec / 1e6:.0f} Mrays/s")
        parts.append(f"{self.lanes_per_iteration * self.ips / 1e6:.1f} Mspp-px/s")
        return "  ".join(parts)


class Timer:
    """Context-manager wall timer for jitted sections."""

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self.t0
        return False
