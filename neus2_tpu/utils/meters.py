"""Time-based EMA meters and profiling helpers.

Mirrors the reference's observability layer (reference: include/.../common.h
238-283 `Ema` with time-based half-life; testbed.h:833-837 the
m_training_prep_ms / m_training_ms / m_render_ms / m_frame_ms instances
updated via ScopeGuard timers, and the loss-scalar EMAs at testbed.h:880-882).
`trace` wraps jax.profiler for xprof captures (SURVEY.md §5.1).
"""

from __future__ import annotations

import contextlib
import math
import time


class Ema:
    """Time-based exponential moving average (reference common.h:238-283)."""

    def __init__(self, half_life_s: float = 1.0):
        self.half_life_s = half_life_s
        self.value = 0.0
        self._last_t: float | None = None

    def update(self, sample: float, now: float | None = None) -> float:
        now = time.monotonic() if now is None else now
        if self._last_t is None:
            self.value = sample
        else:
            dt = max(now - self._last_t, 0.0)
            alpha = 0.5 ** (dt / self.half_life_s) if self.half_life_s > 0 else 0.0
            self.value = alpha * self.value + (1.0 - alpha) * sample
        self._last_t = now
        return self.value


class StepEma:
    """Step-based EMA (reference loss scalars, decay per update)."""

    def __init__(self, decay: float = 0.9):
        self.decay = decay
        self.value = math.nan

    def update(self, sample: float) -> float:
        if math.isnan(self.value):
            self.value = sample
        else:
            self.value = self.decay * self.value + (1.0 - self.decay) * sample
        return self.value


class Meters:
    """The reference's per-phase ms meters as a bundle."""

    def __init__(self):
        self.training_prep_ms = Ema(1.0)
        self.training_ms = Ema(1.0)
        self.render_ms = Ema(1.0)
        self.frame_ms = Ema(1.0)

    @contextlib.contextmanager
    def scope(self, name: str):
        """ScopeGuard-style timing into the named meter."""
        t0 = time.monotonic()
        try:
            yield
        finally:
            getattr(self, f"{name}_ms").update(1000.0 * (time.monotonic() - t0))

    def summary(self) -> dict[str, float]:
        return {
            "training_prep_ms": self.training_prep_ms.value,
            "training_ms": self.training_ms.value,
            "render_ms": self.render_ms.value,
            "frame_ms": self.frame_ms.value,
        }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/neus2_trace"):
    """jax.profiler capture for xprof (TPU equivalent of nvtx ranges)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
