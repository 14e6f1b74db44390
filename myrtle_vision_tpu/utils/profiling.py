"""Opt-in training-step profiling.

The reference wraps model stages in torch autograd profiler ranges behind a
``profile`` flag that no entry point actually sets (reference:
src/myrtle_vision/models/vit.py:116-124, 204-214; utils/models.py:25,41).
Here profiling is both always-on and opt-in:

- ``jax.named_scope`` annotations (patch_to_embedding / transformer:attention
  / transformer:feedforward / mlp_head — the reference's range names) are
  always present in the model, so any captured trace is labeled;
- setting ``MVT_PROFILE_DIR=/path`` makes every trainer capture a device
  trace of a few warm steps (viewable in TensorBoard / Perfetto), the
  jax.profiler analogue of torch.autograd.profiler.
"""
from __future__ import annotations

import os

import jax


class StepProfiler:
    """Captures a jax.profiler trace over steps [start, stop) when
    MVT_PROFILE_DIR is set; otherwise a no-op."""

    def __init__(self, start: int = 3, num_steps: int = 3):
        self.trace_dir = os.environ.get("MVT_PROFILE_DIR")
        self.start = start
        self.stop = start + num_steps
        self._active = False

    def step(self, iteration: int) -> None:
        if self.trace_dir is None:
            return
        if not self._active and iteration == self.start:
            jax.profiler.start_trace(self.trace_dir)
            self._active = True
            print(f"[profiler] tracing steps {self.start}..{self.stop - 1} "
                  f"-> {self.trace_dir}")
        elif self._active and iteration >= self.stop:
            jax.profiler.stop_trace()
            self._active = False
            print(f"[profiler] trace written to {self.trace_dir}")

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
