"""jax.profiler trace windows for the training loop.

The reference has no tracer integration — its observability is wall-clock
AvgTimers (basicsr/utils/logger.py:10-43) and CUDA-event microbenchmarks
(ESC/scripts/test_direct_metrics.py). On TPU the native tool is the XLA
profiler: `jax.profiler.start_trace/stop_trace` dumps a TensorBoard-readable
trace (xplane protobuf) with per-HLO device timelines, HBM traffic and
host<->device transfer lanes — far more than iteration timers can show.

Config (``logger.profile`` in the experiment YAML):

.. code-block:: yaml

    logger:
      profile:
        start_iter: 20     # first traced iteration (after warmup/compile)
        num_iters: 3       # how many iterations to capture
        logdir: ~          # default <experiments_root>/profile

View with ``tensorboard --logdir <dir>`` (Profile plugin) or
``xprof`` tooling.
"""

from __future__ import annotations

import os

import jax


class TraceWindow:
    """Start/stop a jax.profiler trace over an iteration window.

    Drive it from the training loop with :meth:`step`; the window opens at
    ``start_iter`` and closes after ``num_iters`` iterations (blocking on
    ``block_on`` so the final device work lands inside the trace). Inert
    when constructed with ``cfg=None`` and on non-zero processes (the
    profiler captures the local runtime; one trace per job is the useful
    artifact, matching the reference's rank-0-only logging).
    """

    def __init__(self, cfg: dict | None, default_logdir: str):
        self._active = False
        self._done = cfg is None or jax.process_index() != 0
        if cfg is None:
            self.start_iter = self.end_iter = -1
            self.logdir = default_logdir
            return
        self.start_iter = int(cfg.get("start_iter", 10))
        self.end_iter = self.start_iter + int(cfg.get("num_iters", 3))
        self.logdir = cfg.get("logdir") or default_logdir

    def step(self, current_iter: int, block_on=None) -> None:
        """Call once per training iteration (after optimize_parameters)."""
        if self._done:
            return
        if not self._active and current_iter >= self.start_iter:
            os.makedirs(self.logdir, exist_ok=True)
            jax.profiler.start_trace(self.logdir)
            self._active = True
        if self._active and current_iter >= self.end_iter:
            if block_on is not None:
                jax.block_until_ready(block_on)
            jax.profiler.stop_trace()
            self._active = False
            self._done = True

    def close(self) -> None:
        """Stop an open trace (end-of-training safety)."""
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True


class trace_eval:
    """Context manager tracing a whole evaluation pass.

    The eval analog of :class:`TraceWindow` — a ``logger.profile`` block in
    a *test* YAML traces the validation loop (tile dispatches, host<->device
    image transfers, metric reductions). Inert when ``cfg`` is None or on
    non-zero processes.
    """

    def __init__(self, cfg: dict | None, default_logdir: str):
        self._on = cfg is not None and jax.process_index() == 0
        self.logdir = (cfg or {}).get("logdir") or default_logdir

    def __enter__(self):
        if self._on:
            os.makedirs(self.logdir, exist_ok=True)
            jax.profiler.start_trace(self.logdir)
        return self

    def __exit__(self, *exc):
        if self._on:
            jax.profiler.stop_trace()
        return False
