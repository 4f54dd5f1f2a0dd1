"""Per-stage timing + JAX profiler tracing.

The reference's observability is tqdm bars, verbose prints and the
exponential-backoff heartbeat decorator (function_decorators.py:6-66).
This module is the TPU build's upgrade (SURVEY.md §5): a stage timer
that understands JAX's async dispatch, and a thin wrapper over
``jax.profiler`` for on-demand device traces.
"""
from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path


def hard_sync(*pytrees):
    """True device barrier: reduce every array to one scalar on device
    and read it back.

    On the tunneled TPU backend ``jax.device_put`` acknowledges before
    the host→device bytes finish streaming, and
    ``jax.block_until_ready`` waits only for dispatched compute whose
    inputs are already resident — a pending input upload blocks
    *neither* (measured: block_until_ready after an 890 MB device_put
    returns in 0.9 s; the next tiny readback then blocks 235 s while the
    link drains at ~4 MB/s).  The only true barrier is a device→host
    readback, so this reduces each array to a scalar (full data
    dependency) and downloads those few bytes — one ~50 ms tunnel round
    trip, not a bulk transfer.  Use it to close every timed region;
    ``tools/roofline.py`` applies the same trick by fusing the reduction
    into the timed program.
    """
    import numpy as np
    import jax
    import jax.numpy as jnp
    for tree in pytrees:
        for leaf in jax.tree_util.tree_leaves(tree):
            if isinstance(leaf, jax.Array):
                s = jnp.sum(jnp.abs(leaf)) if jnp.iscomplexobj(leaf) \
                    else jnp.sum(leaf)
                np.asarray(s)


def _block(result):
    """Wait for async JAX work so wall times mean what they say."""
    try:
        hard_sync(result)
    except Exception:
        pass
    return result


class StageTimer:
    """Accumulates named stage wall times; prints / saves a summary.

    >>> timer = StageTimer()
    >>> with timer.stage("filtering"):
    ...     filtered = bandpass_filter(x, fs, 1, 100)
    >>> timer.report()
    """

    def __init__(self, name: str = "pipeline", sync_jax: bool = True):
        self.name = name
        self.sync_jax = sync_jax
        self.stages: list[tuple[str, float]] = []

    @contextlib.contextmanager
    def stage(self, label: str, result_getter=None):
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            if self.sync_jax and result_getter is not None:
                _block(result_getter())
            self.stages.append((label, time.perf_counter() - t0))

    def timed(self, label: str):
        """Decorator variant: blocks on the function's (JAX) result."""
        def deco(fn):
            def wrapper(*args, **kwargs):
                t0 = time.perf_counter()
                out = fn(*args, **kwargs)
                if self.sync_jax:
                    _block(out)
                self.stages.append((label,
                                    time.perf_counter() - t0))
                return out
            return wrapper
        return deco

    @property
    def total(self) -> float:
        return sum(t for _, t in self.stages)

    def report(self, printer=print) -> str:
        total = max(self.total, 1e-12)
        lines = [f"[{self.name}] stage timings:"]
        for label, t in self.stages:
            lines.append(f"  {label:<32s} {t:9.3f} s "
                         f"({100 * t / total:5.1f} %)")
        lines.append(f"  {'TOTAL':<32s} {total:9.3f} s")
        text = "\n".join(lines)
        if printer is not None:
            printer(text)
        return text

    def save(self, save_dir: str | Path) -> Path:
        from mba_tpu.utils import file_management as filemgmt
        save_dir = Path(save_dir)
        filemgmt.assert_dir(save_dir)
        path = save_dir / filemgmt.file_title(
            f"Stage Timings {self.name}", ".json")
        with open(path, "w") as f:
            json.dump({"name": self.name,
                       "stages": [{"label": lb, "seconds": t}
                                  for lb, t in self.stages],
                       "total_seconds": self.total}, f, indent=2)
        return path


@contextlib.contextmanager
def device_trace(trace_dir: str | Path, enabled: bool = True):
    """Capture a ``jax.profiler`` trace (TensorBoard/Perfetto format).

    Wrap the hot section once compilation is warm:

    >>> with device_trace("/tmp/trace"):
    ...     multitaper_msc(eeg, emg, fs)

    ``enabled=False`` makes it a no-op so call sites can keep the
    context manager unconditionally.
    """
    if not enabled:
        yield
        return
    import jax
    trace_dir = str(trace_dir)
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(label: str):
    """Named region inside a trace (shows up on the device timeline)."""
    import jax
    return jax.profiler.TraceAnnotation(label)
