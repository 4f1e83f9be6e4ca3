"""Logging, timers and progress — the system/ layer.

Reference parity: system/logger.hpp OPENMVG_LOG_{INFO,WARNING,ERROR},
system/timer.hpp wall Timer, system/loggerprogress.hpp percentage bars.
Timers wrap device work with block_until_ready so measured spans are
real execution, not async dispatch.
"""

import logging
import sys
import time

logger = logging.getLogger("openmvg_tpu")
if not logger.handlers:
    h = logging.StreamHandler(sys.stderr)
    h.setFormatter(logging.Formatter("[%(levelname)s] %(message)s"))
    logger.addHandler(h)
    logger.setLevel(logging.INFO)

log_info = logger.info
log_warning = logger.warning
log_error = logger.error


class Timer:
    """Wall timer; `with Timer("stage") as t:` logs on exit."""

    def __init__(self, name=None, sync=None, log=False):
        self.name = name
        self.sync = sync  # optional array/pytree to block_until_ready on
        self.log = log
        self.elapsed = 0.0

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync is not None:
            import jax

            jax.block_until_ready(self.sync)
        self.elapsed = time.perf_counter() - self.t0
        if self.log and self.name:
            log_info(f"{self.name}: {self.elapsed:.3f}s")
        return False


class Progress:
    """Minimal LoggerProgress: call update() per item; prints every ~10%."""

    def __init__(self, total, name=""):
        self.total = max(total, 1)
        self.name = name
        self.count = 0
        self._next = 0.1

    def update(self, n=1):
        self.count += n
        frac = self.count / self.total
        if frac >= self._next:
            log_info(f"{self.name}: {int(frac * 100)}% ({self.count}/{self.total})")
            while self._next <= frac:
                self._next += 0.1


# ---------------------------------------------------------------------------
# per-stage timing registry + jax-profiler hooks (SURVEY §5 tracing row)
# ---------------------------------------------------------------------------

stage_times = {}


class stage(Timer):
    """Timer that records into the global `stage_times` table (summed over
    re-entries) and annotates the jax profiler trace when one is active,
    so device ops group under the stage name in TensorBoard/perfetto."""

    def __init__(self, name, sync=None, log=False):
        super().__init__(name, sync=sync, log=log)
        self._ann = None

    def __enter__(self):
        try:
            import jax.profiler

            self._ann = jax.profiler.TraceAnnotation(self.name)
            self._ann.__enter__()
        except Exception:
            self._ann = None
        return super().__enter__()

    def __exit__(self, *exc):
        out = super().__exit__(*exc)
        if self._ann is not None:
            self._ann.__exit__(*exc)
        stage_times[self.name] = stage_times.get(self.name, 0.0) + self.elapsed
        return out


def reset_stage_times():
    stage_times.clear()


def start_profiler(logdir):
    """Capture a jax profiler trace (view in TensorBoard / perfetto).
    Activated by the CLI when OMT_PROFILE_DIR is set."""
    import jax.profiler

    jax.profiler.start_trace(logdir)
    log_info(f"jax profiler trace -> {logdir}")


def stop_profiler():
    import jax.profiler

    jax.profiler.stop_trace()
