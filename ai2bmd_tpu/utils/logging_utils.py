"""Output tee + metrics logging.

Replaces the reference's dup2-into-tee redirection (src/utils/system.py:
8-16, main.py:27-28) with an in-process TeeWriter, and adds a structured
per-interval metrics CSV (step, epot, ekin, temperature, wall ms/step) —
the reference's only metrics stream is stdout prints (utils.py:143-159).
"""

from __future__ import annotations

import os
import sys
import time


class TeeWriter:
    """Mirror a stream into a logfile (stdout/stderr tee)."""

    def __init__(self, stream, path: str):
        self.stream = stream
        self.file = open(path, "a", buffering=1)

    def write(self, data):
        self.stream.write(data)
        self.file.write(data)
        return len(data)

    def flush(self):
        self.stream.flush()
        self.file.flush()

    def close(self):
        self.file.close()

    def isatty(self):
        return getattr(self.stream, "isatty", lambda: False)()


def tee_output(log_dir: str, name: str | None = None):
    """Mirror stdout+stderr into a timestamped logfile; returns its path."""
    stamp = time.strftime("%Y%m%d-%H%M%S")
    path = os.path.join(log_dir, f"{name or 'run'}-{stamp}.log")
    sys.stdout = TeeWriter(sys.stdout, path)
    sys.stderr = TeeWriter(sys.stderr, path)
    return path


class MetricsLog:
    """Append-only CSV of per-interval simulation metrics."""

    COLUMNS = ("step", "epot_eV", "ekin_eV", "etot_eV", "temp_K", "ms_per_step")

    def __init__(self, path: str):
        fresh = not os.path.exists(path)
        self.f = open(path, "a", buffering=1)
        if fresh:
            self.f.write(",".join(self.COLUMNS) + "\n")

    def write(self, step, epot, ekin, temp, ms_per_step):
        self.f.write(
            f"{step},{epot:.6f},{ekin:.6f},{epot + ekin:.6f},"
            f"{temp:.2f},{ms_per_step:.3f}\n"
        )

    def close(self):
        self.f.close()


class StepTimer:
    """Wall-clock per-stage timing (the reference's @record_time,
    utils.py:17-25, generalized to named stages)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    def time(self, name: str):
        timer = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *exc):
                dt = time.perf_counter() - self.t0
                timer.totals[name] = timer.totals.get(name, 0.0) + dt
                timer.counts[name] = timer.counts.get(name, 0) + 1

        return _Ctx()

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name}: {total:.3f}s total, {1e3 * total / n:.2f} ms/call x{n}")
        return "\n".join(lines)


def profile_trace(log_dir: str):
    """Context manager: capture a jax profiler trace into log_dir/trace
    (viewable with tensorboard/xprof)."""
    import jax

    return jax.profiler.trace(os.path.join(log_dir, "trace"))
