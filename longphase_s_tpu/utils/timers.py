"""Stage timers printed to stderr.

Mirrors the reference's observability surface: wall-clock stage timers for
every pipeline stage and per chromosome (reference: PhasingProcess.cpp:45-205
prints ``parsing VCF ... 3s`` / ``(chr20,12s)`` style lines).
"""

from __future__ import annotations

import sys
import time
from contextlib import contextmanager


class StageTimer:
    """Accumulates named stage durations; prints like the reference binary."""

    def __init__(self, out=None):
        # resolve sys.stderr lazily so redirect_stderr/capsys see the lines
        self.out = out
        self.stages: dict[str, float] = {}

    @contextmanager
    def __call__(self, name: str, quiet: bool = False):
        begin = time.monotonic()
        if not quiet:
            print(f"{name} ... ", end="",
                  file=self.out or sys.stderr, flush=True)
        try:
            yield
        finally:
            elapsed = time.monotonic() - begin
            self.stages[name] = self.stages.get(name, 0.0) + elapsed
            if not quiet:
                print(f"{elapsed:.1f}s", file=self.out or sys.stderr,
                      flush=True)


@contextmanager
def stage(name: str, out=sys.stderr):
    begin = time.monotonic()
    print(f"{name} ... ", end="", file=out, flush=True)
    yield
    print(f"{time.monotonic() - begin:.1f}s", file=out, flush=True)
