"""TTY-aware progress counters for long host phases.

Mirrors the reference's indicatif spinners with human-formatted counts
and throughput (`alignment_parser.rs:323-336`, `bulk.rs:595-607`): a
single carriage-returned stderr line, refreshed at most every 0.2 s,
active only when stderr is a terminal and the logger is at INFO or
chattier (`--quiet` silences it like the reference's hidden spinner).
Non-TTY runs keep the periodic log lines instead — no escape codes in
captured output.
"""

from __future__ import annotations

import logging
import sys
import time

log = logging.getLogger("oarfish_tpu")

_SPINNER = "|/-\\"


def _human(n: float) -> str:
    for div, suf in ((1e9, "G"), (1e6, "M"), (1e3, "k")):
        if abs(n) >= div:
            return f"{n / div:.2f}{suf}"
    return f"{n:.0f}"


class Progress:
    """Incremental counter: `update(n)` adds n items; `close()` clears
    the line. A no-op unless stderr is a TTY and INFO logging is on."""

    def __init__(self, label: str, unit: str = "records",
                 min_interval: float = 0.2):
        self.label = label
        self.unit = unit
        self.count = 0
        self._t0 = time.perf_counter()
        self._last = 0.0
        self._spin = 0
        self._min_interval = min_interval
        self._active = (
            getattr(sys.stderr, "isatty", lambda: False)()
            and log.getEffectiveLevel() <= logging.INFO
        )
        self._drawn = False

    def update(self, n: int = 1) -> None:
        self.count += n
        if not self._active:
            return
        now = time.perf_counter()
        if now - self._last < self._min_interval:
            return
        self._last = now
        self._spin = (self._spin + 1) % len(_SPINNER)
        dt = max(now - self._t0, 1e-9)
        sys.stderr.write(
            f"\r{_SPINNER[self._spin]} {self.label}: "
            f"{_human(self.count)} {self.unit} "
            f"({_human(self.count / dt)}/s)\x1b[K"
        )
        sys.stderr.flush()
        self._drawn = True

    def close(self) -> None:
        if self._drawn:
            sys.stderr.write("\r\x1b[K")
            sys.stderr.flush()
            self._drawn = False

    def __enter__(self) -> "Progress":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
