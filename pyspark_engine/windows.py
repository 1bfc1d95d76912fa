"""Window option types mirroring the reference's windowing surface.

Reference semantics:
  - Tumbling: fixed size, advance == size       (core/Stream/TumblingWindowOptions.cs:12-41)
  - Hopping:  fixed size, overlapping advance   (core/Stream/HoppingWindowOptions.cs:13-45)
  - Custom:   user window-assignment             (core/Stream/WindowOptions.cs:12-40;
              test helper test/Streamiz.Kafka.Net.Tests/Helpers/DailyTimeWindows.cs)
  - Window membership: all windows with start in (ts - size, ts] aligned to the
    advance (core/Stream/TimeWindowOptions.cs:59 `WindowsFor`).
  - Grace: records are dropped once stream-time - grace passes the window end
    (core/Processors/KStreamWindowAggregateProcessor.cs:51-58,77-82).
  - Join windows: right ts must fall in [left ts - before, left ts + after]
    (core/Stream/JoinWindowOptions.cs:8-60).

Spark mapping: tumbling/hopping compile to `F.window(ts, size[, slide])`;
grace compiles to `withWatermark` in streaming and to a stream-time replay
filter in batch (see dsl.TimeWindowedKStream).  All sizes are milliseconds,
as in the reference.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass(frozen=True)
class WindowOptions:
    """Base window spec.  ``grace_ms`` bounds accepted lateness; ``None``
    means no grace configured (admit everything in batch — the complete-
    replay default), while an explicit ``0`` is REAL zero grace: records
    behind stream time are dropped, the reference's strictest setting
    (KStreamWindowAggregateProcessor admission is windowEnd > closeTime,
    so grace 0 still admits the window containing stream time itself)."""

    size_ms: int
    advance_ms: int
    grace_ms: int | None = None


@dataclass(frozen=True)
class TumblingWindowOptions(WindowOptions):
    """Non-overlapping fixed windows (advance == size)."""

    @classmethod
    def of(cls, size_ms: int, grace_ms: int | None = None) -> "TumblingWindowOptions":
        return cls(size_ms=size_ms, advance_ms=size_ms, grace_ms=grace_ms)


@dataclass(frozen=True)
class HoppingWindowOptions(WindowOptions):
    """Overlapping fixed windows advancing by ``advance_ms``."""

    @classmethod
    def of(cls, size_ms: int, advance_ms: int, grace_ms: int | None = None) -> "HoppingWindowOptions":
        return cls(size_ms=size_ms, advance_ms=advance_ms, grace_ms=grace_ms)


@dataclass(frozen=True)
class CustomWindowOptions:
    """User-supplied window assignment: ``assign(ts_col) -> (start_col, end_col)``.

    Mirrors subclassing ``WindowOptions<W>`` in the reference (e.g. the
    DailyTimeWindows test helper).  The assignment must be a pure Column
    expression so it stays JVM-side.
    """

    assign: Callable  # Callable[[Column], tuple[Column, Column]]
    grace_ms: int | None = None
    size_ms: int = 0  # informational
    advance_ms: int = 0


@dataclass(frozen=True)
class SessionWindowOptions:
    """Gap-based session windows: consecutive records for a key belong to one
    session while each arrives within ``gap_ms`` of the previous record
    (INCLUSIVE — records exactly gap apart merge); the session end is
    last_ts + gap.

    Not in the reference snapshot (its §2.4 surface is tumbling/hopping/
    custom) — Kafka Streams-family parity extension, native in Spark via
    ``F.session_window`` in both batch and streaming (merging session state).
    """

    gap_ms: int
    grace_ms: int | None = None

    @classmethod
    def of(cls, gap_ms: int, grace_ms: int | None = None) -> "SessionWindowOptions":
        return cls(gap_ms=gap_ms, grace_ms=grace_ms)


@dataclass(frozen=True)
class JoinWindowOptions:
    """Stream-stream join interval: right.ts ∈ [left.ts - before, left.ts + after]."""

    before_ms: int
    after_ms: int

    @classmethod
    def of(cls, time_difference_ms: int) -> "JoinWindowOptions":
        """Symmetric window, like ``JoinWindowOptions.Of`` in the reference."""
        return cls(before_ms=time_difference_ms, after_ms=time_difference_ms)

    def before(self, before_ms: int) -> "JoinWindowOptions":
        return JoinWindowOptions(before_ms=before_ms, after_ms=self.after_ms)

    def after(self, after_ms: int) -> "JoinWindowOptions":
        return JoinWindowOptions(before_ms=self.before_ms, after_ms=after_ms)
