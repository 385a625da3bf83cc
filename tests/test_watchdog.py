"""StallWatchdog: the mid-run tunnel-outage guard for hardware tools.

Round-4 session 3: a fully warmed serving burst froze for 21 minutes
(tunnel outage, zero error) and ate the driver's timeout.  The watchdog
aborts with diagnostics instead; these tests pin its firing semantics
with an injected ``on_stall`` (the default action hard-exits).
"""

import itertools
import threading
import time

import pytest

from audio_raytracing_studio_tpu.utils import watchdog as wdmod
from audio_raytracing_studio_tpu.utils.watchdog import StallWatchdog


@pytest.fixture
def frozen_io(monkeypatch):
    """Pin the process-I/O signal so tests control progress exclusively."""
    monkeypatch.setattr(wdmod, "_io_bytes", lambda: 1234)


def test_fires_on_frozen_progress(frozen_io):
    fired = threading.Event()
    msgs = []

    def on_stall(msg):
        msgs.append(msg)
        fired.set()

    wd = StallWatchdog(
        lambda: ("static",), timeout_s=0.15, poll_s=0.03, on_stall=on_stall
    )
    with wd:
        assert fired.wait(timeout=5.0), "watchdog never fired on frozen progress"
    assert "no progress" in msgs[0]


def test_progress_resets_the_timer(frozen_io):
    fired = threading.Event()
    counter = itertools.count()
    wd = StallWatchdog(
        lambda: next(counter),  # changes every poll
        timeout_s=0.15,
        poll_s=0.03,
        on_stall=lambda msg: fired.set(),
    )
    with wd:
        time.sleep(0.6)  # 4× the stall timeout of steady progress
    assert not fired.is_set()


def test_io_movement_counts_as_progress(monkeypatch):
    fired = threading.Event()
    io = itertools.count(step=1 << 20)  # 1 MiB/poll — a real transfer
    monkeypatch.setattr(wdmod, "_io_bytes", lambda: next(io))
    wd = StallWatchdog(
        lambda: ("static",),  # job-level progress frozen; bytes moving
        timeout_s=0.15,
        poll_s=0.03,
        on_stall=lambda msg: fired.set(),
    )
    with wd:
        time.sleep(0.6)
    assert not fired.is_set()


def test_self_read_io_tax_does_not_reset_timer(monkeypatch):
    """Sub-epsilon I/O deltas (the watchdog's own /proc read, stray log
    lines) must NOT count as progress — the round-4 advisor found the
    watchdog inert because each poll's own ~100-byte rchar bump reset the
    idle timer forever."""
    fired = threading.Event()
    io = itertools.count(step=200)  # ≈ the measured self-read cost
    monkeypatch.setattr(wdmod, "_io_bytes", lambda: next(io))
    wd = StallWatchdog(
        lambda: ("static",),
        timeout_s=0.15,
        poll_s=0.03,
        on_stall=lambda msg: fired.set(),
    )
    with wd:
        assert fired.wait(timeout=5.0), (
            "watchdog is inert: its own io-read tax keeps resetting the timer"
        )


def test_fires_with_real_io_bytes_on_idle_process():
    """End-to-end with the REAL /proc/self/io reader: an idle process must
    trip the watchdog.  No monkeypatching — this is the production
    configuration the round-4 advisor proved could never fire."""
    fired = threading.Event()
    wd = StallWatchdog(
        lambda: ("static",),
        timeout_s=0.3,
        poll_s=0.05,
        on_stall=lambda msg: fired.set(),
    )
    with wd:
        assert fired.wait(timeout=10.0), (
            "watchdog with real _io_bytes never fired on an idle process"
        )


def test_zero_timeout_disables(frozen_io):
    wd = StallWatchdog(lambda: 0, timeout_s=0.0, on_stall=lambda m: None)
    with wd:
        assert wd._thread is None


def test_progress_exception_is_no_change_not_death(frozen_io):
    fired = threading.Event()

    def progress():
        raise RuntimeError("stats race during teardown")

    wd = StallWatchdog(
        progress, timeout_s=0.15, poll_s=0.03,
        on_stall=lambda msg: fired.set(),
    )
    with wd:
        # an exception-throwing probe reads as "frozen" → still fires
        assert fired.wait(timeout=5.0)
