"""No-progress watchdog for long training runs.

The reference's failure story is periodic full-state saves "to resume in
case of crash" (/root/reference/Deep_QLearning/main_dir/mainDQL_CNN_step2.py:268,
323-330) — but a crash is the easy failure. On a real TPU runtime the
nastier one is a HANG: a device call that never returns (a wedged PJRT
tunnel, a dead coordinator in a multi-host run, a stuck collective). The
host loop then blocks forever inside ``chunk(state)`` with no exception to
catch, and the run silently stops making progress while holding the chip.

This watchdog turns hangs into crashes so the existing checkpoint/resume
machinery can handle them: a daemon thread checks a heartbeat the training
loop feeds after every jitted chunk (and around host-side checkpoint I/O);
if no heartbeat arrives within ``timeout`` seconds it prints a diagnostic
and hard-exits the process with :data:`WATCHDOG_EXIT_CODE`. A supervisor
(``scripts/train_supervised.sh``) distinguishes that exit code and
relaunches with ``--resume``.

``os._exit`` (not ``sys.exit``) is deliberate: the main thread is blocked
in a C extension call that Python exceptions cannot interrupt, and atexit
handlers could themselves touch the wedged device.
"""

from __future__ import annotations

import os
import sys
import threading
import time
from typing import Callable, Optional

#: Exit status meaning "no forward progress within the watchdog window" —
#: distinct from 0 (done) and 1 (error) so supervisors can decide to
#: resume. 70 = BSD EX_SOFTWARE ("internal software error").
WATCHDOG_EXIT_CODE = 70

#: Pre-first-beat grace the training drivers pass as ``startup_floor``:
#: worst-case first compile (~90 s) + a full-state checkpoint restore over
#: a tunneled TPU (~140 s), with headroom. A --watchdog value below this
#: still applies in steady state; it just can't kill the first chunk.
STARTUP_FLOOR = 300.0


class Watchdog:
    """Fires ``on_timeout`` if :meth:`beat` isn't called for ``timeout`` s.

    The default ``on_timeout`` writes a diagnostic to stderr and
    ``os._exit(WATCHDOG_EXIT_CODE)``. Tests inject a callback instead.

    Usage::

        wd = Watchdog(timeout=900, label="dqn train")
        wd.start()
        while ...:
            state = chunk(state)   # may block forever on a wedged device
            wd.beat()
        wd.stop()
    """

    def __init__(
        self,
        timeout: float,
        label: str = "train",
        on_timeout: Optional[Callable[[float], None]] = None,
        poll_interval: Optional[float] = None,
        startup_floor: float = 0.0,
    ) -> None:
        if timeout <= 0:
            raise ValueError("watchdog timeout must be positive")
        self.timeout = float(timeout)
        self.label = label
        # Until the FIRST beat, the effective window is
        # max(timeout, startup_floor): the first chunk pays one-time
        # compile (~90 s) + possibly a full-state restore, and a --watchdog
        # value sized for steady-state chunks must not kill a legitimately
        # compiling run (it has made no beat yet, so there is nothing to
        # distinguish "compiling" from "wedged" except a longer grace).
        self.startup_floor = float(startup_floor)
        self._beaten = False
        self._on_timeout = on_timeout or self._default_on_timeout
        self._poll = poll_interval or min(5.0, self.timeout / 4)
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def start(self) -> "Watchdog":
        self._last = time.monotonic()
        self._thread = threading.Thread(
            target=self._run, name=f"watchdog:{self.label}", daemon=True
        )
        self._thread.start()
        return self

    def beat(self) -> None:
        """Record forward progress (cheap; call after every chunk)."""
        self._beaten = True
        self._last = time.monotonic()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2 * self._poll)

    # ------------------------------------------------------------------
    def _run(self) -> None:
        while not self._stop.wait(self._poll):
            stale = time.monotonic() - self._last
            window = (
                self.timeout if self._beaten
                else max(self.timeout, self.startup_floor)
            )
            if stale > window:
                self._on_timeout(stale)
                return

    def _default_on_timeout(self, stale: float) -> None:
        sys.stderr.write(
            f"[watchdog:{self.label}] no progress for {stale:.0f}s "
            f"(timeout {self.timeout:.0f}s) — assuming a wedged device "
            f"call; exiting {WATCHDOG_EXIT_CODE} for the supervisor to "
            f"resume from the last checkpoint\n"
        )
        sys.stderr.flush()
        os._exit(WATCHDOG_EXIT_CODE)
