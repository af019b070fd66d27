"""Coordination flag shared by the measurement watchers and bench.

One flag = one measurement at a time on the box. The original
check-then-create pattern had a TOCTOU race: two watchers could both
"hold" the flag, and the first finisher's unlink made the second's
crash with FileNotFoundError mid-capture (observed 2026-08-18 when a
duplicate probe raced a 4→16 leg pair). Acquire is now O_EXCL —
exactly one holder — and release tolerates the file already being gone.
"""

import os
import time

FLAG = "/tmp/quietbench.running"


def acquire(max_age_sec: int = 3600) -> bool:
    """Exclusive-create the flag; True iff this process now holds it.
    A flag older than ``max_age_sec`` is treated as orphaned (its holder
    died without cleanup) and reaped — the next acquire wins it."""
    try:
        os.close(os.open(FLAG, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
        return True
    except FileExistsError:
        try:
            if time.time() - os.path.getmtime(FLAG) > max_age_sec:
                os.unlink(FLAG)
        except OSError:
            pass
        return False


def release() -> None:
    try:
        os.unlink(FLAG)
    except OSError:
        pass
