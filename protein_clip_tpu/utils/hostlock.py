"""Cross-process mutex for multi-device XLA:CPU jobs on one host.

This host has ONE core; XLA:CPU collectives hard-abort after a 40 s
rendezvous timeout when two 8-fake-device jobs starve each other's device
threads (CLAUDE.md: the test_graft_entry flake was exactly a manual dryrun
overlapping the suite's subprocess). Every such job takes this lock: the
pytest session (tests/conftest.py) and dryrun_multichip (__graft_entry__)
both do, so a concurrent second job WAITS instead of crashing both.

Re-entrancy across process trees rides an env var: the holder exports
PCT_HOSTLOCK_HELD=1, so subprocesses it spawns (the dryrun re-exec child,
CLI subprocess tests) skip acquisition instead of deadlocking against
their own parent.
"""

from __future__ import annotations

import contextlib
import os
import sys
import tempfile
import time

_ENV_FLAG = "PCT_HOSTLOCK_HELD"


def _lock_path() -> str:
    return os.path.join(tempfile.gettempdir(), "pct_multidev_host.lock")


@contextlib.contextmanager
def multidevice_lock(label: str = "multi-device job", warn_after_s: float = 5.0):
    """Exclusive host-wide flock; no-op if an ancestor already holds it.

    Blocks until free (the alternative is the rendezvous crash). Prints a
    note to stderr if the wait exceeds ``warn_after_s`` so a human watching
    a 'hung' dryrun knows what it is waiting for.
    """
    if os.environ.get(_ENV_FLAG) == "1":
        yield
        return
    try:
        import fcntl
    except ImportError:  # non-POSIX: no flock, no one-core host either
        yield
        return

    fd = os.open(_lock_path(), os.O_RDWR | os.O_CREAT, 0o666)
    try:
        t0 = time.monotonic()
        warned = False
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except OSError:
                if not warned and time.monotonic() - t0 > warn_after_s:
                    print(f"[hostlock] waiting for another multi-device "
                          f"XLA:CPU job to finish before starting {label} "
                          f"(lock: {_lock_path()})", file=sys.stderr)
                    warned = True
                time.sleep(0.25)
        os.environ[_ENV_FLAG] = "1"
        try:
            yield
        finally:
            os.environ.pop(_ENV_FLAG, None)
            fcntl.flock(fd, fcntl.LOCK_UN)
    finally:
        os.close(fd)
