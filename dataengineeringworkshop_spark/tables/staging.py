"""Abort-safe removal of staged write directories.

When a write action fails mid-scan (e.g. a row-level fail-mode
expectation guard raises inside a task), the driver sees the exception
immediately but Spark kills the job's remaining tasks ASYNCHRONOUSLY.
A straggler task can still be streaming bytes into the staging dir's
``_temporary`` tree when the driver-side ``shutil.rmtree`` runs — the
task's ``FileOutputCommitter`` re-creates directories on demand, so a
single rmtree races the kill and can leave an orphaned staged dir
behind (unaccounted storage until a VACUUM at scale; reference parity:
an aborted Delta transaction leaves no visible files).

``remove_staged_dir`` retries the removal with backoff until the path
stays absent across consecutive checks, which is the observable
"all writers have terminated" condition without needing the job id of
the cancelled action.
"""

from __future__ import annotations

import os
import shutil
import time

# How many consecutive absence observations (spaced by the current
# backoff delay) count as "stable".  Two catches the common case where
# the straggler re-creates the dir within one delay window; the rising
# delay covers slower stragglers within the timeout.
_STABLE_CHECKS = 2


def remove_staged_dir(path: str, timeout: float = 30.0) -> None:
    """Remove ``path`` and keep it removed.

    Retries ``shutil.rmtree`` until the directory is absent for
    ``_STABLE_CHECKS`` consecutive observations separated by an
    exponential backoff (0.05 s → 1 s cap), or ``timeout`` elapses.
    Errors are swallowed like ``rmtree(ignore_errors=True)`` — this is
    best-effort cleanup on an already-failing path; the commit log is
    the only publish point, so a leaked dir is never *visible*, just
    untidy.
    """
    deadline = time.monotonic() + timeout
    delay = 0.05
    absent = 0
    while True:
        shutil.rmtree(path, ignore_errors=True)
        if os.path.exists(path):
            absent = 0
        else:
            absent += 1
            if absent >= _STABLE_CHECKS:
                return
        if time.monotonic() >= deadline:
            shutil.rmtree(path, ignore_errors=True)
            return
        time.sleep(delay)
        delay = min(delay * 2, 1.0)
