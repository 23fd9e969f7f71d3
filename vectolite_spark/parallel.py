"""Overlap independent Spark jobs from driver threads (guide §2.6).

Spark's scheduler runs several jobs at once inside one application;
actions are only sequential because driver code calls them sequentially.
An index build that writes four artifacts (postings, meta, doclen,
stats) as four back-to-back actions pays four fixed job launches AND
leaves the cluster idle through each job's straggler tail. Where the
artifacts are independent — different output directories, no
read-after-write between them — submitting them from a small thread
pool overlaps the launches and lets the next job's tasks back-fill
executors freed by the current job's tail. FIFO scheduling (the
default) gives exactly that back-fill behaviour.

Correctness notes:
- Results are unchanged: each thunk runs the identical plan it ran
  sequentially; only wall-clock submission order changes.
- Job descriptions/groups are thread-local in Spark, so a thunk that
  sets its own description labels only its own jobs.
- Crash-safety gates (the "this artifact is written LAST so its
  _SUCCESS marks build-complete" pattern) must NOT be put in the pool
  with the artifacts they gate: compute the gated artifact to a tmp
  dir in the pool and rename it into place after every other future
  completes, or keep it strictly after the join.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable


def run_jobs(*thunks: Callable[[], Any]) -> list[Any]:
    """Run independent job-submitting thunks concurrently.

    Returns their results in call order. If any thunk raises, the
    earliest-listed failure is re-raised after every thunk has finished
    (no half-cancelled writes racing a caller's cleanup).
    """
    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        results: list[Any] = []
        first_err: BaseException | None = None
        for f in futures:
            try:
                results.append(f.result())
            except BaseException as e:  # noqa: BLE001 - re-raised below
                if first_err is None:
                    first_err = e
                results.append(None)
        if first_err is not None:
            raise first_err
        return results
