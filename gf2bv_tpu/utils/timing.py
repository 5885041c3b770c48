"""Phase wall-clock timers (the reference examples' timeit harness,
``/root/reference/examples/mt.py:9-16``), plus a simple phase recorder."""

from __future__ import annotations

from contextlib import contextmanager
from time import perf_counter


@contextmanager
def timeit(task_name: str, record: dict | None = None, quiet: bool = False):
    start = perf_counter()
    try:
        yield
    finally:
        elapsed = perf_counter() - start
        if record is not None:
            record[task_name] = elapsed
        if not quiet:
            print(f"{task_name} took {elapsed:.2f} seconds")
