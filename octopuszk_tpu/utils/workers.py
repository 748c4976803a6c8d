"""Worker-thread helpers.

XLA:CPU's recursive optimization passes need a deep stack; threads that
run compiles (the G2-overlap executors in parallel/dgroth16.py) must be
created with a large fixed stack.  ``big_stack_executor`` scopes the
``threading.stack_size`` override to the executor's thread creation so
the process-wide default is untouched (threads an embedding application
creates keep their normal stacks).
"""

from __future__ import annotations

import contextlib
import threading
from concurrent.futures import ThreadPoolExecutor

BIG_STACK = 512 * 1024 * 1024


@contextlib.contextmanager
def big_stack_executor(max_workers: int = 1):
    """ThreadPoolExecutor whose worker threads get a 512 MB stack.

    The stack size is virtual memory until touched — harmless — but only
    this executor's threads reserve it.
    """
    try:
        old = threading.stack_size(BIG_STACK)
    except (ValueError, RuntimeError):
        old = None
    ex = ThreadPoolExecutor(max_workers=max_workers)
    try:
        # eagerly spawn the workers while the big stack size is active
        # (ThreadPoolExecutor creates threads lazily on submit)
        for _ in range(max_workers):
            ex.submit(lambda: None)
    finally:
        if old is not None:
            threading.stack_size(old)
    try:
        with ex:
            yield ex
    finally:
        pass
