"""Phase banners + progress logging to stderr.

Equivalent to the reference's ProgressMeter (reference: src/progress.hpp:12-84)
but synchronous: we log phase start/end with elapsed time and rates. The TPU
pipeline is bulk-synchronous, so a sampling thread buys nothing.
"""
from __future__ import annotations

import sys
import time
from contextlib import contextmanager


class Log:
    enabled = True

    @staticmethod
    def info(tag: str, msg: str) -> None:
        if Log.enabled:
            print(f"[smoothxg_tpu::{tag}] {msg}", file=sys.stderr, flush=True)


@contextmanager
def phase(tag: str, msg: str):
    t0 = time.time()
    Log.info(tag, msg)
    yield
    Log.info(tag, f"{msg} done in {time.time() - t0:.2f}s")
