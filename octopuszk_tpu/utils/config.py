"""Run configuration + nested wall-clock instrumentation.

Reference parity: configuration/Configuration.java — carries cluster
sizes/seeds/flags and provides ``beginLog/endLog`` nested section timers
(…java:96-174) and ``beginRuntime/endRuntime/writeRuntimeLog`` CSV records
under /tmp/spark-events (…java:200-330).  Here the "cluster" is a device
mesh; everything else keeps the same shape so profiler output is
comparable.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional


@dataclasses.dataclass
class Config:
    num_devices: int = 1
    num_partitions: int = 1
    seed: int = 1
    debug: bool = False
    verbose: bool = True
    events_dir: str = "/tmp/octopuszk-events"

    def __post_init__(self):
        self._log_stack = []
        self._runtime = {}
        self._records = []

    # -- nested section timers (Configuration.beginLog/endLog) --

    def begin_log(self, message: str):
        if self.verbose:
            indent = "  " * len(self._log_stack)
            print(f"{indent}[begin] {message}", flush=True)
        self._log_stack.append((message, time.perf_counter()))

    def end_log(self, message: str):
        name, t0 = self._log_stack.pop()
        assert name == message, f"mismatched log section: {name} vs {message}"
        dt = time.perf_counter() - t0
        if self.verbose:
            indent = "  " * len(self._log_stack)
            print(f"{indent}[end]   {message}: {dt:.3f}s", flush=True)
        return dt

    # -- runtime CSV records (Configuration.beginRuntime/endRuntime) --

    def begin_runtime(self, name: str):
        self._runtime[name] = time.perf_counter()

    def end_runtime(self, name: str, **meta):
        dt = time.perf_counter() - self._runtime.pop(name)
        self._records.append({"name": name, "seconds": dt, **meta})
        return dt

    @staticmethod
    def suggest_partitions(size: int, num_devices: int) -> int:
        """Per-size partition (chunk) count heuristic.

        Reference parity: SparkUtils.numPartitions (SparkUtils.java:
        114-116) — `size >= 2^25 ? 8 * executors : executors`.  On a TPU
        mesh the analogue is how many chunks each chip streams its shard
        through (ops/msm.py chunk plan): past 2^25 total, 8 chunks per
        chip bound transient HBM the way extra partitions bounded
        executor memory."""
        return 8 * num_devices if size >= (1 << 25) else num_devices

    def write_runtime_log(self, app: str, size: Optional[int] = None):
        os.makedirs(self.events_dir, exist_ok=True)
        path = os.path.join(self.events_dir, f"{app}.csv")
        new = not os.path.exists(path)
        with open(path, "a") as f:
            if new:
                f.write("app,size,devices,name,seconds\n")
            for r in self._records:
                f.write(f"{app},{size},{self.num_devices},"
                        f"{r['name']},{r['seconds']:.6f}\n")
        self._records.clear()
        return path
