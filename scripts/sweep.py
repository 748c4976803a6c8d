"""Size-sweep runner: profile apps across sizes, emit a CSV table.

Reference parity: the spark-submit sweep drivers
serialzkSNARKProfiler.sh:1-40 / distributedzkSNARKProfiler.sh:1-37 and
the EC2 lifecycle scripts under profiler/scripts/ — here one runner
covers both modes (pass --ndev for distributed) and appends rows to a
CSV the way Configuration.writeRuntimeLog does
(Configuration.java:200-330).

Usage:
  python scripts/sweep.py vmsm-g1 16 18 20          # serial sizes 2^k
  python scripts/sweep.py --ndev 8 fft 12 14        # distributed
  python scripts/sweep.py --out /tmp/sweep.csv zksnark 10 12
Each app runs in a fresh subprocess (one crash doesn't kill the sweep;
compile caches persist across runs on TPU).
"""

from __future__ import annotations

import argparse
import csv
import os
import subprocess
import sys
import time


def run_one(ndev, app, log2, timeout, inputs=None):
    cmd = [sys.executable, "-m", "octopuszk_tpu.profiler"]
    if ndev:
        cmd.append(str(ndev))
    cmd += [app, str(log2)]
    if inputs:
        cmd.append(f"--inputs={inputs}")
    t0 = time.time()
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout)
        ok = r.returncode == 0
        tail = (r.stdout + r.stderr).strip().splitlines()[-6:]
    except subprocess.TimeoutExpired:
        ok, tail = False, ["TIMEOUT"]
    return ok, time.time() - t0, tail


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ndev", type=int, default=0,
                    help="device count for the distributed drivers")
    ap.add_argument("--out", default="/tmp/octopuszk-events/sweep.csv")
    ap.add_argument("--timeout", type=int, default=3600)
    ap.add_argument("--inputs", type=int, default=0,
                    help="zksnark numInputs (reference CI uses 1023)")
    ap.add_argument("--retries", type=int, default=1,
                    help="re-run a failed row up to N extra times "
                    "(worker-death recovery; the reference delegates this "
                    "to Spark speculation/lineage, SURVEY.md §5)")
    ap.add_argument("app")
    ap.add_argument("log2sizes", nargs="+", type=int)
    args = ap.parse_args()

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    new = not os.path.exists(args.out)
    with open(args.out, "a", newline="") as f:
        w = csv.writer(f)
        if new:
            w.writerow(["app", "ndev", "log2size", "ok", "wall_s", "tail"])
        for log2 in args.log2sizes:
            for attempt in range(1 + max(0, args.retries)):
                ok, dt, tail = run_one(args.ndev, args.app, log2,
                                       args.timeout, args.inputs)
                if ok:
                    break
                print(f"  retry {attempt + 1}: {args.app} 2^{log2} failed",
                      flush=True)
            print(f"{args.app} ndev={args.ndev} 2^{log2}: "
                  f"ok={ok} {dt:.1f}s", flush=True)
            for line in tail:
                print(f"    {line}", flush=True)
            w.writerow([args.app, args.ndev, log2, ok, round(dt, 2),
                        " | ".join(tail)])
            f.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
