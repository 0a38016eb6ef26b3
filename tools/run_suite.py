"""Full-suite green stamp (VERDICT r4 #8): run the COMPLETE pytest suite
once, record wall clock + pass/fail counts + the slowest tests to a
committed artifact, so every round carries proof the whole gate ran —
not just the sub-minute smoke tier.

    python tools/run_suite.py                 # writes TESTS_rN.json
    python tools/run_suite.py --out TESTS_r05.json

The suite runs on the CPU backend (JAX_PLATFORMS=cpu + the 8-device
virtual mesh flags, same as tests/conftest.py expects); the real chip is
never touched, so this can run alongside on-chip measurement jobs.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="artifact path (default TESTS_r<N>.json, N from "
                         "the latest BENCH_r*.json + 1)")
    ap.add_argument("--durations", type=int, default=25)
    args = ap.parse_args()

    out = args.out
    if out is None:
        rounds = [int(m.group(1)) for p in REPO.glob("BENCH_r*.json")
                  if (m := re.match(r"BENCH_r(\d+)\.json$", p.name))]
        out = f"TESTS_r{max(rounds, default=0) + 1:02d}.json"

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cmd = [sys.executable, "-m", "pytest", "tests/", "-q",
           f"--durations={args.durations}", "-p", "no:cacheprovider"]
    t0 = time.perf_counter()
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=str(REPO),
                       env=env)
    wall = time.perf_counter() - t0
    tail = r.stdout.strip().splitlines()

    counts = {}
    summary = ""
    for line in reversed(tail):
        m = re.search(r"(\d+) passed", line)
        if m:
            summary = line.strip().strip("= ")
            for key in ("passed", "failed", "error", "skipped",
                        "deselected", "xfailed", "xpassed", "warnings"):
                km = re.search(rf"(\d+) {key}", line)
                if km:
                    counts[key] = int(km.group(1))
            break

    slowest = []
    in_dur = False
    for line in tail:
        if "slowest durations" in line:
            in_dur = True
            continue
        if in_dur:
            dm = re.match(r"([\d.]+)s\s+(\w+)\s+(\S+)", line.strip())
            if dm:
                slowest.append({"s": float(dm.group(1)),
                                "phase": dm.group(2),
                                "test": dm.group(3)})
            elif line.startswith("="):
                break

    artifact = {
        "green": r.returncode == 0,
        "returncode": r.returncode,
        "wall_s": round(wall, 1),
        "counts": counts,
        "summary": summary,
        "slowest": slowest[: args.durations],
        "cmd": " ".join(cmd),
        "python": sys.version.split()[0],
    }
    if r.returncode != 0:
        artifact["tail"] = tail[-40:]
    (REPO / out).write_text(json.dumps(artifact, indent=1) + "\n")
    print(json.dumps({"out": out, "green": artifact["green"],
                      "wall_s": artifact["wall_s"],
                      "summary": summary}))
    return r.returncode


if __name__ == "__main__":
    sys.exit(main())
