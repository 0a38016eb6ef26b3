"""Cold vs warm start benchmark (VERDICT r1 #7).

The reference engineered startup hard — 3 phase threads + 4-way parallel
graph deserialization — and logged init time (reference:
csrc/libsdod/src/context.cpp:49-139, init log at :77-79). The TPU analogue
of its precompiled context blobs is the persistent XLA compile cache; this
tool bounds both ends:

* **warm**: Context() + first generate with the populated persistent cache
  (``~/.cache/sdtpu/xla``) — the deployment path after first install;
* **cold**: same with the cache pointed at an empty directory — first-ever
  run on a machine (full Mosaic+XLA pipeline compile).

Each leg runs in a fresh subprocess (in-process jit caches must not leak
between legs). Prints one JSON line per leg.

Usage: python tools/bench_init.py [--legs warm,cold] [--steps 20]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json
import subprocess
import sys
import tempfile

CHILD = r"""
import json, time, sys
t0 = time.perf_counter()
import sdtpu
from sdtpu.engine.logging import LogLevel
cache = sys.argv[1]
steps = int(sys.argv[2])
t_import = time.perf_counter() - t0

t1 = time.perf_counter()
ctx = sdtpu.Context(model_dir=None, steps=steps, sampler="dpm",
                    config="sd15", log_level=LogLevel.ERROR,
                    compile_cache=cache)
t_init = time.perf_counter() - t1

t2 = time.perf_counter()
img = ctx.generate("a photograph of an astronaut riding a horse", seed=0)
t_first = time.perf_counter() - t2

t3 = time.perf_counter()
ctx.generate("a photograph of an astronaut riding a horse", seed=1)
t_steady = time.perf_counter() - t3

print(json.dumps({
    "import_s": round(t_import, 2),
    "context_init_s": round(t_init, 2),
    "first_generate_s": round(t_first, 2),
    "steady_generate_s": round(t_steady, 3),
}))
"""


def run_leg(cache_dir: str, steps: int) -> dict:
    r = subprocess.run(
        [sys.executable, "-c", CHILD, cache_dir, str(steps)],
        capture_output=True, text=True, timeout=3600,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--legs", default="warm,cold")
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import os

    for leg in args.legs.split(","):
        if leg == "warm":
            cache = os.path.expanduser("~/.cache/sdtpu/xla")
        else:
            cache = tempfile.mkdtemp(prefix="sdtpu-coldcache-")
        res = run_leg(cache, args.steps)
        print(json.dumps({"leg": leg, **res}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
