"""Persistent compile cache: a second process must HIT the cache written by
the first (VERDICT r1 #7 — the analogue of the reference's serialized HTP
context blobs, qnn_context.cpp:894-956, whose reuse it verified by logging
init time, context.cpp:77-79). Runs on the CPU backend with the TINY config;
the cache mechanism (jax persistent compilation cache) is backend-uniform.
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

CHILD = r"""
import json, sys, time
cache = sys.argv[1]
import sdtpu
t0 = time.perf_counter()
ctx = sdtpu.Context(model_dir=None, steps=2, sampler="dpm", config="tiny",
                    compile_cache=cache)
img = ctx.generate("cache probe", seed=0)
dt = time.perf_counter() - t0
assert img.shape == (16, 16, 3)
print(json.dumps({"elapsed_s": dt}))
"""


def _run(cache_dir: Path) -> float:
    r = subprocess.run(
        [sys.executable, "-c", CHILD, str(cache_dir)],
        capture_output=True, text=True, cwd=str(REPO), timeout=900,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "PYTHONPATH": str(REPO), "HOME": str(cache_dir.parent)},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])["elapsed_s"]


def test_second_process_hits_persistent_cache(tmp_path):
    cache = tmp_path / "xla-cache"
    cache.mkdir()
    _run(cache)
    entries_after_first = {p.name for p in cache.iterdir()}
    assert entries_after_first, "first run must write cache entries"

    _run(cache)
    entries_after_second = {p.name for p in cache.iterdir()}
    # a cache HIT adds no new executables; a miss would re-serialize under
    # a different key
    assert entries_after_second == entries_after_first
