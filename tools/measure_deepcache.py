"""Paired e2e measurement of DeepCache (run on the real TPU chip).

Question: what does `deepcache=N` (full UNet every N steps, cached deep
splice in between — engine/pipeline.denoise) buy at the headline config
(SD15 512x512, 20-step DPM, CFG 7.5)?

Pairing discipline (docs/PERF_NOTES.md "Measurement discipline"): all
legs run in THIS process back-to-back.

Usage: python tools/measure_deepcache.py [--iters 10] [--intervals 2,3,5]
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PROMPTS = [
    "a photograph of an astronaut riding a horse",
    "a watercolor painting of a fox in a forest",
    "macro photo of a snowflake on dark wool",
    "a city street at night in the rain",
]


def measure(ctx, iters, warmup=2):
    import numpy as np

    times = []
    for i in range(warmup + iters):
        t0 = time.perf_counter()
        img = ctx.generate(PROMPTS[i % len(PROMPTS)], guidance=7.5, seed=i)
        assert isinstance(img, np.ndarray)
        dt = time.perf_counter() - t0
        if i >= warmup:
            times.append(dt)
        print(f"#   iter {i}: {dt:.3f}s", file=sys.stderr, flush=True)
    return statistics.median(times), min(times), max(times)


def run_leg(name, iters, **ctx_kw):
    import sdtpu
    from sdtpu.engine.logging import LogLevel

    t0 = time.perf_counter()
    ctx = sdtpu.Context(model_dir=None, steps=20, sampler="dpm",
                        config="sd15", log_level=LogLevel.ERROR, **ctx_kw)
    print(f"# {name}: init {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)
    med, lo, hi = measure(ctx, iters)
    print(f"{name}: median {med:.4f}s  min {lo:.4f}  max {hi:.4f}",
          flush=True)
    del ctx
    return med


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--intervals", default="2,3,5")
    ap.add_argument("--combo", default=None, metavar="N,LO,HI",
                    help="extra leg: deepcache=N + cfg_interval=(LO,HI)")
    args = ap.parse_args()

    base = run_leg("bf16 baseline", args.iters)
    for n in (int(v) for v in args.intervals.split(",") if v):
        t = run_leg(f"deepcache={n}", args.iters, deepcache=n)
        print(f"=> deepcache {n}: {t:.4f}s vs {base:.4f}s "
              f"({(t / base - 1) * 100:+.1f}%)", flush=True)
    if args.combo:
        n, lo, hi = args.combo.split(",")
        t = run_leg(f"deepcache={n}+cfgi=({lo},{hi})", args.iters,
                    deepcache=int(n), cfg_interval=(float(lo), float(hi)))
        print(f"=> combo: {t:.4f}s vs {base:.4f}s "
              f"({(t / base - 1) * 100:+.1f}%)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
