"""Paired e2e measurement of ToMe-SD token merging (run on the real chip).

Question: what does `tome_ratio` buy at 512x512 (4096-token level-0
self-attention) and at 768x768 (9216 tokens, where attention dominates —
README "long-context/spatial scaling")?

Pairing discipline (docs/PERF_NOTES.md "Measurement discipline"): all
legs run in THIS process back-to-back; cross-session deltas smaller than
the session band are meaningless.

Usage: python tools/measure_tome.py [--iters 10] [--sizes 512,768]
                                    [--ratios 0.5]
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


def run_leg(name, iters, size, **ctx_kw):
    import sdtpu
    from sdtpu.engine.logging import LogLevel

    t0 = time.perf_counter()
    ctx = sdtpu.Context(model_dir=None, steps=20, sampler="dpm",
                        config="sd15", size=size,
                        log_level=LogLevel.ERROR, **ctx_kw)
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
    ap.add_argument("--sizes", default="512,768")
    ap.add_argument("--ratios", default="0.5")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    ratios = [float(r) for r in args.ratios.split(",")]

    for size in sizes:
        base = run_leg(f"bf16 {size}", args.iters, size)
        for r in ratios:
            t = run_leg(f"tome={r} {size}", args.iters, size, tome_ratio=r)
            print(f"=> size {size} ratio {r}: {t:.4f}s vs {base:.4f}s "
                  f"({(t / base - 1) * 100:+.1f}%)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
