"""Round-3 paired e2e measurement (run on the real TPU chip, one process).

Question (VERDICT r2 #2): does `quantize=int8` with the per-shape W8A8
router (models/layers._w8a8_kernel_ok, PERF_NOTES "W8A8 Pallas GEMM")
land strictly below the bf16 control end-to-end?

Pairing discipline (docs/PERF_NOTES.md "Measurement discipline"): both
legs run in THIS process back-to-back on an otherwise idle machine —
cross-session deltas smaller than the ~51 ms p10-p90 session band are
meaningless (docs/BENCH_RESULTS.md "Headline history").

Usage: python tools/measure_r3.py [--iters 12] [--legs bf16,int8]
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
    if ctx_kw.get("quantize") == "int8":
        from sdtpu.quant.ptq import calibrate

        t1 = time.perf_counter()
        ctx.params = calibrate(ctx.params, ctx.cfg, PROMPTS,
                               ctx.tokenizer, steps=4)
        ctx._gen_cache.clear()
        print(f"# {name}: calibrate {time.perf_counter() - t1:.1f}s",
              file=sys.stderr, flush=True)
    med, lo, hi = measure(ctx, iters)
    # free HBM before the next leg: drop the device param tree + jit cache
    ctx.params = None
    ctx._gen_cache.clear()
    del ctx
    import gc

    gc.collect()
    print(f"{name}: median {med:.4f}s  min {lo:.4f}s  max {hi:.4f}s",
          flush=True)
    return med


def run_batch_leg(name, iters, batch=4, overlap=False, cfg_interval=None):
    """Batch-serving throughput: per-image time at `batch`, either
    fetch-blocking per batch (sync — the round-2 number) or dispatching
    batch k+1 before fetching batch k (overlap — VERDICT r2 #5: the VAE
    decode + host fetch of one batch rides under the next batch's scan)."""
    import sdtpu
    from sdtpu.engine.logging import LogLevel

    t0 = time.perf_counter()
    ctx = sdtpu.Context(model_dir=None, steps=20, sampler="dpm",
                        config="sd15", log_level=LogLevel.ERROR,
                        cfg_interval=cfg_interval)
    print(f"# {name}: init {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)
    seed = [0]

    def reqs():
        r = [{"prompt": PROMPTS[(seed[0] + i) % len(PROMPTS)],
              "guidance": 7.5, "seed": seed[0] + i} for i in range(batch)]
        seed[0] += batch
        return r

    times = []
    if overlap:
        pending, last = None, None
        for i in range(2 + iters):
            fetch = ctx.generate_batch_async(reqs())
            if pending is not None:
                pending()
                now = time.perf_counter()
                if last is not None and i > 2:
                    times.append((now - last) / batch)
                last = now
            pending = fetch
        pending()
    else:
        for i in range(2 + iters):
            t1 = time.perf_counter()
            ctx.generate_batch(reqs())
            if i >= 2:
                times.append((time.perf_counter() - t1) / batch)
    med = statistics.median(times)
    print(f"{name}: median {med:.4f}s/image  min {min(times):.4f}  "
          f"max {max(times):.4f}  (batch={batch})", flush=True)
    ctx.params = None
    ctx._gen_cache.clear()
    return med


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--legs", default="bf16,int8",
                    help="comma list: bf16,int8,int8w,pallas_conv,"
                         "batch4,batch4_overlap,batch4_overlap_interval")
    args = ap.parse_args()

    meds = {}
    for raw in args.legs.split(","):
        # a trailing "#N" permits repeated legs (e.g. bf16,int8,bf16#2 —
        # the end control that detects in-process leg-order drift)
        leg = raw.split("#")[0]
        if leg == "bf16":
            meds[raw] = run_leg(f"bf16 control {raw}", args.iters)
        elif leg == "int8":
            meds[raw] = run_leg("int8 static", args.iters, quantize="int8")
        elif leg == "int8_kernel":
            # A/B: force the Pallas W8A8 kernel on the weights-dominant
            # sites (the path the round-3 closure rejected)
            from sdtpu.ops import matmul as mm

            mm.KERNEL_W8A8 = True
            try:
                meds[raw] = run_leg("int8 w8a8-routed", args.iters,
                                    quantize="int8")
            finally:
                mm.KERNEL_W8A8 = False
        elif leg == "int8w":
            meds[raw] = run_leg("int8w", args.iters, quantize="int8w")
        elif leg == "pallas_conv":
            meds[raw] = run_leg("pallas_conv", args.iters,
                                kernels="pallas_conv")
        elif leg == "combo":
            meds[raw] = run_leg("int8 + pallas_conv", args.iters,
                                quantize="int8", kernels="pallas_conv")
        elif leg == "batch4":
            meds[raw] = run_batch_leg("batch4 sync", args.iters)
        elif leg == "batch4_overlap":
            meds[raw] = run_batch_leg("batch4 overlap", args.iters,
                                      overlap=True)
        elif leg == "batch4_overlap_interval":
            # compounding: double-buffered dispatch + guidance interval
            meds[raw] = run_batch_leg("batch4 overlap+interval", args.iters,
                                      overlap=True,
                                      cfg_interval=(0.1, 0.75))
        else:
            raise SystemExit(f"unknown leg {leg}")
    if "bf16" in meds:
        for k, v in meds.items():
            if k != "bf16":
                print(f"# {k} vs bf16: {meds['bf16'] / v:.3f}x "
                      f"({(v - meds['bf16']) * 1e3:+.1f} ms)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
