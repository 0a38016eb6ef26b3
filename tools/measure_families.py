"""On-chip latency for every model family shipped in rounds 2-3
(VERDICT r3 #3: "everything that ships gets measured" — the reference
benchmarks every converted model part, /root/reference/benchmark.py:58-72).

One process, one real chip, families measured sequentially (contexts are
dropped between legs to free HBM). Emits one JSON line per leg plus a
combined final line; paste the table into docs/BENCH_RESULTS.md.

    python tools/measure_families.py --legs sdxl,sdxl_2stage,lcm4,x4,cn1,cn2
    python tools/measure_families.py --legs lcm4 --iters 12

Weights are random-init (no checkpoints in this env) — latency is
weight-agnostic (identical graphs/shapes/dtypes as trained weights).
"""

from __future__ import annotations

import argparse
import gc
import json
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


def _stats(times):
    return {"median_s": round(statistics.median(times), 4),
            "min_s": round(min(times), 4), "max_s": round(max(times), 4),
            "n": len(times)}


def _mfu(config, steps, median_s, n_controlnets=0, cfg_batch=True):
    """tflop_per_image / tflop_per_s / mfu_pct from the shared analytic
    constants (sdtpu/bench/flops.py, VERDICT r4 #2: the family matrix gets
    the same MFU discipline as the sd15 headline). Empty when the config
    has no captured constants yet."""
    import jax

    from sdtpu.bench import flops as fl

    return fl.mfu_fields(config, steps, median_s,
                         jax.devices()[0].device_kind,
                         n_controlnets=n_controlnets, cfg_batch=cfg_batch)


def _measure(call, warmup, iters):
    import numpy as np

    warm = []
    for i in range(warmup):
        t0 = time.perf_counter()
        out = call(i)
        assert isinstance(out, np.ndarray)
        warm.append(round(time.perf_counter() - t0, 3))
        print(f"#   warmup {i}: {warm[-1]:.3f}s", file=sys.stderr, flush=True)
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        call(warmup + i)
        times.append(time.perf_counter() - t0)
    return {**_stats(times), "warmup_s": warm}


def _ctx(config, steps, sampler="dpm", **kw):
    import sdtpu
    from sdtpu.engine.logging import LogLevel

    t0 = time.perf_counter()
    ctx = sdtpu.Context(model_dir=None, steps=steps, sampler=sampler,
                        config=config, log_level=LogLevel.ERROR, **kw)
    return ctx, round(time.perf_counter() - t0, 1)


def leg_sdxl(warmup, iters, steps):
    ctx, init_s = _ctx("sdxl", steps)
    r = _measure(lambda i: ctx.generate(PROMPTS[i % 4], guidance=7.5,
                                        seed=i), warmup, iters)
    return {"leg": "sdxl", "desc": f"SDXL base 1024x1024 {steps}-step dpm "
            "CFG 7.5 batch 1", "init_s": init_s, **r}


def leg_sdxl_2stage(warmup, iters, steps):
    base, init_b = _ctx("sdxl", steps)
    ref, init_r = _ctx("sdxl_refiner", steps)

    def call(i):
        lat = base.generate(PROMPTS[i % 4], guidance=7.5, seed=i,
                            denoising_end=0.8, output="latent")
        return ref.refine(lat, PROMPTS[i % 4], guidance=7.5, seed=i,
                          denoising_start=0.8)

    r = _measure(call, warmup, iters)
    return {"leg": "sdxl_2stage", "desc": f"SDXL base(0-80%)+refiner"
            f"(80-100%) 1024x1024 {steps}-step dpm", "init_s": init_b + init_r,
            **r}


def leg_lcm4(warmup, iters, steps=4):
    ctx, init_s = _ctx("sd15_lcm", steps, sampler="lcm")
    r = _measure(lambda i: ctx.generate(PROMPTS[i % 4], guidance=8.0,
                                        seed=i), warmup, iters)
    return {"leg": "lcm4", "desc": f"SD15-LCM 512x512 {steps}-step lcm "
            "(guidance embedded, no CFG batch)", "init_s": init_s, **r}


def leg_x4(warmup, iters, steps):
    import numpy as np

    ctx, init_s = _ctx("sd_x4", steps)
    rng = np.random.default_rng(0)
    lows = [rng.integers(0, 255, (ctx.cfg.latent_size, ctx.cfg.latent_size,
                                  3), np.uint8) for _ in range(4)]
    r = _measure(lambda i: ctx.upscale(PROMPTS[i % 4], lows[i % 4],
                                       noise_level=20, seed=i),
                 warmup, iters)
    return {"leg": "x4", "desc": f"SD x4 latent upscaler "
            f"{ctx.cfg.latent_size}->"
            f"{ctx.cfg.latent_size * 4} {steps}-step dpm", "init_s": init_s,
            **r}


def leg_cn(warmup, iters, steps, n_nets):
    import numpy as np

    ctx, init_s = _ctx("sd15", steps)
    names = []
    for k in range(n_nets):
        name = f"cn{k}"
        ctx.load_controlnet(name, "random")
        names.append(name)
    rng = np.random.default_rng(0)
    size = ctx.cfg.image_size
    hint = rng.integers(0, 255, (size, size, 3), np.uint8)
    kw = ({"control": names[0], "control_image": hint} if n_nets == 1 else
          {"control": names, "control_image": [hint] * n_nets})
    r = _measure(lambda i: ctx.generate(PROMPTS[i % 4], guidance=7.5,
                                        seed=i, **kw), warmup, iters)
    return {"leg": f"cn{n_nets}", "desc": f"SD15 512x512 {steps}-step dpm + "
            f"{n_nets} ControlNet(s)", "init_s": init_s, **r}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--legs", default="lcm4,x4,cn1,cn2,sdxl,sdxl_2stage")
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    fns = {
        "sdxl": lambda: leg_sdxl(args.warmup, args.iters, args.steps),
        "sdxl_2stage": lambda: leg_sdxl_2stage(args.warmup, args.iters,
                                               args.steps),
        "lcm4": lambda: leg_lcm4(args.warmup, args.iters),
        "x4": lambda: leg_x4(args.warmup, args.iters, args.steps),
        "cn1": lambda: leg_cn(args.warmup, args.iters, args.steps, 1),
        "cn2": lambda: leg_cn(args.warmup, args.iters, args.steps, 2),
    }
    results = []
    for leg in args.legs.split(","):
        print(f"# === leg {leg} ===", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        try:
            r = fns[leg]()
        except Exception as e:  # noqa: BLE001 — fleet continues (reference)
            import traceback

            traceback.print_exc()
            r = {"leg": leg, "error": f"{type(e).__name__}: {e}"}
        r["wall_s"] = round(time.perf_counter() - t0, 1)
        results.append(r)
        print(json.dumps(r), flush=True)
        gc.collect()
    print(json.dumps({"families": results}))


if __name__ == "__main__":
    main()
