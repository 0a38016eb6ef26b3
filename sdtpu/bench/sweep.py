"""Config-matrix sweep harness: the BASELINE.json evaluation configs.

Runs the sampler sweep (DDIM/DPM/PLMS x steps x CFG), batched multi-prompt,
and high-res configs on the current backend, emitting one JSON line per
config (metric: s/image at steady state) plus optional image dumps for
eyeball checks. This is the rebuild's counterpart to the reference's
"quality config" matrix (reference: README.md:61).
"""

from __future__ import annotations

import json
import statistics
import time
from pathlib import Path
from typing import Optional


def run_sweep(
    config: str = "sd15",
    samplers=("dpm", "ddim", "plms", "plms_exact"),
    steps_list=(10, 20, 50),
    guidance_list=(1.0, 4.0, 7.5),
    batches=(1, 4),
    sizes=(512, 768),
    iters: int = 3,
    out_dir: Optional[str] = None,
    dump_images: bool = False,
    quick: bool = False,
):
    """Yield one result dict per config (and optionally write JSONL/PNGs)."""
    import sdtpu

    if quick:
        samplers = samplers[:1]
        steps_list = steps_list[:1]
        guidance_list = (7.5,)
        batches = (1,)
        sizes = sizes[:1]

    out_path = Path(out_dir) if out_dir else None
    if out_path:
        out_path.mkdir(parents=True, exist_ok=True)
    prompt = "a photograph of an astronaut riding a horse"
    results = []

    for size in sizes:
        ctx = None
        for sampler in samplers:
            for steps in steps_list:
                for g in guidance_list:
                    for b in batches:
                        if ctx is None or ctx.sampler != sampler \
                                or ctx.steps != steps:
                            ctx = sdtpu.Context(
                                config=config, steps=steps, sampler=sampler,
                                size=size if config == "sd15" else None,
                            )
                        prompts = [prompt] * b if b > 1 else prompt
                        ctx.generate(prompts, guidance=g, seed=0)  # compile
                        times = []
                        for i in range(iters):
                            t = time.perf_counter()
                            img = ctx.generate(prompts, guidance=g, seed=i)
                            times.append(time.perf_counter() - t)
                        r = {
                            "config": config, "size": size,
                            "sampler": sampler, "steps": steps,
                            "guidance": g, "batch": b,
                            "s_per_image": statistics.median(times) / b,
                            "s_per_call": statistics.median(times),
                        }
                        results.append(r)
                        line = json.dumps(r)
                        print(line, flush=True)
                        if out_path:
                            with open(out_path / "sweep.jsonl", "a") as f:
                                f.write(line + "\n")
                            if dump_images:
                                from PIL import Image

                                im = img[0] if b > 1 else img
                                Image.fromarray(im).save(
                                    out_path /
                                    f"{sampler}_{steps}_{g}_{size}.png")
    return results
