"""GEGLU activation variant A/B on the real chip (VERDICT r5: attack the
top time-weighted low-utilization shapes from docs/UTILIZATION.md).

The per-shape MXU attribution shows the transformer ff2 projections
(e.g. L0 ``conv 2x4096x1280 * 1280x320x1``) running at 19-31% peak while
the neighboring 3x3 convs hit 97%+. The fusion wrapping ff2 contains the
GEGLU gate: ``jax.nn.gelu(approximate=False)`` lowers to an f32 ``erfc``
over [2, 4096, 1280] (10.5M elements, upcast from bf16 — visible in the
optimized HLO with source_line=layers.py geglu). This tool measures
whether the transcendental/precision choice is the gap:

  exact   erf-based gelu, f32 upcast (production default — diffusers
          fixed-seed parity)
  tanh    jax.nn.gelu(approximate=True)
  quick   x * sigmoid(1.702 x) (GPT-2 style)

Paired, chained timing of the full CFG UNet eval (unique inputs per call,
scalar fetch per iter); numerics vs exact reported as max|delta| on the
eps output. Each leg re-jits a FRESH callable (pjit caches replay stale
traces across monkeypatched variants — PERF_NOTES "Dead ends").

    python tools/measure_gelu.py --iters 30
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="sd15")
    ap.add_argument("--kernels", default="pallas")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--platform", default="auto",
                    choices=["auto", "cpu", "tpu"])
    args = ap.parse_args()

    import jax

    if args.platform != "auto":
        jax.config.update("jax_platforms", args.platform)
    if not jax.config.jax_compilation_cache_dir:
        jax.config.update("jax_compilation_cache_dir",
                          str(Path("~/.cache/sdtpu/xla").expanduser()))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_enable_xla_caches", "")

    import jax.numpy as jnp
    import numpy as np

    from sdtpu.config import CONFIGS
    from sdtpu.io.params import cast_params, init_pipeline_params
    from sdtpu.models import layers, unet

    cfg = CONFIGS[args.config]
    # init + cast the UNet only, inside one jit, so the f32 full-pipeline
    # params never stay resident (first run OOMed holding both copies)
    params = jax.jit(
        lambda k: cast_params(init_pipeline_params(k, cfg),
                              cfg.compute_dtype)["unet"])(
        jax.random.PRNGKey(0))
    p = params
    dt = cfg.compute_dtype
    s = cfg.latent_size
    ctx_dim = cfg.unet.context_dim
    te = jnp.zeros((2, cfg.unet.time_embed_dim), dt)
    rows = jnp.zeros((2, cfg.clip.context_len, ctx_dim), dt)
    kern = args.kernels

    GELUS = {
        "exact": lambda a, b: a * jax.nn.gelu(b, approximate=False),
        "tanh": lambda a, b: a * jax.nn.gelu(b, approximate=True),
        "quick": lambda a, b: a * jax.nn.sigmoid(1.702 * b),
    }

    orig_geglu = layers.geglu
    out = {"config": args.config, "kernels": kern,
           "device": jax.devices()[0].device_kind, "iters": args.iters}
    xs = [jax.device_put(jnp.asarray(
        np.random.default_rng(i).standard_normal(
            (2, s, s, cfg.unet.in_channels), np.float32), dt))
        for i in range(8)]

    # Phase 1: compile every variant up front (persistent cache makes
    # reruns cheap). unet.py binds geglu by name at import (`from
    # ...layers import geglu`) — patch BOTH references or the variant
    # never runs (the first capture of this tool reported identical times
    # and delta 0.0 for exactly this reason).
    fns, ref = {}, None
    for name, gate in GELUS.items():
        def patched(pp, x, dtype=None, _gate=gate):
            h = layers.dense(pp, x, dtype)
            a, b = jnp.split(h, 2, axis=-1)
            return _gate(a, b)

        layers.geglu = patched
        unet.geglu = patched
        try:
            fn = jax.jit(lambda pr, x, t, c: unet.apply(pr, x, t, c,
                                                        cfg.unet, kern))
            fn = (lambda f: lambda pr, x: f(pr, x, te, rows))(fn)
            eps = np.asarray(fn(p, xs[0]), np.float32)   # compile + fetch
        finally:
            layers.geglu = orig_geglu
            unet.geglu = orig_geglu
        if ref is None:
            ref = eps
        fns[name] = fn
        out[name] = {"times": [],
                     "max_abs_delta_vs_exact": float(np.max(np.abs(eps - ref)))}
        print(f"# compiled {name}", file=sys.stderr, flush=True)

    # Phase 2: INTERLEAVED timing rounds (leg-order drift polluted the
    # sequential capture: the same exact leg measured 47.3 and 60.6 ms
    # median in two back-to-back runs). Variants alternate within each
    # round, so slow-session minutes hit all legs equally.
    rounds = max(1, args.iters // 10)
    for rd in range(rounds):
        for name, fn in fns.items():
            for it in range(10):
                t0 = time.perf_counter()
                r = fn(p, xs[(rd * 10 + it) % len(xs)])
                np.asarray(r[0, 0, 0, 0])
                out[name]["times"].append(time.perf_counter() - t0)
    for name, rec in ((n, out[n]) for n in GELUS):
        times = rec.pop("times")
        rec["median_ms"] = round(statistics.median(times) * 1e3, 3)
        rec["min_ms"] = round(min(times) * 1e3, 3)
        print(f"# {name}: {rec}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
