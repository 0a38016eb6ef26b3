"""Extract per-part compiled FLOP counts (XLA cost analysis) for a config.

Provenance tool for the PART_FLOPS constants embedded in bench.py: the MFU
accounting there (VERDICT r3 #2) uses compiled-executable cost_analysis()
numbers captured on the real chip by this script. Re-run after any model
change that alters FLOPs:

    python tools/extract_flops.py --config sd15
    python tools/extract_flops.py --config sdxl

Reference ethos: everything that ships gets measured/accounted
(/root/reference/benchmark.py:58-72, analyze_results.py:129-146).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def extract(config: str, kernels: str = "auto",
            controlnet: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/sdtpu/xla")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sdtpu.config import CONFIGS
    from sdtpu.io.params import cast_params, init_pipeline_params
    from sdtpu.models import clip, temb, unet, vae

    cfg = CONFIGS[config]
    if kernels == "auto":
        kernels = "pallas" if jax.default_backend() == "tpu" else "xla"
    # Abstract params only: cost_analysis needs shapes/dtypes, not values.
    # eval_shape keeps SDXL's ~10 GB of f32 init params entirely off the
    # device (concrete init OOMed a 16 GB v5e holding f32 + bf16 copies).
    params = jax.eval_shape(
        lambda k: cast_params(init_pipeline_params(k, cfg),
                              cfg.compute_dtype),
        jax.random.PRNGKey(0))
    dt = cfg.compute_dtype
    s = cfg.latent_size
    ctx_dim = cfg.unet.context_dim
    # CFG hot-loop batch (cond+uncond fused), the shape the scan runs at
    specs = {
        "temb": (
            lambda p, t: temb.apply(p, t, cfg.unet, dtype=dt),
            (params["temb"], jnp.linspace(0.0, 999.0, 20)),
        ),
        "clip": (
            lambda p, tok: clip.apply(p, tok, cfg.clip, dtype=dt),
            (params["clip"], jnp.zeros((1, cfg.clip.context_len), jnp.int32)),
        ),
        "unet_cfg": (
            lambda p, x, t, c: unet.apply(p, x, t, c, cfg.unet, kernels),
            (params["unet"],
             jnp.zeros((2, s, s, cfg.unet.in_channels), dt),
             jnp.zeros((2, cfg.unet.time_embed_dim), dt),
             jnp.zeros((2, cfg.clip.context_len, ctx_dim), dt)),
        ),
        # batch-1 no-CFG program (LCM / guidance-embedded serving)
        "unet_b1": (
            lambda p, x, t, c: unet.apply(p, x, t, c, cfg.unet, kernels),
            (params["unet"],
             jnp.zeros((1, s, s, cfg.unet.in_channels), dt),
             jnp.zeros((1, cfg.unet.time_embed_dim), dt),
             jnp.zeros((1, cfg.clip.context_len, ctx_dim), dt)),
        ),
        "vae_dec": (
            lambda p, z: vae.apply(p, z, cfg.vae, kernels),
            (params["vae"], jnp.zeros((1, s, s, cfg.vae.z_channels), dt)),
        ),
    }
    if cfg.clip2 is not None:  # SDXL dual tower
        specs["clip2"] = (
            lambda p, tok: clip.apply(p, tok, cfg.clip2, dtype=dt),
            (params["clip2"],
             jnp.zeros((1, cfg.clip2.context_len), jnp.int32)),
        )
    if controlnet:
        from sdtpu.models import controlnet as cn_mod

        cn = jax.eval_shape(
            lambda k: cast_params(cn_mod.init(k, cfg.unet,
                                              zero_init_outs=False),
                                  cfg.compute_dtype),
            jax.random.PRNGKey(1))
        mc = cfg.unet.model_channels
        specs["controlnet_cfg"] = (
            lambda p, x, h, t, c: cn_mod.apply(p, x, h, t, c, cfg.unet,
                                               kernels),
            (cn,
             jnp.zeros((2, s, s, cfg.unet.in_channels), dt),
             jnp.zeros((2, s, s, mc), dt),
             jnp.zeros((2, cfg.unet.time_embed_dim), dt),
             jnp.zeros((2, cfg.clip.context_len, ctx_dim), dt)),
        )
        factor = cfg.image_size // cfg.latent_size
        specs["cn_hint"] = (
            lambda p, img: cn_mod.embed_hint(p, img, factor),
            (cn, jnp.zeros((2, cfg.image_size, cfg.image_size, 3), dt)),
        )
    out = {"config": config, "kernels": kernels,
           "backend": jax.default_backend(),
           "device": jax.devices()[0].device_kind}
    for name, (fn, args) in specs.items():
        t0 = time.perf_counter()
        compiled = jax.jit(fn).lower(*args).compile()
        ca = compiled.cost_analysis() or {}
        out[name] = {
            "flops": ca.get("flops"),
            "bytes_accessed": ca.get("bytes accessed"),
            "compile_s": round(time.perf_counter() - t0, 1),
        }
        print(f"# {name}: {out[name]}", flush=True)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="sd15")
    ap.add_argument("--kernels", default="auto")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--controlnet", action="store_true",
                    help="also capture the ControlNet eval + hint embed")
    ap.add_argument("--platform", default="auto",
                    choices=["auto", "cpu", "tpu"])
    args = ap.parse_args()
    if args.platform != "auto":
        import jax

        jax.config.update("jax_platforms", args.platform)
    out = extract(args.config, args.kernels, controlnet=args.controlnet)
    # paste-ready PART_FLOPS entry for sdtpu/bench/flops.py
    out["part_flops_entry"] = {
        k: out[k]["flops"] for k in
        ("unet_cfg", "unet_b1", "clip", "clip2", "vae_dec", "temb",
         "controlnet_cfg", "cn_hint") if k in out}
    total = (out["unet_cfg"]["flops"] * args.steps
             + out["clip"]["flops"] * 2
             + out.get("clip2", {}).get("flops", 0.0) * 2
             + out["vae_dec"]["flops"] + out["temb"]["flops"])
    out["tflop_per_image"] = {f"{args.steps}step_cfg": total / 1e12}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
