"""Per-phase pipeline timings + jax.profiler trace capture.

The analogue of the reference's runtime phase timers ("Conditioning" /
"Single iteration" / "Decoding" / "Image generation", reference:
context.cpp:309-314, 331, 381, 398, 402): the production pipeline runs as ONE
program, so for observability the phases are compiled separately here and
timed at steady state.
"""

from __future__ import annotations

import statistics
import time

import jax
import jax.numpy as jnp

from sdtpu.config import SD15, PipelineConfig
from sdtpu.engine.pipeline import decode_latents, denoise, encode_text


def phase_timings(
    cfg: PipelineConfig = SD15,
    params=None,
    steps: int = 20,
    sampler: str = "dpm",
    kernels: str = "auto",
    warmup: int = 3,
    iters: int = 10,
) -> dict:
    """Time Conditioning / full denoise / single iteration / Decoding."""
    from sdtpu.io.params import cast_params, init_pipeline_params

    if kernels == "auto":
        kernels = "pallas" if jax.default_backend() == "tpu" else "xla"
    if params is None:
        params = jax.jit(lambda k: init_pipeline_params(k, cfg))(
            jax.random.PRNGKey(0)
        )
        params = cast_params(params, cfg.compute_dtype)

    tokens = jnp.zeros((1, cfg.clip.context_len), jnp.int32)
    ctx2 = jnp.zeros(
        (2, cfg.clip.context_len, cfg.unet.context_dim), cfg.compute_dtype
    )
    key = jax.random.PRNGKey(0)
    g = jnp.float32(7.5)
    lat = jnp.zeros(
        (1, cfg.latent_size, cfg.latent_size, cfg.latent_channels), jnp.float32
    )

    fns = {
        "conditioning": (
            jax.jit(lambda p, t: encode_text(p, t, cfg)), (params, tokens)),
        "denoise_loop": (
            jax.jit(lambda p, c, k, gg: denoise(
                p, c, k, gg, cfg, sampler, steps, True, kernels)),
            (params, ctx2, key, g)),
        "single_iteration": (
            jax.jit(lambda p, c, k, gg: denoise(
                p, c, k, gg, cfg, sampler, 1, True, kernels)),
            (params, ctx2, key, g)),
        "decoding": (
            jax.jit(lambda p, x: decode_latents(p, x, cfg, kernels)),
            (params, lat)),
    }
    out = {}
    for name, (fn, args) in fns.items():
        # distinct input per call + forced fetch — repeat inputs are
        # memoized by remote execution layers and block_until_ready can
        # return early there
        import numpy as np

        def vary(a, i):
            if a is key:
                return jax.random.fold_in(a, i)
            if hasattr(a, "dtype") and a.ndim > 0:
                if jnp.issubdtype(a.dtype, jnp.floating):
                    return a + jnp.asarray(i * 1e-3, a.dtype)
                return jnp.roll(a, i, axis=-1)
            return a

        variants = [tuple(vary(a, i) for a in args)
                    for i in range(warmup + iters)]
        for i in range(warmup):
            np.asarray(fn(*variants[i]))
        times = []
        for i in range(iters):
            t = time.perf_counter()
            np.asarray(fn(*variants[warmup + i]))
            times.append((time.perf_counter() - t) * 1e3)
        out[name] = statistics.median(times)
    out["image_generation_est"] = (
        out["conditioning"] + out["denoise_loop"] + out["decoding"]
    )
    out["per_step"] = out["denoise_loop"] / steps
    return out


def capture_trace(fn, args, out_dir: str = "/tmp/sdtpu_trace"):
    """Capture a jax.profiler trace of one invocation (open with XProf/
    tensorboard) — the deep-dive analogue of the reference's per-layer
    profiling output."""
    fn(*args)  # compile outside the trace
    with jax.profiler.trace(out_dir):
        jax.tree.leaves(fn(*args))[0].block_until_ready()
    return out_dir
