"""Per-part benchmark runner.

TPU-native rebuild of the reference's on-device benchmark fleet (reference:
benchmark.py:41-103): each model part (temb / text encoder / UNet / VAE
decoder) is timed separately at steady state (default warmup=20, iters=100 —
the reference's protocol), with an HLO-derived per-op-class breakdown as the
"detailed per-layer profiling" analogue. Results are written one JSON per
part under ``results/`` (the reference writes pprint dicts under
``results/**``; failures are captured to ``.error`` files and the fleet
continues, reference: benchmark.py:88-95).
"""

from __future__ import annotations

import json
import statistics
import time
import traceback
from pathlib import Path

import jax
import jax.numpy as jnp

from sdtpu.config import SD15, PipelineConfig
from sdtpu.models import clip, temb, unet, vae


def _vary(args, key):
    """Distinct device-resident variants of the float args — identical
    repeated inputs can be memoized by remote execution layers, which
    poisons steady-state timing."""
    out = []
    for i, a in enumerate(args):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) \
                and getattr(a, "ndim", 0) > 0 and not isinstance(a, dict):
            out.append(
                a + jax.random.normal(
                    jax.random.fold_in(key, i), a.shape, a.dtype) * 0.01
            )
        else:
            out.append(a)
    return tuple(out)


def _time_fn(fn, args, warmup: int, iters: int):
    """Steady-state timing that is honest over remote backends: EVERY call
    gets a distinct input (repeat inputs are memoized by the remote layer)
    and completion is forced by fetching a value (block_until_ready can
    return before remote execution finishes)."""
    import numpy as np

    variants = [_vary(args, jax.random.PRNGKey(v))
                for v in range(warmup + iters)]
    for v in range(warmup):
        np.asarray(jax.tree.leaves(fn(*variants[v]))[0])
    times = []
    for i in range(iters):
        a = variants[warmup + i]
        t = time.perf_counter()
        r = fn(*a)
        np.asarray(jax.tree.leaves(r)[0])
        times.append((time.perf_counter() - t) * 1e3)
    return times


def _hlo_op_classes(compiled) -> dict:
    """Classify the optimized HLO's instructions into op classes — the
    analogue of the reference's layer-name-prefix classification
    (reference: analyze_results.py:20-93: conv/act/norm/matmul/softmax/...).
    """
    classes = {
        "conv": 0, "matmul": 0, "norm_reduce": 0, "activation": 0,
        "softmax_exp": 0, "shaping": 0, "elementwise": 0, "fusion": 0,
        "other": 0,
    }
    try:
        txt = compiled.as_text()
    except Exception:
        return classes
    for line in txt.splitlines():
        line = line.strip()
        if line.startswith("ROOT "):
            line = line[5:]
        if "=" not in line or line.startswith(("HloModule", "ENTRY", "}")):
            continue
        rhs = line.split("=", 1)[1].strip()
        head = rhs.split("(", 1)[0].split()
        op = head[-1] if ("(" in rhs and head) else ""
        op = op.lstrip("%")
        if op.startswith("convolution"):
            classes["conv"] += 1
        elif op.startswith(("dot", "cublas", "custom-call")):
            classes["matmul"] += 1
        elif op.startswith("reduce"):
            classes["norm_reduce"] += 1
        elif op.startswith(("exponential", "divide")):
            classes["softmax_exp"] += 1
        elif op.startswith(("logistic", "tanh", "maximum")):
            classes["activation"] += 1
        elif op.startswith(("reshape", "transpose", "broadcast", "concatenate",
                            "slice", "pad", "copy", "bitcast")):
            classes["shaping"] += 1
        elif op.startswith("fusion"):
            classes["fusion"] += 1
        elif op.startswith(("add", "multiply", "subtract", "select")):
            classes["elementwise"] += 1
        elif op:
            classes["other"] += 1
    return classes


def _part_specs(cfg: PipelineConfig, params, kernels: str):
    dt = cfg.compute_dtype
    b = 2  # CFG batch, the hot-loop shape
    s = cfg.latent_size
    return {
        "temb": (
            lambda p, t: temb.apply(p, t, cfg.unet, dtype=dt),
            (params["temb"], jnp.linspace(0.0, 999.0, 20)),
        ),
        "text_encoder": (
            lambda p, tok: clip.apply(p, tok, cfg.clip, dtype=dt),
            (params["clip"],
             jnp.zeros((1, cfg.clip.context_len), jnp.int32)),
        ),
        "unet": (
            lambda p, x, t, c: unet.apply(p, x, t, c, cfg.unet, kernels),
            (params["unet"],
             jnp.zeros((b, s, s, cfg.unet.in_channels), dt),
             jnp.zeros((b, cfg.unet.time_embed_dim), dt),
             jnp.zeros((b, cfg.clip.context_len, cfg.unet.context_dim), dt)),
        ),
        "vae_decoder": (
            lambda p, z: vae.apply(p, z, cfg.vae, kernels),
            (params["vae"], jnp.zeros((1, s, s, cfg.vae.z_channels), dt)),
        ),
    }


def benchmark_parts(
    cfg: PipelineConfig = SD15,
    params=None,
    warmup: int = 20,
    iters: int = 100,
    parts=None,
    out_dir: str | Path = "results",
    kernels: str = "auto",
) -> dict:
    """Benchmark each model part; write results/<part>.json; return summary."""
    from sdtpu.io.params import cast_params, init_pipeline_params

    if kernels == "auto":
        kernels = "pallas" if jax.default_backend() == "tpu" else "xla"
    if params is None:
        params = jax.jit(lambda k: init_pipeline_params(k, cfg))(
            jax.random.PRNGKey(0)
        )
        params = cast_params(params, cfg.compute_dtype)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    specs = _part_specs(cfg, params, kernels)
    if parts:
        specs = {k: v for k, v in specs.items() if k in parts}

    summary = {}
    for name, (fn, args) in specs.items():
        try:
            jitted = jax.jit(fn)
            compiled = jitted.lower(*args).compile()
            cost = compiled.cost_analysis() or {}
            times = _time_fn(jitted, args, warmup, iters)
            result = {
                "part": name,
                "latency_ms": statistics.median(times),
                "latency_mean_ms": statistics.fmean(times),
                "latency_p99_ms": sorted(times)[int(0.99 * (len(times) - 1))],
                "warmup": warmup,
                "iters": iters,
                "flops": cost.get("flops"),
                "bytes_accessed": cost.get("bytes accessed"),
                "op_classes": _hlo_op_classes(compiled),
                "backend": jax.default_backend(),
                "kernels": kernels,
            }
            (out_dir / f"{name}.json").write_text(json.dumps(result, indent=1))
            summary[name] = result
        except Exception:  # noqa: BLE001 — fleet continues (reference behavior)
            (out_dir / f"{name}.error").write_text(traceback.format_exc())
            summary[name] = {"part": name, "error": True}
    return summary
