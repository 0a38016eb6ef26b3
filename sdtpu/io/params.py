"""Parameter-tree construction: random init + dtype casting.

Checkpoint loading (LDM/HF safetensors -> this pytree) lives in
sdtpu.io.weights; this module owns the tree *shape*.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sdtpu.config import PipelineConfig
from sdtpu.models import clip, temb, unet, vae


def init_pipeline_params(key, cfg: PipelineConfig, demo: bool = True):
    """Random-init parameters for all four models (demo / test mode — the
    reference ships no weights either; they are converted offline).

    With ``demo=True`` the LDM zero-initialized output convolutions get
    random weights instead — otherwise a fresh UNet predicts eps == 0 and
    the pipeline degenerates (zero-init is a *training* convention; demo
    mode needs a non-trivial function). Fully traceable (jit the whole init
    for a single device dispatch)."""
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    params = {
        "temb": temb.init(k2, cfg.unet),
        "unet": unet.init(k3, cfg.unet, zero_init_outs=not demo),
        "vae": vae.init(k4, cfg.vae),
        "vae_enc": vae.init_encoder(k5, cfg.vae),
    }
    if not cfg.refiner:
        params["clip"] = clip.init(k1, cfg.clip)
    if cfg.clip2 is not None:
        # SDXL: second text tower + the additive-conditioning MLP
        # (the refiner conditions on THIS tower only — no tower-1 tree)
        params["clip2"] = clip.init(k6, cfg.clip2)
        params["add_mlp"] = temb.init_add(k7, cfg.unet)
    return params


def cast_params(params, dtype):
    """Cast the whole tree once at load time (device-resident weights live in
    the compute dtype; float32 master copies are not kept for inference).
    int8 leaves and quantization scales (``w8_scale``/``w_scale``/
    ``x_scale``) keep their dtype — scales must stay float32."""
    from jax.tree_util import tree_map_with_path

    dt = jnp.dtype(dtype)
    keep = ("w8_scale", "w_scale", "x_scale")

    def cast(path, a):
        if path and getattr(path[-1], "key", None) in keep:
            return a
        return a.astype(dt) if jnp.issubdtype(a.dtype, jnp.floating) else a

    return tree_map_with_path(cast, params)


def param_count(params) -> int:
    return sum(int(a.size) for a in jax.tree.leaves(params))


def fuse_attention_projections(params):
    """Runtime optimization: concatenate each SpatialTransformer's q/k/v
    (self-attention) and k/v (cross-attention) projection kernels into single
    wider matmuls — one MXU-friendly GEMM instead of three narrow ones at SD
    widths (320/640/1280). Applied after load; checkpoint import/export and
    quantization operate on the unfused layout."""
    def walk(node):
        if isinstance(node, dict):
            if ("attn1" in node and "attn2" in node
                    and "w" in node.get("attn1", {}).get("q", {})):
                node = dict(node)
                a1, a2 = node["attn1"], node["attn2"]
                if a1["k"]["w"].shape[0] == a1["q"]["w"].shape[0]:
                    node["attn1"] = {
                        "qkv": {"w": jnp.concatenate(
                            [a1["q"]["w"], a1["k"]["w"], a1["v"]["w"]],
                            axis=1)},
                        "out": a1["out"],
                    }
                else:
                    # cross-only attn1 (SD x4-upscaler): k/v take ctx_dim
                    # inputs — fuse that pair like attn2's
                    node["attn1"] = {
                        "q": a1["q"],
                        "kv": {"w": jnp.concatenate(
                            [a1["k"]["w"], a1["v"]["w"]], axis=1)},
                        "out": a1["out"],
                    }
                node["attn2"] = {
                    "q": a2["q"],
                    "kv": {"w": jnp.concatenate(
                        [a2["k"]["w"], a2["v"]["w"]], axis=1)},
                    "out": a2["out"],
                }
                return node
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)
