"""Time-embedding MLP: 320-d sinusoidal features -> 1280-d embedding.

The reference converts this tiny net as its own graph (`temb`, always fp16)
and precomputes the 20 per-step embeddings at init
(reference: context.cpp:208-209, 256-279; todlc.py:105). We keep the same
factoring — the engine embeds all step timesteps once, outside the scan —
but it is just two fused matmuls under jit.

Matches the SD UNet's ``time_embed`` block: Linear(d, 4d) -> SiLU ->
Linear(4d, 4d).
"""

from __future__ import annotations

import jax

from sdtpu.config import UNetConfig
from sdtpu.models.layers import dense, init_dense, silu, timestep_features


def init(key, cfg: UNetConfig):
    k0, k1 = jax.random.split(key)
    return {
        "fc0": init_dense(k0, cfg.model_channels, cfg.time_embed_dim),
        "fc1": init_dense(k1, cfg.time_embed_dim, cfg.time_embed_dim),
    }


def apply(params, t, cfg: UNetConfig, dtype=None):
    """t: [...] float timesteps -> [..., time_embed_dim] embeddings."""
    feats = timestep_features(t, cfg.model_channels)
    if dtype is not None:
        feats = feats.astype(dtype)
    h = dense(params["fc0"], feats)
    return dense(params["fc1"], silu(h))


def init_add(key, cfg: UNetConfig):
    """SDXL additive-conditioning MLP (``add_embedding``): the pooled text
    embedding + size/crop microcond fourier vector (adm_in_channels wide)
    through the same Linear -> SiLU -> Linear shape as the time MLP; its
    output ADDS to the per-step time embedding."""
    k0, k1 = jax.random.split(key)
    return {
        "fc0": init_dense(k0, cfg.adm_in_channels, cfg.time_embed_dim),
        "fc1": init_dense(k1, cfg.time_embed_dim, cfg.time_embed_dim),
    }


def apply_vec(params, y, dtype=None):
    """y: [..., adm_in_channels] conditioning vector -> [..., temb_dim]."""
    if dtype is not None:
        y = y.astype(dtype)
    return dense(params["fc1"], silu(dense(params["fc0"], y)))


def micro_features(cfg, fourier_dim: int):
    """The static microcond fourier block, flattened — constant per pipeline
    config, computed once at trace time and concatenated after the pooled
    embedding. txt2img: (original_h, original_w, crop_top, crop_left,
    target_h, target_w) = (H, W, 0, 0, H, W); SDXL-refiner: (original_h,
    original_w, crop_top, crop_left, aesthetic_score)."""
    import jax.numpy as jnp

    s = float(cfg.image_size)
    if getattr(cfg, "refiner", False):
        vals = jnp.asarray([s, s, 0.0, 0.0, cfg.aesthetic_score], jnp.float32)
    else:
        vals = jnp.asarray([s, s, 0.0, 0.0, s, s], jnp.float32)
    return timestep_features(vals, fourier_dim).reshape(-1)
