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
    k0, k1, k2 = jax.random.split(key, 3)
    p = {
        "fc0": init_dense(k0, cfg.model_channels, cfg.time_embed_dim),
        "fc1": init_dense(k1, cfg.time_embed_dim, cfg.time_embed_dim),
    }
    if cfg.time_cond_proj_dim:
        # LCM guidance-embedding projection (diffusers TimestepEmbedding's
        # cond_proj: bias-free, ADDS to the fourier features before fc0)
        p["cond_proj"] = init_dense(k2, cfg.time_cond_proj_dim,
                                    cfg.model_channels, bias=False)
    return p


def apply(params, t, cfg: UNetConfig, dtype=None, cond=None,
          cond_align: str = "outer"):
    """t: [...] float timesteps -> [..., time_embed_dim] embeddings.

    `cond`: optional guidance-scale features [time_cond_proj_dim] (scalar
    guidance) or [B, time_cond_proj_dim] (per-sample, batched serving) —
    projected bias-free and added to the fourier features before the MLP
    (the diffusers LCM convention). With a [B, ...] cond and t of shape
    [steps], the result broadcasts to [steps, B, time_embed_dim] when
    ``cond_align="outer"`` (the default). ``cond_align="aligned"`` instead
    adds elementwise — for callers whose t is already PER SAMPLE ([B]
    timesteps zipped with [B, F] cond, e.g. the continuous-batching pool
    where every slot sits at its own trajectory position)."""
    feats = timestep_features(t, cfg.model_channels)
    if cond is not None:
        proj = dense(params["cond_proj"], cond.astype(feats.dtype))
        if cond_align == "outer" and proj.ndim == 2 and feats.ndim == 2:
            # [steps, F] + [B, F] -> [steps, B, F]
            feats = feats[:, None, :] + proj[None, :, :]
        else:
            feats = feats + proj
    if dtype is not None:
        feats = feats.astype(dtype)
    h = dense(params["fc0"], feats)
    return dense(params["fc1"], silu(h))


def guidance_scale_features(w, dim: int):
    """Sinusoidal guidance-scale features, diffusers
    ``get_guidance_scale_embedding`` convention (note: [sin | cos] halves
    and a ``half - 1`` denominator — both DIFFERENT from
    ``timestep_features``' LDM convention): ``emb_j = w * 1000 *
    exp(-log(10000) * j / (half - 1))``. `w`: scalar or [B] (the pipeline
    passes guidance - 1, the LCM distillation's w parametrization)."""
    import math

    import jax.numpy as jnp

    half = dim // 2
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32)
        / max(half - 1, 1)
    )
    args = jnp.asarray(w, jnp.float32)[..., None] * 1000.0 * freqs
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


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
