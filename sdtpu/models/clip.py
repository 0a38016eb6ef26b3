"""CLIP text encoder (ViT-L/14 text tower for SD v1.x).

The reference runs this as the converted ``text_encoder.serialized`` graph:
77 uint tokens -> 77x768 prompt embedding (reference: context.cpp:211-212,
233-239). Architecture = HF ``CLIPTextModel``: token + learned position
embeddings, pre-LN transformer blocks with causal self-attention and
quick-GELU MLP, final layer norm. SD consumes the full last-hidden-state
(no pooling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sdtpu.config import CLIPConfig
from sdtpu.models.layers import (
    causal_sdpa,
    dense,
    init_dense,
    init_norm,
    layer_norm,
    quick_gelu,
)


def init(key, cfg: CLIPConfig):
    keys = jax.random.split(key, 3 + cfg.layers)
    d = cfg.hidden
    params = {
        "token_embedding": jax.random.normal(keys[0], (cfg.vocab_size, d)) * 0.02,
        "position_embedding": jax.random.normal(keys[1], (cfg.context_len, d)) * 0.01,
        "final_ln": init_norm(d),
        "blocks": [],
    }
    if cfg.projection:
        # pooled-embedding projection (SDXL bigG: eot hidden -> 1280)
        params["text_proj"] = jax.random.normal(
            keys[2], (d, cfg.projection)) * (d ** -0.5)
    for i in range(cfg.layers):
        ks = jax.random.split(keys[2 + i], 6)
        params["blocks"].append(
            {
                "ln1": init_norm(d),
                "q": init_dense(ks[0], d, d),
                "k": init_dense(ks[1], d, d),
                "v": init_dense(ks[2], d, d),
                "out": init_dense(ks[3], d, d),
                "ln2": init_norm(d),
                "fc1": init_dense(ks[4], d, d * cfg.mlp_ratio),
                "fc2": init_dense(ks[5], d * cfg.mlp_ratio, d),
            }
        )
    return params


def _encoder_block(blk, x, heads, eps, causal, act=quick_gelu):
    from sdtpu.models.layers import sdpa

    h = layer_norm(blk["ln1"], x, eps)
    q = dense(blk["q"], h)
    k = dense(blk["k"], h)
    v = dense(blk["v"], h)
    a = causal_sdpa(q, k, v, heads) if causal else sdpa(q, k, v, heads)
    x = x + dense(blk["out"], a)
    h = layer_norm(blk["ln2"], x, eps)
    return x + dense(blk["fc2"], act(dense(blk["fc1"], h)))


def apply(params, tokens, cfg: CLIPConfig, dtype=jnp.float32):
    """tokens: [B, T] int32 -> [B, T, hidden] hidden state (post final LN).

    ``cfg.penultimate`` skips the last transformer block before the final LN
    (SD2's OpenCLIP convention); ``cfg.act`` selects quick-GELU (SD1.x) vs
    GELU (SD2)."""
    import jax.nn

    act = quick_gelu if cfg.act == "quick_gelu" else (
        lambda h: jax.nn.gelu(h, approximate=False))
    x = params["token_embedding"][tokens].astype(dtype)
    x = x + params["position_embedding"][: tokens.shape[-1]].astype(dtype)
    blocks = params["blocks"]
    n_skip = cfg.skip_last or (1 if cfg.penultimate else 0)
    if n_skip:
        # A1111 "CLIP skip" (skip_last = clip_skip - 1) / SD2's
        # penultimate tap: drop the last block(s), keep the final LN
        blocks = blocks[:-n_skip]
    for blk in blocks:
        x = _encoder_block(blk, x, cfg.heads, cfg.eps, causal=True, act=act)
    return layer_norm(params["final_ln"], x, cfg.eps)


def apply_xl(params, tokens, cfg: CLIPConfig, eot_id: int,
             dtype=jnp.float32):
    """SDXL text-tower tap: ``(hidden, pooled)``.

    ``hidden`` is the PENULTIMATE block's output WITHOUT the final layer
    norm (the sgm ``layer="hidden"/"penultimate"`` convention both SDXL
    towers use for the cross-attention context — unlike SD2.1, which norms
    its penultimate tap). ``pooled`` runs the full stack + final LN, takes
    the first-eot hidden state and projects it with ``text_proj``
    (OpenCLIP's contrastive pooling); None when the config has no
    projection (the CLIP-L tower — only bigG's pooled output conditions
    the XL UNet)."""
    import jax.nn

    act = quick_gelu if cfg.act == "quick_gelu" else (
        lambda h: jax.nn.gelu(h, approximate=False))
    x = params["token_embedding"][tokens].astype(dtype)
    x = x + params["position_embedding"][: tokens.shape[-1]].astype(dtype)
    for blk in params["blocks"][:-1]:
        x = _encoder_block(blk, x, cfg.heads, cfg.eps, causal=True, act=act)
    hidden = x
    if "text_proj" not in params:
        return hidden, None
    x = _encoder_block(params["blocks"][-1], x, cfg.heads, cfg.eps,
                       causal=True, act=act)
    x = layer_norm(params["final_ln"], x, cfg.eps)
    eot_pos = jnp.argmax((tokens == eot_id).astype(jnp.int32), axis=-1)
    pooled = jnp.take_along_axis(
        x, eot_pos[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    pooled = jnp.dot(pooled, params["text_proj"].astype(pooled.dtype),
                     preferred_element_type=jnp.float32).astype(dtype)
    return hidden, pooled


# ---------------------------------------------------------------------------
# vision tower + projections (CLIP-score evaluation harness; the text tower
# above is the only part the SD pipeline itself needs)
# ---------------------------------------------------------------------------

import dataclasses


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch: int = 14
    hidden: int = 1024
    layers: int = 24
    heads: int = 16
    mlp_ratio: int = 4
    projection: int = 768    # shared text/image embedding dim (ViT-L/14)
    eps: float = 1e-5

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch) ** 2


VIT_L14 = CLIPVisionConfig()
TINY_VISION = CLIPVisionConfig(image_size=16, patch=8, hidden=32, layers=2,
                               heads=2, projection=16)


def init_vision(key, cfg: CLIPVisionConfig):
    keys = jax.random.split(key, 4 + cfg.layers)
    d = cfg.hidden
    params = {
        "class_embedding": jax.random.normal(keys[0], (d,)) * 0.02,
        "patch_embedding": jax.random.normal(
            keys[1], (cfg.patch, cfg.patch, 3, d)) * 0.02,  # HWIO, no bias
        "position_embedding": jax.random.normal(
            keys[2], (cfg.n_patches + 1, d)) * 0.01,
        "ln_pre": init_norm(d),
        "ln_post": init_norm(d),
        "proj": jax.random.normal(keys[3], (d, cfg.projection)) * 0.02,
        "blocks": [],
    }
    for i in range(cfg.layers):
        ks = jax.random.split(keys[4 + i], 6)
        params["blocks"].append(
            {
                "ln1": init_norm(d),
                "q": init_dense(ks[0], d, d),
                "k": init_dense(ks[1], d, d),
                "v": init_dense(ks[2], d, d),
                "out": init_dense(ks[3], d, d),
                "ln2": init_norm(d),
                "fc1": init_dense(ks[4], d, d * cfg.mlp_ratio),
                "fc2": init_dense(ks[5], d * cfg.mlp_ratio, d),
            }
        )
    return params


def apply_vision(params, images, cfg: CLIPVisionConfig, dtype=jnp.float32):
    """images: [B, H, W, 3] float (CLIP-normalized) -> [B, projection]."""
    from jax import lax

    from sdtpu.models.layers import PRECISION

    b = images.shape[0]
    patches = lax.conv_general_dilated(
        images.astype(dtype), params["patch_embedding"].astype(dtype),
        window_strides=(cfg.patch, cfg.patch), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32, precision=PRECISION,
    ).astype(dtype)
    x = patches.reshape(b, -1, cfg.hidden)
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(dtype)[None, None], (b, 1, cfg.hidden)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"].astype(dtype)[None]
    x = layer_norm(params["ln_pre"], x, cfg.eps)
    for blk in params["blocks"]:
        x = _encoder_block(blk, x, cfg.heads, cfg.eps, causal=False)
    pooled = layer_norm(params["ln_post"], x[:, 0], cfg.eps)
    return jnp.dot(pooled, params["proj"].astype(pooled.dtype),
                   preferred_element_type=jnp.float32).astype(dtype)


def text_embedding(params, tokens, text_proj, cfg: CLIPConfig,
                   eot_id: int, dtype=jnp.float32):
    """Pooled + projected text embedding (CLIP contrastive space): the
    hidden state at the FIRST eot position, projected."""
    hidden = apply(params, tokens, cfg, dtype)
    eot_pos = jnp.argmax((tokens == eot_id).astype(jnp.int32), axis=-1)
    pooled = jnp.take_along_axis(
        hidden, eot_pos[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    return jnp.dot(pooled, text_proj.astype(pooled.dtype),
                   preferred_element_type=jnp.float32).astype(dtype)
