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
    keys = jax.random.split(key, 2 + cfg.layers)
    d = cfg.hidden
    params = {
        "token_embedding": jax.random.normal(keys[0], (cfg.vocab_size, d)) * 0.02,
        "position_embedding": jax.random.normal(keys[1], (cfg.context_len, d)) * 0.01,
        "final_ln": init_norm(d),
        "blocks": [],
    }
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


def apply(params, tokens, cfg: CLIPConfig, dtype=jnp.float32):
    """tokens: [B, T] int32 -> [B, T, hidden] last hidden state (post final LN)."""
    x = params["token_embedding"][tokens].astype(dtype)
    x = x + params["position_embedding"][: tokens.shape[-1]].astype(dtype)
    for blk in params["blocks"]:
        h = layer_norm(blk["ln1"], x, cfg.eps)
        q = dense(blk["q"], h)
        k = dense(blk["k"], h)
        v = dense(blk["v"], h)
        a = causal_sdpa(q, k, v, cfg.heads)
        x = x + dense(blk["out"], a)
        h = layer_norm(blk["ln2"], x, cfg.eps)
        h = dense(blk["fc2"], quick_gelu(dense(blk["fc1"], h)))
        x = x + h
    return layer_norm(params["final_ln"], x, cfg.eps)
