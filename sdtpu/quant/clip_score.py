"""CLIP-score evaluation harness (BASELINE.md quality metric: "CLIP-score
parity with fp32 reference").

score(image, prompt) = 100 * max(0, cos(E_img(image), E_txt(prompt))) — the
standard CLIPScore definition. Needs CLIP ViT weights (image tower is NOT
part of SD checkpoints); load them with ``vision_params_from_hf`` from an
openai/clip-vit-large-patch14 state dict when available, or use random-init
towers for harness plumbing tests.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sdtpu.models import clip

#: CLIP preprocessing constants (openai)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_images(images_uint8, size: int = 224):
    """uint8 [B,H,W,3] -> CLIP-normalized float [B,size,size,3] (bilinear)."""
    import jax.image

    x = jnp.asarray(images_uint8, jnp.float32) / 255.0
    if x.shape[1] != size:
        x = jax.image.resize(x, (x.shape[0], size, size, 3), "bilinear")
    return (x - CLIP_MEAN) / CLIP_STD


def clip_scores(
    images_uint8,
    prompts: list[str],
    tokenizer,
    text_params,
    text_proj,
    vision_params,
    text_cfg,
    vision_cfg,
) -> np.ndarray:
    """Per-pair CLIP scores for images[i] vs prompts[i]."""
    tokens = jnp.asarray(
        [tokenizer.tokenize(p, text_cfg.context_len) for p in prompts],
        jnp.int32,
    )
    t_emb = clip.text_embedding(
        text_params, tokens, text_proj, text_cfg, eot_id=tokenizer.eot
    )
    i_emb = clip.apply_vision(
        vision_params, preprocess_images(images_uint8, vision_cfg.image_size),
        vision_cfg,
    )
    t = t_emb / jnp.linalg.norm(t_emb, axis=-1, keepdims=True)
    i = i_emb / jnp.linalg.norm(i_emb, axis=-1, keepdims=True)
    cos = jnp.sum(t * i, axis=-1)
    return np.asarray(100.0 * jnp.maximum(cos, 0.0))


def vision_params_from_hf(state_dict: dict, cfg) -> tuple[dict, np.ndarray]:
    """Map an HF CLIPModel (openai/clip-vit-*) state dict into
    (vision_params, text_projection). Keys: vision_model.*,
    visual_projection.weight, text_projection.weight."""
    sd = state_dict

    def lin(name):
        return {"w": np.ascontiguousarray(sd[name + ".weight"].T),
                "b": sd[name + ".bias"]}

    def ln(name):
        return {"scale": sd[name + ".weight"], "bias": sd[name + ".bias"]}

    pre = "vision_model."
    params = {
        "class_embedding": sd[pre + "embeddings.class_embedding"],
        "patch_embedding": np.ascontiguousarray(
            sd[pre + "embeddings.patch_embedding.weight"].transpose(2, 3, 1, 0)
        ),
        "position_embedding": sd[pre + "embeddings.position_embedding.weight"],
        "ln_pre": ln(pre + "pre_layrnorm"),   # (sic — HF's key name)
        "ln_post": ln(pre + "post_layernorm"),
        "proj": np.ascontiguousarray(sd["visual_projection.weight"].T),
        "blocks": [],
    }
    for i in range(cfg.layers):
        b = f"{pre}encoder.layers.{i}."
        params["blocks"].append({
            "ln1": ln(b + "layer_norm1"),
            "q": lin(b + "self_attn.q_proj"),
            "k": lin(b + "self_attn.k_proj"),
            "v": lin(b + "self_attn.v_proj"),
            "out": lin(b + "self_attn.out_proj"),
            "ln2": ln(b + "layer_norm2"),
            "fc1": lin(b + "mlp.fc1"),
            "fc2": lin(b + "mlp.fc2"),
        })
    text_proj = np.ascontiguousarray(sd["text_projection.weight"].T)
    return params, text_proj
