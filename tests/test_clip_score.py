"""CLIP-score harness tests: vision tower parity vs transformers CLIPModel
(tiny config, copied weights) + end-to-end score plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sdtpu.config import CLIPConfig
from sdtpu.models import clip
from sdtpu.models.clip import TINY_VISION, CLIPVisionConfig
from sdtpu.quant.clip_score import (
    clip_scores,
    preprocess_images,
    vision_params_from_hf,
)


def test_vision_tower_matches_transformers(rng):
    from transformers import CLIPConfig as HFCLIPConfig
    from transformers import CLIPModel

    v = CLIPVisionConfig(image_size=32, patch=8, hidden=32, layers=2, heads=2,
                         projection=24)
    t = CLIPConfig(vocab_size=100, hidden=16, layers=2, heads=2, context_len=12)
    hf_cfg = HFCLIPConfig(
        text_config={
            "vocab_size": t.vocab_size, "hidden_size": t.hidden,
            "intermediate_size": t.hidden * 4, "num_hidden_layers": t.layers,
            "num_attention_heads": t.heads,
            "max_position_embeddings": t.context_len,
            "hidden_act": "quick_gelu",
        },
        vision_config={
            "image_size": v.image_size, "patch_size": v.patch,
            "hidden_size": v.hidden, "intermediate_size": v.hidden * 4,
            "num_hidden_layers": v.layers, "num_attention_heads": v.heads,
            "hidden_act": "quick_gelu",
        },
        projection_dim=v.projection,
    )
    torch.manual_seed(0)
    hf = CLIPModel(hf_cfg).eval()
    sd = {k: w.detach().numpy() for k, w in hf.state_dict().items()}
    params, text_proj = vision_params_from_hf(sd, v)
    params = jax.tree.map(jnp.asarray, params)

    imgs = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(clip.apply_vision(params, jnp.asarray(imgs), v))
    with torch.no_grad():
        theirs = hf.get_image_features(
            pixel_values=torch.from_numpy(imgs).permute(0, 3, 1, 2)
        ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)
    assert text_proj.shape == (t.hidden, v.projection)


def test_text_embedding_matches_transformers(rng):
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    t = CLIPConfig(vocab_size=100, hidden=16, layers=2, heads=2, context_len=12)
    hf_cfg = CLIPTextConfig(
        vocab_size=t.vocab_size, hidden_size=t.hidden,
        intermediate_size=t.hidden * 4, num_hidden_layers=t.layers,
        num_attention_heads=t.heads, max_position_embeddings=t.context_len,
        hidden_act="quick_gelu", projection_dim=8,
        eos_token_id=99,
    )
    torch.manual_seed(1)
    hf = CLIPTextModelWithProjection(hf_cfg).eval()
    # reuse the text-weight copier from the models test
    from tests.test_models import _copy_clip_weights

    params = _copy_clip_weights(hf, t)
    text_proj = jnp.asarray(hf.text_projection.weight.detach().numpy().T)

    tokens = np.array([[5, 3, 7, 99, 99, 99, 99, 99, 99, 99, 99, 99],
                       [1, 2, 3, 4, 5, 99, 99, 99, 99, 99, 99, 99]], np.int32)
    ours = np.asarray(clip.text_embedding(
        params, jnp.asarray(tokens), text_proj, t, eot_id=99))
    with torch.no_grad():
        theirs = hf(torch.from_numpy(tokens.astype(np.int64))).text_embeds.numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_preprocess_images():
    imgs = np.full((1, 64, 64, 3), 128, np.uint8)
    x = np.asarray(preprocess_images(imgs, size=32))
    assert x.shape == (1, 32, 32, 3)
    expected = (128 / 255.0 - 0.48145466) / 0.26862954
    np.testing.assert_allclose(x[0, 0, 0, 0], expected, atol=1e-5)


def test_clip_scores_plumbing(rng):
    """Random towers: scores are finite, in [0, 100], batch-shaped."""
    from sdtpu.engine.context import DEMO_MERGES
    from sdtpu.tokenizer import Tokenizer

    tok = Tokenizer.from_merges(DEMO_MERGES)
    t_cfg = CLIPConfig(vocab_size=tok.vocab_size, hidden=16, layers=1,
                       heads=2, context_len=12)
    key = jax.random.PRNGKey(0)
    text_params = clip.init(key, t_cfg)
    vis_params = clip.init_vision(key, TINY_VISION)
    text_proj = jax.random.normal(key, (16, TINY_VISION.projection)) * 0.1
    imgs = (rng.random((2, 16, 16, 3)) * 255).astype(np.uint8)
    scores = clip_scores(
        imgs, ["a horse", "the photograph"], tok, text_params, text_proj,
        vis_params, t_cfg, TINY_VISION,
    )
    assert scores.shape == (2,)
    assert np.isfinite(scores).all()
    assert (scores >= 0).all() and (scores <= 100).all()
