"""Checkpoint mapping tests: LDM-layout state dict <-> sdtpu pytree.

The round-trip (params -> LDM names -> params) plus a forward-equality check
guarantees the mapping covers every parameter with correct transposes —
without needing the 4 GB real checkpoint in the test environment.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.config import TINY
from sdtpu.io.params import init_pipeline_params, param_count
from sdtpu.io.weights import (
    all_rules,
    load_ldm_state_dict,
    load_pipeline_params,
    params_to_ldm,
)


@pytest.fixture(scope="module")
def params():
    return jax.tree.map(
        np.asarray, init_pipeline_params(jax.random.PRNGKey(3), TINY, demo=True)
    )


def test_roundtrip_exact(params):
    sd = params_to_ldm(params, TINY)
    back = load_ldm_state_dict(sd, TINY)
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = {tuple(str(k) for k in p): v
              for p, v in jax.tree_util.tree_flatten_with_path(back)[0]}
    assert len(flat_a) == len(flat_b), "tree structure mismatch"
    for path, a in flat_a:
        key = tuple(str(k) for k in path)
        np.testing.assert_array_equal(a, flat_b[key], err_msg=str(key))


def test_ldm_key_names_look_like_sd(params):
    sd = params_to_ldm(params, TINY)
    keys = set(sd)
    # spot-check canonical SD v1.x names exist with the right shapes
    assert "model.diffusion_model.time_embed.0.weight" in keys
    assert "model.diffusion_model.input_blocks.0.0.weight" in keys
    assert "model.diffusion_model.middle_block.1.transformer_blocks.0.attn2.to_k.weight" in keys
    assert "model.diffusion_model.out.2.bias" in keys
    assert "cond_stage_model.transformer.text_model.encoder.layers.0.self_attn.q_proj.weight" in keys
    assert "first_stage_model.decoder.mid.attn_1.q.weight" in keys
    assert "first_stage_model.post_quant_conv.weight" in keys
    # torch conv layout [O, I, H, W]
    w = sd["model.diffusion_model.input_blocks.0.0.weight"]
    assert w.shape == (TINY.unet.model_channels, TINY.unet.in_channels, 3, 3)
    # torch linear layout [out, in]
    w = sd["model.diffusion_model.time_embed.0.weight"]
    assert w.shape == (TINY.unet.time_embed_dim, TINY.unet.model_channels)
    # attention q/k/v have no bias in SD
    assert "model.diffusion_model.middle_block.1.transformer_blocks.0.attn1.to_q.bias" not in keys


def test_rule_coverage_is_complete(params):
    """Every leaf of the pytree must be reachable from the rules — a missing
    rule would silently keep random init for that weight."""
    sd = params_to_ldm(params, TINY)
    n_leaves = param_count(params)
    n_mapped = sum(int(np.asarray(v).size) for v in sd.values())
    assert n_mapped == n_leaves


def test_forward_equality_after_roundtrip(params):
    from sdtpu.engine.pipeline import generate

    back = jax.tree.map(jnp.asarray, load_ldm_state_dict(
        params_to_ldm(params, TINY), TINY))
    tokens = jnp.arange(TINY.clip.context_len, dtype=jnp.int32)[None]
    uncond = jnp.zeros((TINY.clip.context_len, TINY.clip.hidden))
    key = jax.random.PRNGKey(0)
    a = generate(params, tokens, uncond, key, jnp.float32(7.5),
                 cfg=TINY, steps=2)
    b = generate(back, tokens, uncond, key, jnp.float32(7.5),
                 cfg=TINY, steps=2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_missing_keys_strict(params):
    sd = params_to_ldm(params, TINY)
    del sd["model.diffusion_model.out.2.weight"]
    with pytest.raises(KeyError):
        load_ldm_state_dict(sd, TINY)


def test_load_from_safetensors_file(params, tmp_path):
    import safetensors.numpy

    sd = params_to_ldm(params, TINY)
    f = tmp_path / "model.safetensors"
    safetensors.numpy.save_file(sd, str(f))
    loaded = load_pipeline_params(tmp_path, TINY)
    a = np.asarray(params["unet"]["conv_in"]["w"])
    np.testing.assert_array_equal(a, loaded["unet"]["conv_in"]["w"])


def test_openclip_text_roundtrip():
    """SD 2.x text-tower mapping: our tree -> OpenCLIP LDM keys (fused
    in_proj) -> tree, exact; and the full SD2-style state dict loads."""
    import dataclasses

    from sdtpu.config import CLIPConfig
    from sdtpu.io.weights import (
        load_ldm_state_dict,
        openclip_text_to_tree,
        tree_to_openclip_text,
    )
    from sdtpu.models import clip as clip_mod

    cfg2 = dataclasses.replace(
        TINY, clip=CLIPConfig(vocab_size=100, hidden=32, layers=2, heads=2,
                              context_len=16, act="gelu"))
    params = init_pipeline_params(jax.random.PRNGKey(5), cfg2)
    clip_np = jax.tree.map(np.asarray, params["clip"])
    sd_text = tree_to_openclip_text(clip_np, cfg2)
    assert "cond_stage_model.model.transformer.resblocks.0.attn.in_proj_weight" in sd_text
    back = openclip_text_to_tree(sd_text, cfg2)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(clip_np)[0],
        jax.tree_util.tree_flatten_with_path(back)[0],
    ):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))

    # full SD2-style checkpoint: openclip text + standard unet/vae keys
    sd_full = dict(sd_text)
    sd_full.update({k: v for k, v in params_to_ldm(
        jax.tree.map(np.asarray, params), cfg2).items()
        if not k.startswith("cond_stage_model.")})
    loaded = load_ldm_state_dict(sd_full, cfg2)
    a = clip_mod.apply(jax.tree.map(jnp.asarray, loaded["clip"]),
                       jnp.arange(16, dtype=jnp.int32)[None], cfg2.clip)
    b = clip_mod.apply(params["clip"],
                       jnp.arange(16, dtype=jnp.int32)[None], cfg2.clip)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
