"""kohya-ss LoRA interchange (sdtpu/io/kohya.py).

The community adapter format (kohya-ss/sd-scripts, consumed by
A1111/ComfyUI/diffusers) must load into the runtime adapter representation,
reach UNet AND text-encoder sites, round-trip through save, and serve
through the Context registry exactly like native .npz adapters."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdtpu.config import CONFIGS
from sdtpu.io.kohya import load_lora_kohya, save_lora_kohya, site_map


CFG = CONFIGS["tiny"]


def _tree_get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def test_site_map_wellformed():
    m = site_map(CFG)
    # every adapter-capable site class is present
    names = set(m)
    assert any("attn1_to_q" in n for n in names)
    assert any("ff_net_0_proj" in n for n in names)
    assert any(n.endswith("proj_in") for n in names)
    assert "lora_te_text_model_encoder_layers_0_self_attn_q_proj" in names
    # single tower: the numbered alias points at the same site
    assert (m["lora_te1_text_model_encoder_layers_0_self_attn_q_proj"]
            == m["lora_te_text_model_encoder_layers_0_self_attn_q_proj"])
    # paths are distinct per unet name (aliases aside)
    unet_paths = [p for n, (p, _) in m.items() if n.startswith("lora_unet_")]
    assert len(unet_paths) == len(set(unet_paths))


def test_xl_site_map_two_towers():
    m = site_map(CONFIGS["tiny_xl"])
    assert "lora_te1_text_model_encoder_layers_0_self_attn_q_proj" in m
    assert "lora_te2_text_model_encoder_layers_0_self_attn_k_proj" in m
    p1, _ = m["lora_te1_text_model_encoder_layers_0_mlp_fc1"]
    p2, _ = m["lora_te2_text_model_encoder_layers_0_mlp_fc1"]
    assert p1[0] == "clip" and p2[0] == "clip2"
    # the unnumbered alias resolves to tower 1
    pa, _ = m["lora_te_text_model_encoder_layers_0_mlp_fc1"]
    assert pa == p1


@pytest.fixture(scope="module")
def ctx():
    import sdtpu

    return sdtpu.Context(config="tiny", steps=2)


def _kohya_entry(rng, name, kind, w_shape, rank=2, alpha=4.0, zero_up=False):
    """Random kohya-layout tensors for a site whose native kernel has
    `w_shape` ([in, out] linear, HWIO conv)."""
    out = {}
    if kind == "linear":
        d_in, d_out = w_shape
        out[name + ".lora_down.weight"] = rng.normal(
            size=(rank, d_in)).astype(np.float32)
        up = rng.normal(size=(d_out, rank)).astype(np.float32)
    else:
        kh, kw, d_in, d_out = w_shape
        out[name + ".lora_down.weight"] = rng.normal(
            size=(rank, d_in, kh, kw)).astype(np.float32)
        up = rng.normal(size=(d_out, rank, 1, 1)).astype(np.float32)
    out[name + ".lora_up.weight"] = np.zeros_like(up) if zero_up else up
    out[name + ".alpha"] = np.asarray(alpha, np.float32)
    return out


def test_linear_site_math(ctx):
    """Loaded adapter applied through layers.dense == y + x @ down.T @ up.T
    * alpha/r, on both a UNet and a text-encoder site."""
    from sdtpu.models.layers import dense
    from sdtpu.train.lora import apply_lora

    m = site_map(CFG)
    rng = np.random.default_rng(0)
    te_name = "lora_te_text_model_encoder_layers_0_self_attn_q_proj"
    un_name = next(n for n in sorted(m) if n.endswith("attn1_to_q"))
    tensors = {}
    for name in (te_name, un_name):
        path, kind = m[name]
        w = np.asarray(_tree_get(ctx.params, path)["w"], np.float32)
        tensors.update(_kohya_entry(rng, name, kind, w.shape))

    overlay = load_lora_kohya(tensors, CFG)
    assert set(overlay) == {"unet", "clip"}

    for name in (te_name, un_name):
        path, _ = m[name]
        tower = path[0]
        patched = apply_lora(ctx.params[tower], overlay[tower])
        site = _tree_get(patched, path[1:])
        base = _tree_get(ctx.params[tower], path[1:])
        d_in = np.asarray(base["w"]).shape[0]
        x = jnp.asarray(rng.normal(size=(3, d_in)).astype(np.float32))
        got = dense(site, x)
        down = tensors[name + ".lora_down.weight"]
        up = tensors[name + ".lora_up.weight"]
        want = np.asarray(dense(base, x), np.float32) + (
            np.asarray(x) @ down.T @ up.T) * (4.0 / 2)
        np.testing.assert_allclose(np.asarray(got, np.float32), want,
                                   atol=1e-4, rtol=1e-4)


def test_conv_site_runtime_equals_merge(ctx):
    """proj_in (1x1 conv) adapter: the runtime conv2d lora path and the
    merge_lora weight fold must agree."""
    from sdtpu.models.layers import conv2d
    from sdtpu.train.lora import apply_lora, merge_lora

    m = site_map(CFG)
    name = next(n for n in sorted(m) if n.endswith("proj_in"))
    path, kind = m[name]
    assert kind == "conv"
    w = np.asarray(_tree_get(ctx.params, path)["w"], np.float32)
    rng = np.random.default_rng(1)
    tensors = _kohya_entry(rng, name, kind, w.shape, rank=3, alpha=1.5)
    overlay = load_lora_kohya(tensors, CFG)

    patched = apply_lora(ctx.params["unet"], overlay["unet"])
    site = _tree_get(patched, path[1:])
    merged_site = _tree_get(merge_lora(patched), path[1:])
    assert "lora_a" not in merged_site

    c_in = w.shape[2]
    x = jnp.asarray(rng.normal(size=(2, 4, 4, c_in)).astype(np.float32))
    y_rt = conv2d(site, x, padding=0)
    y_merged = conv2d(merged_site, x, padding=0)
    np.testing.assert_allclose(np.asarray(y_rt), np.asarray(y_merged),
                               atol=1e-4, rtol=1e-4)
    # and the adapter actually changes the output
    y_base = conv2d(_tree_get(ctx.params, path), x, padding=0)
    assert not np.allclose(np.asarray(y_rt), np.asarray(y_base))


def test_save_load_roundtrip(tmp_path, ctx):
    m = site_map(CFG)
    rng = np.random.default_rng(2)
    tensors = {}
    for name in ["lora_te_text_model_encoder_layers_1_mlp_fc2",
                 next(n for n in sorted(m) if n.endswith("attn2_to_v")),
                 next(n for n in sorted(m) if n.endswith("proj_out"))]:
        path, kind = m[name]
        w = np.asarray(_tree_get(ctx.params, path)["w"], np.float32)
        tensors.update(_kohya_entry(rng, name, kind, w.shape, rank=2,
                                    alpha=2.0))

    overlay = load_lora_kohya(tensors, CFG)
    p = tmp_path / "adapter.safetensors"
    save_lora_kohya(overlay, CFG, p)
    again = load_lora_kohya(p, CFG)

    fa, ta = jax.tree.flatten(overlay)
    fb, tb = jax.tree.flatten(again)
    assert ta == tb
    for a, b in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_strict_rejects_foreign_keys():
    with pytest.raises(ValueError, match="do not map"):
        load_lora_kohya(
            {"lora_unet_nonexistent_module.lora_down.weight":
             np.zeros((2, 4), np.float32),
             "lora_unet_nonexistent_module.lora_up.weight":
             np.zeros((4, 2), np.float32)}, CFG)
    # non-strict: ignored
    out = load_lora_kohya(
        {"lora_unet_nonexistent_module.lora_down.weight":
         np.zeros((2, 4), np.float32),
         "lora_unet_nonexistent_module.lora_up.weight":
         np.zeros((4, 2), np.float32)}, CFG, strict=False)
    assert out == {}


def test_context_kohya_serving(tmp_path):
    """A kohya .safetensors adapter served through the Context registry:
    zero-up adapters are bit-exact with the base; a text-encoder adapter
    with nonzero up changes the image (proving TE sites reach the compiled
    program)."""
    import sdtpu

    base = sdtpu.Context(config="tiny", steps=2)
    m = site_map(CFG)
    rng = np.random.default_rng(3)

    te_name = "lora_te_text_model_encoder_layers_0_self_attn_v_proj"
    un_name = next(n for n in sorted(m) if n.endswith("attn1_to_q"))
    zero, hot = {}, {}
    for name, zero_up in ((te_name, False), (un_name, False)):
        path, kind = m[name]
        w = np.asarray(_tree_get(base.params, path)["w"], np.float32)
        zero.update(_kohya_entry(rng, name, kind, w.shape, zero_up=True))
        hot.update(_kohya_entry(rng, name, kind, w.shape, zero_up=False))

    from safetensors.numpy import save_file

    save_file(zero, str(tmp_path / "zero.safetensors"))
    save_file(hot, str(tmp_path / "hot.safetensors"))

    base.load_lora("zero", tmp_path / "zero.safetensors")
    base.load_lora("hot", tmp_path / "hot.safetensors")
    assert base.lora_names() == ["hot", "zero"]

    ref = base.generate("kohya probe", seed=5)
    z = base.generate("kohya probe", seed=5, lora="zero")
    h = base.generate("kohya probe", seed=5, lora="hot")
    np.testing.assert_array_equal(ref, z)
    assert not np.array_equal(ref, h)
