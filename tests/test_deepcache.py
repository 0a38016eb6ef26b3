"""DeepCache (models/unet.apply `deep`; engine/pipeline.denoise via
cfg.deepcache_interval; Context(deepcache=N)).

Ma et al. 2023 (arXiv:2312.00858): the deep UNet features change slowly
across adjacent denoising steps — run the full UNet every N steps, cache
the branch-0 junction feature, and on the other steps recompute only the
shallow level-0 blocks around the spliced cache. Latency knob over the
reference's fixed per-step graph (reference: context.cpp:341-382).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import sdtpu
from sdtpu.config import CONFIGS
from sdtpu.engine.errors import SdtpuError
from sdtpu.models import unet


CFG = CONFIGS["tiny"]


def _io(key, b=2):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    x = jax.random.normal(ks[0], (b, 8, 8, 4), jnp.float32)
    te = jax.random.normal(ks[1], (b, CFG.unet.time_embed_dim), jnp.float32)
    ctx = jax.random.normal(ks[2], (b, 7, CFG.unet.context_dim), jnp.float32)
    return x, te, ctx


def test_capture_matches_plain():
    """deep='capture' returns the plain forward's eps plus the junction."""
    p = sdtpu.Context(config="tiny", steps=2).params["unet"]
    x, te, ctx = _io(0)
    plain = unet.apply(p, x, te, ctx, CFG.unet)
    eps, cache = unet.apply(p, x, te, ctx, CFG.unet, deep="capture")
    np.testing.assert_allclose(np.asarray(plain), np.asarray(eps),
                               atol=1e-6, rtol=1e-6)
    assert cache.shape[0] == x.shape[0] and cache.ndim == 4


def test_shallow_with_true_cache_is_exact():
    """A shallow pass spliced with the SAME input's true junction feature
    recomputes the identical graph — the paper's zero-drift anchor case."""
    p = sdtpu.Context(config="tiny", steps=2).params["unet"]
    x, te, ctx = _io(1)
    full, cache = unet.apply(p, x, te, ctx, CFG.unet, deep="capture")
    shallow = unet.apply(p, x, te, ctx, CFG.unet, deep=cache)
    np.testing.assert_allclose(np.asarray(full), np.asarray(shallow),
                               atol=1e-5, rtol=1e-5)


def test_shallow_ignores_deep_param_changes():
    """The shallow pass must not touch the deep stack: zeroing the mid
    block's weights changes the full output but not the shallow one."""
    p = sdtpu.Context(config="tiny", steps=2).params["unet"]
    x, te, ctx = _io(2)
    _, cache = unet.apply(p, x, te, ctx, CFG.unet, deep="capture")
    broken = dict(p)
    broken["mid"] = jax.tree_util.tree_map(jnp.zeros_like, p["mid"])
    a = unet.apply(p, x, te, ctx, CFG.unet, deep=cache)
    b = unet.apply(broken, x, te, ctx, CFG.unet, deep=cache)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(
        np.asarray(unet.apply(p, x, te, ctx, CFG.unet)),
        np.asarray(unet.apply(broken, x, te, ctx, CFG.unet)))


def test_validation():
    with pytest.raises(SdtpuError):
        sdtpu.Context(config="tiny", steps=2, deepcache=1)
    with pytest.raises(ValueError):
        unet.apply(None, None, None, None, CFG.unet, deep="bogus")


def test_e2e_deterministic_and_distinct():
    base = sdtpu.Context(config="tiny", steps=4)
    ctx = sdtpu.Context(config="tiny", steps=4, deepcache=2)
    a = ctx.generate("the horse", seed=5)
    np.testing.assert_array_equal(a, ctx.generate("the horse", seed=5))
    assert not np.array_equal(a, base.generate("the horse", seed=5))


def test_incompatible_combos_raise():
    ctx2 = sdtpu.Context(config="tiny", steps=4, deepcache=2)
    with pytest.raises(ValueError, match="PAG"):
        ctx2.generate("the horse", seed=1, pag_scale=2.0)


def test_composes_with_cfg_interval():
    """DeepCache + guidance interval: per-segment caches (the eval batch
    differs between guided/unguided segments), each segment re-anchored
    with a full eval on its first step."""
    ctx = sdtpu.Context(config="tiny", steps=6, deepcache=2,
                        cfg_interval=(0.2, 0.7))
    a = ctx.generate("the horse", seed=1)
    np.testing.assert_array_equal(a, ctx.generate("the horse", seed=1))
    plain = sdtpu.Context(config="tiny", steps=6,
                          cfg_interval=(0.2, 0.7)).generate(
        "the horse", seed=1)
    assert not np.array_equal(a, plain)


def test_img2img_and_batch():
    ctx = sdtpu.Context(config="tiny", steps=4, deepcache=2)
    img = np.random.default_rng(0).integers(
        0, 255, (16, 16, 3), np.uint8)
    a = ctx.img2img("the horse", img, strength=0.6, seed=3)
    np.testing.assert_array_equal(
        a, ctx.img2img("the horse", img, strength=0.6, seed=3))
    outs = ctx.generate_batch([
        {"prompt": "the horse", "guidance": 7.5, "seed": 5},
        {"prompt": "a photograph", "guidance": 7.5, "seed": 6},
    ])
    np.testing.assert_array_equal(
        outs[0], ctx.generate("the horse", seed=5, guidance=7.5))


def test_on_mesh_matches_single_device():
    ctx1 = sdtpu.Context(config="tiny", steps=4, deepcache=2)
    ctx8 = sdtpu.Context(config="tiny", steps=4, deepcache=2, mesh=(2, 4))
    prompts = ["the horse", "a photograph"]
    a = ctx1.generate(prompts, seed=9)
    b = ctx8.generate(prompts, seed=9)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1
