"""SDXL-family tests (TINY_XL config, CPU backend).

Covers the XL-specific machinery the SD1.x/2.x suites cannot reach:
dual-text-tower packed conditioning (engine.pipeline.encode_text),
penultimate-tap + pooled projection (models.clip.apply_xl), per-level
transformer depth (models.unet), the additive pooled/microcond MLP
(models.temb.init_add/apply_vec), and the end-to-end Context paths.
Capability extension beyond the reference's SD1.x/2.x scope
(reference: README.md:108-113 converts SD v1.5/v2.1 graphs only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sdtpu
from sdtpu.config import TINY_XL
from sdtpu.engine import pipeline as pl
from sdtpu.io.params import init_pipeline_params
from sdtpu.models import clip, temb, unet


@pytest.fixture(scope="module")
def params():
    return init_pipeline_params(jax.random.PRNGKey(0), TINY_XL)


def test_param_tree_has_xl_leaves(params):
    assert "clip2" in params and "add_mlp" in params
    assert "text_proj" in params["clip2"]
    assert params["clip2"]["text_proj"].shape == (
        TINY_XL.clip2.hidden, TINY_XL.clip2.projection)
    # level-1 spatial transformers carry depth-2 nested blocks; the XL
    # level list has no st at level 0 (attn_levels=(1,))
    l0, l1 = params["unet"]["down"]
    assert all("st" not in b for b in l0["blocks"])
    assert all(len(b["st"]["blocks"]) == 2 for b in l1["blocks"])
    assert len(params["unet"]["mid"]["st"]["blocks"]) == 2


def test_encode_text_packs_pooled_row(params):
    tokens = jnp.asarray([[1, 5, 7, 535] + [0] * 12,
                          [2, 6, 535, 0] + [0] * 12], jnp.int32)
    packed = pl.encode_text(params, tokens, TINY_XL)
    t = TINY_XL.clip.context_len
    d = TINY_XL.unet.context_dim
    assert packed.shape == (2, t + 1, d)
    ctx, pooled = pl._unpack_context(packed, TINY_XL)
    assert ctx.shape == (2, t, d)
    assert pooled.shape == (2, TINY_XL.clip2.projection)
    # the packed row zero-pads past the projection width
    pad = packed[:, -1, TINY_XL.clip2.projection:]
    np.testing.assert_array_equal(np.asarray(pad), 0.0)
    # and the context rows are the two towers' hidden states concatenated
    h1, _ = clip.apply_xl(params["clip"], tokens, TINY_XL.clip,
                          TINY_XL.clip.vocab_size - 1)
    assert np.allclose(np.asarray(ctx[..., : TINY_XL.clip.hidden]),
                       np.asarray(h1), atol=1e-6)


def test_apply_xl_taps_penultimate_without_final_ln(params):
    """The hidden tap must be the raw penultimate-block output: recompute
    it with a truncated tower and compare; and it must differ from the
    final-LN'd full-stack output (the SD1.x tap)."""
    tokens = jnp.asarray([[3, 9, 535] + [0] * 13], jnp.int32)
    cfg2 = TINY_XL.clip2
    hidden, pooled = clip.apply_xl(params["clip2"], tokens, cfg2,
                                   cfg2.vocab_size - 1)
    trunc = dict(params["clip2"])
    trunc["blocks"] = params["clip2"]["blocks"][:-1]
    import dataclasses

    # full-stack-minus-one WITH final ln (what SD2-style tapping would do)
    lncfg = dataclasses.replace(cfg2, layers=cfg2.layers - 1)
    ln_version = clip.apply(trunc, tokens, lncfg)
    assert not np.allclose(np.asarray(hidden), np.asarray(ln_version),
                           atol=1e-4)
    # pooled: projected, correct width, depends on the eot position
    assert pooled.shape == (1, cfg2.projection)
    tokens2 = jnp.asarray([[3, 9, 1, 535] + [0] * 12], jnp.int32)
    _, pooled2 = clip.apply_xl(params["clip2"], tokens2, cfg2,
                               cfg2.vocab_size - 1)
    assert not np.allclose(np.asarray(pooled), np.asarray(pooled2),
                           atol=1e-5)


def test_add_embedding_conditions_the_unet(params):
    """Zeroing the add-MLP must change the denoised output — proves the
    pooled/microcond path reaches the UNet's time conditioning."""
    tokens = jnp.asarray([[1, 2, 535] + [0] * 13], jnp.int32)
    packed = pl.encode_text(params, tokens, TINY_XL)
    uncond = packed[0]  # reuse as a stand-in uncond with the right shape
    key = jax.random.PRNGKey(0)

    def run(p):
        return pl.generate(p, tokens, uncond, key, 7.5, cfg=TINY_XL,
                           sampler="dpm", steps=2)

    img = run(params)
    z = dict(params)
    z["add_mlp"] = jax.tree.map(jnp.zeros_like, params["add_mlp"])
    img_z = run(z)
    assert img.shape == (1, TINY_XL.image_size, TINY_XL.image_size, 3)
    assert not np.array_equal(np.asarray(img), np.asarray(img_z))


def test_micro_features_static_and_sized():
    fdim = (TINY_XL.unet.adm_in_channels - TINY_XL.clip2.projection) // 6
    m = temb.micro_features(TINY_XL, fdim)
    assert m.shape == (6 * fdim,)
    assert TINY_XL.clip2.projection + m.shape[0] == \
        TINY_XL.unet.adm_in_channels


def test_xl_unet_matches_torch_golden(params):
    """Full TINY_XL UNet (depth-2 transformers, attn-free level 0) against
    the independent torch assembly (tests/test_unet_full_torch.py)."""
    torch = pytest.importorskip("torch")
    from tests.test_unet_full_torch import UNetT

    cfg = TINY_XL.unet
    np_params = jax.tree.map(np.asarray, params["unet"])
    tm = UNetT(np_params, cfg).eval()
    rng = np.random.default_rng(0)
    s = TINY_XL.latent_size
    x = rng.standard_normal((2, s, s, cfg.in_channels)).astype(np.float32)
    emb = rng.standard_normal((2, cfg.time_embed_dim)).astype(np.float32)
    ctx = rng.standard_normal(
        (2, TINY_XL.clip.context_len, cfg.context_dim)).astype(np.float32)
    ours = np.asarray(unet.apply(params["unet"], jnp.asarray(x),
                                 jnp.asarray(emb), jnp.asarray(ctx), cfg))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x).permute(0, 3, 1, 2),
                    torch.from_numpy(emb), torch.from_numpy(ctx)
                    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-4)


@pytest.fixture(scope="module")
def ctx():
    return sdtpu.Context(config="tiny_xl", steps=4)


def test_context_generate_deterministic(ctx):
    a = ctx.generate("a photograph of an astronaut", guidance=7.5, seed=3)
    b = ctx.generate("a photograph of an astronaut", guidance=7.5, seed=3)
    assert a.shape == (TINY_XL.image_size, TINY_XL.image_size, 3)
    assert a.dtype == np.uint8 and a.std() > 1.0
    np.testing.assert_array_equal(a, b)
    c = ctx.generate("a photograph of an astronaut", guidance=7.5, seed=4)
    assert not np.array_equal(a, c)


def test_context_batch1_bit_identical_to_single(ctx):
    single = ctx.generate("a cat", guidance=7.5, seed=11)
    batched = ctx.generate_batch(
        [{"prompt": "a cat", "guidance": 7.5, "seed": 11}])
    np.testing.assert_array_equal(single, np.asarray(batched)[0])


def test_context_batch_negative_prompt(ctx):
    outs = ctx.generate_batch([
        {"prompt": "a cat", "seed": 1},
        {"prompt": "a dog", "seed": 2, "negative_prompt": "blurry"},
    ])
    arr = np.asarray(outs)
    assert arr.shape == (2, TINY_XL.image_size, TINY_XL.image_size, 3)


def test_xl_train_loss_finite_and_grads_flow(params):
    from sdtpu.train.step import ldm_loss

    frozen = {k: v for k, v in params.items() if k != "unet"}
    b, s = 2, TINY_XL.latent_size
    rng = np.random.default_rng(0)
    batch = {
        "latents": jnp.asarray(
            rng.standard_normal((b, s, s, 4)).astype(np.float32)),
        "tokens": jnp.asarray([[1, 2, 535] + [0] * 13] * b, jnp.int32),
    }
    loss, grads = jax.value_and_grad(ldm_loss)(
        params["unet"], frozen, batch, jax.random.PRNGKey(0), TINY_XL)
    assert np.isfinite(float(loss))
    gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g))
                         for g in jax.tree.leaves(grads)))
    assert float(gnorm) > 0.0


def test_xl_ldm_roundtrip(params):
    """params -> SDXL LDM naming (conditioner.embedders.*, label_emb,
    transformer_blocks.{d}) -> params must be exact; proves the converter
    map covers the full XL tree (io/weights XL branches)."""
    from sdtpu.io.weights import load_ldm_state_dict, params_to_ldm

    np_params = jax.tree.map(np.asarray, params)
    sd = params_to_ldm(np_params, TINY_XL)
    assert any(k.startswith("conditioner.embedders.0.") for k in sd)
    assert any(k.startswith("conditioner.embedders.1.") for k in sd)
    assert "model.diffusion_model.label_emb.0.0.weight" in sd
    assert any("transformer_blocks.1." in k for k in sd)
    back = load_ldm_state_dict(sd, TINY_XL, strict=False)
    for key in ("unet", "clip", "clip2", "add_mlp", "temb", "vae"):
        ours = jax.tree.map(np.asarray, np_params[key])
        theirs = back[key]
        flat_a = {p: l for p, l in _flat(ours)}
        flat_b = {p: l for p, l in _flat(theirs)}
        missing = set(flat_a) - set(flat_b)
        assert not missing, (key, sorted(missing)[:5])
        for p, a in flat_a.items():
            np.testing.assert_allclose(a, flat_b[p], atol=1e-6,
                                       err_msg=f"{key}:{p}")


def _flat(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flat(v, f"{prefix}/{k}")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _flat(v, f"{prefix}/{i}")
    else:
        yield prefix, np.asarray(tree)
