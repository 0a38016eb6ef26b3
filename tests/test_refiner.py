"""SDXL-refiner + two-stage pipeline tests (TINY/TINY_XL/TINY_XL_REF, CPU).

The refiner config drops the CLIP-L tower (tower 2 alone is the context),
swaps the 6-microcond txt2img fourier block for the 5-microcond
(size/crop/aesthetic) one, and consumes the base stage's latents mid-way
through the noise schedule (Context.generate(denoising_end, output="latent")
-> Context.refine(denoising_start)). Capability extension beyond the
reference's SD1.x scope (reference: README.md:108-113).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sdtpu
from sdtpu.config import TINY_XL, TINY_XL_REF
from sdtpu.engine import pipeline as pl
from sdtpu.io.params import init_pipeline_params


@pytest.fixture(scope="module")
def params():
    return init_pipeline_params(jax.random.PRNGKey(0), TINY_XL_REF)


def test_refiner_param_tree_has_no_tower1(params):
    assert "clip" not in params
    assert "clip2" in params and "add_mlp" in params
    # adm input: projection 16 + 5 fourier blocks x 8 dims
    assert params["add_mlp"]["fc0"]["w"].shape[0] == 56
    # no attention at level 0; depth-2 st at level 1 AND in mid (mid takes
    # the deepest ATTENTION level's depth, not the last channel level's)
    l0, l1 = params["unet"]["down"]
    assert all("st" not in b for b in l0["blocks"])
    assert all(len(b["st"]["blocks"]) == 2 for b in l1["blocks"])
    assert len(params["unet"]["mid"]["st"]["blocks"]) == 2


def test_refiner_encode_text_single_tower(params):
    tokens = jnp.asarray([[1, 5, 7, 535] + [0] * 12], jnp.int32)
    packed = pl.encode_text(params, tokens, TINY_XL_REF)
    t = TINY_XL_REF.clip.context_len
    assert packed.shape == (1, t + 1, TINY_XL_REF.unet.context_dim)
    ctx, pooled = pl._unpack_context(packed, TINY_XL_REF)
    # tower 2's hidden IS the context (no concat)
    from sdtpu.models import clip as clip_mod

    h2, p2 = clip_mod.apply_xl(params["clip2"], tokens, TINY_XL_REF.clip2,
                               TINY_XL_REF.clip2.vocab_size - 1)
    np.testing.assert_allclose(np.asarray(ctx), np.asarray(h2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(p2), atol=1e-6)


def test_refiner_micro_features_five_blocks():
    from sdtpu.models import temb

    f = temb.micro_features(TINY_XL_REF, 8)
    assert f.shape == (5 * 8,)
    f_base = temb.micro_features(TINY_XL, 8)
    assert f_base.shape == (6 * 8,)


def test_refiner_context_generates_standalone():
    ctx = sdtpu.Context(config="tiny_xl_ref", steps=3)
    img = ctx.generate("the horse", seed=1)
    assert img.shape == (ctx.cfg.image_size, ctx.cfg.image_size, 3)
    assert img.std() > 0


def test_refine_from_pure_noise_equals_generate():
    """refine(noise, denoising_start=0) must reproduce generate() exactly —
    the handoff protocol's anchor: latents are the scan's x representation
    (scale-factored latent space) and the timeline indexing matches."""
    ctx = sdtpu.Context(config="tiny", steps=4)
    want = ctx.generate("the horse", seed=9)
    shape = (1, ctx.cfg.latent_size, ctx.cfg.latent_size,
             ctx.cfg.latent_channels)
    noise = jax.random.normal(jax.random.PRNGKey(9), shape, jnp.float32)
    got = ctx.refine(noise[0], "the horse", seed=9, denoising_start=0.0)
    np.testing.assert_array_equal(want, got)


def test_split_trajectory_equals_full_for_stateless_sampler():
    """With a stateless sampler (euler), generate(denoising_end=f) +
    refine(denoising_start=f) must be bit-identical to the unsplit run —
    the scan split point cannot perturb anything."""
    ctx = sdtpu.Context(config="tiny", steps=4, sampler="euler")
    full = ctx.generate("the horse", seed=3)
    lat = ctx.generate("the horse", seed=3, denoising_end=0.5,
                       output="latent")
    assert lat.dtype == np.float32
    assert lat.shape == (ctx.cfg.latent_size, ctx.cfg.latent_size,
                         ctx.cfg.latent_channels)
    stitched = ctx.refine(lat, "the horse", seed=3, denoising_start=0.5)
    np.testing.assert_array_equal(full, stitched)


def test_split_trajectory_close_for_multistep_sampler():
    """DPM-2M restarts its multistep history at the split, so the stitched
    image is not bit-identical — but it must stay close (the refiner
    handoff in practice)."""
    ctx = sdtpu.Context(config="tiny", steps=4, sampler="dpm")
    full = ctx.generate("the horse", seed=3).astype(np.int32)
    lat = ctx.generate("the horse", seed=3, denoising_end=0.5,
                       output="latent")
    stitched = ctx.refine(lat, "the horse", seed=3,
                          denoising_start=0.5).astype(np.int32)
    assert np.abs(full - stitched).mean() < 8.0


def test_xl_base_to_refiner_handoff():
    base = sdtpu.Context(config="tiny_xl", steps=4)
    ref = sdtpu.Context(config="tiny_xl_ref", steps=4)
    lat = base.generate("the horse", seed=2, denoising_end=0.5,
                        output="latent")
    img = ref.refine(lat, "the horse", seed=2, denoising_start=0.5)
    assert img.shape == (ref.cfg.image_size, ref.cfg.image_size, 3)
    assert np.isfinite(img.astype(np.float64)).all() and img.std() > 0
    # deterministic
    img2 = ref.refine(lat, "the horse", seed=2, denoising_start=0.5)
    np.testing.assert_array_equal(img, img2)


def test_refiner_ldm_roundtrip(params):
    """params -> refiner LDM naming (conditioner.embedders.0.model = bigG,
    no CLIP-L keys) -> params must be exact."""
    from sdtpu.io.weights import load_ldm_state_dict, params_to_ldm

    np_params = jax.tree.map(np.asarray, params)
    sd = params_to_ldm(np_params, TINY_XL_REF)
    assert any(k.startswith("conditioner.embedders.0.model.") for k in sd)
    assert not any(k.startswith("conditioner.embedders.1.") for k in sd)
    assert not any("text_model" in k for k in sd)
    assert "model.diffusion_model.label_emb.0.0.weight" in sd
    back = load_ldm_state_dict(sd, TINY_XL_REF, strict=False)
    assert "clip" not in back
    for key in ("unet", "clip2", "add_mlp", "temb", "vae"):
        a, tdef_a = jax.tree_util.tree_flatten(np_params[key])
        b, tdef_b = jax.tree_util.tree_flatten(
            jax.tree.map(np.asarray, back[key]))
        assert tdef_a == tdef_b, key
        for x, y in zip(a, b):
            np.testing.assert_allclose(x, y, atol=1e-6)


def test_refine_argument_validation():
    from sdtpu.engine.errors import SdtpuError

    ctx = sdtpu.Context(config="tiny", steps=2)
    lat = np.zeros((ctx.cfg.latent_size, ctx.cfg.latent_size,
                    ctx.cfg.latent_channels), np.float32)
    with pytest.raises(SdtpuError):
        ctx.refine(lat, "x", denoising_start=1.0)
    with pytest.raises(SdtpuError):
        ctx.refine(np.zeros((2, 2, 4), np.float32), "x")
    with pytest.raises(SdtpuError):
        ctx.generate("x", denoising_end=0.0)
    with pytest.raises(SdtpuError):
        ctx.generate("x", output="bogus")
