"""Perturbed-attention guidance (engine/pipeline.denoise pag_scale/
pag_layers; models/unet.apply perturb).

PAG (Ahn et al. 2024) runs one extra cond-slot UNet eval per step with
self-attention replaced by the IDENTITY map in selected sections, and
steers eps away from that structure-blind prediction. Quality knob in the
A1111/ComfyUI/diffusers ecosystem; capability extension over the
reference (txt2img with plain CFG only, reference: context.cpp:341-382).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import sdtpu
from sdtpu.config import CONFIGS
from sdtpu.engine.errors import SdtpuError
from sdtpu.models import unet
from sdtpu.models.layers import dense, geglu, layer_norm


CFG = CONFIGS["tiny"]


def test_identity_attention_oracle_single_token():
    """Over a single spatial token, softmax self-attention IS the identity
    map — so the perturbed transformer must equal the unperturbed one."""
    p = unet._init_transformer(jax.random.PRNGKey(0), 32, CFG.unet.context_dim,
                               zero_init_outs=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 1, 32), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (2, 7, CFG.unet.context_dim), jnp.float32)
    a = unet._transformer(p, x, ctx, 4, 8, "xla", perturb_self=False)
    b = unet._transformer(p, x, ctx, 4, 8, "xla", perturb_self=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)


def test_identity_attention_oracle_manual():
    """Multi-token perturbed block == a hand-computed identity-attn
    residual (out-proj of the raw value rows) followed by the shared
    cross-attn/ff tail."""
    p = unet._init_basic(jax.random.PRNGKey(3), 32, CFG.unet.context_dim)
    h = jax.random.normal(jax.random.PRNGKey(4), (2, 9, 32), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(5),
                            (2, 7, CFG.unet.context_dim), jnp.float32)
    got = unet._basic_block(p, h, ctx, 4, "xla", perturb_self=True)

    hn = layer_norm(p["ln1"], h)
    want = h + dense(p["attn1"]["out"], dense(p["attn1"]["v"], hn))
    # cross-attn + ff tail is unperturbed — reuse the real block with the
    # self-attn residual pre-applied by zeroing its contribution:
    tail_in = want
    a2 = p["attn2"]
    hn2 = layer_norm(p["ln2"], tail_in)
    from sdtpu.models.layers import sdpa

    want = tail_in + dense(a2["out"], sdpa(
        dense(a2["q"], hn2), dense(a2["k"], ctx), dense(a2["v"], ctx),
        4, "xla"))
    hn3 = layer_norm(p["ln3"], want)
    want = want + dense(p["ff2"], geglu(p["ff1"], hn3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_unet_perturb_validation():
    ctx = sdtpu.Context(config="tiny", steps=2)
    with pytest.raises(ValueError, match="perturb"):
        unet.apply(ctx.params["unet"],
                   jnp.zeros((1, 16, 16, 4), jnp.float32),
                   jnp.zeros((1, CFG.unet.time_embed_dim), jnp.float32),
                   jnp.zeros((1, 7, CFG.unet.context_dim), jnp.float32),
                   CFG.unet, perturb=("bogus",))


def test_pag_zero_scale_is_exact_noop_and_nonzero_acts():
    """The PAG program at scale 0.0 reproduces the PAG-free program
    bit-exactly (eps + 0*(delta)); a nonzero scale changes the image and
    stays deterministic."""
    ctx = sdtpu.Context(config="tiny", steps=3)
    base = ctx.generate("the horse", seed=6)
    zero = ctx.generate("the horse", seed=6, pag_scale=0.0)
    np.testing.assert_array_equal(base, zero)
    a = ctx.generate("the horse", seed=6, pag_scale=3.0)
    b = ctx.generate("the horse", seed=6, pag_scale=3.0)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, base)
    # traced scale: a different value reuses the program and differs
    c = ctx.generate("the horse", seed=6, pag_scale=9.0)
    assert not np.array_equal(c, a)


def test_pag_without_cfg():
    """guidance == 1 disables CFG but PAG still applies (independent
    guidance signals)."""
    ctx = sdtpu.Context(config="tiny", steps=3)
    base = ctx.generate("the horse", guidance=1.0, seed=2)
    a = ctx.generate("the horse", guidance=1.0, seed=2, pag_scale=2.0)
    assert not np.array_equal(a, base)


def test_pag_batch_per_sample_routing():
    """Per-sample pag_scale in generate_batch: a 0-scale batch-mate stays
    bit-identical to the PAG-free batch; the asking sample changes; and
    batch-of-1 reproduces the single path bit-for-bit."""
    ctx = sdtpu.Context(config="tiny", steps=3)
    r0 = {"prompt": "the horse", "guidance": 7.5, "seed": 11}
    r1 = {"prompt": "a photograph", "guidance": 7.5, "seed": 12}
    plain = ctx.generate_batch([dict(r0), dict(r1)])
    mixed = ctx.generate_batch([dict(r0), dict(r1, pag_scale=4.0)])
    np.testing.assert_array_equal(plain[0], mixed[0])
    assert not np.array_equal(plain[1], mixed[1])
    single = ctx.generate("a photograph", seed=12, pag_scale=4.0)
    b1 = ctx.generate_batch([dict(r1, pag_scale=4.0)])[0]
    np.testing.assert_array_equal(single, b1)


def test_pag_layers_validation_and_sections():
    with pytest.raises(SdtpuError):
        sdtpu.Context(config="tiny", steps=2, pag_layers=("bogus",))
    with pytest.raises(SdtpuError):
        sdtpu.Context(config="tiny", steps=2, pag_layers=())
    # a different section set is a different perturbation
    mid = sdtpu.Context(config="tiny", steps=3)
    all_ = sdtpu.Context(config="tiny", steps=3,
                         pag_layers=("down", "mid", "up"))
    a = mid.generate("the horse", seed=3, pag_scale=3.0)
    b = all_.generate("the horse", seed=3, pag_scale=3.0)
    assert not np.array_equal(a, b)


def test_pag_on_mesh_matches_single_device():
    ctx1 = sdtpu.Context(config="tiny", steps=3)
    ctx8 = sdtpu.Context(config="tiny", steps=3, mesh=(2, 4))
    prompts = ["the horse", "a photograph"]
    a = ctx1.generate(prompts, seed=9, pag_scale=3.0)
    b = ctx8.generate(prompts, seed=9, pag_scale=3.0)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1
