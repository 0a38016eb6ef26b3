"""Latent-consistency-model serving tests: the LCM timestep grid and
consistency update (vs an independently-coded diffusers-LCMScheduler
reference), the guidance-embedding architecture (time_cond_proj_dim), and
the end-to-end 4-step serving paths. Capability extension — the reference
engine is a 20-step CFG DPM pipeline (reference: README.md:61,
context.cpp:250-251, 341-382)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sdtpu
from sdtpu.config import CONFIGS, TINY_LCM
from sdtpu.samplers import lcm
from sdtpu.samplers.schedule import NoiseSchedule

PROMPT = "the horse"


@pytest.fixture(scope="module")
def sched():
    return NoiseSchedule.sd_v1()


def test_timestep_grid_matches_diffusers(sched):
    """set_timesteps: origin grid arange(1,51)*20-1, reversed, thinned."""
    np.testing.assert_array_equal(lcm.timestep_grid(sched, 4),
                                  [999, 759, 519, 279])
    np.testing.assert_array_equal(lcm.timestep_grid(sched, 1), [999])
    ts8 = lcm.timestep_grid(sched, 8)
    assert ts8[0] == 999 and len(ts8) == 8
    # thinning step is 50 // steps = 6 -> spacing 6 * 20 = 120
    np.testing.assert_array_equal(np.diff(ts8), -120)
    with pytest.raises(ValueError):
        lcm.timestep_grid(sched, 51)


def test_step_matches_diffusers_scheduler(sched):
    """Table-driven step vs a direct transcription of diffusers
    LCMScheduler.step (eps prediction, sigma_data=0.5, scaling 10)."""
    steps = 4
    p = lcm.plan(sched, steps)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3)).astype(np.float32)
    eps_seq = rng.standard_normal((steps, 2, 3)).astype(np.float32)
    noise_seq = rng.standard_normal((steps, 2, 3)).astype(np.float32)

    x_ours = jnp.asarray(x)
    st = lcm.init_state(x.shape)
    for i in range(steps):
        x_ours, st = lcm.step(p, i, x_ours, jnp.asarray(eps_seq[i]), st,
                              noise=jnp.asarray(noise_seq[i]))

    ts = lcm.timestep_grid(sched, steps)
    abar = sched.alphas_cumprod
    x_ref = x.copy()
    for i, t in enumerate(ts):
        a_t = np.sqrt(abar[t])
        s_t = np.sqrt(1 - abar[t])
        scaled = t * 10.0
        c_skip = 0.25 / (scaled**2 + 0.25)
        c_out = scaled / np.sqrt(scaled**2 + 0.25)
        x0 = (x_ref - s_t * eps_seq[i]) / a_t
        denoised = c_out * x0 + c_skip * x_ref
        if i + 1 < steps:
            t_n = ts[i + 1]
            x_ref = (np.sqrt(abar[t_n]) * denoised
                     + np.sqrt(1 - abar[t_n]) * noise_seq[i])
        else:
            x_ref = denoised
        x_ref = x_ref.astype(np.float32)
    np.testing.assert_allclose(np.asarray(x_ours), x_ref, atol=2e-4)


def test_guidance_scale_features_formula():
    """temb.guidance_scale_features matches diffusers
    get_guidance_scale_embedding ([sin | cos], half-1 denominator, w*1000)."""
    from sdtpu.models.temb import guidance_scale_features

    dim, w = 16, 6.5
    half = dim // 2
    emb = np.log(10000.0) / (half - 1)
    freqs = np.exp(np.arange(half) * -emb)
    args = w * 1000.0 * freqs
    expected = np.concatenate([np.sin(args), np.cos(args)])
    got = np.asarray(guidance_scale_features(w, dim))
    # absolute tolerance: the leading args are O(w*1000) radians, where f32
    # range reduction legitimately differs from numpy's f64 by ~1e-3
    np.testing.assert_allclose(got, expected, atol=5e-3, rtol=0)
    # per-sample form: [B] -> [B, dim]
    got_b = np.asarray(guidance_scale_features(jnp.asarray([w, 0.0]), dim))
    assert got_b.shape == (2, dim)
    np.testing.assert_allclose(got_b[0], got, atol=1e-6, rtol=0)


def test_cond_proj_params_and_broadcast():
    """tiny_lcm's time MLP owns a bias-free cond_proj; per-sample cond
    broadcasts to [steps, B, D]."""
    from sdtpu.models import temb

    cfg = TINY_LCM
    p = temb.init(jax.random.PRNGKey(0), cfg.unet)
    assert "cond_proj" in p and "b" not in p["cond_proj"]
    t = jnp.asarray([999.0, 759.0, 519.0])
    wf = temb.guidance_scale_features(jnp.asarray([5.0, 1.0]),
                                      cfg.unet.time_cond_proj_dim)
    out = temb.apply(p, t, cfg.unet, cond=wf)
    assert out.shape == (3, 2, cfg.unet.time_embed_dim)
    # scalar cond: plain [steps, D], equal to the matching per-sample row
    out_s = temb.apply(p, t, cfg.unet, cond=wf[0])
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out[:, 0]),
                               atol=1e-5, rtol=1e-5)
    # plain config rejects nothing but has no cond leaf
    p0 = temb.init(jax.random.PRNGKey(0), CONFIGS["tiny"].unet)
    assert "cond_proj" not in p0


def test_lcm_e2e_guidance_embedded():
    """4-step LCM serving: deterministic per seed, guidance changes the
    image WITHOUT a CFG batch (embedded w), batch-of-1 == single path."""
    ctx = sdtpu.Context(config="tiny_lcm", steps=4, sampler="lcm")
    a = ctx.generate(PROMPT, guidance=8.0, seed=3)
    assert a.shape == (16, 16, 3)
    np.testing.assert_array_equal(a, ctx.generate(PROMPT, guidance=8.0,
                                                  seed=3))
    # the guidance scale reaches the model through the embedding
    assert not np.array_equal(a, ctx.generate(PROMPT, guidance=2.0, seed=3))
    # batched serving path (vector guidance through the w embedding)
    bat = ctx.generate_batch(
        [{"prompt": PROMPT, "guidance": 8.0, "seed": 3}])
    np.testing.assert_array_equal(a, bat[0])
    # mixed-guidance batch: each sample keeps its own conditioning
    two = ctx.generate_batch([
        {"prompt": PROMPT, "guidance": 8.0, "seed": 3},
        {"prompt": PROMPT, "guidance": 2.0, "seed": 3},
    ])
    np.testing.assert_array_equal(a, two[0])
    assert not np.array_equal(two[0], two[1])


def test_lcm_config_rejects_cfg_batch():
    """A guidance-embedded config refuses a use_cfg program (CFG is baked
    into the distilled model)."""
    from sdtpu.engine.pipeline import generate
    from sdtpu.io.params import init_pipeline_params

    params = init_pipeline_params(jax.random.PRNGKey(0), TINY_LCM)
    tokens = jnp.zeros((1, TINY_LCM.clip.context_len), jnp.int32)
    uncond = jnp.zeros(
        (TINY_LCM.clip.context_len, TINY_LCM.clip.hidden), jnp.float32)
    with pytest.raises(ValueError, match="bake"):
        generate(params, tokens, uncond, jax.random.PRNGKey(0),
                 jnp.float32(7.5), cfg=TINY_LCM, sampler="lcm", steps=2,
                 use_cfg=True)


def test_lcm_checkpoint_roundtrip():
    """The cond_proj leaf rides the LDM mapping (time_embed.cond_proj)."""
    from sdtpu.io.params import init_pipeline_params
    from sdtpu.io.weights import load_ldm_state_dict, params_to_ldm

    params = jax.tree.map(np.asarray, init_pipeline_params(
        jax.random.PRNGKey(1), TINY_LCM, demo=True))
    sd = params_to_ldm(params, TINY_LCM)
    assert "model.diffusion_model.time_embed.cond_proj.weight" in sd
    back = load_ldm_state_dict(sd, TINY_LCM)
    np.testing.assert_array_equal(
        np.asarray(back["temb"]["cond_proj"]["w"]),
        np.asarray(params["temb"]["cond_proj"]["w"]))
