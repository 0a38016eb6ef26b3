"""Model-stack tests: per-module numerical parity vs trusted torch
implementations (SURVEY.md §4 test bar: component goldens vs a reference
implementation), plus topology/shape checks on the TINY config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sdtpu.config import TINY, CLIPConfig, UNetConfig
from sdtpu.models import clip, temb, unet, vae
from sdtpu.models.unet import _resblock, _transformer

ATOL = 1e-4


def t2j(t):
    return jnp.asarray(t.detach().numpy())


# ---------------------------------------------------------------------------
# temb
# ---------------------------------------------------------------------------

def test_temb_matches_manual():
    cfg = TINY.unet
    params = temb.init(jax.random.PRNGKey(0), cfg)
    t = jnp.asarray([0.0, 500.0, 999.0])
    out = temb.apply(params, t, cfg)
    assert out.shape == (3, cfg.time_embed_dim)
    # manual: features -> fc0 -> silu -> fc1
    from sdtpu.models.layers import timestep_features

    feats = np.asarray(timestep_features(t, cfg.model_channels))
    h = feats @ np.asarray(params["fc0"]["w"]) + np.asarray(params["fc0"]["b"])
    h = h * (1 / (1 + np.exp(-h)))
    expected = h @ np.asarray(params["fc1"]["w"]) + np.asarray(params["fc1"]["b"])
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


# ---------------------------------------------------------------------------
# CLIP vs transformers
# ---------------------------------------------------------------------------

def _copy_clip_weights(hf_model, cfg):
    """Map HF CLIPTextModel weights into our pytree (torch Linear weights are
    [out, in] -> transpose to our [in, out])."""
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    pre = "text_model."

    def lin(name):
        return {
            "w": jnp.asarray(sd[pre + name + ".weight"].T),
            "b": jnp.asarray(sd[pre + name + ".bias"]),
        }

    def ln(name):
        return {
            "scale": jnp.asarray(sd[pre + name + ".weight"]),
            "bias": jnp.asarray(sd[pre + name + ".bias"]),
        }

    params = {
        "token_embedding": jnp.asarray(sd[pre + "embeddings.token_embedding.weight"]),
        "position_embedding": jnp.asarray(
            sd[pre + "embeddings.position_embedding.weight"]
        ),
        "final_ln": ln("final_layer_norm"),
        "blocks": [],
    }
    for i in range(cfg.layers):
        b = f"encoder.layers.{i}."
        params["blocks"].append(
            {
                "ln1": ln(b + "layer_norm1"),
                "q": lin(b + "self_attn.q_proj"),
                "k": lin(b + "self_attn.k_proj"),
                "v": lin(b + "self_attn.v_proj"),
                "out": lin(b + "self_attn.out_proj"),
                "ln2": ln(b + "layer_norm2"),
                "fc1": lin(b + "mlp.fc1"),
                "fc2": lin(b + "mlp.fc2"),
            }
        )
    return params


def test_clip_matches_transformers():
    from transformers import CLIPTextConfig, CLIPTextModel

    cfg = CLIPConfig(vocab_size=100, hidden=32, layers=2, heads=2, context_len=16)
    hf_cfg = CLIPTextConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden,
        intermediate_size=cfg.hidden * cfg.mlp_ratio,
        num_hidden_layers=cfg.layers,
        num_attention_heads=cfg.heads,
        max_position_embeddings=cfg.context_len,
        hidden_act="quick_gelu",
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = CLIPTextModel(hf_cfg).eval()
    params = _copy_clip_weights(hf, cfg)

    tokens = np.array(
        [[49 % 100, 3, 7, 12, 5] + [99] * 11, [1, 2, 3] + [99] * 13], np.int32
    )
    ours = np.asarray(clip.apply(params, jnp.asarray(tokens), cfg))
    with torch.no_grad():
        theirs = hf(torch.from_numpy(tokens.astype(np.int64))).last_hidden_state.numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


# ---------------------------------------------------------------------------
# UNet blocks vs torch cross-implementations
# ---------------------------------------------------------------------------

class TorchResBlock(torch.nn.Module):
    """LDM-style ResBlock (GN-SiLU-conv, +emb, GN-SiLU-conv, skip)."""

    def __init__(self, c_in, c_out, temb_dim, groups):
        super().__init__()
        self.n1 = torch.nn.GroupNorm(groups, c_in)
        self.c1 = torch.nn.Conv2d(c_in, c_out, 3, padding=1)
        self.e = torch.nn.Linear(temb_dim, c_out)
        self.n2 = torch.nn.GroupNorm(groups, c_out)
        self.c2 = torch.nn.Conv2d(c_out, c_out, 3, padding=1)
        self.skip = torch.nn.Conv2d(c_in, c_out, 1) if c_in != c_out else None

    def forward(self, x, emb):
        h = self.c1(torch.nn.functional.silu(self.n1(x)))
        h = h + self.e(torch.nn.functional.silu(emb))[:, :, None, None]
        h = self.c2(torch.nn.functional.silu(self.n2(h)))
        sk = self.skip(x) if self.skip is not None else x
        return sk + h


def _conv_p(m):
    return {
        "w": t2j(m.weight.permute(2, 3, 1, 0)),  # OIHW -> HWIO
        "b": t2j(m.bias),
    }


def _lin_p(m):
    p = {"w": t2j(m.weight.T)}
    if m.bias is not None:
        p["b"] = t2j(m.bias)
    return p


def _norm_p(m):
    return {"scale": t2j(m.weight), "bias": t2j(m.bias)}


def test_resblock_vs_torch(rng):
    c_in, c_out, temb_dim, groups = 8, 12, 16, 4
    torch.manual_seed(1)
    tm = TorchResBlock(c_in, c_out, temb_dim, groups).eval()
    p = {
        "norm1": _norm_p(tm.n1),
        "conv1": _conv_p(tm.c1),
        "emb": _lin_p(tm.e),
        "norm2": _norm_p(tm.n2),
        "conv2": _conv_p(tm.c2),
        "skip": _conv_p(tm.skip),
    }
    x = rng.standard_normal((2, 6, 6, c_in), dtype=np.float32)
    emb = rng.standard_normal((2, temb_dim), dtype=np.float32)
    ours = np.asarray(_resblock(p, jnp.asarray(x), jnp.asarray(emb), groups))
    with torch.no_grad():
        theirs = (
            tm(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(emb))
            .permute(0, 2, 3, 1)
            .numpy()
        )
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


class TorchSpatialTransformer(torch.nn.Module):
    """LDM SpatialTransformer, depth 1, GEGLU feed-forward."""

    def __init__(self, c, ctx, heads, groups):
        super().__init__()
        self.heads = heads
        self.norm = torch.nn.GroupNorm(groups, c, eps=1e-6)
        self.proj_in = torch.nn.Conv2d(c, c, 1)
        self.ln1 = torch.nn.LayerNorm(c)
        self.q1 = torch.nn.Linear(c, c, bias=False)
        self.k1 = torch.nn.Linear(c, c, bias=False)
        self.v1 = torch.nn.Linear(c, c, bias=False)
        self.o1 = torch.nn.Linear(c, c)
        self.ln2 = torch.nn.LayerNorm(c)
        self.q2 = torch.nn.Linear(c, c, bias=False)
        self.k2 = torch.nn.Linear(ctx, c, bias=False)
        self.v2 = torch.nn.Linear(ctx, c, bias=False)
        self.o2 = torch.nn.Linear(c, c)
        self.ln3 = torch.nn.LayerNorm(c)
        self.ff1 = torch.nn.Linear(c, c * 8)
        self.ff2 = torch.nn.Linear(c * 4, c)
        self.proj_out = torch.nn.Conv2d(c, c, 1)

    def _attn(self, q, k, v):
        b, tq, c = q.shape
        d = c // self.heads
        q = q.view(b, tq, self.heads, d).transpose(1, 2)
        k = k.view(b, -1, self.heads, d).transpose(1, 2)
        v = v.view(b, -1, self.heads, d).transpose(1, 2)
        o = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        return o.transpose(1, 2).reshape(b, tq, c)

    def forward(self, x, ctx):
        b, c, hh, ww = x.shape
        h = self.proj_in(self.norm(x))
        h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        hn = self.ln1(h)
        h = h + self.o1(self._attn(self.q1(hn), self.k1(hn), self.v1(hn)))
        hn = self.ln2(h)
        h = h + self.o2(self._attn(self.q2(hn), self.k2(ctx), self.v2(ctx)))
        hn = self.ln3(h)
        a, g = self.ff1(hn).chunk(2, dim=-1)
        h = h + self.ff2(a * torch.nn.functional.gelu(g))
        h = h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
        return x + self.proj_out(h)


def test_spatial_transformer_vs_torch(rng):
    c, ctx_dim, heads, groups = 8, 12, 2, 4
    torch.manual_seed(2)
    tm = TorchSpatialTransformer(c, ctx_dim, heads, groups).eval()
    p = {
        "norm": _norm_p(tm.norm),
        "proj_in": _conv_p(tm.proj_in),
        "ln1": _norm_p(tm.ln1),
        "attn1": {"q": _lin_p(tm.q1), "k": _lin_p(tm.k1), "v": _lin_p(tm.v1),
                  "out": _lin_p(tm.o1)},
        "ln2": _norm_p(tm.ln2),
        "attn2": {"q": _lin_p(tm.q2), "k": _lin_p(tm.k2), "v": _lin_p(tm.v2),
                  "out": _lin_p(tm.o2)},
        "ln3": _norm_p(tm.ln3),
        "ff1": _lin_p(tm.ff1),
        "ff2": _lin_p(tm.ff2),
        "proj_out": _conv_p(tm.proj_out),
    }
    x = rng.standard_normal((2, 4, 4, c), dtype=np.float32)
    context = rng.standard_normal((2, 5, ctx_dim), dtype=np.float32)
    ours = np.asarray(
        _transformer(p, jnp.asarray(x), jnp.asarray(context), heads, groups, "xla")
    )
    with torch.no_grad():
        theirs = (
            tm(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(context))
            .permute(0, 2, 3, 1)
            .numpy()
        )
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


# ---------------------------------------------------------------------------
# full nets on TINY config
# ---------------------------------------------------------------------------

def test_unet_topology_and_zero_init():
    cfg = TINY.unet
    params = unet.init(jax.random.PRNGKey(0), cfg)
    b, s = 2, TINY.latent_size
    x = jax.random.normal(jax.random.PRNGKey(1), (b, s, s, cfg.in_channels))
    t_emb = jax.random.normal(jax.random.PRNGKey(2), (b, cfg.time_embed_dim))
    ctx = jax.random.normal(
        jax.random.PRNGKey(3), (b, TINY.clip.context_len, cfg.context_dim)
    )
    out = unet.apply(params, x, t_emb, ctx, cfg)
    assert out.shape == (b, s, s, cfg.out_channels)
    # conv_out is zero-initialized (LDM convention) -> output exactly 0 at init
    assert np.abs(np.asarray(out)).max() == 0.0


def test_unet_batch_consistency():
    """CFG runs cond+uncond as one batch of 2 (SURVEY.md §7) — batching must
    equal two independent calls."""
    cfg = TINY.unet
    params = unet.init(jax.random.PRNGKey(0), cfg)
    # perturb conv_out so outputs are nonzero
    params["conv_out"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(9), params["conv_out"]["w"].shape) * 0.1
    )
    s = TINY.latent_size
    x = jax.random.normal(jax.random.PRNGKey(1), (2, s, s, cfg.in_channels))
    t_emb = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.time_embed_dim))
    ctx = jax.random.normal(
        jax.random.PRNGKey(3), (2, TINY.clip.context_len, cfg.context_dim)
    )
    batched = np.asarray(unet.apply(params, x, t_emb, ctx, cfg))
    one = np.asarray(unet.apply(params, x[:1], t_emb[:1], ctx[:1], cfg))
    two = np.asarray(unet.apply(params, x[1:], t_emb[1:], ctx[1:], cfg))
    np.testing.assert_allclose(batched, np.concatenate([one, two]), atol=1e-5)


def test_vae_decoder_topology():
    cfg = TINY.vae
    params = vae.init(jax.random.PRNGKey(0), cfg)
    s = TINY.latent_size
    z = jax.random.normal(jax.random.PRNGKey(1), (1, s, s, cfg.z_channels))
    img = vae.apply(params, z, cfg)
    up_factor = 2 ** (len(cfg.channel_mult) - 1)
    assert img.shape == (1, s * up_factor, s * up_factor, cfg.out_channels)
    assert np.isfinite(np.asarray(img)).all()
    assert up_factor == TINY.upscale


def test_unet_jits_in_bf16():
    cfg = TINY.unet
    params = unet.init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    s = TINY.latent_size
    x = jnp.ones((1, s, s, cfg.in_channels), jnp.bfloat16)
    t_emb = jnp.ones((1, cfg.time_embed_dim), jnp.bfloat16)
    ctx = jnp.ones((1, TINY.clip.context_len, cfg.context_dim), jnp.bfloat16)
    out = jax.jit(lambda *a: unet.apply(*a, cfg))(params, x, t_emb, ctx)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_fused_qkv_projection_equivalence():
    """fuse_attention_projections must be numerically identical (same dtype,
    same contraction — just concatenated kernels)."""
    from sdtpu.io.params import fuse_attention_projections, init_pipeline_params

    params = init_pipeline_params(jax.random.PRNGKey(4), TINY)
    fused = fuse_attention_projections(params)
    st = fused["unet"]["mid"]["st"]
    assert "qkv" in st["attn1"] and "kv" in st["attn2"]
    cfg = TINY.unet
    s = TINY.latent_size
    x = jax.random.normal(jax.random.PRNGKey(1), (2, s, s, cfg.in_channels))
    t_emb = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.time_embed_dim))
    ctx = jax.random.normal(
        jax.random.PRNGKey(3), (2, TINY.clip.context_len, cfg.context_dim)
    )
    a = np.asarray(unet.apply(params["unet"], x, t_emb, ctx, cfg))
    b = np.asarray(unet.apply(fused["unet"], x, t_emb, ctx, cfg))
    np.testing.assert_allclose(a, b, atol=1e-5)
