"""Full-pipeline torch golden (VERDICT r1 #3): tokens -> CLIP -> CFG DPM
scan -> VAE decode -> uint8, reassembled independently in torch/numpy and
compared against the compiled `pipeline.generate` program at TINY.

Per-component parity is covered elsewhere (test_models, test_unet_full_torch,
test_samplers); what only THIS test sees is the pipeline assembly: uncond
precompute, CFG batch/mix, the noise protocol, scan order, latent scaling and
the decode shift/round/clamp (reference validated this end-to-end with real
graphs, test/simple_app.cpp:6-38)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_unet_full_torch import UNetT, conv_t, j2t

import sdtpu
from sdtpu.config import TINY
from sdtpu.samplers import dpm
from sdtpu.samplers.schedule import NoiseSchedule


def _hf_clip_from_ours(params, cfg):
    """Inverse of test_models._copy_clip_weights: load OUR pytree into a
    transformers CLIPTextModel."""
    from transformers import CLIPTextConfig, CLIPTextModel

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
    hf = CLIPTextModel(hf_cfg).eval()
    sd = {}
    pre = "text_model."

    def put_lin(name, p):
        sd[pre + name + ".weight"] = j2t(p["w"]).T.contiguous()
        sd[pre + name + ".bias"] = j2t(p["b"])

    def put_ln(name, p):
        sd[pre + name + ".weight"] = j2t(p["scale"])
        sd[pre + name + ".bias"] = j2t(p["bias"])

    sd[pre + "embeddings.token_embedding.weight"] = j2t(
        params["token_embedding"])
    sd[pre + "embeddings.position_embedding.weight"] = j2t(
        params["position_embedding"])
    put_ln("final_layer_norm", params["final_ln"])
    for i, b in enumerate(params["blocks"]):
        base = f"encoder.layers.{i}."
        put_ln(base + "layer_norm1", b["ln1"])
        put_lin(base + "self_attn.q_proj", b["q"])
        put_lin(base + "self_attn.k_proj", b["k"])
        put_lin(base + "self_attn.v_proj", b["v"])
        put_lin(base + "self_attn.out_proj", b["out"])
        put_ln(base + "layer_norm2", b["ln2"])
        put_lin(base + "mlp.fc1", b["fc1"])
        put_lin(base + "mlp.fc2", b["fc2"])
    missing, unexpected = hf.load_state_dict(sd, strict=False)
    # position_ids buffers may be "missing" on some transformers versions
    assert not unexpected, unexpected
    return hf


class VAEResT(torch.nn.Module):
    def __init__(self, p, groups):
        super().__init__()
        self.g = groups
        self.n1s, self.n1b = j2t(p["norm1"]["scale"]), j2t(p["norm1"]["bias"])
        self.c1 = conv_t(p["conv1"])
        self.n2s, self.n2b = j2t(p["norm2"]["scale"]), j2t(p["norm2"]["bias"])
        self.c2 = conv_t(p["conv2"])
        self.nin = conv_t(p["nin"]) if "nin" in p else None

    def forward(self, x):
        F = torch.nn.functional
        h = self.c1(F.silu(F.group_norm(x, self.g, self.n1s, self.n1b,
                                        eps=1e-6)))
        h = self.c2(F.silu(F.group_norm(h, self.g, self.n2s, self.n2b,
                                        eps=1e-6)))
        if self.nin is not None:
            x = self.nin(x)
        return x + h


class VAEAttnT(torch.nn.Module):
    def __init__(self, p, groups):
        super().__init__()
        self.g = groups
        self.ns, self.nb = j2t(p["norm"]["scale"]), j2t(p["norm"]["bias"])
        self.q = conv_t(p["q"])
        self.k = conv_t(p["k"])
        self.v = conv_t(p["v"])
        self.proj = conv_t(p["proj"])

    def forward(self, x):
        F = torch.nn.functional
        b, c, hh, ww = x.shape
        h = F.group_norm(x, self.g, self.ns, self.nb, eps=1e-6)

        def to_seq(t):
            return t.reshape(b, c, hh * ww).transpose(1, 2)[:, None]

        o = F.scaled_dot_product_attention(
            to_seq(self.q(h)), to_seq(self.k(h)), to_seq(self.v(h)))
        o = o[:, 0].transpose(1, 2).reshape(b, c, hh, ww)
        return x + self.proj(o)


class VAEDecT(torch.nn.Module):
    def __init__(self, p, cfg):
        super().__init__()
        g = cfg.groups
        self.post_quant = conv_t(p["post_quant"])
        self.conv_in = conv_t(p["conv_in"])
        self.mid = (VAEResT(p["mid"]["res1"], g), VAEAttnT(p["mid"]["attn"], g),
                    VAEResT(p["mid"]["res2"], g))
        self.up = [
            ([VAEResT(b, g) for b in level["blocks"]],
             conv_t(level["up"]) if "up" in level else None)
            for level in p["up"]
        ]
        self.g = g
        self.ons, self.onb = j2t(p["norm_out"]["scale"]), j2t(
            p["norm_out"]["bias"])
        self.conv_out = conv_t(p["conv_out"])

    def forward(self, z):
        F = torch.nn.functional
        h = self.conv_in(self.post_quant(z))
        r1, at, r2 = self.mid
        h = r2(at(r1(h)))
        for blocks, up in self.up:
            for blk in blocks:
                h = blk(h)
            if up is not None:
                h = up(F.interpolate(h, scale_factor=2, mode="nearest"))
        h = F.silu(F.group_norm(h, self.g, self.ons, self.onb, eps=1e-6))
        return self.conv_out(h)


def _torch_scan_decode(params, cfg, ctx_cond, ctx_un, steps, seed, guidance):
    """CFG DPM++(2M) scan + VAE decode, reassembled in torch/numpy from a
    given pair of (cond, uncond) torch context tensors -> uint8 image."""
    from sdtpu.models.layers import timestep_features

    plan = jax.tree.map(np.asarray, dpm.plan(NoiseSchedule.sd_v1(), steps))

    def temb_np(t):
        feats = np.asarray(timestep_features(jnp.asarray([t]),
                                             cfg.unet.model_channels))
        p = params["temb"]
        h = feats @ p["fc0"]["w"] + p["fc0"]["b"]
        h = h / (1 + np.exp(-h))
        return h @ p["fc1"]["w"] + p["fc1"]["b"]

    unet_t = UNetT(params["unet"], cfg.unet).eval()
    shape = (1, cfg.latent_size, cfg.latent_size, cfg.latent_channels)
    # the noise protocol is DEFINED as jax.random.normal(PRNGKey(seed))
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(seed), shape,
                                     jnp.float32))
    prev_y = np.zeros(shape, np.float32)
    with torch.no_grad():
        for i in range(steps):
            emb = torch.from_numpy(temb_np(float(plan.model_t[i]))
                                   .astype(np.float32))
            xt = torch.from_numpy(x.astype(np.float32)).permute(0, 3, 1, 2)
            e_c = unet_t(xt, emb, ctx_cond).permute(0, 2, 3, 1).numpy()
            e_u = unet_t(xt, emb, ctx_un).permute(0, 2, 3, 1).numpy()
            eps = guidance * e_c + (1.0 - guidance) * e_u
            y = (x - plan.sigma_s[i] * eps) * plan.inv_alpha_s[i]
            d = (1.0 + plan.i2r[i]) * y - plan.i2r[i] * prev_y
            x = plan.sigma_ratio[i] * x - plan.alpha_phi[i] * d
            prev_y = y

        # --- decode: unscale -> VAE -> [-1,1] -> uint8 ------------------
        z = torch.from_numpy(
            (x / cfg.vae.scale_factor).astype(np.float32)
        ).permute(0, 3, 1, 2)
        img = VAEDecT(params["vae"], cfg.vae)(z).permute(0, 2, 3, 1).numpy()
    return np.clip(np.round((img[0] + 1.0) * 127.5), 0, 255).astype(np.uint8)


def test_full_pipeline_matches_torch_reassembly():
    steps, seed, guidance = 4, 13, 7.5
    cfg = TINY
    ctx = sdtpu.Context(config="tiny", steps=steps)
    # must fit ONE context window (TINY context_len=16): prompts that
    # exceed it now route to the A1111-style chunked long-prompt encode
    # (sdtpu.text), whose torch reassembly is the _chunked test below
    prompt = "a photograph"
    ours = ctx.generate(prompt, guidance=guidance, seed=seed)

    params = jax.tree.map(np.asarray, ctx.params)

    # --- text: HF CLIP with our weights, our tokenizer ------------------
    hf = _hf_clip_from_ours(params["clip"], cfg.clip)
    toks = np.asarray([ctx.tokenizer.tokenize(prompt, cfg.clip.context_len)])
    toks_un = np.asarray([ctx.tokenizer.tokenize("", cfg.clip.context_len)])
    with torch.no_grad():
        ctx_cond = hf(torch.from_numpy(toks.astype(np.int64))
                      ).last_hidden_state
        ctx_un = hf(torch.from_numpy(toks_un.astype(np.int64))
                    ).last_hidden_state

    theirs = _torch_scan_decode(params, cfg, ctx_cond, ctx_un, steps, seed,
                                guidance)

    assert ours.shape == theirs.shape == (cfg.image_size, cfg.image_size, 3)
    diff = np.abs(ours.astype(int) - theirs.astype(int))
    # f32 everywhere; only pixels on a .5 rounding boundary may flip 1 LSB
    assert diff.max() <= 1, f"max LSB diff {diff.max()}"
    assert (diff > 0).mean() < 0.02, f"{(diff > 0).mean():.3%} pixels differ"


def _np_a1111_rescale(emb, w):
    """encode_text's attention-weighting normalization, in numpy float32:
    scale by per-token weights, restore the per-sample signed mean — unless
    the mean is degenerate (|mean| <= 1e-4 * rms), where the rescale is
    skipped (engine/pipeline.encode_text)."""
    old_mean = emb.mean(axis=(1, 2), keepdims=True)
    g = emb * w
    new_mean = g.mean(axis=(1, 2), keepdims=True)
    rms = np.sqrt((g * g).mean(axis=(1, 2), keepdims=True))
    ok = np.abs(new_mean) > 1e-4 * rms
    scale = np.where(ok, old_mean / np.where(ok, new_mean, 1.0), 1.0)
    return (g * scale).astype(np.float32)


def test_chunked_weighted_pipeline_matches_torch_reassembly():
    """The A1111-style long-prompt path: a prompt over TINY's 16-token
    window chunks to [1, 2, 16] tokens + per-token weights; each window
    encodes separately, hidden states concatenate to a 32-token context,
    and the weighting rescale applies. Reassembled independently: HF CLIP
    per window + numpy weighting + the torch scan/decode."""
    from sdtpu import text as text_mod

    steps, seed, guidance = 4, 13, 7.5
    cfg = TINY
    ctx = sdtpu.Context(config="tiny", steps=steps)
    prompt = "the horse rides a (photograph:1.3)"
    assert text_mod.needs_chunking(ctx.tokenizer, prompt, cfg.clip.context_len)
    ours = ctx.generate(prompt, guidance=guidance, seed=seed)

    params = jax.tree.map(np.asarray, ctx.params)
    hf = _hf_clip_from_ours(params["clip"], cfg.clip)
    L = cfg.clip.context_len
    toks, w = text_mod.chunked_tokens(ctx.tokenizer, prompt, L)
    k = toks.shape[0]
    toks_un, w_un = text_mod.chunked_tokens(ctx.tokenizer, "", L,
                                            min_chunks=k)

    def encode(tk, wt):
        with torch.no_grad():
            h = hf(torch.from_numpy(np.asarray(tk).astype(np.int64))
                   ).last_hidden_state.numpy()
        emb = h.reshape(1, k * L, h.shape[-1]).astype(np.float32)
        return _np_a1111_rescale(
            emb, np.asarray(wt).reshape(1, k * L, 1).astype(np.float32))

    ctx_cond = torch.from_numpy(encode(toks, w))
    ctx_un = torch.from_numpy(encode(toks_un, w_un))
    theirs = _torch_scan_decode(params, cfg, ctx_cond, ctx_un, steps, seed,
                                guidance)

    diff = np.abs(ours.astype(int) - theirs.astype(int))
    assert diff.max() <= 1, f"max LSB diff {diff.max()}"
    assert (diff > 0).mean() < 0.02, f"{(diff > 0).mean():.3%} pixels differ"
