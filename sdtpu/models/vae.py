"""VAE decoder: latent [B,h,w,4] -> RGB image in [-1, 1].

The reference runs this as the converted ``vae_decoder.serialized`` graph:
y(1,64,64,4) -> img(512,512,3) float 0..1 (reference: context.cpp:220-221,
386-395; the 0..1 shift/clamp lives in the pipeline here). Architecture =
SD v1.x AutoencoderKL decoder: post-quant 1x1 conv, conv_in to the widest
width, middle (ResnetBlock, single-head AttnBlock, ResnetBlock), then one
level per channel-mult in reverse with ``num_res_blocks+1`` ResnetBlocks and
nearest-2x upsample between levels, GroupNorm -> SiLU -> conv_out.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sdtpu.config import VAEConfig
from sdtpu.models.layers import (
    conv2d,
    group_norm,
    init_conv,
    init_norm,
    sdpa,
    silu,
)


def _init_resblock(key, c_in, c_out):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": init_norm(c_in),
        "conv1": init_conv(ks[0], 3, c_in, c_out),
        "norm2": init_norm(c_out),
        "conv2": init_conv(ks[1], 3, c_out, c_out),
    }
    if c_in != c_out:
        p["nin"] = init_conv(ks[2], 1, c_in, c_out)
    return p


def _init_attn(key, c):
    ks = jax.random.split(key, 4)
    return {
        "norm": init_norm(c),
        "q": init_conv(ks[0], 1, c, c),
        "k": init_conv(ks[1], 1, c, c),
        "v": init_conv(ks[2], 1, c, c),
        "proj": init_conv(ks[3], 1, c, c),
    }


def init(key, cfg: VAEConfig):
    keys = iter(jax.random.split(key, 64))
    widest = cfg.base_channels * cfg.channel_mult[-1]
    params = {
        "post_quant": init_conv(next(keys), 1, cfg.z_channels, cfg.z_channels),
        "conv_in": init_conv(next(keys), 3, cfg.z_channels, widest),
        "mid": {
            "res1": _init_resblock(next(keys), widest, widest),
            "attn": _init_attn(next(keys), widest),
            "res2": _init_resblock(next(keys), widest, widest),
        },
    }
    up = []
    cur = widest
    for lvl in reversed(range(len(cfg.channel_mult))):
        out_ch = cfg.base_channels * cfg.channel_mult[lvl]
        blocks = []
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(_init_resblock(next(keys), cur, out_ch))
            cur = out_ch
        level = {"blocks": blocks}
        if lvl != 0:
            level["up"] = init_conv(next(keys), 3, cur, cur)
        up.append(level)
    params["up"] = up
    params["norm_out"] = init_norm(cur)
    params["conv_out"] = init_conv(next(keys), 3, cur, cfg.out_channels)
    return params


def _resblock(p, x, groups, kernels="xla"):
    if kernels == "pallas_conv":
        # fused GN+SiLU-prologue conv (sdtpu.ops.conv); only the 64x64
        # levels fit the full-image VMEM scratch — the 128..512px levels
        # fall back to XLA via `eligible`
        from sdtpu.models.unet import _conv_wq
        from sdtpu.ops import conv as C

        w1, s1 = _conv_wq(p["conv1"])
        w2, s2 = _conv_wq(p["conv2"])
        if C.eligible(x, w1, 1, 1) and C.eligible(x, w2, 1, 1):
            w1 = w1.astype(x.dtype) if s1 is None else w1
            w2 = w2.astype(x.dtype) if s2 is None else w2
            a1, d1 = C.gn_affine(p["norm1"], x, groups, 1e-6)
            h = C.fused_conv(x, w1, p["conv1"]["b"], a=a1, d=d1, silu=True,
                             w_scale=s1)
            a2, d2 = C.gn_affine(p["norm2"], h, groups, 1e-6)
            h = C.fused_conv(h, w2, p["conv2"]["b"], a=a2, d=d2, silu=True,
                             w_scale=s2)
            if "nin" in p:
                x = conv2d(p["nin"], x, padding=0)
            return x + h
    h = conv2d(p["conv1"], silu(group_norm(p["norm1"], x, groups, eps=1e-6)))
    h = conv2d(p["conv2"], silu(group_norm(p["norm2"], h, groups, eps=1e-6)))
    if "nin" in p:
        x = conv2d(p["nin"], x, padding=0)
    return x + h


def _attn(p, x, groups, kernels="xla"):
    b, hh, ww, c = x.shape
    h = group_norm(p["norm"], x, groups, eps=1e-6)
    q = conv2d(p["q"], h, padding=0).reshape(b, hh * ww, c)
    k = conv2d(p["k"], h, padding=0).reshape(b, hh * ww, c)
    v = conv2d(p["v"], h, padding=0).reshape(b, hh * ww, c)
    kern = "pallas" if kernels.startswith("pallas") else "xla"
    o = sdpa(q, k, v, heads=1, kernel=kern).reshape(b, hh, ww, c)
    return x + conv2d(p["proj"], o, padding=0)


def _upsample_nearest(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def init_encoder(key, cfg: VAEConfig):
    """SD v1.x AutoencoderKL *encoder* (img2img support — the reference has
    no encoder; txt2img only needs the decoder). Mirror of the decoder:
    conv_in, per-level ResnetBlocks with stride-2 downsample between levels,
    middle (Resnet, Attn, Resnet), GroupNorm -> SiLU -> conv_out producing
    2*z channels (mean, logvar), then the 1x1 quant_conv."""
    keys = iter(jax.random.split(key, 64))
    params = {"conv_in": init_conv(next(keys), 3, cfg.out_channels,
                                   cfg.base_channels)}
    down = []
    cur = cfg.base_channels
    for lvl, mult in enumerate(cfg.channel_mult):
        out_ch = cfg.base_channels * mult
        blocks = []
        for _ in range(cfg.num_res_blocks):
            blocks.append(_init_resblock(next(keys), cur, out_ch))
            cur = out_ch
        level = {"blocks": blocks}
        if lvl != len(cfg.channel_mult) - 1:
            level["down"] = init_conv(next(keys), 3, cur, cur)
        down.append(level)
    params["down"] = down
    params["mid"] = {
        "res1": _init_resblock(next(keys), cur, cur),
        "attn": _init_attn(next(keys), cur),
        "res2": _init_resblock(next(keys), cur, cur),
    }
    params["norm_out"] = init_norm(cur)
    params["conv_out"] = init_conv(next(keys), 3, cur, 2 * cfg.z_channels)
    params["quant"] = init_conv(next(keys), 1, 2 * cfg.z_channels,
                                2 * cfg.z_channels)
    return params


def _downsample(p, x):
    # torch Downsample pads (0,1,0,1) then stride-2 VALID conv
    from jax import lax

    from sdtpu.models.layers import PRECISION

    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (2, 2), [(0, 1), (0, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32, precision=PRECISION,
    )
    return (y + p["b"].astype(jnp.float32)).astype(x.dtype)


def apply_encoder(params, img, cfg: VAEConfig, kernels: str = "xla"):
    """img: [B, H, W, 3] in [-1, 1] -> (mean, logvar) each [B, h, w, z]."""
    g = cfg.groups
    h = conv2d(params["conv_in"], img)
    for level in params["down"]:
        for blk in level["blocks"]:
            h = _resblock(blk, h, g, kernels)
        if "down" in level:
            h = _downsample(level["down"], h)
    mid = params["mid"]
    h = _resblock(mid["res1"], h, g, kernels)
    h = _attn(mid["attn"], h, g, kernels)
    h = _resblock(mid["res2"], h, g, kernels)
    h = silu(group_norm(params["norm_out"], h, g, eps=1e-6))
    h = conv2d(params["conv_out"], h)
    h = conv2d(params["quant"], h, padding=0)
    mean, logvar = jnp.split(h, 2, axis=-1)
    return mean, logvar


def apply(params, z, cfg: VAEConfig, kernels: str = "xla"):
    """z: [B,h,w,z_channels] *scaled* latent (the pipeline divides by
    cfg.scale_factor before calling) -> [B, h*2^L, w*2^L, 3] in ~[-1, 1].

    The mid-block's single-head attention runs over the full latent grid
    (4096 tokens at 512x512 output, d=512) — `kernels='pallas'` routes it
    to the flash kernel like the UNet's self-attention."""
    g = cfg.groups
    h = conv2d(params["post_quant"], z, padding=0)
    h = conv2d(params["conv_in"], h)
    mid = params["mid"]
    h = _resblock(mid["res1"], h, g, kernels)
    h = _attn(mid["attn"], h, g, kernels)
    h = _resblock(mid["res2"], h, g, kernels)
    for level in params["up"]:
        for blk in level["blocks"]:
            h = _resblock(blk, h, g, kernels)
        if "up" in level:
            h = _upsample_nearest(h)
            h = conv2d(level["up"], h)
    h = silu(group_norm(params["norm_out"], h, g, eps=1e-6))
    return conv2d(params["conv_out"], h)
