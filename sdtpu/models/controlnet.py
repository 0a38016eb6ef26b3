"""ControlNet: spatially-conditioned control for the SD UNet.

A trainable copy of the UNet's encoder (conv_in + down path + mid) with

* a **hint network**: 7 SiLU-separated 3x3 convs that embed the control
  image (canny edges, depth, pose, ...) from pixel space down to the latent
  grid, finishing in a zero-initialized projection to ``model_channels``;
* **zero convs**: one zero-initialized 1x1 conv per encoder skip tensor plus
  one on the mid output. Zero init makes a freshly-created ControlNet an
  exact no-op on the base model (the training trick from the paper), which
  is also this module's key invariant test.

The residuals it produces are added to the base UNet's skip tensors and mid
output (``sdtpu.models.unet.apply(control=...)``). The hint embedding does
not depend on the timestep, so the pipeline computes it ONCE outside the
denoise scan (``embed_hint``) — per step only the encoder copy runs.

TPU-first notes: everything rides the same NHWC conv/attention primitives as
the base UNet (XLA fuses the zero convs into the surrounding graph); the
per-step cost is ~half a UNet encoder, batched with CFG like the base net.

The reference is txt2img-only (SURVEY.md §2.3) — this is a capability
extension; parameter layout follows the LDM ``control_model.*`` checkpoint
convention so real ControlNet weights map 1:1 (sdtpu.io.weights.controlnet_rules).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sdtpu.config import UNetConfig
from sdtpu.models import temb
from sdtpu.models.layers import conv2d, init_conv, silu
from sdtpu.models.unet import (
    _heads,
    _init_resblock,
    _init_transformer,
    _resblock,
    _transformer,
)

#: the canonical hint-network channel ladder (ControlNet paper / LDM
#: ``input_hint_block``): 7 body convs, then a zero conv to model_channels
HINT_CHANNELS = (16, 16, 32, 32, 96, 96, 256)


def _hint_strides(factor: int) -> tuple:
    """Strides for the 7 body convs: the canonical net downsamples 8x via
    stride 2 at positions 2/4/6; smaller pixel->latent factors (tiny test
    configs) use only the LAST log2(factor) of those positions, keeping
    parameter shapes (and so checkpoint mapping) identical."""
    n_down = max(0, factor.bit_length() - 1)  # log2 for powers of two
    if 1 << n_down != factor:
        raise ValueError(f"hint downsample factor must be a power of 2, "
                         f"got {factor}")
    if n_down > 3:
        raise ValueError(f"hint network supports factors up to 8, got {factor}")
    strides = [1] * len(HINT_CHANNELS)
    for pos in (2, 4, 6)[3 - n_down:]:
        strides[pos] = 2
    return tuple(strides)


def init(key, cfg: UNetConfig, hint_channels: int = 3,
         zero_init_outs: bool = True):
    """Parameter pytree. ``down``/``mid`` mirror models/unet.init exactly
    (same channel bookkeeping), so a ControlNet created from a base UNet
    checkpoint is structurally a subtree copy. ``zero_init_outs=False``
    (random demo weights) also randomizes the zero convs, so the control
    path visibly does something without trained weights."""
    keys = iter(jax.random.split(key, 256))
    ch = cfg.model_channels

    hint = []
    c_prev = hint_channels
    for c in HINT_CHANNELS:
        hint.append(init_conv(next(keys), 3, c_prev, c))
        c_prev = c
    hint.append(init_conv(next(keys), 3, c_prev, ch,
                          zero_init=zero_init_outs))

    params = {
        "temb": temb.init(next(keys), cfg),
        "hint": hint,
        "conv_in": init_conv(next(keys), 3, cfg.in_channels, ch),
    }

    down = []
    zero = [init_conv(next(keys), 1, ch, ch, zero_init=zero_init_outs)]
    cur = ch
    for lvl, mult in enumerate(cfg.channel_mult):
        out_ch = ch * mult
        blocks = []
        for _ in range(cfg.num_res_blocks):
            blk = {"res": _init_resblock(next(keys), cur, out_ch,
                                         cfg.time_embed_dim, zero_init_outs)}
            cur = out_ch
            if lvl in cfg.attn_levels:
                blk["st"] = _init_transformer(next(keys), cur, cfg.context_dim,
                                              zero_init_outs,
                                              depth=cfg.depth_at(lvl))
            blocks.append(blk)
            zero.append(init_conv(next(keys), 1, cur, cur,
                                  zero_init=zero_init_outs))
        level = {"blocks": blocks}
        if lvl != len(cfg.channel_mult) - 1:
            level["down"] = init_conv(next(keys), 3, cur, cur)
            zero.append(init_conv(next(keys), 1, cur, cur,
                                  zero_init=zero_init_outs))
        down.append(level)
    params["down"] = down
    params["zero"] = zero

    params["mid"] = {
        "res1": _init_resblock(next(keys), cur, cur, cfg.time_embed_dim,
                               zero_init_outs),
        "st": _init_transformer(next(keys), cur, cfg.context_dim,
                                zero_init_outs,
                                depth=cfg.depth_at(len(cfg.channel_mult) - 1)),
        "res2": _init_resblock(next(keys), cur, cur, cfg.time_embed_dim,
                               zero_init_outs),
    }
    params["zero_mid"] = init_conv(next(keys), 1, cur, cur,
                                   zero_init=zero_init_outs)
    return params


def embed_hint(params, hint, factor: int):
    """Control image [B, H, W, C_hint] (float, [0, 1]) -> hint features on
    the latent grid [B, H/factor, W/factor, model_channels]. ``factor`` is
    the pixel->latent ratio (= cfg.upscale). Timestep-independent: call once
    per request, outside the denoise scan."""
    strides = _hint_strides(factor)
    h = hint
    for p, s in zip(params["hint"][:-1], strides):
        h = silu(conv2d(p, h, stride=s))
    return conv2d(params["hint"][-1], h)


def apply(params, x, hint_feat, t_emb, context, cfg: UNetConfig,
          kernels: str = "xla"):
    """One ControlNet eval.

    x: [B, h, w, C_in] noisy latents (the CFG-doubled batch, like the base
    UNet); hint_feat: [B, h, w, model_channels] from embed_hint_for;
    t_emb: [B, time_embed_dim] embedded through THIS net's own time MLP
    (real checkpoints train it separately from the base's); context:
    [B, T, context_dim].

    Returns (down_residuals, mid_residual): one residual per base-UNet skip
    tensor, in push order, plus the mid output — unscaled (the pipeline
    applies the per-request conditioning scale).
    """
    g = cfg.groups
    h = conv2d(params["conv_in"], x) + hint_feat.astype(x.dtype)
    zs = iter(params["zero"])
    outs = [conv2d(next(zs), h, padding=0)]
    for lvl, level in enumerate(params["down"]):
        for blk in level["blocks"]:
            h = _resblock(blk["res"], h, t_emb, g, kernels)
            if "st" in blk:
                h = _transformer(blk["st"], h, context,
                                 _heads(cfg, h.shape[-1]), g, kernels)
            outs.append(conv2d(next(zs), h, padding=0))
        if "down" in level:
            h = conv2d(level["down"], h, stride=2)
            outs.append(conv2d(next(zs), h, padding=0))

    mid = params["mid"]
    h = _resblock(mid["res1"], h, t_emb, g, kernels)
    h = _transformer(mid["st"], h, context, _heads(cfg, h.shape[-1]), g,
                     kernels)
    h = _resblock(mid["res2"], h, t_emb, g, kernels)
    return tuple(outs), conv2d(params["zero_mid"], h, padding=0)
