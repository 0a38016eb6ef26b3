"""SD v1.x UNet denoiser: eps-prediction net with cross-attention.

The reference runs this as one converted graph ``unet.serialized`` with
inputs x(1,64,64,4), t-embedding(1280), prompt(77,768) and output
eps(1,64,64,4) (reference: context.cpp:214-218; README.md:108-113 — the
conversion splits it into 4 parts purely for converter RAM, the runtime
graph is one). Here it is a config-driven functional net:

    down path:  per level, `num_res_blocks` x [ResBlock (+SpatialTransformer
                at attn levels)], then a stride-2 conv Downsample between
                levels;
    middle:     ResBlock, SpatialTransformer, ResBlock;
    up path:    mirrored, with skip-concat from the down path, nearest-2x
                Upsample between levels;
    out:        GroupNorm -> SiLU -> 3x3 conv (zero-initialized).

Timestep conditioning enters each ResBlock as SiLU(t_emb) -> Linear added to
the hidden; text conditioning enters each SpatialTransformer's second
attention as keys/values. Everything is NHWC; attention flattens HW into the
sequence axis so self-attention at 64x64 is a 4096-token problem (9216 at
768x768 — the flash-attention Pallas kernel's target, SURVEY.md §5.7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sdtpu.config import UNetConfig
from sdtpu.models.layers import (
    conv2d,
    dense,
    geglu,
    group_norm,
    init_conv,
    init_dense,
    init_norm,
    sdpa,
    silu,
)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_resblock(key, c_in, c_out, temb_dim, zero_init_outs=True):
    ks = jax.random.split(key, 4)
    p = {
        "norm1": init_norm(c_in),
        "conv1": init_conv(ks[0], 3, c_in, c_out),
        "emb": init_dense(ks[1], temb_dim, c_out),
        "norm2": init_norm(c_out),
        "conv2": init_conv(ks[2], 3, c_out, c_out, zero_init=zero_init_outs),
    }
    if c_in != c_out:
        p["skip"] = init_conv(ks[3], 1, c_in, c_out)
    return p


def _init_basic(key, c, ctx_dim, cross_only=False):
    """One attn1/attn2/GEGLU-ff transformer block (the depth unit).

    ``cross_only`` (SD x4-upscaler, LDM ``disable_self_attentions``):
    attn1 attends the TEXT context instead of self — its k/v projections
    take ctx_dim inputs."""
    ks = jax.random.split(key, 11)
    kv_in = ctx_dim if cross_only else c
    return {
        "ln1": init_norm(c),
        "attn1": {
            "q": init_dense(ks[0], c, c, bias=False),
            "k": init_dense(ks[1], kv_in, c, bias=False),
            "v": init_dense(ks[2], kv_in, c, bias=False),
            "out": init_dense(ks[3], c, c),
        },
        "ln2": init_norm(c),
        "attn2": {
            "q": init_dense(ks[4], c, c, bias=False),
            "k": init_dense(ks[5], ctx_dim, c, bias=False),
            "v": init_dense(ks[6], ctx_dim, c, bias=False),
            "out": init_dense(ks[7], c, c),
        },
        "ln3": init_norm(c),
        "ff1": init_dense(ks[8], c, c * 8),       # GEGLU: produces 2 x 4c
        "ff2": init_dense(ks[9], c * 4, c),
    }


def _init_transformer(key, c, ctx_dim, zero_init_outs=True, depth=1,
                      cross_only=False):
    """Spatial transformer: GN + proj_in, ``depth`` basic blocks, proj_out.

    depth == 1 keeps the historical FLAT layout (basic-block leaves live
    directly in this dict) so SD1.x/2.x checkpoints, LoRA site paths, and
    PTQ walks are unchanged; depth > 1 (SDXL) nests them under
    ``blocks``."""
    ks = jax.random.split(key, depth + 3)
    p = {
        "norm": init_norm(c),
        "proj_in": init_conv(ks[0], 1, c, c),
        "proj_out": init_conv(ks[1], 1, c, c, zero_init=zero_init_outs),
    }
    if depth == 1:
        p.update(_init_basic(ks[2], c, ctx_dim, cross_only))
    else:
        p["blocks"] = [_init_basic(ks[2 + i], c, ctx_dim, cross_only)
                       for i in range(depth)]
    return p


def init(key, cfg: UNetConfig, zero_init_outs: bool = True):
    """Build the parameter pytree. Channel bookkeeping mirrors the SD v1.x
    layout exactly so LDM checkpoints map 1:1 (sdtpu/io/weights.py).

    ``zero_init_outs``: LDM convention zero-initializes each block's output
    conv; pass False for demo/random-weight mode (a fully zero-init UNet
    predicts eps == 0)."""
    n_keys = 256
    keys = iter(jax.random.split(key, n_keys))
    ch = cfg.model_channels
    params = {"conv_in": init_conv(next(keys), 3, cfg.in_channels, ch)}

    down = []
    skip_chs = [ch]
    cur = ch
    for lvl, mult in enumerate(cfg.channel_mult):
        out_ch = ch * mult
        blocks = []
        for _ in range(cfg.num_res_blocks):
            blk = {"res": _init_resblock(next(keys), cur, out_ch,
                                         cfg.time_embed_dim, zero_init_outs)}
            cur = out_ch
            if lvl in cfg.attn_levels:
                blk["st"] = _init_transformer(
                    next(keys), cur, cfg.context_dim, zero_init_outs,
                    depth=cfg.depth_at(lvl),
                    cross_only=lvl in cfg.cross_only_levels)
            blocks.append(blk)
            skip_chs.append(cur)
        level = {"blocks": blocks}
        if lvl != len(cfg.channel_mult) - 1:
            level["down"] = init_conv(next(keys), 3, cur, cur)
            skip_chs.append(cur)
        down.append(level)
    params["down"] = down

    params["mid"] = {
        "res1": _init_resblock(next(keys), cur, cur, cfg.time_embed_dim,
                               zero_init_outs),
        "st": _init_transformer(next(keys), cur, cfg.context_dim,
                                zero_init_outs,
                                depth=cfg.mid_depth()),
        "res2": _init_resblock(next(keys), cur, cur, cfg.time_embed_dim,
                               zero_init_outs),
    }

    up = []
    for lvl in reversed(range(len(cfg.channel_mult))):
        out_ch = ch * cfg.channel_mult[lvl]
        blocks = []
        for _ in range(cfg.num_res_blocks + 1):
            skip = skip_chs.pop()
            blk = {
                "res": _init_resblock(
                    next(keys), cur + skip, out_ch, cfg.time_embed_dim,
                    zero_init_outs,
                )
            }
            cur = out_ch
            if lvl in cfg.attn_levels:
                blk["st"] = _init_transformer(
                    next(keys), cur, cfg.context_dim, zero_init_outs,
                    depth=cfg.depth_at(lvl),
                    cross_only=lvl in cfg.cross_only_levels)
            blocks.append(blk)
        level = {"blocks": blocks}
        if lvl != 0:
            level["up"] = init_conv(next(keys), 3, cur, cur)
        up.append(level)
    params["up"] = up

    if cfg.num_class_embeds:
        # noise-level class conditioning (LDM num_classes -> nn.Embedding,
        # default N(0,1) init); the selected row adds to the time embedding
        params["label_emb"] = jax.random.normal(
            next(keys), (cfg.num_class_embeds, cfg.time_embed_dim),
            jnp.float32)
    params["out_norm"] = init_norm(cur)
    params["conv_out"] = init_conv(next(keys), 3, cur, cfg.out_channels,
                                   zero_init=zero_init_outs)
    return params


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _gn(p, x, groups, eps, fuse_silu, kernels):
    """GroupNorm (+SiLU).

    Measured on v5e INSIDE the full UNet program, the standalone Pallas GN
    kernel loses to the XLA path by ~6 ms/step (26.4 vs 32.5 ms/eval): XLA
    fuses the GN chain into neighboring convs/bias-adds, and a pallas_call is
    a fusion barrier. So the default 'pallas' kernel policy uses Pallas ONLY
    for attention; 'pallas_gn' opts the GN kernel back in (useful standalone
    or at shapes XLA fuses poorly)."""
    if kernels == "pallas_gn":
        from sdtpu.ops.groupnorm import fused_group_norm

        return fused_group_norm(p, x, groups, eps, fuse_silu=fuse_silu)
    y = group_norm(p, x, groups, eps)
    return silu(y) if fuse_silu else y


def _conv_wq(p):
    """(weight, int8 scale or None) for a conv site — the Pallas kernel
    dequantizes weight-only-int8 in VMEM (sdtpu.ops.conv docstring)."""
    if "w8" in p:
        return p["w8"], p["w8_scale"]
    return p["w"], None


def _resblock(p, x, emb, groups, kernels="xla"):
    if kernels == "pallas_conv":
        from sdtpu.ops import conv as C

        w1, s1 = _conv_wq(p["conv1"])
        w2, s2 = _conv_wq(p["conv2"])
        if C.eligible(x, w1, 1, 1) and C.eligible(x, w2, 1, 1):
            # whole ResBlock branch = 2 kernel launches: GN+SiLU prologues
            # in-kernel, conv1's bias carries the per-sample t-emb add
            w1 = w1.astype(x.dtype) if s1 is None else w1
            w2 = w2.astype(x.dtype) if s2 is None else w2
            a1, d1 = C.gn_affine(p["norm1"], x, groups, 1e-5)
            b1 = (p["conv1"]["b"].astype(jnp.float32)[None, :]
                  + dense(p["emb"], silu(emb)).astype(jnp.float32))
            h = C.fused_conv(x, w1, b1, a=a1, d=d1, silu=True, w_scale=s1)
            a2, d2 = C.gn_affine(p["norm2"], h, groups, 1e-5)
            h = C.fused_conv(h, w2, p["conv2"]["b"], a=a2, d=d2, silu=True,
                             w_scale=s2)
            if "skip" in p:
                x = conv2d(p["skip"], x, padding=0)
            return x + h
    h = conv2d(p["conv1"], _gn(p["norm1"], x, groups, 1e-5, True, kernels))
    h = h + dense(p["emb"], silu(emb))[:, None, None, :]
    h = conv2d(p["conv2"], _gn(p["norm2"], h, groups, 1e-5, True, kernels))
    if "skip" in p:
        x = conv2d(p["skip"], x, padding=0)
    return x + h


def _transformer(p, x, context, heads, groups, kernels, perturb_self=False,
                 tome=None, cross_only=False):
    attn_kernel = "pallas" if kernels.startswith("pallas") else "xla"
    b, hh, ww, c = x.shape
    # ToMe-SD gate (static): merge only at levels with at least
    # min_tokens spatial tokens — the quadratic-cost self-attentions
    if tome is not None and hh * ww >= tome[1]:
        tome = (hh, ww, tome[0])
    else:
        tome = None
    if heads <= 0:
        raise ValueError("heads must resolve to a positive count")
    fused_in = False
    if kernels == "pallas_conv":
        from sdtpu.ops import conv as C

        wi, si = _conv_wq(p["proj_in"])
        if C.eligible(x, wi, 1, 0):
            a, d = C.gn_affine(p["norm"], x, groups, 1e-6)
            wi = wi.astype(x.dtype) if si is None else wi
            h = C.fused_conv(x, wi, p["proj_in"]["b"], a=a, d=d, silu=False,
                             w_scale=si)
            fused_in = True
    if not fused_in:
        h = _gn(p["norm"], x, groups, 1e-6, False, kernels)
        h = conv2d(p["proj_in"], h, padding=0)
    h = h.reshape(b, hh * ww, c)

    # depth > 1 (SDXL) nests the basic blocks under "blocks"; depth 1 keeps
    # them flat in p (SD1.x/2.x checkpoint layout)
    for blk in p.get("blocks", (p,)):
        h = _basic_block(blk, h, context, heads, attn_kernel, perturb_self,
                         tome, cross_only)

    h = h.reshape(b, hh, ww, c)
    return x + conv2d(p["proj_out"], h, padding=0)


def _basic_block(p, h, context, heads, attn_kernel, perturb_self=False,
                 tome=None, cross_only=False):
    """attn1 (self) -> attn2 (cross) -> GEGLU ff, each with a residual.

    `cross_only` (static, SD x4-upscaler): attn1's keys/values come from
    `context` instead of the hidden — the block has NO self-attention
    (LDM ``disable_self_attentions``). PAG's identity-self-attention
    perturbation is self-attention-specific, so it does not apply to
    cross-only blocks (their attn1 is left untouched); ToMe merges only
    the query rows here (keys/values are text tokens), which stays exact
    under its unmerge.

    `perturb_self` (static): replace the self-attention map with the
    IDENTITY matrix — each token attends only to itself, so the attention
    output is exactly its own value row `v` (perturbed-attention guidance,
    Ahn et al. 2024). The q/k projections are skipped entirely: they
    cannot influence an identity map.

    `tome` (static (hh, ww, ratio) or None): ToMe-SD — merge the ratio
    most redundant tokens (by cosine similarity of the block INPUT, the
    paper's metric) before attn1, unmerge its output after the out
    projection (sdtpu.ops.tome). Cross-attn and the ff run unmerged, the
    paper's default. The identity attention of `perturb_self` has no
    quadratic term, so PAG's perturbed eval never merges."""
    a = p["attn1"]
    hn = _ln(p["ln1"], h)
    if cross_only:
        # x4-upscaler blocks: attn1 is a second CROSS attention
        unmerge = None
        if tome is not None:
            from sdtpu.ops.tome import build

            merge, unmerge, r_ = build(h, tome[0], tome[1], tome[2])
            if r_:
                hn = merge(hn)
            else:
                unmerge = None
        if "kv" in a:  # fused cross projection (like attn2's)
            k, v = jnp.split(dense(a["kv"], context), 2, axis=-1)
        else:
            k, v = dense(a["k"], context), dense(a["v"], context)
        o = dense(a["out"], sdpa(dense(a["q"], hn), k, v, heads,
                                 attn_kernel))
        h = h + (unmerge(o) if unmerge is not None else o)
    elif perturb_self:
        v = (jnp.split(dense(a["qkv"], hn), 3, axis=-1)[2] if "qkv" in a
             else dense(a["v"], hn))
        h = h + dense(a["out"], v)
    else:
        unmerge = None
        if tome is not None:
            from sdtpu.ops.tome import build

            merge, unmerge, r = build(h, tome[0], tome[1], tome[2])
            if r:
                hn = merge(hn)
            else:
                unmerge = None
        if "qkv" in a:  # fused projection (io.params.fuse_attention_projections)
            q, k, v = jnp.split(dense(a["qkv"], hn), 3, axis=-1)
        else:
            q, k, v = dense(a["q"], hn), dense(a["k"], hn), dense(a["v"], hn)
        o = dense(a["out"], sdpa(q, k, v, heads, attn_kernel))
        h = h + (unmerge(o) if unmerge is not None else o)
    a = p["attn2"]
    hn = _ln(p["ln2"], h)
    if "kv" in a:
        k, v = jnp.split(dense(a["kv"], context), 2, axis=-1)
    else:
        k, v = dense(a["k"], context), dense(a["v"], context)
    h = h + dense(a["out"], sdpa(dense(a["q"], hn), k, v, heads, attn_kernel))
    hn = _ln(p["ln3"], h)
    return h + dense(p["ff2"], geglu(p["ff1"], hn))


def _ln(p, x):
    from sdtpu.models.layers import layer_norm

    return layer_norm(p, x)


def _upsample_nearest(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def _heads(cfg: UNetConfig, c: int) -> int:
    """SD1.x: fixed head count; SD2.x: fixed head DIM (heads = C / head_dim,
    so the count grows with channel width)."""
    return c // cfg.head_dim if cfg.head_dim else cfg.num_heads


def _fourier_lowfreq_scale(x, scale, threshold: int = 1):
    """FreeU's skip-feature filter: scale the lowest spatial frequencies
    (a (2*threshold)^2 window around DC after fftshift) by `scale`.
    XLA lowers the FFT natively on TPU; applied in f32, cast back."""
    dt = x.dtype
    f = jnp.fft.fftshift(jnp.fft.fftn(x.astype(jnp.float32), axes=(1, 2)),
                         axes=(1, 2))
    b, hh, ww, c = x.shape
    cr, cc = hh // 2, ww // 2
    row = (jnp.arange(hh) >= cr - threshold) & (jnp.arange(hh) < cr + threshold)
    col = (jnp.arange(ww) >= cc - threshold) & (jnp.arange(ww) < cc + threshold)
    m = jnp.where(row[:, None] & col[None, :], scale, 1.0)
    f = f * m[None, :, :, None]
    out = jnp.fft.ifftn(jnp.fft.ifftshift(f, axes=(1, 2)), axes=(1, 2)).real
    return out.astype(dt)


def _freeu(h, s, cfg: UNetConfig):
    """FreeU (Si et al. 2023): rebalance decoder backbone vs skip features,
    training-free. At the two deepest decoder widths, scale the first half
    of the backbone channels by b and damp the skip's low spatial
    frequencies by s — amplified backbone semantics, reduced skip noise.
    Identity (and not even traced) when cfg.freeu is None; parity with the
    reference FreeU recipe for SD's (1280, 640) widths via the
    channel-width match on model_channels * channel_mult[-1:-3:-1]."""
    b1, b2, s1, s2 = cfg.freeu
    widths = [cfg.model_channels * m
              for m in cfg.channel_mult[::-1][:2]]  # deepest two
    c = h.shape[-1]
    if c == widths[0]:
        bk, sk = b1, s1
    elif len(widths) > 1 and c == widths[1]:
        bk, sk = b2, s2
    else:
        return h, s
    if bk != 1.0:
        half = c // 2
        h = jnp.concatenate(
            [h[..., :half] * jnp.asarray(bk, h.dtype), h[..., half:]],
            axis=-1)
    if sk != 1.0:
        s = _fourier_lowfreq_scale(s, sk)
    return h, s


def apply(
    params,
    x,
    t_emb,
    context,
    cfg: UNetConfig,
    kernels: str = "xla",
    control=None,
    perturb=None,
    deep=None,
):
    """x: [B,H,W,C_in]; t_emb: [B, time_embed_dim] (already MLP-embedded by
    sdtpu.models.temb); context: [B, T, context_dim] -> eps [B,H,W,C_out].

    kernels: 'pallas' uses the fused flash-attention + GroupNorm(+SiLU) TPU
    kernels (sdtpu.ops); 'xla' is the portable fallback.

    control: optional ``(down_residuals, mid_residual)`` from
    sdtpu.models.controlnet.apply (already scaled): one residual per skip
    tensor in push order, added to the skips as the up path consumes them,
    plus one added to the mid output.

    perturb: optional STATIC collection of section tags out of
    ("down", "mid", "up") — self-attention in those sections' spatial
    transformers is replaced by the identity map (perturbed-attention
    guidance; see engine.pipeline.denoise).

    deep: DeepCache (Ma et al. 2023) junction protocol. None = plain
    forward. "capture" = full forward that ALSO returns the deep feature
    at the branch-0 junction — the hidden entering the LAST up level,
    whose value changes slowly across adjacent denoising steps — as
    ``(eps, cache)``. A tensor = SHALLOW forward: compute only conv_in +
    the level-0 down blocks (for the skips the last up level consumes),
    splice the cached junction tensor in place of the whole deep stack
    (deeper downs, mid, deeper ups), and run the last up level + out
    head. See engine.pipeline.denoise(deepcache_interval=...)."""
    perturb = frozenset(perturb or ())
    if not perturb <= {"down", "mid", "up"}:
        raise ValueError(f"unknown perturb sections {sorted(perturb)}; "
                         f"expected a subset of ('down', 'mid', 'up')")
    capture = isinstance(deep, str)
    if capture and deep != "capture":
        raise ValueError(f"deep must be None, 'capture', or a cached "
                         f"junction tensor, got {deep!r}")
    shallow = deep is not None and not capture
    if shallow and control is not None:
        raise ValueError("DeepCache shallow pass is incompatible with "
                         "ControlNet residuals (they enter the deep skips)")
    # optional W-axis activation sharding of the conv stack (no-op unless a
    # sharded jit was built with spatial=True — see parallel/spatial.py)
    from sdtpu.parallel.spatial import constrain

    # ToMe-SD token merging (sdtpu.ops.tome): (ratio, min_tokens) or None,
    # gated per level inside _transformer on the static token count
    tome = ((cfg.tome_ratio, cfg.tome_min_tokens)
            if cfg.tome_ratio > 0.0 else None)
    g = cfg.groups
    h = constrain(conv2d(params["conv_in"], x))
    skips = [h]
    down_levels = params["down"][:1] if shallow else params["down"]
    for lvl, level in enumerate(down_levels):
        for blk in level["blocks"]:
            h = constrain(_resblock(blk["res"], h, t_emb, g, kernels))
            if "st" in blk:
                h = _transformer(blk["st"], h, context,
                                 _heads(cfg, h.shape[-1]), g, kernels,
                                 perturb_self="down" in perturb, tome=tome,
                                 cross_only=lvl in cfg.cross_only_levels)
            skips.append(h)
        if "down" in level and not shallow:
            h = constrain(conv2d(level["down"], h, stride=2))
            skips.append(h)

    ctrl_down = None
    if control is not None:
        ctrl_down, ctrl_mid = control
        if len(ctrl_down) != len(skips):
            raise ValueError(
                f"control residual count {len(ctrl_down)} != skip count "
                f"{len(skips)}")
        ctrl_down = list(ctrl_down)

    if shallow:
        # DeepCache shallow step: the whole deep stack (deeper downs, mid,
        # deeper ups) is replaced by the cached junction feature; the
        # remaining skips are exactly the ones the last up level consumes
        h = deep.astype(h.dtype)
    else:
        mid = params["mid"]
        h = _resblock(mid["res1"], h, t_emb, g, kernels)
        h = _transformer(mid["st"], h, context, _heads(cfg, h.shape[-1]), g,
                         kernels, perturb_self="mid" in perturb, tome=tome)
        h = _resblock(mid["res2"], h, t_emb, g, kernels)
        if control is not None:
            h = h + ctrl_mid.astype(h.dtype)

    cache = None
    up_levels = params["up"][-1:] if shallow else params["up"]
    n_lvls = len(cfg.channel_mult)
    for uidx, level in enumerate(up_levels):
        # params["up"] is stored deepest-first; recover the actual level
        # index (the shallow DeepCache pass runs only level 0)
        lvl = 0 if shallow else n_lvls - 1 - uidx
        if capture and uidx == len(up_levels) - 1:
            cache = h  # branch-0 junction: input to the last up level
        for blk in level["blocks"]:
            s = skips.pop()
            if ctrl_down is not None:
                s = s + ctrl_down.pop().astype(s.dtype)
            if cfg.freeu is not None:
                h, s = _freeu(h, s, cfg)
            h = jnp.concatenate([h, s], axis=-1)
            h = constrain(_resblock(blk["res"], h, t_emb, g, kernels))
            if "st" in blk:
                h = _transformer(blk["st"], h, context,
                                 _heads(cfg, h.shape[-1]), g, kernels,
                                 perturb_self="up" in perturb, tome=tome,
                                 cross_only=lvl in cfg.cross_only_levels)
        if "up" in level:
            h = _upsample_nearest(h)
            h = constrain(conv2d(level["up"], h))

    h = _gn(params["out_norm"], h, g, 1e-5, True, kernels)
    out = conv2d(params["conv_out"], h)
    return (out, cache) if capture else out
