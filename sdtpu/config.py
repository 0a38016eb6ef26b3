"""Model/pipeline configuration.

The reference bakes its architecture into converted QNN graphs
(SURVEY.md §2.3); here the architecture is config-driven so tests run tiny
variants on CPU while production runs SD v1.x on TPU. ``SD15`` mirrors the
Stable Diffusion v1.x graph set the reference converts: 4-ch 64x64 latents,
77x768 text context, 320-ch UNet, 512x512 RGB output
(reference: context.cpp:208-221, README.md:108-113, simple_app.cpp:9-11).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    vocab_size: int = 49408
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: int = 4
    context_len: int = 77
    # SD v1.x uses the final-layer-norm output of the full stack
    eps: float = 1e-5
    act: str = "quick_gelu"      # SD2 (OpenCLIP ViT-H) uses "gelu"
    penultimate: bool = False    # SD2: skip the last block, then final LN
    # A1111 "CLIP skip": run `layers - skip_last` blocks, then the final LN
    # (skip_last = clip_skip - 1; 0 = the config's default tap). Set via
    # Context(clip_skip=...)
    skip_last: int = 0
    # text-projection dim for the pooled embedding (SDXL's OpenCLIP bigG
    # tower projects the eot hidden state to 1280); 0 = no projection leaf
    projection: int = 0


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_levels: Tuple[int, ...] = (0, 1, 2)   # levels with spatial transformers
    num_heads: int = 8
    head_dim: int = 0            # SD2: heads = channels // head_dim (64)
    context_dim: int = 768
    time_embed_dim: int = 1280                 # = 4 * model_channels
    groups: int = 32
    # transformer blocks per spatial-transformer, per level (SDXL: (0,2,10));
    # empty tuple = depth 1 at every attn level (SD1.x/2.x). The mid block
    # uses the LAST level's depth.
    transformer_depth: Tuple[int, ...] = ()
    # input dim of the additive conditioning MLP (SDXL: 2816 = 1280 pooled
    # bigG + 6 x 256 fourier microconds); 0 = no additive conditioning
    adm_in_channels: int = 0
    # FreeU (Si et al. 2023, training-free quality knob): (b1, b2, s1, s2)
    # backbone/skip rebalancing at the two deepest decoder widths; None =
    # off (the bit-exact default). Set via Context(freeu=...)
    freeu: Optional[Tuple[float, float, float, float]] = None
    # ToMe-SD (Bolya & Hoffman 2023): merge this fraction of spatial
    # tokens before each self-attention whose token count is at least
    # tome_min_tokens (4096 = the 64x64 level-0 transformers and up).
    # 0.0 = off (the bit-exact default). Set via Context(tome_ratio=...)
    tome_ratio: float = 0.0
    tome_min_tokens: int = 4096
    # SD x4-upscaler: levels whose transformer attn1 attends the TEXT
    # context instead of self (LDM ``disable_self_attentions`` per level,
    # x4-upscaling.yaml [True, True, True, False] -> the attention levels
    # 1 and 2; the mid block keeps self-attention,
    # ``disable_middle_self_attn: False``)
    cross_only_levels: Tuple[int, ...] = ()
    # noise-level class conditioning: a learned [num_class_embeds,
    # time_embed_dim] embedding table whose selected row ADDS to the time
    # embedding (LDM ``num_classes: 1000`` -> nn.Embedding; diffusers
    # ``num_class_embeds``). 0 = none
    num_class_embeds: int = 0
    # LCM guidance embedding (Luo et al. 2023, latent consistency models):
    # width of the sinusoidal guidance-scale feature that a distilled
    # model's time MLP consumes through an extra bias-free projection
    # (diffusers `time_cond_proj_dim`, 256 for LCM-Dreamshaper/LCM-SDXL).
    # CFG is baked into the model, so the engine runs the cond slot only
    # and embeds w = guidance - 1 instead (engine/pipeline.denoise).
    # 0 = standard UNet (no extra params).
    time_cond_proj_dim: int = 0

    def depth_at(self, lvl: int) -> int:
        if not self.transformer_depth:
            return 1
        return self.transformer_depth[lvl]

    def mid_depth(self) -> int:
        """Transformer depth of the mid block: the deepest ATTENTION level's
        depth (SDXL-refiner's last channel level has no attention but its
        mid block is depth-4, so len(channel_mult)-1 would be wrong)."""
        if not self.transformer_depth:
            return 1
        lvl = max(self.attn_levels) if self.attn_levels else (
            len(self.channel_mult) - 1)
        return self.transformer_depth[lvl]


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    z_channels: int = 4
    base_channels: int = 128
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)   # encoder order; decoder reverses
    num_res_blocks: int = 2                        # decoder uses num_res_blocks + 1
    out_channels: int = 3
    groups: int = 32
    scale_factor: float = 0.18215


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    clip: CLIPConfig = CLIPConfig()
    # second text tower (SDXL: OpenCLIP bigG) — hidden states of both towers
    # concatenate to the cross-attention context; tower 2 also provides the
    # pooled embedding for the UNet's additive conditioning
    clip2: Optional[CLIPConfig] = None
    unet: UNetConfig = UNetConfig()
    vae: VAEConfig = VAEConfig()
    latent_channels: int = 4
    latent_size: int = 64
    upscale: int = 8          # VAE upsampling factor (reference: simple_app.cpp:9-11)
    dtype: str = "bfloat16"   # activation/compute dtype on TPU
    param_dtype: str = "float32"
    prediction: str = "eps"   # "eps" (SD1.x/2.0-base) | "v" (SD2.x 768-v)
    # SDXL-refiner mode: text conditioning comes from tower 2 ONLY (no
    # CLIP-L tree in the params), and the additive microcond vector is
    # (orig_h, orig_w, crop_top, crop_left, aesthetic_score) — 5 fourier
    # blocks instead of txt2img's 6. `clip` stays set (to the tower-2
    # config) so context_len/vocab plumbing is uniform.
    refiner: bool = False
    # static aesthetic-score conditioning value for the refiner microcond
    # (the sgm default for "high quality" guidance)
    aesthetic_score: float = 6.0
    # CFG rescale (Lin et al. 2023, "Common Diffusion Noise Schedules and
    # Sample Steps are Flawed"): blend the guided eps toward a variant
    # rescaled to the cond prediction's per-sample std — fixes the
    # overexposure v-prediction models show at high guidance. 0 = off
    # (bit-exact default). Set via Context(guidance_rescale=...)
    guidance_rescale: float = 0.0
    # SD x4-upscaler noise augmentation cap: the low-res conditioning
    # image is forward-diffused on an IMAGE-SPACE sqrt-linear schedule
    # (1e-4 -> 2e-2) to a caller-chosen level < max_noise_level, and that
    # level conditions the UNet through the class-embedding table
    # (x4-upscaling.yaml low_scale_config max_noise_level: 350)
    max_noise_level: int = 350
    # DeepCache (Ma et al. 2023, arXiv:2312.00858): every N-th denoising
    # step runs the full UNet and caches the slow-changing deep feature at
    # the branch-0 junction; the other steps recompute only the shallow
    # level-0 blocks and splice the cache in (models/unet.apply `deep`).
    # None = off (the bit-exact default). Set via Context(deepcache=N)
    deepcache_interval: Optional[int] = None

    @property
    def image_size(self) -> int:
        return self.latent_size * self.upscale

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


SD15 = PipelineConfig()

# Stable Diffusion 2.1 (768-v): OpenCLIP ViT-H text tower (penultimate layer,
# GELU), head_dim-64 UNet attention, v-prediction objective, 768x768 output.
SD21 = PipelineConfig(
    clip=CLIPConfig(hidden=1024, layers=23, heads=16, act="gelu",
                    penultimate=False),  # 23 = 24 - 1, penultimate pre-cut
    unet=UNetConfig(num_heads=0, head_dim=64, context_dim=1024),
    latent_size=96,
    prediction="v",
)

# SD 2.1-base (512, eps-prediction), same towers
SD21_BASE = dataclasses.replace(SD21, latent_size=64, prediction="eps")

# Dedicated inpainting checkpoints (sd-v1-5-inpainting /
# stable-diffusion-2-inpainting): the UNet's conv_in takes 9 channels —
# concat(latents 4, downsampled mask 1, masked-image latents 4) at every
# step (the RunwayML inpaint-UNet convention). The engine routes
# Context.inpaint to the concat-conditioned program automatically when
# unet.in_channels == 2 * latent_channels + 1 (engine/pipeline.inpaint);
# otherwise the mask-pinning legacy path runs. Beyond the reference's
# txt2img-only scope.
SD15_INPAINT = dataclasses.replace(
    SD15, unet=dataclasses.replace(SD15.unet, in_channels=9))
SD21_INPAINT = dataclasses.replace(
    SD21_BASE, unet=dataclasses.replace(SD21_BASE.unet, in_channels=9))

# Depth-conditioned img2img (stable-diffusion-2-depth): 5 input channels —
# concat(latents 4, per-sample min/max-normalized depth 1) on the SD2-base
# (512, eps) architecture. The depth map is caller-provided (any monocular
# depth estimator; MiDaS upstream).
SD2_DEPTH = dataclasses.replace(
    SD21_BASE, unet=dataclasses.replace(SD21_BASE.unet, in_channels=5))

# InstructPix2Pix (timbrooks/instruct-pix2pix, SD1.5-based): 8 input
# channels — concat(latents 4, edit image's unscaled posterior-mode
# latents 4) — with dual text/image CFG (Context.instruct_pix2pix).
SD15_IP2P = dataclasses.replace(
    SD15, unet=dataclasses.replace(SD15.unet, in_channels=8))

# Latent-consistency distilled SD1.5 (e.g. SimianLuo/LCM_Dreamshaper_v7):
# the SD15 graph plus a 256-wide guidance-embedding projection in the time
# MLP; serve with sampler="lcm" at 2-8 steps, guidance embedded (no CFG
# batch). Architecture per the diffusers LCM UNet (time_cond_proj_dim=256).
SD15_LCM = dataclasses.replace(
    SD15, unet=dataclasses.replace(SD15.unet, time_cond_proj_dim=256))

# SD x4 latent upscaler (stabilityai/stable-diffusion-x4-upscaler,
# x4-upscaling.yaml): the 7-channel UNet takes concat(latents 4,
# noise-augmented low-res RGB 3) at the LOW-RES grid, conditions on the
# augmentation level through a 1000-row class-embedding table, attends
# text cross-only at levels 1-2 (disable_self_attentions), and decodes
# through an f=4 VAE (ch_mult 1,2,4, scale_factor 0.08333) -> 4x output.
# v-prediction; OpenCLIP ViT-H text tower (the SD2.x tower).
# Serve with Context.upscale(prompt, low_res_image, noise_level).
SD_X4 = PipelineConfig(
    clip=CLIPConfig(hidden=1024, layers=23, heads=16, act="gelu"),
    unet=UNetConfig(in_channels=7, model_channels=256,
                    channel_mult=(1, 2, 2, 4), attn_levels=(1, 2, 3),
                    num_heads=8, context_dim=1024, time_embed_dim=1024,
                    cross_only_levels=(1, 2), num_class_embeds=1000),
    vae=VAEConfig(channel_mult=(1, 2, 4), scale_factor=0.08333),
    latent_size=128,
    upscale=4,
    prediction="v",
)

# Stable Diffusion XL base (1024x1024): dual text towers (CLIP-L penultimate
# hidden + OpenCLIP bigG penultimate hidden, concat -> 2048-dim context),
# bigG pooled + size/crop microcond fourier vector through an additive
# conditioning MLP (adm 2816 -> 1280), 3-level UNet with NO attention at
# level 0 and transformer depth (–, 2, 10), head_dim-64 attention.
# Beyond the reference's SD1.x/2.x scope (ROADMAP "SDXL-family config").
SDXL = PipelineConfig(
    clip=CLIPConfig(),  # CLIP-L tower; XL taps its penultimate hidden state
    clip2=CLIPConfig(hidden=1280, layers=32, heads=20, act="gelu",
                     projection=1280),
    unet=UNetConfig(channel_mult=(1, 2, 4), attn_levels=(1, 2),
                    transformer_depth=(0, 2, 10), num_heads=0, head_dim=64,
                    context_dim=2048, adm_in_channels=2816),
    vae=VAEConfig(scale_factor=0.13025),
    latent_size=128,
)

# SDXL inpainting (diffusers stable-diffusion-xl-1.0-inpainting: the XL
# graph with the RunwayML 9-channel conv_in — latents 4 + latent-res mask
# 1 + VAE-encoded masked image 4). Context.inpaint routes to the
# concat-conditioned program automatically (in_channels == 2*lc + 1).
SDXL_INPAINT = dataclasses.replace(
    SDXL, unet=dataclasses.replace(SDXL.unet, in_channels=9))

# SDXL refiner (1024x1024, the second stage of the XL two-stage pipeline):
# ONE text tower (OpenCLIP bigG penultimate hidden -> 1280-dim context),
# pooled bigG + (size, crop, aesthetic-score) microconds through the
# additive MLP (adm 2560 -> 1536), 384-channel 4-level UNet with depth-4
# transformers at levels 1/2 only. Consumes the base model's latents at a
# chosen noise level (Context.refine / generate(denoising_end=...)).
_XL_BIGG = CLIPConfig(hidden=1280, layers=32, heads=20, act="gelu",
                      projection=1280)
SDXL_REFINER = PipelineConfig(
    clip=_XL_BIGG,   # context_len/vocab plumbing; no tower-1 params exist
    clip2=_XL_BIGG,
    unet=UNetConfig(model_channels=384, channel_mult=(1, 2, 4, 4),
                    attn_levels=(1, 2), transformer_depth=(0, 4, 4, 0),
                    num_heads=0, head_dim=64, context_dim=1280,
                    time_embed_dim=1536, adm_in_channels=2560),
    vae=VAEConfig(scale_factor=0.13025),
    latent_size=128,
    refiner=True,
)

# Tiny refiner-topology config for CPU-backend tests: single tower,
# aesthetic microcond, no level-0 attention. adm_in = projection 16 +
# 5 fourier dims x 8 = 56.
TINY_XL_REF = PipelineConfig(
    clip=CLIPConfig(vocab_size=512 + 22 + 2, hidden=48, layers=3, heads=2,
                    context_len=16, act="gelu", projection=16),
    clip2=CLIPConfig(vocab_size=512 + 22 + 2, hidden=48, layers=3, heads=2,
                     context_len=16, act="gelu", projection=16),
    unet=UNetConfig(model_channels=16, channel_mult=(1, 2), num_res_blocks=1,
                    attn_levels=(1,), transformer_depth=(0, 2), num_heads=2,
                    context_dim=48, time_embed_dim=64, groups=4,
                    adm_in_channels=56),
    vae=VAEConfig(base_channels=16, channel_mult=(1, 2), num_res_blocks=1,
                  groups=4),
    latent_size=8,
    upscale=2,
    dtype="float32",
    refiner=True,
)

# Tiny SDXL-topology config for CPU-backend tests: dual towers, depth-2
# transformers, additive conditioning — every XL code path, ~1000x fewer
# FLOPs. adm_in = projection 16 + 6 fourier dims x 8 = 64.
TINY_XL = PipelineConfig(
    clip=CLIPConfig(vocab_size=512 + 22 + 2, hidden=32, layers=2, heads=2,
                    context_len=16),
    clip2=CLIPConfig(vocab_size=512 + 22 + 2, hidden=48, layers=3, heads=2,
                     context_len=16, act="gelu", projection=16),
    unet=UNetConfig(model_channels=16, channel_mult=(1, 2), num_res_blocks=1,
                    attn_levels=(1,), transformer_depth=(0, 2), num_heads=2,
                    context_dim=80, time_embed_dim=64, groups=4,
                    adm_in_channels=64),
    vae=VAEConfig(base_channels=16, channel_mult=(1, 2), num_res_blocks=1,
                  groups=4),
    latent_size=8,
    upscale=2,
    dtype="float32",
)

# Tiny config for CPU-backend tests: same topology, ~1000x fewer FLOPs.
TINY = PipelineConfig(
    clip=CLIPConfig(vocab_size=512 + 22 + 2, hidden=32, layers=2, heads=2,
                    context_len=16),
    unet=UNetConfig(model_channels=16, channel_mult=(1, 2), num_res_blocks=1,
                    attn_levels=(0, 1), num_heads=2, context_dim=32,
                    time_embed_dim=64, groups=4),
    vae=VAEConfig(base_channels=16, channel_mult=(1, 2), num_res_blocks=1,
                  groups=4),
    latent_size=8,
    upscale=2,
    dtype="float32",
)


# Tiny concat-conditioned variants (CPU-backend tests): the 9-ch inpaint
# and 5-ch depth UNet code paths at TINY scale.
TINY_LCM = dataclasses.replace(
    TINY, unet=dataclasses.replace(TINY.unet, time_cond_proj_dim=8))
# Tiny x4-upscaler topology (CPU tests): 7-ch input, cross-only attn at
# level 0 (self kept at level 1), 20-row class table, f=2 VAE
TINY_X4 = dataclasses.replace(
    TINY,
    unet=dataclasses.replace(TINY.unet, in_channels=7,
                             cross_only_levels=(0,), num_class_embeds=20),
    max_noise_level=16,
    prediction="v",
)
TINY_INPAINT = dataclasses.replace(
    TINY, unet=dataclasses.replace(TINY.unet, in_channels=9))
TINY_DEPTH = dataclasses.replace(
    TINY, unet=dataclasses.replace(TINY.unet, in_channels=5))
TINY_IP2P = dataclasses.replace(
    TINY, unet=dataclasses.replace(TINY.unet, in_channels=8))
TINY_XL_INPAINT = dataclasses.replace(
    TINY_XL, unet=dataclasses.replace(TINY_XL.unet, in_channels=9))


#: name -> config registry (Context(config=...), CLI --config, tests)
CONFIGS = {
    "sd15": SD15,
    "sd15_inpaint": SD15_INPAINT,
    "sd15_ip2p": SD15_IP2P,
    "sd15_lcm": SD15_LCM,
    "sd21": SD21,
    "sd21base": SD21_BASE,
    "sd21_inpaint": SD21_INPAINT,
    "sd2_depth": SD2_DEPTH,
    "sd_x4": SD_X4,
    "sdxl": SDXL,
    "sdxl_inpaint": SDXL_INPAINT,
    "sdxl_refiner": SDXL_REFINER,
    "tiny": TINY,
    "tiny_inpaint": TINY_INPAINT,
    "tiny_lcm": TINY_LCM,
    "tiny_x4": TINY_X4,
    "tiny_depth": TINY_DEPTH,
    "tiny_ip2p": TINY_IP2P,
    "tiny_xl": TINY_XL,
    "tiny_xl_inpaint": TINY_XL_INPAINT,
    "tiny_xl_ref": TINY_XL_REF,
}
