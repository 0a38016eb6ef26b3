"""Checkpoint loading: Stable Diffusion v1.x LDM-layout weights -> sdtpu pytrees.

This replaces the reference's offline conversion pipeline (ONNX -> QNN
context binaries -> objcopy'd HTP blobs, reference: todlc.py:104-108,
extract_htp_blobs.sh) with a direct mapping from the standard SD checkpoint
format (CompVis/LDM naming, e.g. ``v1-5-pruned-emaonly.safetensors``:
``model.diffusion_model.*`` / ``cond_stage_model.*`` / ``first_stage_model.*``)
into the functional param pytrees. The map is generated from the SAME config
loops that build the trees (sdtpu.models.*.init), so block indices cannot
drift from the architecture.

Conventions: torch Linear kernels are [out, in] -> transposed to [in, out];
torch conv kernels are OIHW -> transposed to HWIO; norms map directly.

Also provides the inverse (``params_to_ldm``) for round-trip testing and
checkpoint export.
"""

from __future__ import annotations

from pathlib import Path
from typing import NamedTuple

import numpy as np

from sdtpu.config import PipelineConfig


class Rule(NamedTuple):
    ldm: str            # LDM key prefix (without .weight/.bias suffix)
    path: tuple         # path into our pytree (without final w/b/scale/bias)
    kind: str           # 'linear' | 'conv' | 'norm' | 'embed'


# ---------------------------------------------------------------------------
# rule generation (mirrors models/*.init loops)
# ---------------------------------------------------------------------------

def _st_rules(ldm_prefix: str, path: tuple, depth: int = 1) -> list[Rule]:
    rules = [
        Rule(ldm_prefix + "norm", path + ("norm",), "norm"),
        Rule(ldm_prefix + "proj_in", path + ("proj_in",), "conv"),
    ]
    for d in range(depth):
        tb = ldm_prefix + f"transformer_blocks.{d}."
        # depth 1 keeps the basic-block leaves flat (SD1.x/2.x layout);
        # depth > 1 nests them (SDXL — models/unet._init_transformer)
        bp = path if depth == 1 else path + ("blocks", d)
        rules += [
            Rule(tb + "norm1", bp + ("ln1",), "norm"),
            Rule(tb + "attn1.to_q", bp + ("attn1", "q"), "linear"),
            Rule(tb + "attn1.to_k", bp + ("attn1", "k"), "linear"),
            Rule(tb + "attn1.to_v", bp + ("attn1", "v"), "linear"),
            Rule(tb + "attn1.to_out.0", bp + ("attn1", "out"), "linear"),
            Rule(tb + "norm2", bp + ("ln2",), "norm"),
            Rule(tb + "attn2.to_q", bp + ("attn2", "q"), "linear"),
            Rule(tb + "attn2.to_k", bp + ("attn2", "k"), "linear"),
            Rule(tb + "attn2.to_v", bp + ("attn2", "v"), "linear"),
            Rule(tb + "attn2.to_out.0", bp + ("attn2", "out"), "linear"),
            Rule(tb + "norm3", bp + ("ln3",), "norm"),
            Rule(tb + "ff.net.0.proj", bp + ("ff1",), "linear"),
            Rule(tb + "ff.net.2", bp + ("ff2",), "linear"),
        ]
    rules.append(Rule(ldm_prefix + "proj_out", path + ("proj_out",), "conv"))
    return rules


def _res_rules(ldm_prefix: str, path: tuple, has_skip: bool) -> list[Rule]:
    rules = [
        Rule(ldm_prefix + "in_layers.0", path + ("norm1",), "norm"),
        Rule(ldm_prefix + "in_layers.2", path + ("conv1",), "conv"),
        Rule(ldm_prefix + "emb_layers.1", path + ("emb",), "linear"),
        Rule(ldm_prefix + "out_layers.0", path + ("norm2",), "norm"),
        Rule(ldm_prefix + "out_layers.3", path + ("conv2",), "conv"),
    ]
    if has_skip:
        rules.append(Rule(ldm_prefix + "skip_connection", path + ("skip",), "conv"))
    return rules


def unet_rules(cfg: PipelineConfig) -> list[Rule]:
    u = cfg.unet
    pre = "model.diffusion_model."
    rules = [
        Rule(pre + "time_embed.0", ("temb", "fc0"), "linear"),
        Rule(pre + "time_embed.2", ("temb", "fc1"), "linear"),
        Rule(pre + "input_blocks.0.0", ("unet", "conv_in"), "conv"),
    ]
    if u.time_cond_proj_dim:
        # LCM guidance-embedding projection (bias-free). LDM never had this
        # layer, so there is no canonical LDM key; we use the natural
        # ``time_embed.cond_proj`` (diffusers: time_embedding.cond_proj).
        rules.append(Rule(pre + "time_embed.cond_proj",
                          ("temb", "cond_proj"), "linear"))
    if u.num_class_embeds:
        # x4-upscaler noise-level class table (LDM num_classes ->
        # nn.Embedding -> "label_emb.weight")
        rules.append(Rule(pre + "label_emb", ("unet", "label_emb"), "embed"))
    ch = u.model_channels
    cur = ch
    idx = 1
    skip_chs = [ch]
    for lvl, mult in enumerate(u.channel_mult):
        out_ch = ch * mult
        for b in range(u.num_res_blocks):
            p = ("unet", "down", lvl, "blocks", b)
            rules += _res_rules(f"{pre}input_blocks.{idx}.0.", p + ("res",),
                                has_skip=cur != out_ch)
            cur = out_ch
            if lvl in u.attn_levels:
                rules += _st_rules(f"{pre}input_blocks.{idx}.1.", p + ("st",),
                                   depth=u.depth_at(lvl))
            skip_chs.append(cur)
            idx += 1
        if lvl != len(u.channel_mult) - 1:
            rules.append(Rule(f"{pre}input_blocks.{idx}.0.op",
                              ("unet", "down", lvl, "down"), "conv"))
            skip_chs.append(cur)
            idx += 1

    rules += _res_rules(pre + "middle_block.0.", ("unet", "mid", "res1"), False)
    rules += _st_rules(pre + "middle_block.1.", ("unet", "mid", "st"),
                       depth=u.mid_depth())
    rules += _res_rules(pre + "middle_block.2.", ("unet", "mid", "res2"), False)

    idx = 0
    for k, lvl in enumerate(reversed(range(len(u.channel_mult)))):
        out_ch = ch * u.channel_mult[lvl]
        for b in range(u.num_res_blocks + 1):
            skip = skip_chs.pop()
            p = ("unet", "up", k, "blocks", b)
            rules += _res_rules(f"{pre}output_blocks.{idx}.0.", p + ("res",),
                                has_skip=cur + skip != out_ch)
            cur = out_ch
            comp = 1
            if lvl in u.attn_levels:
                rules += _st_rules(f"{pre}output_blocks.{idx}.{comp}.",
                                   p + ("st",), depth=u.depth_at(lvl))
                comp += 1
            if b == u.num_res_blocks and lvl != 0:
                rules.append(Rule(
                    f"{pre}output_blocks.{idx}.{comp}.conv",
                    ("unet", "up", k, "up"), "conv",
                ))
            idx += 1

    rules += [
        Rule(pre + "out.0", ("unet", "out_norm"), "norm"),
        Rule(pre + "out.2", ("unet", "conv_out"), "conv"),
    ]
    if u.adm_in_channels:
        # SDXL pooled/microcond MLP (sgm names it label_emb)
        rules += [
            Rule(pre + "label_emb.0.0", ("add_mlp", "fc0"), "linear"),
            Rule(pre + "label_emb.0.2", ("add_mlp", "fc1"), "linear"),
        ]
    return rules


def clip_rules(cfg: PipelineConfig,
               pre: str = "cond_stage_model.transformer.text_model.",
               ) -> list[Rule]:
    rules = [
        Rule(pre + "embeddings.token_embedding", ("clip", "token_embedding"),
             "embed"),
        Rule(pre + "embeddings.position_embedding",
             ("clip", "position_embedding"), "embed"),
        Rule(pre + "final_layer_norm", ("clip", "final_ln"), "norm"),
    ]
    for i in range(cfg.clip.layers):
        b = f"{pre}encoder.layers.{i}."
        p = ("clip", "blocks", i)
        rules += [
            Rule(b + "layer_norm1", p + ("ln1",), "norm"),
            Rule(b + "self_attn.q_proj", p + ("q",), "linear"),
            Rule(b + "self_attn.k_proj", p + ("k",), "linear"),
            Rule(b + "self_attn.v_proj", p + ("v",), "linear"),
            Rule(b + "self_attn.out_proj", p + ("out",), "linear"),
            Rule(b + "layer_norm2", p + ("ln2",), "norm"),
            Rule(b + "mlp.fc1", p + ("fc1",), "linear"),
            Rule(b + "mlp.fc2", p + ("fc2",), "linear"),
        ]
    return rules


def vae_rules(cfg: PipelineConfig) -> list[Rule]:
    v = cfg.vae
    pre = "first_stage_model."
    dec = pre + "decoder."
    rules = [
        Rule(pre + "post_quant_conv", ("vae", "post_quant"), "conv"),
        Rule(dec + "conv_in", ("vae", "conv_in"), "conv"),
    ]

    def res(ldm, path, c_in, c_out):
        out = [
            Rule(ldm + "norm1", path + ("norm1",), "norm"),
            Rule(ldm + "conv1", path + ("conv1",), "conv"),
            Rule(ldm + "norm2", path + ("norm2",), "norm"),
            Rule(ldm + "conv2", path + ("conv2",), "conv"),
        ]
        if c_in != c_out:
            out.append(Rule(ldm + "nin_shortcut", path + ("nin",), "conv"))
        return out

    widest = v.base_channels * v.channel_mult[-1]
    rules += res(dec + "mid.block_1.", ("vae", "mid", "res1"), widest, widest)
    rules += [
        Rule(dec + "mid.attn_1.norm", ("vae", "mid", "attn", "norm"), "norm"),
        Rule(dec + "mid.attn_1.q", ("vae", "mid", "attn", "q"), "conv"),
        Rule(dec + "mid.attn_1.k", ("vae", "mid", "attn", "k"), "conv"),
        Rule(dec + "mid.attn_1.v", ("vae", "mid", "attn", "v"), "conv"),
        Rule(dec + "mid.attn_1.proj_out", ("vae", "mid", "attn", "proj"), "conv"),
    ]
    rules += res(dec + "mid.block_2.", ("vae", "mid", "res2"), widest, widest)

    # LDM stores decoder levels as up[i_level] (0 = finest); processing order
    # is reversed, and our params["up"] list is in processing order.
    cur = widest
    n_lvl = len(v.channel_mult)
    for k, lvl in enumerate(reversed(range(n_lvl))):
        out_ch = v.base_channels * v.channel_mult[lvl]
        for b in range(v.num_res_blocks + 1):
            rules += res(
                f"{dec}up.{lvl}.block.{b}.",
                ("vae", "up", k, "blocks", b), cur, out_ch,
            )
            cur = out_ch
        if lvl != 0:
            rules.append(Rule(f"{dec}up.{lvl}.upsample.conv",
                              ("vae", "up", k, "up"), "conv"))
    rules += [
        Rule(dec + "norm_out", ("vae", "norm_out"), "norm"),
        Rule(dec + "conv_out", ("vae", "conv_out"), "conv"),
    ]

    # encoder (img2img; every SD checkpoint carries it)
    enc = pre + "encoder."
    rules += [
        Rule(enc + "conv_in", ("vae_enc", "conv_in"), "conv"),
        Rule(pre + "quant_conv", ("vae_enc", "quant"), "conv"),
    ]
    cur = v.base_channels
    for lvl, mult in enumerate(v.channel_mult):
        out_ch = v.base_channels * mult
        for b in range(v.num_res_blocks):
            rules += res(
                f"{enc}down.{lvl}.block.{b}.",
                ("vae_enc", "down", lvl, "blocks", b), cur, out_ch,
            )
            cur = out_ch
        if lvl != n_lvl - 1:
            rules.append(Rule(f"{enc}down.{lvl}.downsample.conv",
                              ("vae_enc", "down", lvl, "down"), "conv"))
    rules += res(enc + "mid.block_1.", ("vae_enc", "mid", "res1"), cur, cur)
    rules += [
        Rule(enc + "mid.attn_1.norm", ("vae_enc", "mid", "attn", "norm"), "norm"),
        Rule(enc + "mid.attn_1.q", ("vae_enc", "mid", "attn", "q"), "conv"),
        Rule(enc + "mid.attn_1.k", ("vae_enc", "mid", "attn", "k"), "conv"),
        Rule(enc + "mid.attn_1.v", ("vae_enc", "mid", "attn", "v"), "conv"),
        Rule(enc + "mid.attn_1.proj_out", ("vae_enc", "mid", "attn", "proj"),
             "conv"),
    ]
    rules += res(enc + "mid.block_2.", ("vae_enc", "mid", "res2"), cur, cur)
    rules += [
        Rule(enc + "norm_out", ("vae_enc", "norm_out"), "norm"),
        Rule(enc + "conv_out", ("vae_enc", "conv_out"), "conv"),
    ]
    return rules


def all_rules(cfg: PipelineConfig, include_clip: bool = True) -> list[Rule]:
    rules = unet_rules(cfg) + vae_rules(cfg)
    if include_clip:
        rules += clip_rules(cfg)
    return rules


def controlnet_rules(cfg: PipelineConfig,
                     pre: str = "control_model.") -> list[Rule]:
    """LDM ControlNet checkpoint keys (``control_model.*``) -> the
    sdtpu.models.controlnet param tree (paths relative to the CN tree root).
    The encoder section mirrors unet_rules' input/middle loops; on top:
    ``input_hint_block`` (convs at even submodule indices — odd are SiLUs),
    ``zero_convs.N.0`` (one per skip, push order) and ``middle_block_out.0``."""
    u = cfg.unet
    rules = [
        Rule(pre + "time_embed.0", ("temb", "fc0"), "linear"),
        Rule(pre + "time_embed.2", ("temb", "fc1"), "linear"),
        Rule(pre + "input_blocks.0.0", ("conv_in",), "conv"),
    ]
    for k in range(8):  # 7 body convs + the zero projection
        rules.append(Rule(f"{pre}input_hint_block.{2 * k}",
                          ("hint", k), "conv"))
    ch = u.model_channels
    cur = ch
    idx = 1
    z = 0
    rules.append(Rule(f"{pre}zero_convs.{z}.0", ("zero", z), "conv"))
    z += 1
    for lvl, mult in enumerate(u.channel_mult):
        out_ch = ch * mult
        for b in range(u.num_res_blocks):
            p = ("down", lvl, "blocks", b)
            rules += _res_rules(f"{pre}input_blocks.{idx}.0.", p + ("res",),
                                has_skip=cur != out_ch)
            cur = out_ch
            if lvl in u.attn_levels:
                rules += _st_rules(f"{pre}input_blocks.{idx}.1.", p + ("st",),
                                   depth=u.depth_at(lvl))
            rules.append(Rule(f"{pre}zero_convs.{z}.0", ("zero", z), "conv"))
            z += 1
            idx += 1
        if lvl != len(u.channel_mult) - 1:
            rules.append(Rule(f"{pre}input_blocks.{idx}.0.op",
                              ("down", lvl, "down"), "conv"))
            rules.append(Rule(f"{pre}zero_convs.{z}.0", ("zero", z), "conv"))
            z += 1
            idx += 1
    rules += _res_rules(pre + "middle_block.0.", ("mid", "res1"), False)
    rules += _st_rules(pre + "middle_block.1.", ("mid", "st"),
                       depth=u.mid_depth())
    rules += _res_rules(pre + "middle_block.2.", ("mid", "res2"), False)
    rules.append(Rule(pre + "middle_block_out.0", ("zero_mid",), "conv"))
    return rules


def load_controlnet_state_dict(tensors: dict, cfg: PipelineConfig,
                               strict: bool = True):
    """LDM-named ControlNet {key: array} -> controlnet param pytree."""
    params: dict = {}
    missing = []
    for rule in controlnet_rules(cfg):
        for ldm_suffix, ours in _SUFFIX[rule.kind]:
            key = f"{rule.ldm}.{ldm_suffix}"
            if key not in tensors:
                if ldm_suffix == "bias":
                    continue
                missing.append(key)
                continue
            arr = np.asarray(tensors[key], np.float32)
            name = ours if ours is not None else None
            val = _from_ldm(rule.kind, name or "w", arr) if name else arr
            path = rule.path + ((name,) if name else ())
            _tree_set(params, path, val)
    if strict and missing:
        raise KeyError(
            f"{len(missing)} ControlNet keys missing, first: {missing[:5]}"
        )
    return params


def controlnet_to_ldm(params, cfg: PipelineConfig,
                      pre: str = "control_model.") -> dict:
    """Inverse mapping (export / round-trip tests)."""
    out = {}
    for rule in controlnet_rules(cfg, pre):
        node = _tree_get(params, rule.path)
        for ldm_suffix, ours in _SUFFIX[rule.kind]:
            if ours is not None and ours not in node:
                continue
            arr = np.asarray(node[ours] if ours else node, np.float32)
            out[f"{rule.ldm}.{ldm_suffix}"] = _to_ldm(rule.kind, ours or "w", arr)
    return out


# ---------------------------------------------------------------------------
# OpenCLIP text tower (SD 2.x checkpoints: cond_stage_model.model.*)
# ---------------------------------------------------------------------------

OPENCLIP_PREFIX = "cond_stage_model.model."
#: SDXL checkpoint tower prefixes (sgm conditioner layout)
XL_CLIP_PREFIX = "conditioner.embedders.0.transformer.text_model."
XL_CLIP2_PREFIX = "conditioner.embedders.1.model."
#: SDXL-refiner: the bigG tower is the FIRST (and only) embedder
XL_REFINER_CLIP2_PREFIX = "conditioner.embedders.0.model."


def openclip_text_to_tree(tensors: dict, cfg: PipelineConfig,
                          pre: str = OPENCLIP_PREFIX, ccfg=None) -> dict:
    """SD 2.x / SDXL LDM keys (OpenCLIP naming, fused in_proj qkv) -> our
    clip tree. ``ccfg`` selects which tower config to read (default
    cfg.clip; SDXL passes cfg.clip2 with the embedders.1 prefix — its
    ``text_projection`` maps to our pooled-projection leaf ``text_proj``).

    Checkpoints carry the full tower; ccfg.layers selects how many blocks
    to load (SD2 consumes the penultimate layer, so SD21 uses 23; SDXL
    loads all 32 bigG blocks — apply_xl taps the penultimate itself)."""
    ccfg = ccfg or cfg.clip
    d = ccfg.hidden

    def t(name):
        return np.asarray(tensors[pre + name], np.float32)

    params = {
        "token_embedding": t("token_embedding.weight"),
        "position_embedding": t("positional_embedding"),
        "final_ln": {"scale": t("ln_final.weight"), "bias": t("ln_final.bias")},
        "blocks": [],
    }
    if ccfg.projection and pre + "text_projection" in tensors:
        # OpenCLIP stores text_projection as [d, proj], used as x @ W
        params["text_proj"] = t("text_projection")
    for i in range(ccfg.layers):
        b = f"transformer.resblocks.{i}."
        in_w = t(b + "attn.in_proj_weight")   # [3d, d] torch layout
        in_b = t(b + "attn.in_proj_bias")     # [3d]
        qw, kw, vw = in_w[:d], in_w[d:2 * d], in_w[2 * d:]
        qb, kb, vb = in_b[:d], in_b[d:2 * d], in_b[2 * d:]
        params["blocks"].append({
            "ln1": {"scale": t(b + "ln_1.weight"), "bias": t(b + "ln_1.bias")},
            "q": {"w": np.ascontiguousarray(qw.T), "b": qb},
            "k": {"w": np.ascontiguousarray(kw.T), "b": kb},
            "v": {"w": np.ascontiguousarray(vw.T), "b": vb},
            "out": {"w": np.ascontiguousarray(t(b + "attn.out_proj.weight").T),
                    "b": t(b + "attn.out_proj.bias")},
            "ln2": {"scale": t(b + "ln_2.weight"), "bias": t(b + "ln_2.bias")},
            "fc1": {"w": np.ascontiguousarray(t(b + "mlp.c_fc.weight").T),
                    "b": t(b + "mlp.c_fc.bias")},
            "fc2": {"w": np.ascontiguousarray(t(b + "mlp.c_proj.weight").T),
                    "b": t(b + "mlp.c_proj.bias")},
        })
    return params


def tree_to_openclip_text(clip_params, cfg: PipelineConfig,
                          pre: str = OPENCLIP_PREFIX) -> dict:
    """Inverse of openclip_text_to_tree (round-trip tests / export)."""
    out = {
        pre + "token_embedding.weight": np.asarray(
            clip_params["token_embedding"], np.float32),
        pre + "positional_embedding": np.asarray(
            clip_params["position_embedding"], np.float32),
        pre + "ln_final.weight": np.asarray(
            clip_params["final_ln"]["scale"], np.float32),
        pre + "ln_final.bias": np.asarray(
            clip_params["final_ln"]["bias"], np.float32),
    }
    if "text_proj" in clip_params:
        out[pre + "text_projection"] = np.asarray(
            clip_params["text_proj"], np.float32)
    for i, blk in enumerate(clip_params["blocks"]):
        b = f"{pre}transformer.resblocks.{i}."
        qw = np.asarray(blk["q"]["w"], np.float32).T
        kw = np.asarray(blk["k"]["w"], np.float32).T
        vw = np.asarray(blk["v"]["w"], np.float32).T
        out[b + "attn.in_proj_weight"] = np.concatenate([qw, kw, vw], 0)
        out[b + "attn.in_proj_bias"] = np.concatenate(
            [np.asarray(blk[k]["b"], np.float32) for k in "qkv"], 0)
        out[b + "attn.out_proj.weight"] = np.asarray(
            blk["out"]["w"], np.float32).T
        out[b + "attn.out_proj.bias"] = np.asarray(blk["out"]["b"], np.float32)
        out[b + "ln_1.weight"] = np.asarray(blk["ln1"]["scale"], np.float32)
        out[b + "ln_1.bias"] = np.asarray(blk["ln1"]["bias"], np.float32)
        out[b + "ln_2.weight"] = np.asarray(blk["ln2"]["scale"], np.float32)
        out[b + "ln_2.bias"] = np.asarray(blk["ln2"]["bias"], np.float32)
        out[b + "mlp.c_fc.weight"] = np.asarray(blk["fc1"]["w"], np.float32).T
        out[b + "mlp.c_fc.bias"] = np.asarray(blk["fc1"]["b"], np.float32)
        out[b + "mlp.c_proj.weight"] = np.asarray(blk["fc2"]["w"], np.float32).T
        out[b + "mlp.c_proj.bias"] = np.asarray(blk["fc2"]["b"], np.float32)
    return out


# ---------------------------------------------------------------------------
# tensor transforms
# ---------------------------------------------------------------------------

def _from_ldm(kind: str, name: str, arr: np.ndarray) -> np.ndarray:
    if kind == "linear" and name == "w":
        return np.ascontiguousarray(arr.T)
    if kind == "conv" and name == "w":
        if arr.ndim == 2:  # some checkpoints store 1x1 convs as [O, I]
            arr = arr[:, :, None, None]
        return np.ascontiguousarray(arr.transpose(2, 3, 1, 0))  # OIHW->HWIO
    return arr


def _to_ldm(kind: str, name: str, arr: np.ndarray) -> np.ndarray:
    if kind == "linear" and name == "w":
        return np.ascontiguousarray(arr.T)
    if kind == "conv" and name == "w":
        return np.ascontiguousarray(arr.transpose(3, 2, 0, 1))  # HWIO->OIHW
    return arr


_SUFFIX = {
    "linear": [("weight", "w"), ("bias", "b")],
    "conv": [("weight", "w"), ("bias", "b")],
    "norm": [("weight", "scale"), ("bias", "bias")],
    "embed": [("weight", None)],
}


def _tree_set(tree, path, value):
    node = tree
    for i, k in enumerate(path[:-1]):
        nxt = path[i + 1]
        empty = [] if isinstance(nxt, int) else {}
        if isinstance(k, int):
            while len(node) <= k:
                node.append(None)
            if node[k] is None:
                node[k] = empty
            node = node[k]
        else:
            if k not in node:
                node[k] = empty
            node = node[k]
    node[path[-1]] = value


def _tree_get(tree, path):
    node = tree
    for k in path:
        node = node[k]
    return node


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def load_ldm_state_dict(tensors: dict, cfg: PipelineConfig, strict: bool = True):
    """LDM-named {key: np.ndarray} -> pipeline param pytree (numpy leaves).

    Auto-detects the text-tower format: SD 1.x checkpoints use HF-CLIP naming
    (``cond_stage_model.transformer.*``), SD 2.x use OpenCLIP naming
    (``cond_stage_model.model.*`` with fused in_proj qkv)."""
    params: dict = {}
    rules = None
    if cfg.refiner:
        # SDXL-refiner layout: ONE OpenCLIP tower under
        # conditioner.embedders.0 (no CLIP-L tree at all)
        params["clip2"] = openclip_text_to_tree(
            tensors, cfg, pre=XL_REFINER_CLIP2_PREFIX, ccfg=cfg.clip2)
        rules = unet_rules(cfg) + vae_rules(cfg)
    elif cfg.clip2 is not None:
        # SDXL checkpoint layout: tower 1 is HF-CLIP naming under
        # conditioner.embedders.0, tower 2 OpenCLIP naming (fused qkv +
        # text_projection) under conditioner.embedders.1
        params["clip2"] = openclip_text_to_tree(
            tensors, cfg, pre=XL_CLIP2_PREFIX, ccfg=cfg.clip2)
        rules = (unet_rules(cfg) + vae_rules(cfg)
                 + clip_rules(cfg, pre=XL_CLIP_PREFIX))
    else:
        openclip = any(k.startswith(OPENCLIP_PREFIX) for k in tensors)
        if openclip:
            params["clip"] = openclip_text_to_tree(tensors, cfg)
        rules = all_rules(cfg, include_clip=not openclip)
    missing = []
    for rule in rules:
        for ldm_suffix, ours in _SUFFIX[rule.kind]:
            key = f"{rule.ldm}.{ldm_suffix}"
            if key not in tensors:
                # bias-less linears (SD attention q/k/v) simply absent
                if ldm_suffix == "bias":
                    continue
                missing.append(key)
                continue
            arr = np.asarray(tensors[key], np.float32)
            name = ours if ours is not None else None
            val = _from_ldm(rule.kind, name or "w", arr) if name else arr
            path = rule.path + ((name,) if name else ())
            _tree_set(params, path, val)
    if strict and missing:
        raise KeyError(
            f"{len(missing)} checkpoint keys missing, first: {missing[:5]}"
        )
    return params


def params_to_ldm(params, cfg: PipelineConfig) -> dict:
    """Inverse mapping (export / round-trip tests)."""
    out = {}
    if cfg.refiner:
        out.update(tree_to_openclip_text(params["clip2"], cfg,
                                         pre=XL_REFINER_CLIP2_PREFIX))
        rules = unet_rules(cfg) + vae_rules(cfg)
    elif cfg.clip2 is not None:
        out.update(tree_to_openclip_text(params["clip2"], cfg,
                                         pre=XL_CLIP2_PREFIX))
        rules = (unet_rules(cfg) + vae_rules(cfg)
                 + clip_rules(cfg, pre=XL_CLIP_PREFIX))
    else:
        rules = all_rules(cfg)
    for rule in rules:
        node = _tree_get(params, rule.path)
        for ldm_suffix, ours in _SUFFIX[rule.kind]:
            if ours is not None and ours not in node:
                continue
            arr = np.asarray(node[ours] if ours else node, np.float32)
            out[f"{rule.ldm}.{ldm_suffix}"] = _to_ldm(rule.kind, ours or "w", arr)
    return out


# ---------------------------------------------------------------------------
# native fast-load format: flattened pytree in one safetensors file
# ---------------------------------------------------------------------------

NATIVE_SUFFIX = ".sdtpu.safetensors"


def _flatten_tree(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_tree(v, f"{prefix}{k}/"))
    elif isinstance(tree, list):
        for i, v in enumerate(tree):
            out.update(_flatten_tree(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = tree
    return out


def _unflatten_tree(flat: dict):
    tree: dict = {}
    for key, val in flat.items():
        parts = [int(p) if p.isdigit() else p for p in key.split("/")]
        _tree_set(tree, tuple(parts), val)
    return tree


def save_native(params, path) -> None:
    """Write the converted, ready-to-load param pytree (any dtype incl. bf16)
    — the analogue of the reference's precompiled context blobs
    (reference: extract_htp_blobs.sh + mmap load, qnn_context.cpp:894-956):
    convert once offline, mmap-load fast at startup."""
    from safetensors.flax import save_file

    import jax.numpy as jnp

    flat = {k: jnp.asarray(v) for k, v in _flatten_tree(params).items()}
    save_file(flat, str(path))


def load_native(path):
    from safetensors.flax import load_file

    return _unflatten_tree(load_file(str(path)))


def load_pipeline_params(model_dir, cfg: PipelineConfig):
    """Load from a directory containing an SD v1.x checkpoint.

    Prefers the native converted format (``*.sdtpu.safetensors``, written by
    tools/convert_weights.py), falling back to raw LDM-layout
    ``*.safetensors``. The tokenizer asset (``ctokenizer.txt``) is handled by
    the Context, matching the reference's model-dir layout
    (reference: context.cpp:105-114, 186).
    """
    model_dir = Path(model_dir)
    if model_dir.is_file():
        if model_dir.name.endswith(NATIVE_SUFFIX):
            return load_native(model_dir)
        files = [model_dir]
    else:
        native = sorted(model_dir.glob(f"*{NATIVE_SUFFIX}"))
        if native:
            return load_native(native[0])
        files = sorted(model_dir.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors checkpoint under {model_dir}")
    from safetensors import safe_open

    tensors = {}
    for f in files:
        with safe_open(str(f), framework="np") as sf:
            for k in sf.keys():
                tensors[k] = sf.get_tensor(k)
    return load_ldm_state_dict(tensors, cfg)
