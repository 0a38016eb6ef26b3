"""kohya-ss LoRA interchange: load/save the de-facto community adapter format.

The reference has no fine-tuning artifacts at all; the ecosystem's standard
LoRA container (kohya-ss/sd-scripts, consumed by A1111/ComfyUI/diffusers) is
a flat safetensors file whose keys name torch modules of the LDM UNet and
the HF CLIP text tower(s):

    lora_unet_<module path, dots->underscores>.lora_down.weight  [r, in]
    lora_unet_<...>.lora_up.weight                               [out, r]
    lora_unet_<...>.alpha                                        scalar
    lora_te_text_model_encoder_layers_<i>_<mod>.{lora_down,lora_up,alpha}
    (SDXL: lora_te1_* for CLIP-L, lora_te2_* for OpenCLIP bigG)

Conv2d sites (spatial-transformer proj_in/proj_out, and the resblock convs
of "LoCon"-style extended adapters) store lora_down as a conv kernel
[r, in, kh, kw] and lora_up as a 1x1 conv [out, r, 1, 1].

The underscored module names are ambiguous to parse (module names contain
underscores themselves), so — exactly like every other consumer of the
format — we resolve them by GENERATING the expected name set from the
architecture: the same `io.weights` Rule lists that drive checkpoint
loading produce (kohya name -> pytree path) maps that cannot drift from
the model structure.

Loaded adapters use sdtpu's native runtime representation
(`lora_a` [in, r] / [kh, kw, in, r], `lora_b` [r, out], `lora_s` = alpha/r;
see sdtpu.train.lora), so they hot-swap per request through the same
Context registry as native .npz adapters and compose with quantized bases.
"""

from __future__ import annotations

import numpy as np

from sdtpu.config import PipelineConfig

_ADAPTER_KEYS = ("lora_a", "lora_b", "lora_s")

# suffixes of a kohya entry, keyed by what they mean
_DOWN = ".lora_down.weight"
_UP = ".lora_up.weight"
_ALPHA = ".alpha"


def _unet_sites(cfg: PipelineConfig):
    """(kohya name, full-tree path, kind) for every adapter-capable UNet
    site. Kohya's target set is the Linear/Conv2d modules inside the
    down/mid/up blocks (time_embed / label_emb are never adapted)."""
    from sdtpu.io.weights import unet_rules

    pre = "model.diffusion_model."
    for r in unet_rules(cfg):
        if r.path[0] != "unet" or r.kind not in ("linear", "conv"):
            continue
        name = "lora_unet_" + r.ldm[len(pre):].replace(".", "_")
        yield name, r.path, r.kind


_TE_MODS = {
    "q": "self_attn_q_proj",
    "k": "self_attn_k_proj",
    "v": "self_attn_v_proj",
    "out": "self_attn_out_proj",
    "fc1": "mlp_fc1",
    "fc2": "mlp_fc2",
}


def _te_sites(tower_key: str, ccfg, prefix: str):
    for i in range(ccfg.layers):
        for ours, hf in _TE_MODS.items():
            name = f"{prefix}text_model_encoder_layers_{i}_{hf}"
            yield name, (tower_key, "blocks", i, ours), "linear"


def site_map(cfg: PipelineConfig) -> dict:
    """kohya base name -> (full-tree path, kind) for this architecture.

    Single-tower configs register the text encoder under BOTH ``lora_te_``
    (SD1.x/2.x convention) and ``lora_te1_`` (tools that always number);
    dual-tower configs register ``lora_te1_``/``lora_te2_`` and alias
    ``lora_te_`` to tower 1."""
    m = {}
    for name, path, kind in _unet_sites(cfg):
        m[name] = (path, kind)
    te1 = [] if cfg.refiner else list(_te_sites("clip", cfg.clip, "lora_te_"))
    for name, path, kind in te1:
        m[name] = (path, kind)
        m["lora_te1_" + name[len("lora_te_"):]] = (path, kind)
    if cfg.clip2 is not None:
        for name, path, kind in _te_sites("clip2", cfg.clip2, "lora_te2_"):
            m[name] = (path, kind)
    return m


# ---------------------------------------------------------------------------
# tensor layout conversion (torch module layout <-> sdtpu runtime layout)
# ---------------------------------------------------------------------------

def _to_native(kind: str, down: np.ndarray, up: np.ndarray,
               alpha: float | None) -> dict:
    if kind == "linear":
        if down.ndim == 4:   # Linear site shipped as a 1x1 conv
            down = down.reshape(down.shape[:2])
            up = up.reshape(up.shape[:2])
        rank = down.shape[0]
        a = np.ascontiguousarray(down.T)                   # [in, r]
        b = np.ascontiguousarray(up.T)                     # [r, out]
    else:
        if down.ndim == 2:   # conv site shipped in linear layout (1x1)
            down = down[:, :, None, None]
            up = up[:, :, None, None]
        rank = down.shape[0]
        a = np.ascontiguousarray(down.transpose(2, 3, 1, 0))  # HWIO [kh,kw,in,r]
        b = np.ascontiguousarray(up.reshape(up.shape[0], rank).T)  # [r, out]
    s = (float(alpha) if alpha is not None else float(rank)) / float(rank)
    return {"lora_a": a, "lora_b": b, "lora_s": np.float32(s)}


def _to_kohya(kind: str, site: dict) -> tuple[np.ndarray, np.ndarray, float]:
    a = np.asarray(site["lora_a"], np.float32)
    b = np.asarray(site["lora_b"], np.float32)
    rank = b.shape[0]
    alpha = float(np.asarray(site["lora_s"], np.float32)) * rank
    if kind == "linear":
        down = np.ascontiguousarray(a.T)                   # [r, in]
        up = np.ascontiguousarray(b.T)                     # [out, r]
    else:
        if a.ndim == 2:      # adapter trained on the flattened 1x1 site
            a = a[None, None]
        down = np.ascontiguousarray(a.transpose(3, 2, 0, 1))  # [r,in,kh,kw]
        up = np.ascontiguousarray(b.T)[:, :, None, None]       # [out,r,1,1]
    return down, up, alpha


# ---------------------------------------------------------------------------
# overlay tree assembly (the apply_lora input format: nested dicts, lists
# for int-indexed levels, empty dicts in adapter-free list slots)
# ---------------------------------------------------------------------------

def _nest(flat: dict) -> dict:
    root: dict = {}
    for path, site in flat.items():
        node = root
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = dict(site)

    def listify(node):
        if isinstance(node, dict) and not any(
                k in node for k in _ADAPTER_KEYS):
            if node and all(isinstance(k, int) for k in node):
                n = max(node) + 1
                return [listify(node.get(i, {})) for i in range(n)]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(root)


def load_lora_kohya(source, cfg: PipelineConfig, strict: bool = True):
    """Read a kohya-format adapter file (or a pre-loaded {key: array} dict)
    into a full-tree overlay: {"unet": ..., "clip": ..., "clip2": ...} with
    only the towers that have adapters present. Apply with
    ``sdtpu.train.lora.apply_lora`` per tower (Context does this
    automatically for registry adapters).
    """
    if isinstance(source, dict):
        tensors = source
    else:
        from safetensors.numpy import load_file

        tensors = load_file(str(source))

    groups: dict[str, dict] = {}
    unmatched = []
    for key, arr in tensors.items():
        for suffix, slot in ((_DOWN, "down"), (_UP, "up"), (_ALPHA, "alpha")):
            if key.endswith(suffix):
                groups.setdefault(key[: -len(suffix)], {})[slot] = arr
                break
        else:
            unmatched.append(key)

    smap = site_map(cfg)
    flat: dict[tuple, dict] = {}
    for name, parts in sorted(groups.items()):
        hit = smap.get(name)
        if hit is None:
            unmatched.append(name)
            continue
        if "down" not in parts or "up" not in parts:
            raise ValueError(f"kohya adapter {name!r} is missing "
                             f"lora_down/lora_up tensors")
        path, kind = hit
        alpha = parts.get("alpha")
        flat[path] = _to_native(
            kind, np.asarray(parts["down"], np.float32),
            np.asarray(parts["up"], np.float32),
            None if alpha is None else float(np.asarray(alpha)))
    if unmatched and strict:
        raise ValueError(
            f"{len(unmatched)} kohya key(s) do not map onto this "
            f"architecture (config mismatch?): {sorted(unmatched)[:8]} ...")

    by_tower: dict[str, dict] = {}
    for path, site in flat.items():
        by_tower.setdefault(path[0], {})[path[1:]] = site
    return {tower: _nest(sites) for tower, sites in by_tower.items()}


def save_lora_kohya(overlay: dict, cfg: PipelineConfig, path,
                    metadata: dict | None = None) -> None:
    """Write a full-tree overlay ({"unet": ...} and/or text towers — the
    `load_lora_kohya` shape, or a bare UNet overlay from
    ``sdtpu.train.lora.extract_lora``) as a kohya-format safetensors file
    interoperable with A1111/ComfyUI/diffusers."""
    from safetensors.numpy import save_file

    if not (set(overlay) <= {"unet", "clip", "clip2"}):
        overlay = {"unet": overlay}

    def sites(node, path=()):
        if isinstance(node, dict):
            if any(k in node for k in _ADAPTER_KEYS):
                yield path, node
            else:
                for k, v in node.items():
                    yield from sites(v, path + (k,))
        elif isinstance(node, list):
            for i, v in enumerate(node):
                yield from sites(v, path + (i,))

    # path -> (preferred kohya name, kind); tower-1 sites keep the
    # unnumbered lora_te_ name unless a second tower exists
    name_of: dict[tuple, tuple] = {}
    for name, (p, kind) in site_map(cfg).items():
        if name.startswith("lora_te1_") and cfg.clip2 is None:
            continue
        if name.startswith("lora_te_") and cfg.clip2 is not None:
            continue
        name_of[p] = (name, kind)

    out = {}
    for tower, sub in overlay.items():
        for rel_path, site in sites(sub):
            full = (tower,) + rel_path
            if full not in name_of:
                raise ValueError(f"no kohya name for adapter site {full}")
            name, kind = name_of[full]
            down, up, alpha = _to_kohya(kind, site)
            out[name + _DOWN] = down
            out[name + _UP] = up
            out[name + _ALPHA] = np.asarray(alpha, np.float32)
    save_file(out, str(path), metadata=metadata or {"software": "sdtpu"})
