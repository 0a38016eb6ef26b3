"""LoRA adapters: low-rank fine-tuning and zero-cost serving merges.

The reference has no fine-tuning story at all; LoRA is the production way
to specialize a diffusion model (style/subject adapters, served either
merged into the base weights or hot-swapped per request). Design:

* adapters live INSIDE the param tree: a dense site dict gains
  ``lora_a`` [in, r], ``lora_b`` [r, out] (zero-init — the adapted model
  starts exactly equal to the base) and ``lora_s`` (= alpha / r);
  ``layers.dense`` applies ``y += (x A) B * s`` whenever the keys are
  present, composing with every base path including the int8 ones
  (QLoRA-style: frozen quantized base + small f32 adapters);
* training reuses the ordinary `sdtpu.train.step` machinery: the same
  ``train_step``/``jit_train_step`` with an `optax.masked` optimizer so
  only adapter leaves update (`make_lora_optimizer`) — base weights,
  AdamW moments for base weights, and checkpoint plumbing all stay
  untouched;
* `merge_lora` folds ``W += A B * s`` and strips the adapter leaves for
  zero-overhead inference; `extract_lora`/`apply_lora` move just the
  adapter tree (a few MB) between checkpoints.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

# dense-site names that receive adapters (attention projections + FFN —
# the standard LoRA target set for SD UNets)
LORA_TARGETS = frozenset({"q", "k", "v", "out", "ff1", "ff2"})


def _walk(node, fn, path=()):
    if isinstance(node, dict):
        return {k: _walk(v, fn, path + (k,)) for k, v in node.items()}
    if isinstance(node, list):
        return [_walk(v, fn, path + (i,)) for i, v in enumerate(node)]
    return fn(path, node)


def _site_dicts(node, path=(), targets=LORA_TARGETS):
    """Yield (path, site_dict) for every dense site dict with a 2D kernel
    whose name is in ``targets``."""
    if isinstance(node, dict):
        w = node.get("w")
        if w is not None and getattr(w, "ndim", 0) == 2 \
                and path and path[-1] in targets:
            yield path, node
        for k, v in node.items():
            yield from _site_dicts(v, path + (k,), targets)
    elif isinstance(node, list):
        for i, v in enumerate(node):
            yield from _site_dicts(v, path + (i,), targets)


def inject_lora(params, rank: int, key, alpha: float | None = None,
                targets=LORA_TARGETS, dtype=jnp.float32):
    """Return a copy of `params` with adapters at every target dense site.

    ``A`` is Kaiming-init, ``B`` zero-init, so the injected model is
    numerically IDENTICAL to the base until training moves ``B``."""
    alpha = float(rank) if alpha is None else float(alpha)
    # the caller's target set drives discovery directly, so custom targets
    # outside LORA_TARGETS (e.g. time-embedding denses) do get adapters
    sites = list(_site_dicts(params, targets=frozenset(targets)))
    keys = jax.random.split(key, max(len(sites), 1))
    lora_at = {}
    for (path, node), k in zip(sites, keys):
        d_in, d_out = node["w"].shape
        lora_at[path] = {
            "lora_a": jax.random.normal(k, (d_in, rank), dtype)
            / jnp.sqrt(jnp.float32(d_in)).astype(dtype),
            "lora_b": jnp.zeros((rank, d_out), dtype),
            "lora_s": jnp.asarray(alpha / rank, dtype),
        }

    def patch(node, path=()):
        if isinstance(node, dict):
            out = {k: patch(v, path + (k,)) for k, v in node.items()}
            if path in lora_at:
                out.update(lora_at[path])
            return out
        if isinstance(node, list):
            return [patch(v, path + (i,)) for i, v in enumerate(node)]
        return node

    return patch(params)


def lora_mask(params):
    """Boolean pytree: True exactly on adapter leaves (for optax.masked)."""
    return _walk(params, lambda path, leaf: path[-1] in ("lora_a", "lora_b"))


def make_lora_optimizer(lr: float = 1e-4, weight_decay: float = 0.0,
                        grad_clip: float = 1.0):
    """AdamW over the adapter leaves ONLY; every other leaf's update is
    hard-zeroed (optax.masked would pass raw gradients through for
    unmasked leaves — measured as instant NaN). AdamW moments are
    allocated just for the adapter leaves, so the optimizer state stays
    adapter-sized."""
    inner = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(lr, weight_decay=weight_decay),
    )
    labels = lambda params: _walk(
        params,
        lambda path, leaf: "lora" if path[-1] in ("lora_a", "lora_b")
        else "frozen")
    return optax.multi_transform(
        {"lora": inner, "frozen": optax.set_to_zero()}, labels)


def merge_lora(params):
    """Fold ``W += A B * s`` and strip adapter leaves — zero-cost serving."""

    def patch(node):
        if isinstance(node, dict):
            out = {k: patch(v) for k, v in node.items()
                   if k not in ("lora_a", "lora_b", "lora_s")}
            if "lora_a" in node:
                w = node["w"]
                a = node["lora_a"].astype(jnp.float32)
                b = node["lora_b"].astype(jnp.float32)
                s = node["lora_s"].astype(jnp.float32)
                if a.ndim == 4:
                    # conv site (kohya/LoCon, sdtpu.io.kohya): a is HWIO
                    # [kh, kw, in, r]; the fold is per-tap A @ B
                    delta = jnp.einsum("hwir,ro->hwio", a, b) * s
                else:
                    delta = a @ b * s
                out["w"] = (w.astype(jnp.float32) + delta).astype(w.dtype)
            return out
        if isinstance(node, list):
            return [patch(v) for v in node]
        return node

    return patch(params)


def extract_lora(params):
    """Just the adapter leaves, tree-shaped (a few MB — the shippable
    artifact)."""

    def patch(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k in ("lora_a", "lora_b", "lora_s"):
                    out[k] = v
                else:
                    sub = patch(v)
                    if sub not in ({}, []):
                        out[k] = sub
            return out
        if isinstance(node, list):
            subs = [patch(v) for v in node]
            return subs if any(s not in ({}, []) for s in subs) else []
        return None

    return patch(params)


def save_lora_npz(adapters, path) -> None:
    """Write an extracted adapter tree as a single .npz (keys are
    '/'-joined tree paths) — the few-MB shippable artifact."""
    import numpy as np

    from jax.tree_util import tree_flatten_with_path

    leaves, _ = tree_flatten_with_path(adapters)

    def name(p):
        out = []
        for k in p:
            out.append(str(getattr(k, "key", getattr(k, "idx", k))))
        return "/".join(out)

    np.savez(path, **{name(p): np.asarray(v) for p, v in leaves})


def load_lora_npz(path):
    """Rebuild the adapter tree from `save_lora_npz` output (integer path
    components become list indices)."""
    import numpy as np

    flat = np.load(path)
    root: dict = {}
    for key in flat.files:
        node = root
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(flat[key])

    def listify(node):
        if isinstance(node, dict):
            if node and all(k.isdigit() for k in node):
                # sparse indices happen (adapter-free list slots flatten
                # away): fill the gaps with empty overlays
                n = max(int(k) for k in node) + 1
                return [listify(node.get(str(i), {})) for i in range(n)]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(root)


def apply_lora(params, adapters):
    """Overlay an extracted adapter tree onto a (base) param tree."""

    def patch(node, ad):
        if isinstance(node, dict):
            out = dict(node)
            for k, v in (ad or {}).items():
                if k in ("lora_a", "lora_b", "lora_s"):
                    out[k] = v
                elif k in out:
                    out[k] = patch(out[k], v)
            return out
        if isinstance(node, list):
            ad = ad or []
            return [patch(v, ad[i] if i < len(ad) else None)
                    for i, v in enumerate(node)]
        return node

    return patch(params, adapters)
