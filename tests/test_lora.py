"""LoRA adapters: identity at init, masked training, merge/extract/apply.

TPU-native extension beyond the reference (which has no fine-tuning
story). CPU backend, TINY config.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.config import TINY
from sdtpu.models import clip, temb, unet
from sdtpu.train import init_train_state, jit_train_step
from sdtpu.train.lora import (
    apply_lora,
    extract_lora,
    inject_lora,
    lora_mask,
    make_lora_optimizer,
    merge_lora,
)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    ku, kc, kt, kb = jax.random.split(key, 4)
    unet_params = unet.init(ku, TINY.unet, zero_init_outs=False)
    frozen = {"clip": clip.init(kc, TINY.clip),
              "temb": temb.init(kt, TINY.unet)}
    b, s = 2, TINY.latent_size
    batch = {
        "latents": jax.random.normal(kb, (b, s, s, TINY.unet.in_channels)),
        "tokens": jnp.tile(
            jnp.arange(TINY.clip.context_len, dtype=jnp.int32)[None], (b, 1)),
    }
    x = jax.random.normal(jax.random.PRNGKey(5),
                          (b, s, s, TINY.unet.in_channels))
    te = jax.random.normal(jax.random.PRNGKey(6),
                           (b, TINY.unet.time_embed_dim))
    ctx = jax.random.normal(
        jax.random.PRNGKey(7),
        (b, TINY.clip.context_len, TINY.unet.context_dim))
    return unet_params, frozen, batch, (x, te, ctx)


def _apply(params, io):
    x, te, ctx = io
    return np.asarray(unet.apply(params, x, te, ctx, TINY.unet))


def test_injected_lora_is_identity_at_init(setup):
    unet_params, _, _, io = setup
    lp = inject_lora(unet_params, rank=4, key=jax.random.PRNGKey(1))
    assert any(m for m in jax.tree.leaves(lora_mask(lp)))
    np.testing.assert_array_equal(_apply(lp, io), _apply(unet_params, io))


def test_masked_training_updates_only_adapters(setup):
    unet_params, frozen, batch, io = setup
    lp = inject_lora(unet_params, rank=4, key=jax.random.PRNGKey(1))
    opt = make_lora_optimizer(lr=1e-2)
    state = init_train_state(lp, opt)
    step = jit_train_step(TINY, opt, donate=False)
    key = jax.random.PRNGKey(2)
    first = None
    for _ in range(6):
        state, metrics = step(state, frozen, batch, key)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first
    # base weights untouched, adapters moved
    mask_tree = lora_mask(lp)
    for leaf, m, orig in zip(jax.tree.leaves(state.params),
                             jax.tree.leaves(mask_tree),
                             jax.tree.leaves(lp)):
        if m:
            assert float(jnp.abs(leaf - orig).max()) > 0
        else:
            np.testing.assert_array_equal(np.asarray(leaf), np.asarray(orig))


def test_merge_extract_apply_roundtrip(setup):
    unet_params, frozen, batch, io = setup
    lp = inject_lora(unet_params, rank=4, key=jax.random.PRNGKey(1))
    opt = make_lora_optimizer(lr=1e-2)
    state = init_train_state(lp, opt)
    step = jit_train_step(TINY, opt, donate=False)
    for _ in range(3):
        state, _ = step(state, frozen, batch, jax.random.PRNGKey(3))
    trained = state.params

    # merged == adapter-applied, adapter leaves gone
    merged = merge_lora(trained)
    assert not any(jax.tree.leaves(lora_mask(merged)))
    np.testing.assert_allclose(_apply(merged, io), _apply(trained, io),
                               atol=2e-5, rtol=1e-5)
    # extract -> apply onto the clean base reproduces the trained model
    adapters = extract_lora(trained)
    n_leaves = len(jax.tree.leaves(adapters))
    assert n_leaves > 0
    reapplied = apply_lora(unet_params, adapters)
    np.testing.assert_array_equal(_apply(reapplied, io), _apply(trained, io))


def test_npz_roundtrip_and_context_lora(tmp_path, setup):
    """save_lora_npz/load_lora_npz roundtrip + Context(lora=...) serving:
    zero-init adapters must reproduce the base images exactly."""
    import sdtpu
    from sdtpu.train.lora import load_lora_npz, save_lora_npz

    unet_params, _, _, io = setup
    lp = inject_lora(unet_params, rank=4, key=jax.random.PRNGKey(1))
    adapters = extract_lora(lp)
    path = tmp_path / "adapters.npz"
    save_lora_npz(adapters, path)
    loaded = load_lora_npz(path)
    reapplied = apply_lora(unet_params, loaded)
    np.testing.assert_array_equal(_apply(reapplied, io), _apply(lp, io))

    base = sdtpu.Context(config="tiny", steps=2)
    with_lora = sdtpu.Context(config="tiny", steps=2, lora=str(path))
    # TINY and the test fixture share shapes only by coincidence of config;
    # the context re-inits its own params, so compare its own two variants
    a = base.generate("adapter probe", seed=11)
    b = with_lora.generate("adapter probe", seed=11)
    np.testing.assert_array_equal(a, b)


def test_inject_lora_custom_targets(setup):
    """ADVICE r2 #4 regression: a caller-supplied target set outside
    LORA_TARGETS (e.g. proj_out) must actually receive adapters."""
    unet_params, _, _, io = setup

    def count_adapters(tree):
        n = 0

        def walk(node):
            nonlocal n
            if isinstance(node, dict):
                if "lora_a" in node:
                    n += 1
                for v in node.values():
                    walk(v)
            elif isinstance(node, list):
                for v in node:
                    walk(v)

        walk(tree)
        return n

    # 'q' is a standard target; restricting to it adapts only q sites
    lp_q = inject_lora(unet_params, rank=2, key=jax.random.PRNGKey(2),
                       targets={"q"})
    n_q = count_adapters(lp_q)
    assert n_q > 0

    # a NON-standard 2D dense target (the ResBlock time-embedding dense)
    # must also get adapters
    lp_emb = inject_lora(unet_params, rank=2, key=jax.random.PRNGKey(3),
                         targets={"emb"})
    assert count_adapters(lp_emb) > 0
    lp_all = inject_lora(unet_params, rank=2, key=jax.random.PRNGKey(4))
    n_all = count_adapters(lp_all)
    assert n_q < n_all
    # custom targets are still identity at init
    np.testing.assert_allclose(_apply(lp_q, io), _apply(unet_params, io),
                               rtol=1e-6, atol=1e-6)


def test_context_multi_adapter_registry(tmp_path):
    """Multi-adapter registry: load N adapters once, select per request;
    overlays share the base weights; mixed-adapter batches are rejected."""
    import sdtpu
    from sdtpu.engine.errors import SdtpuError
    from jax.tree_util import tree_map_with_path
    from sdtpu.train.lora import extract_lora, save_lora_npz

    ctx = sdtpu.Context(config="tiny", steps=2)

    def make(path, seed):
        lp = inject_lora(ctx.params["unet"], rank=2,
                         key=jax.random.PRNGKey(seed))
        i = [0]

        def bump(p, leaf):
            if getattr(p[-1], "key", None) == "lora_b":
                i[0] += 1
                return 0.1 * jax.random.normal(
                    jax.random.PRNGKey(seed * 1000 + i[0]),
                    leaf.shape, leaf.dtype)
            return leaf

        save_lora_npz(extract_lora(tree_map_with_path(bump, lp)), path)

    make(tmp_path / "a.npz", 1)
    make(tmp_path / "b.npz", 2)
    ctx.load_lora("a", tmp_path / "a.npz")
    ctx.load_lora("b", tmp_path / "b.npz")
    assert ctx.lora_names() == ["a", "b"]

    base = ctx.generate("the horse", seed=5)
    ia = ctx.generate("the horse", seed=5, lora="a")
    ib = ctx.generate("the horse", seed=5, lora="b")
    assert not np.array_equal(base, ia)
    assert not np.array_equal(ia, ib)
    # overlays share base arrays (N adapters != N models resident)
    pa = ctx._params_for("a")
    assert pa["clip"] is ctx.params["clip"]
    assert pa["vae"] is ctx.params["vae"]

    # batch path: uniform request 'lora' keys work, mixed ones are rejected
    outs = ctx.generate_batch(
        [{"prompt": "the horse", "seed": 5, "lora": "a"}])
    assert np.array_equal(outs[0], ia)
    with pytest.raises(SdtpuError):
        ctx.generate_batch([
            {"prompt": "x", "lora": "a"}, {"prompt": "y", "lora": "b"}])
    with pytest.raises(SdtpuError):
        ctx.generate("the horse", lora="missing")

    # dict constructor form + per-request selection via img2img
    ctx2 = sdtpu.Context(config="tiny", steps=2,
                         lora={"a": tmp_path / "a.npz"})
    assert ctx2.lora_names() == ["a"]
    # dict form sets NO default: plain generate uses the base model
    assert np.array_equal(ctx2.generate("the horse", seed=5), base)
    assert np.array_equal(ctx2.generate("the horse", seed=5, lora="a"), ia)
