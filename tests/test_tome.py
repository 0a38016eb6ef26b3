"""ToMe-SD token merging (ops/tome; models/unet._basic_block `tome`;
Context(tome_ratio=...)).

Merges the most redundant spatial tokens before the large self-attentions
(Bolya & Hoffman 2023) — a latency knob over the reference's fixed dense
attention graph (reference: context.cpp:214-218). All shapes static, dst
choice deterministic, so outputs are bit-reproducible.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import sdtpu
from sdtpu.config import CONFIGS
from sdtpu.engine.errors import SdtpuError
from sdtpu.ops import tome


CFG = CONFIGS["tiny"]


def test_plan_partition():
    for hh, ww in [(4, 4), (8, 8), (6, 10), (3, 5)]:
        dst, src = tome.plan(hh, ww)
        n = hh * ww
        assert dst.size == -(-hh // 2) * (-(-ww // 2))
        assert dst.size + src.size == n
        assert sorted(np.concatenate([dst, src]).tolist()) == list(range(n))


def _np_reference(metric, hh, ww, ratio):
    """Straight numpy re-implementation of build()+merge (the oracle)."""
    b, n, c = metric.shape
    dst_idx, src_idx = tome.plan(hh, ww)
    nd, ns = dst_idx.size, src_idx.size
    r = min(int(n * ratio), ns)
    m = metric.astype(np.float64)
    m = m / np.maximum(np.linalg.norm(m, axis=-1, keepdims=True), 1e-6)
    scores = np.einsum("bsc,bdc->bsd", m[:, src_idx], m[:, dst_idx])
    node_max, node_idx = scores.max(-1), scores.argmax(-1)
    order = np.argsort(-node_max, axis=-1, kind="stable")
    merged, kept = order[:, :r], order[:, r:]
    out = np.zeros((b, ns - r + nd, c), metric.dtype)
    full = np.zeros((b, n, c), metric.dtype)
    for i in range(b):
        src, dst = metric[i, src_idx], metric[i, dst_idx].astype(np.float64)
        cnt = np.ones(nd)
        acc = dst.copy()
        for j in merged[i]:
            t = node_idx[i, j]
            acc[t] += src[j]
            cnt[t] += 1
        dst_out = (acc / cnt[:, None]).astype(metric.dtype)
        out[i] = np.concatenate([src[kept[i]], dst_out], 0)
        # unmerge of the merged tokens themselves (identity inputs)
        full[i, dst_idx] = dst_out
        full[i, src_idx[kept[i]]] = src[kept[i]]
        for j in merged[i]:
            full[i, src_idx[j]] = dst_out[node_idx[i, j]]
    return out, full


def test_merge_numpy_oracle():
    hh = ww = 4
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (2, 16, 8),
                                     jnp.float32))
    merge, unmerge, r = tome.build(jnp.asarray(x), hh, ww, 0.5)
    assert r == 8
    got = np.asarray(merge(jnp.asarray(x)))
    want, full_want = _np_reference(x, hh, ww, 0.5)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    # unmerging the merged tokens scatters each dst row back over its
    # merged sources
    got_full = np.asarray(unmerge(jnp.asarray(got)))
    np.testing.assert_allclose(got_full, full_want, atol=1e-5, rtol=1e-5)


def test_identical_tokens_are_free():
    """All-equal tokens: the scatter-mean is exact, so merge/unmerge is
    lossless and the merged block output equals the unmerged one."""
    from sdtpu.models import unet

    p = unet._init_basic(jax.random.PRNGKey(1), 32, CFG.unet.context_dim)
    row = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 32), jnp.float32)
    h = jnp.tile(row, (2, 16, 1))
    ctx = jax.random.normal(jax.random.PRNGKey(3),
                            (2, 7, CFG.unet.context_dim), jnp.float32)
    base = unet._basic_block(p, h, ctx, 4, "xla")
    merged = unet._basic_block(p, h, ctx, 4, "xla", tome=(4, 4, 0.5))
    np.testing.assert_allclose(np.asarray(base), np.asarray(merged),
                               atol=1e-5, rtol=1e-5)


def test_ratio_zero_is_identity():
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 4), jnp.float32)
    merge, unmerge, r = tome.build(x, 4, 4, 0.0)
    assert r == 0
    assert merge(x) is x and unmerge(x) is x


def test_context_validation():
    with pytest.raises(SdtpuError):
        sdtpu.Context(config="tiny", steps=2, tome_ratio=0.9)
    with pytest.raises(SdtpuError):
        sdtpu.Context(config="tiny", steps=2, tome_ratio=-0.1)


def _lower_gate(ctx, min_tokens=64):
    ctx.cfg = dataclasses.replace(
        ctx.cfg, unet=dataclasses.replace(ctx.cfg.unet,
                                          tome_min_tokens=min_tokens))


def test_gate_keeps_program_untouched():
    """tome_ratio set but every level below min_tokens (tiny's largest
    level is 64 tokens < the 4096 default): bit-identical to baseline."""
    base = sdtpu.Context(config="tiny", steps=3)
    gated = sdtpu.Context(config="tiny", steps=3, tome_ratio=0.5)
    a = base.generate("the horse", seed=5)
    b = gated.generate("the horse", seed=5)
    np.testing.assert_array_equal(a, b)


def test_e2e_deterministic_and_distinct():
    base = sdtpu.Context(config="tiny", steps=3)
    ctx = sdtpu.Context(config="tiny", steps=3, tome_ratio=0.5)
    _lower_gate(ctx)
    a = ctx.generate("the horse", seed=5)
    b = ctx.generate("the horse", seed=5)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, base.generate("the horse", seed=5))
    # composes with batch serving
    outs = ctx.generate_batch([
        {"prompt": "the horse", "guidance": 7.5, "seed": 5},
        {"prompt": "a photograph", "guidance": 7.5, "seed": 6},
    ])
    np.testing.assert_array_equal(outs[0],
                                  ctx.generate("the horse", seed=5,
                                               guidance=7.5))


def test_tome_on_mesh_matches_single_device():
    ctx1 = sdtpu.Context(config="tiny", steps=3, tome_ratio=0.5)
    _lower_gate(ctx1)
    ctx8 = sdtpu.Context(config="tiny", steps=3, tome_ratio=0.5,
                         mesh=(2, 4))
    _lower_gate(ctx8)
    prompts = ["the horse", "a photograph"]
    a = ctx1.generate(prompts, seed=9)
    b = ctx8.generate(prompts, seed=9)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1
