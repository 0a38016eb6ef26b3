"""Primitive-op parity vs torch (the trusted reference implementation).

This is the rebuild's version of the reference's GroupNorm-rewrite
equivalence test (reference: tests/gn_to_ln.py — torch.allclose of GN vs its
ln/bn rewrites): every primitive is checked numerically against the torch op
it re-implements.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sdtpu.models import layers as L

ATOL = 2e-5


def j2t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def test_dense_vs_torch(rng):
    x = rng.standard_normal((3, 7, 16), dtype=np.float32)
    w = rng.standard_normal((16, 24), dtype=np.float32)
    b = rng.standard_normal(24, dtype=np.float32)
    ours = L.dense({"w": jnp.asarray(w), "b": jnp.asarray(b)}, jnp.asarray(x))
    theirs = torch.nn.functional.linear(j2t(x), j2t(w).T, j2t(b)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=ATOL)


@pytest.mark.parametrize("stride,padding,k", [(1, 1, 3), (2, 1, 3), (1, 0, 1)])
def test_conv2d_vs_torch(rng, stride, padding, k):
    x = rng.standard_normal((2, 8, 8, 5), dtype=np.float32)
    w = rng.standard_normal((k, k, 5, 7), dtype=np.float32)
    b = rng.standard_normal(7, dtype=np.float32)
    ours = L.conv2d(
        {"w": jnp.asarray(w), "b": jnp.asarray(b)}, jnp.asarray(x),
        stride=stride, padding=padding,
    )
    xt = j2t(x).permute(0, 3, 1, 2)
    wt = j2t(w).permute(3, 2, 0, 1)  # HWIO -> OIHW
    theirs = (
        torch.nn.functional.conv2d(xt, wt, j2t(b), stride=stride, padding=padding)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=ATOL)


def test_group_norm_vs_torch(rng):
    """GroupNorm in ln-form == torch GroupNorm (the gn_to_ln equivalence)."""
    n, h, w, c, g = 2, 6, 5, 12, 4
    x = rng.standard_normal((n, h, w, c), dtype=np.float32)
    scale = rng.standard_normal(c, dtype=np.float32)
    bias = rng.standard_normal(c, dtype=np.float32)
    ours = L.group_norm(
        {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        jnp.asarray(x), groups=g,
    )
    xt = j2t(x).permute(0, 3, 1, 2)
    theirs = (
        torch.nn.functional.group_norm(xt, g, j2t(scale), j2t(bias), eps=1e-5)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=ATOL)


def test_layer_norm_vs_torch(rng):
    x = rng.standard_normal((4, 9, 32), dtype=np.float32)
    scale = rng.standard_normal(32, dtype=np.float32)
    bias = rng.standard_normal(32, dtype=np.float32)
    ours = L.layer_norm(
        {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}, jnp.asarray(x)
    )
    theirs = torch.nn.functional.layer_norm(
        j2t(x), (32,), j2t(scale), j2t(bias), eps=1e-5
    ).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=ATOL)


@pytest.mark.parametrize("heads", [1, 4])
def test_sdpa_vs_torch(rng, heads):
    b, tq, tk, c = 2, 10, 7, 16
    q = rng.standard_normal((b, tq, c), dtype=np.float32)
    k = rng.standard_normal((b, tk, c), dtype=np.float32)
    v = rng.standard_normal((b, tk, c), dtype=np.float32)
    ours = L.sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads)
    d = c // heads
    qt = j2t(q).view(b, tq, heads, d).transpose(1, 2)
    kt = j2t(k).view(b, tk, heads, d).transpose(1, 2)
    vt = j2t(v).view(b, tk, heads, d).transpose(1, 2)
    theirs = (
        torch.nn.functional.scaled_dot_product_attention(qt, kt, vt)
        .transpose(1, 2)
        .reshape(b, tq, c)
        .numpy()
    )
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=ATOL)


def test_causal_sdpa_vs_torch(rng):
    b, t, c, heads = 2, 9, 12, 3
    q = rng.standard_normal((b, t, c), dtype=np.float32)
    k = rng.standard_normal((b, t, c), dtype=np.float32)
    v = rng.standard_normal((b, t, c), dtype=np.float32)
    ours = L.causal_sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads)
    d = c // heads
    qt = j2t(q).view(b, t, heads, d).transpose(1, 2)
    kt = j2t(k).view(b, t, heads, d).transpose(1, 2)
    vt = j2t(v).view(b, t, heads, d).transpose(1, 2)
    theirs = (
        torch.nn.functional.scaled_dot_product_attention(qt, kt, vt, is_causal=True)
        .transpose(1, 2)
        .reshape(b, t, c)
        .numpy()
    )
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=ATOL)


def test_silu_gelu_vs_torch(rng):
    x = rng.standard_normal((5, 17), dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(L.silu(jnp.asarray(x))),
        torch.nn.functional.silu(j2t(x)).numpy(), atol=ATOL,
    )
    # GEGLU: x @ W -> split -> a * gelu(b), as in SD's feed-forward
    w = rng.standard_normal((17, 12), dtype=np.float32)
    b = rng.standard_normal(12, dtype=np.float32)
    ours = L.geglu({"w": jnp.asarray(w), "b": jnp.asarray(b)}, jnp.asarray(x))
    h = torch.nn.functional.linear(j2t(x), j2t(w).T, j2t(b))
    a_t, b_t = h.chunk(2, dim=-1)
    theirs = (a_t * torch.nn.functional.gelu(b_t)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=ATOL)


def test_timestep_features():
    """[cos | sin] halves with f_j = exp(-ln(10000) j / half)
    (reference: context.cpp:256-279 builds the same 320-d features)."""
    dim = 320
    t = np.array([0.0, 1.0, 999.0], np.float32)
    feats = np.asarray(L.timestep_features(jnp.asarray(t), dim))
    half = dim // 2
    freqs = np.exp(-math.log(10000.0) * np.arange(half) / half)
    expected = np.concatenate(
        [np.cos(t[:, None] * freqs), np.sin(t[:, None] * freqs)], axis=-1
    )
    # f32 trig at arg ~999 carries ~2e-3 phase error vs f64 — inherent, not a bug
    np.testing.assert_allclose(feats, expected.astype(np.float32), atol=5e-3)
    np.testing.assert_allclose(feats[:2], expected[:2].astype(np.float32), atol=1e-5)
    # t=0: cos-half all ones, sin-half all zeros
    assert np.allclose(feats[0, :half], 1.0) and np.allclose(feats[0, half:], 0.0)
