"""Pallas kernel numerical parity (interpreter mode on CPU; the same kernels
compile via Mosaic on the real chip — covered by the bench/TPU smoke run)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.models import layers as L
from sdtpu.ops import attention as attn_ops
from sdtpu.ops import groupnorm as gn_ops


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(attn_ops, "INTERPRET", True)
    monkeypatch.setattr(gn_ops, "INTERPRET", True)
    # interpret-mode jit caches must not leak compiled-mode entries
    attn_ops._flash_mha.clear_cache()
    gn_ops._gn_call.clear_cache()
    yield
    attn_ops._flash_mha.clear_cache()
    gn_ops._gn_call.clear_cache()


@pytest.mark.parametrize("seq,heads,d", [(512, 2, 32), (1024, 4, 40), (512, 1, 512)])
def test_flash_attention_matches_xla(rng, seq, heads, d):
    c = heads * d
    q = jnp.asarray(rng.standard_normal((2, seq, c), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((2, seq, c), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((2, seq, c), dtype=np.float32))
    ours = np.asarray(attn_ops.flash_attention(q, k, v, heads))
    ref = np.asarray(L.sdpa(q, k, v, heads, kernel="xla"))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_flash_attention_small_falls_back(rng):
    # 77-token cross attention goes through the XLA path untouched
    q = jnp.asarray(rng.standard_normal((1, 64, 32), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((1, 77, 32), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((1, 77, 32), dtype=np.float32))
    ours = np.asarray(attn_ops.flash_attention(q, k, v, 2))
    ref = np.asarray(L.sdpa(q, k, v, 2, kernel="xla"))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_flash_attention_bf16(rng):
    q = jnp.asarray(rng.standard_normal((1, 512, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 512, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 512, 64)), jnp.bfloat16)
    ours = np.asarray(attn_ops.flash_attention(q, k, v, 2), np.float32)
    ref = np.asarray(L.sdpa(q, k, v, 2, kernel="xla"), np.float32)
    np.testing.assert_allclose(ours, ref, atol=3e-2)


@pytest.mark.parametrize("fuse_silu", [False, True])
@pytest.mark.parametrize("hw,c,g", [(256, 64, 4), (1024, 320, 32)])
def test_fused_group_norm_matches_xla(rng, fuse_silu, hw, c, g):
    side = int(np.sqrt(hw))
    x = jnp.asarray(rng.standard_normal((2, side, side, c), dtype=np.float32))
    p = {
        "scale": jnp.asarray(rng.standard_normal(c, dtype=np.float32)),
        "bias": jnp.asarray(rng.standard_normal(c, dtype=np.float32)),
    }
    ours = np.asarray(gn_ops.fused_group_norm(p, x, g, fuse_silu=fuse_silu))
    ref = L.group_norm(p, x, g)
    if fuse_silu:
        ref = L.silu(ref)
    np.testing.assert_allclose(ours, np.asarray(ref), atol=2e-4)


def test_fused_group_norm_fallback_large_plane(rng):
    # plane over the VMEM budget -> must fall back to the XLA path (VAE)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 512), dtype=np.float32))
    p = {"scale": jnp.ones(512), "bias": jnp.zeros(512)}
    ours = np.asarray(gn_ops.fused_group_norm(p, x, 32))
    ref = np.asarray(L.group_norm(p, x, 32))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_fused_group_norm_no_tracer_leak_across_jits(rng):
    """Regression: the cached group one-hot must not capture a tracer from
    the first jit trace (it did when lru_cache stored a jnp constant)."""
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 64), dtype=np.float32))
    p = {"scale": jnp.ones(64), "bias": jnp.zeros(64)}
    f1 = jax.jit(lambda x: gn_ops.fused_group_norm(p, x, 4))
    f2 = jax.jit(lambda x: gn_ops.fused_group_norm(p, x, 4) + 1.0)
    a = np.asarray(f1(x))
    b = np.asarray(f2(x))
    np.testing.assert_allclose(b, a + 1.0, atol=1e-6)


def test_flash_attention_cross_padded(rng, monkeypatch):
    """77-token cross attention via the padded-kv flash path must match XLA
    (path off by default — slower in-program on v5e — but kept correct)."""
    monkeypatch.setattr(attn_ops, "CROSS_FLASH", True)
    q = jnp.asarray(rng.standard_normal((2, 512, 32), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((2, 77, 32), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((2, 77, 32), dtype=np.float32))
    ours = np.asarray(attn_ops.flash_attention(q, k, v, 2))
    ref = np.asarray(L.sdpa(q, k, v, 2, kernel="xla"))
    np.testing.assert_allclose(ours, ref, atol=2e-4)
