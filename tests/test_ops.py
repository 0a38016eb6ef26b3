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


# ---------------------------------------------------------------------------
# fused implicit-GEMM conv (sdtpu.ops.conv)
# ---------------------------------------------------------------------------

from sdtpu.ops import conv as conv_ops  # noqa: E402
from sdtpu.ops import matmul as mm_ops  # noqa: E402


@pytest.fixture(autouse=True)
def _conv_interpret(monkeypatch):
    monkeypatch.setattr(conv_ops, "INTERPRET", True)
    monkeypatch.setattr(mm_ops, "INTERPRET", True)
    conv_ops._fused_conv.clear_cache()
    mm_ops._mm.clear_cache()
    yield
    conv_ops._fused_conv.clear_cache()
    mm_ops._mm.clear_cache()


def _ref_conv(x, w, pad):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_fused_conv_gn_silu_prologue(rng):
    n, h, w_, cin, cout, g = 2, 8, 8, 64, 96, 8
    x = jnp.asarray(rng.standard_normal((n, h, w_, cin), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout),
                                        dtype=np.float32)) * 0.05
    b = jnp.asarray(rng.standard_normal((n, cout), dtype=np.float32))
    p = {"scale": jnp.asarray(rng.standard_normal(cin,
                                                  dtype=np.float32)) * 0.1 + 1,
         "bias": jnp.asarray(rng.standard_normal(cin, dtype=np.float32))}
    ref = _ref_conv(L.silu(L.group_norm(p, x, g)), w, 1) + b[:, None, None, :]
    a, d = conv_ops.gn_affine(p, x, g)
    got = conv_ops.fused_conv(x, w, b, a=a, d=d, silu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_fused_conv_1x1_plain_bias(rng):
    n, h, w_, cin, cout = 2, 8, 8, 64, 96
    x = jnp.asarray(rng.standard_normal((n, h, w_, cin), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((1, 1, cin, cout),
                                        dtype=np.float32)) * 0.05
    b = jnp.asarray(rng.standard_normal(cout, dtype=np.float32))
    ref = _ref_conv(x, w, 0) + b
    got = conv_ops.fused_conv(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fused_conv_affine_no_silu(rng):
    # transformer proj_in: GN prologue WITHOUT the SiLU
    n, h, w_, c, g = 1, 8, 8, 64, 8
    x = jnp.asarray(rng.standard_normal((n, h, w_, c), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((1, 1, c, c), dtype=np.float32)) * 0.1
    p = {"scale": jnp.ones(c), "bias": jnp.zeros(c)}
    ref = _ref_conv(L.group_norm(p, x, g, eps=1e-6), w, 0)
    a, d = conv_ops.gn_affine(p, x, g, eps=1e-6)
    got = conv_ops.fused_conv(x, w, jnp.zeros(c), a=a, d=d, silu=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_fused_conv_int8_weights(rng):
    n, h, w_, cin, cout = 2, 8, 8, 64, 96
    x = jnp.asarray(rng.standard_normal((n, h, w_, cin), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout),
                                        dtype=np.float32)) * 0.05
    ws = jnp.abs(w).max(axis=(0, 1, 2)) / 127.0
    wq = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)
    ref = _ref_conv(x, wq.astype(jnp.float32) * ws, 1)
    got = conv_ops.fused_conv(x, wq, jnp.zeros(cout), w_scale=ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-2, rtol=1e-3)


def test_fused_conv_tiled_cin_cout(rng):
    # Cin=640 -> 640-wide contraction chunk; Cout=256 -> one 256 tile
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 640), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 640, 256),
                                        dtype=np.float32)) * 0.02
    ref = _ref_conv(x, w, 1)
    got = conv_ops.fused_conv(x, w, jnp.zeros(256))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_fused_conv_eligibility_gate():
    # 512px VAE plane exceeds the VMEM scratch budget -> not eligible
    x = jnp.zeros((1, 512, 512, 128), jnp.bfloat16)
    w = jnp.zeros((3, 3, 128, 128), jnp.bfloat16)
    assert not conv_ops.eligible(x, w, 1, 1)
    # SD15 level-0 up-path worst case (64x64, Cin 640) IS eligible
    x = jnp.zeros((2, 64, 64, 640), jnp.bfloat16)
    w = jnp.zeros((3, 3, 640, 320), jnp.bfloat16)
    assert conv_ops.eligible(x, w, 1, 1)
    # stride/padding contracts
    assert not conv_ops.eligible(x, w, 2, 1)
    assert not conv_ops.eligible(x, w, 1, 0)


def test_unet_pallas_conv_matches_xla(rng):
    from sdtpu.config import TINY
    from sdtpu.models import unet

    cfg = TINY.unet
    params = unet.init(jax.random.PRNGKey(0), cfg, zero_init_outs=False)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4), dtype=np.float32))
    temb = jnp.asarray(rng.standard_normal((2, cfg.time_embed_dim),
                                           dtype=np.float32))
    ctx = jnp.asarray(rng.standard_normal((2, 16, cfg.context_dim),
                                          dtype=np.float32))
    ref = np.asarray(unet.apply(params, x, temb, ctx, cfg, kernels="xla"))
    got = np.asarray(unet.apply(params, x, temb, ctx, cfg,
                                kernels="pallas_conv"))
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-4)


def test_unet_pallas_conv_int8w_close(rng):
    from sdtpu.config import TINY
    from sdtpu.models import unet
    from sdtpu.quant.ptq import quantize_weights_only

    cfg = TINY.unet
    params = unet.init(jax.random.PRNGKey(0), cfg, zero_init_outs=False)
    pq = quantize_weights_only(params, include_dense=True, min_elems=0)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4), dtype=np.float32))
    temb = jnp.asarray(rng.standard_normal((1, cfg.time_embed_dim),
                                           dtype=np.float32))
    ctx = jnp.asarray(rng.standard_normal((1, 16, cfg.context_dim),
                                          dtype=np.float32))
    ref = np.asarray(unet.apply(params, x, temb, ctx, cfg, kernels="xla"))
    # int8w through the XLA dequant fallback and through the Pallas kernel
    # must agree with each other tightly and with bf16 within quant error
    q_xla = np.asarray(unet.apply(pq, x, temb, ctx, cfg, kernels="xla"))
    q_pal = np.asarray(unet.apply(pq, x, temb, ctx, cfg,
                                  kernels="pallas_conv"))
    np.testing.assert_allclose(q_pal, q_xla, atol=1e-3, rtol=1e-3)
    assert np.mean(np.abs(q_xla - ref)) / (np.mean(np.abs(ref)) + 1e-9) < 0.12


def test_vae_pallas_conv_matches_xla(rng):
    from sdtpu.config import TINY
    from sdtpu.models import vae

    cfg = TINY.vae
    params = vae.init(jax.random.PRNGKey(1), cfg)
    z = jnp.asarray(rng.standard_normal((1, 8, 8, cfg.z_channels),
                                        dtype=np.float32))
    ref = np.asarray(vae.apply(params, z, cfg, kernels="xla"))
    got = np.asarray(vae.apply(params, z, cfg, kernels="pallas_conv"))
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# weight-only int8 GEMM (sdtpu.ops.matmul)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("m,k,n", [(128, 64, 128), (256, 320, 256),
                                   (64, 96, 160)])
def test_matmul_int8w_matches_dequant(rng, m, k, n):
    x = jnp.asarray(rng.standard_normal((m, k), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((k, n), dtype=np.float32)) * 0.05
    ws = jnp.abs(w).max(axis=0) / 127.0
    w8 = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)
    b = jnp.asarray(rng.standard_normal(n, dtype=np.float32))
    ref = x @ (w8.astype(jnp.float32) * ws) + b
    got = mm_ops.matmul_int8w(x, w8, ws, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)


def test_matmul_int8w_batched_lead(rng):
    x = jnp.asarray(rng.standard_normal((2, 64, 96), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((96, 128), dtype=np.float32)) * 0.1
    ws = jnp.abs(w).max(axis=0) / 127.0
    w8 = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)
    ref = jnp.einsum("btk,kn->btn", x, w8.astype(jnp.float32) * ws)
    got = mm_ops.matmul_int8w(x, w8, ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)


def test_dense_routes_w8_through_pallas(rng, monkeypatch):
    # layers.dense must give identical results through the pallas GEMM and
    # the XLA dequant fallback
    x = jnp.asarray(rng.standard_normal((128, 96), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((96, 128), dtype=np.float32)) * 0.1
    ws = jnp.abs(w).max(axis=0) / 127.0
    w8 = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)
    p = {"w8": w8, "w8_scale": ws,
         "b": jnp.asarray(rng.standard_normal(128, dtype=np.float32))}
    got = np.asarray(L.dense(p, x))
    monkeypatch.setattr(mm_ops, "DISABLE", True)
    ref = np.asarray(L.dense(p, x))
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-4)


def test_conv_plan_matches_onchip_validated_matrix():
    """Pin `_plan` to the tile plans validated on the real chip
    (tools/smoke_conv_matrix.py): the planner's VMEM model was bisected
    against 13 on-chip Mosaic pass/fail points — including the GN-prologue
    f32 staging temporary — and these exact plans compile AND match the
    XLA reference at every SD15 UNet resblock shape. A change that shifts
    any of them must re-run the on-chip matrix before landing."""
    validated = {
        (2, 64, 64, 320, 320): (384, 128, 64, "B"),
        (2, 64, 64, 640, 320): (640, 640, 16, "A"),
        (2, 32, 32, 640, 640): (640, 640, 32, "B"),
        (2, 32, 32, 960, 640): (1024, 512, 32, "B"),
        (2, 16, 16, 1280, 1280): (1280, 640, 16, "B"),
        (2, 16, 16, 2560, 1280): (2560, 640, 16, "B"),
        (2, 16, 16, 1920, 1280): (1920, 640, 16, "B"),
        (2, 8, 8, 1280, 1280): (1280, 640, 8, "B"),
        (1, 64, 64, 512, 512): (512, 128, 64, "B"),   # VAE decoder plane
        (2, 64, 64, 512, 512): (512, 512, 16, "A"),
        (16, 32, 32, 640, 640): (640, 640, 32, "A"),  # serving batch 8 CFG
    }
    for (n, h, w, cin, cout), plan in validated.items():
        assert conv_ops._plan(h, w, cin, cout, 3, 2, n) == plan, (n, h, w)
    # 96x96 planes (768px / SD21-base level 0): non-power-of-two tile
    # geometry crashes Mosaic -> XLA fallback
    assert conv_ops._plan(96, 96, 320, 320, 3, 2, 2) is None
    assert conv_ops._plan(96, 96, 640, 320, 3, 2, 2) is None


@pytest.mark.parametrize("variant", ["A", "B"])
def test_fused_conv_both_variants_match_ref(rng, variant, monkeypatch):
    """Force each kernel variant at the same shape (the planner would pick
    B here) so the interpreter covers both grid orders."""
    n, h, w_, cin, cout, g = 2, 16, 16, 64, 64, 8
    th = h if variant == "B" else 8
    monkeypatch.setattr(conv_ops, "_plan",
                        lambda *a, **k: (cin, cin // 2, th, variant))
    x = jnp.asarray(rng.standard_normal((n, h, w_, cin), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout),
                                        dtype=np.float32)) * 0.05
    b = jnp.asarray(rng.standard_normal((n, cout), dtype=np.float32))
    p = {"scale": jnp.ones((cin,)), "bias": jnp.zeros((cin,))}
    ref = _ref_conv(L.silu(L.group_norm(p, x, g)), w, 1) + b[:, None, None, :]
    a, d = conv_ops.gn_affine(p, x, g)
    got = conv_ops.fused_conv(x, w, b, a=a, d=d, silu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_flash_attention_gradients_match_xla(rng):
    """custom_vjp backward (chunked exact recompute) must match XLA sdpa
    gradients — this is what makes kernels='pallas' usable under jax.grad
    in the training step."""
    b, s, heads, d = 1, 512, 2, 32
    c = heads * d
    q = jnp.asarray(rng.standard_normal((b, s, c), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, c), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, c), dtype=np.float32))
    tgt = jnp.asarray(rng.standard_normal((b, s, c), dtype=np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(jnp.square(attn_ops.flash_attention(q, k, v, heads) - tgt))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.square(L.sdpa(q, k, v, heads, kernel="xla") - tgt))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-3, rtol=1e-3)


def test_matmul_eligible_rejects_unaligned_m():
    """ADVICE r2 #3 regression: m not a multiple of 8 (e.g. the [B*77, ctx]
    cross-attention k/v flatten, m=154) must fall back to the XLA dequant
    path — a full-M tile with m % 8 != 0 is the non-tile-aligned shape that
    crashes this Mosaic toolchain."""
    mm_ops.INTERPRET, saved = True, mm_ops.INTERPRET
    try:
        assert not mm_ops.eligible(154, 768, 320)
        assert not mm_ops.eligible(77, 1024, 320)
        assert mm_ops.eligible(256, 768, 320)
    finally:
        mm_ops.INTERPRET = saved


def test_fused_conv_unplannable_shape_falls_back_to_xla(rng):
    """ADVICE r2 #2 regression: a direct fused_conv call on a shape with no
    validated plan (non-power-of-two W) must produce the XLA answer instead
    of running the kernel with an unchecked full-width plan."""
    n, h, w_, cin, cout, g = 1, 8, 24, 32, 32, 8
    assert conv_ops._plan(h, w_, cin, cout, 3, 4, n) is None
    x = jnp.asarray(rng.standard_normal((n, h, w_, cin), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout),
                                        dtype=np.float32)) * 0.05
    b = jnp.asarray(rng.standard_normal((n, cout), dtype=np.float32))
    p = {"scale": jnp.ones(cin), "bias": jnp.zeros(cin)}
    ref = _ref_conv(L.silu(L.group_norm(p, x, g)), w, 1) + b[:, None, None, :]
    a, d = conv_ops.gn_affine(p, x, g)
    got = conv_ops.fused_conv(x, w, b, a=a, d=d, silu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
    # quantized leg of the fallback
    ws = jnp.abs(w).max(axis=(0, 1, 2)) / 127.0
    wq = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)
    ref_q = _ref_conv(x, wq.astype(jnp.float32) * ws, 1)
    got_q = conv_ops.fused_conv(x, wq, jnp.zeros(cout), w_scale=ws)
    np.testing.assert_allclose(np.asarray(got_q), np.asarray(ref_q),
                               atol=1e-2, rtol=1e-3)


def test_eligible_uses_actual_itemsize():
    """f32 activations double every VMEM buffer: a shape the bf16 planner
    admits can overflow at f32 — eligible() must re-plan with the real
    itemsize rather than hardcoding 2."""
    # find a shape where the budgets differ
    x16 = jnp.zeros((2, 64, 64, 640), jnp.bfloat16)
    x32 = jnp.zeros((2, 64, 64, 640), jnp.float32)
    w = jnp.zeros((3, 3, 640, 320), jnp.bfloat16)
    conv_ops.INTERPRET, saved = True, conv_ops.INTERPRET
    try:
        e16 = conv_ops.eligible(x16, w, 1, 1)
        e32 = conv_ops.eligible(x32, w.astype(jnp.float32), 1, 1)
    finally:
        conv_ops.INTERPRET = saved
    assert e16
    # the f32 answer must agree with the f32 plan, whatever it is
    assert e32 == (conv_ops._plan(64, 64, 640, 320, 3, 4, 2) is not None)


@pytest.mark.parametrize("m,k,n", [(256, 320, 320), (512, 1280, 640)])
def test_matmul_w8a8_matches_xla_int8_dot(rng, m, k, n):
    """Static-scale W8A8 Pallas GEMM == the XLA int8 reference path
    (layers._dense_int8's in-graph formula) to f32-rounding tolerance."""
    x = jnp.asarray(rng.standard_normal((m, k), dtype=np.float32))
    w = rng.standard_normal((k, n), dtype=np.float32) * 0.05
    absmax = np.abs(w).max(axis=0)
    w_scale = jnp.asarray(absmax / 127.0)
    w_q = jnp.asarray(
        np.clip(np.round(w / (absmax / 127.0)), -127, 127).astype(np.int8))
    b = jnp.asarray(rng.standard_normal(n, dtype=np.float32))
    xs = jnp.float32(float(np.abs(np.asarray(x)).max()) / 127.0)

    inv = 1.0 / xs
    xq = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
    ref = (jax.lax.dot(xq, w_q, preferred_element_type=jnp.int32)
           .astype(jnp.float32) * xs * w_scale + b)

    got = mm_ops.matmul_w8a8(x, w_q, w_scale, xs, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-3)


def test_dense_w8a8_kernel_default_off(rng, monkeypatch):
    """By default a calibrated site must NOT take the Pallas W8A8 kernel:
    the e2e measurement rejected it (+78 ms/image from boundary slice/copy
    traffic — tools/attr_w8a8.py). Regression-pin the default."""
    monkeypatch.setattr(mm_ops, "INTERPRET", True)
    x = jnp.asarray(rng.standard_normal((256, 320), dtype=np.float32))
    w = rng.standard_normal((320, 320), dtype=np.float32) * 0.05
    absmax = np.abs(w).max(axis=0)
    p = {
        "w_q": jnp.asarray(np.clip(np.round(w / (absmax / 127.0)),
                                   -127, 127).astype(np.int8)),
        "w_scale": jnp.asarray(absmax / 127.0),
        "x_scale": jnp.float32(float(np.abs(np.asarray(x)).max()) / 127.0),
    }
    called = []
    real = mm_ops.matmul_w8a8
    monkeypatch.setattr(
        mm_ops, "matmul_w8a8",
        lambda *a, **kw: (called.append(1), real(*a, **kw))[1])
    L.dense(p, x)
    assert not called, "W8A8 kernel routed despite KERNEL_W8A8=False default"


def test_dense_routes_calibrated_site_through_w8a8_kernel(rng, monkeypatch):
    """With the opt-in flag on, a calibrated int8 site (w_q + x_scale) with
    eligible shapes must take the Pallas W8A8 kernel and agree with the XLA
    dequant formula. (KERNEL_W8A8 defaults OFF — the kernel loses e2e to
    boundary slice/copy traffic, PERF_NOTES 'W8A8 e2e closure'.)"""
    monkeypatch.setattr(mm_ops, "INTERPRET", True)
    monkeypatch.setattr(mm_ops, "KERNEL_W8A8", True)
    x = jnp.asarray(rng.standard_normal((256, 320), dtype=np.float32))
    w = rng.standard_normal((320, 320), dtype=np.float32) * 0.05
    absmax = np.abs(w).max(axis=0)
    p = {
        "w_q": jnp.asarray(np.clip(np.round(w / (absmax / 127.0)),
                                   -127, 127).astype(np.int8)),
        "w_scale": jnp.asarray(absmax / 127.0),
        "x_scale": jnp.float32(float(np.abs(np.asarray(x)).max()) / 127.0),
        "b": jnp.asarray(rng.standard_normal(320, dtype=np.float32)),
    }
    got = L.dense(p, x)

    called = []
    real = mm_ops.matmul_w8a8
    monkeypatch.setattr(
        mm_ops, "matmul_w8a8",
        lambda *a, **kw: (called.append(1), real(*a, **kw))[1])
    import sdtpu.models.layers as layers_mod

    got2 = layers_mod.dense(p, x)
    assert called, "calibrated site did not route through the W8A8 kernel"
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got2))

    # the XLA formula agrees
    monkeypatch.setattr(mm_ops, "DISABLE", True)
    ref = layers_mod.dense(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-3)


@pytest.mark.parametrize("cin", [256, 512])
def test_fused_conv_v2_merged_taps_deep_levels(rng, cin):
    """16x16 planes hit the v2 merged-tap path (merge=9 at Cin 256,
    merge=3 at Cin 512 where the 2^20 dot-LHS cap binds); numerics must
    match the XLA conv exactly as for the unmerged kernel."""
    x = jnp.asarray(rng.standard_normal((2, 16, 16, cin),
                                        dtype=np.float32)) * 0.5
    w = jnp.asarray(rng.standard_normal((3, 3, cin, 256),
                                        dtype=np.float32)) * 0.02
    b = jnp.asarray(rng.standard_normal((2, 256), dtype=np.float32))
    p = {"scale": jnp.ones(cin) * 1.1, "bias": jnp.zeros(cin) + 0.05}
    ref = _ref_conv(L.silu(L.group_norm(p, x, 8)), w, 1) + b[:, None, None, :]
    a, d = conv_ops.gn_affine(p, x, 8)
    got = conv_ops.fused_conv(x, w, b, a=a, d=d, silu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=1e-4)


def test_fused_conv_v2_flags_equal_v1(rng, monkeypatch):
    """Overlap + merged taps are pure scheduling: output must be
    bit-identical with the levers disabled."""
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 128),
                                        dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 128, 128),
                                        dtype=np.float32)) * 0.05
    b = jnp.zeros((128,), jnp.float32)
    v2 = np.asarray(conv_ops.fused_conv(x, w, b))
    conv_ops._fused_conv.clear_cache()
    monkeypatch.setattr(conv_ops, "STAGE_OVERLAP", False)
    monkeypatch.setattr(conv_ops, "MERGE_TAPS", False)
    v1 = np.asarray(conv_ops.fused_conv(x, w, b))
    conv_ops._fused_conv.clear_cache()
    # merged contraction reassociates float adds; allow only tiny drift
    np.testing.assert_allclose(v2, v1, atol=2e-5, rtol=1e-6)
