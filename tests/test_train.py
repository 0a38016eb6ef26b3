"""LDM training step: loss decreases, state plumbing, and mesh sharding.

The reference is inference-only; training is a TPU-native extension
(sdtpu/train/step.py). CPU backend, TINY config.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.config import TINY
from sdtpu.models import clip, temb, unet
from sdtpu.train import (
    init_train_state,
    jit_train_step,
    ldm_loss,
    make_optimizer,
)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    ku, kc, kt, kb = jax.random.split(key, 4)
    unet_params = unet.init(ku, TINY.unet, zero_init_outs=False)
    frozen = {"clip": clip.init(kc, TINY.clip), "temb": temb.init(kt, TINY.unet)}
    b, s = 2, TINY.latent_size
    batch = {
        "latents": jax.random.normal(kb, (b, s, s, TINY.unet.in_channels)),
        "tokens": jnp.tile(
            jnp.arange(TINY.clip.context_len, dtype=jnp.int32)[None], (b, 1)),
    }
    return unet_params, frozen, batch


def test_loss_finite_and_order_one(setup):
    unet_params, frozen, batch = setup
    loss = ldm_loss(unet_params, frozen, batch, jax.random.PRNGKey(1), TINY)
    assert np.isfinite(float(loss))
    # regressing eps ~ N(0,1) from a random-init net: loss near 1
    assert 0.1 < float(loss) < 20.0


def test_train_step_decreases_loss_on_fixed_batch(setup):
    unet_params, frozen, batch = setup
    opt = make_optimizer(lr=1e-3)
    state = init_train_state(unet_params, opt)
    step = jit_train_step(TINY, opt, donate=False)
    key = jax.random.PRNGKey(2)
    first = None
    for i in range(8):
        state, metrics = step(state, frozen, batch, key)  # fixed key+batch
        if first is None:
            first = float(metrics["loss"])
    assert int(state.step) == 8
    assert float(metrics["loss"]) < first, (first, float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))


def test_remat_matches_plain_loss(setup):
    unet_params, frozen, batch = setup
    k = jax.random.PRNGKey(3)
    a = ldm_loss(unet_params, frozen, batch, k, TINY, remat=False)
    b = ldm_loss(unet_params, frozen, batch, k, TINY, remat=True)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-5)


def test_sharded_train_step_matches_single(setup):
    """Same step on the (data, model) mesh: params shard on the model axis,
    batch on data; loss must match the single-device step to float tolerance
    and updated params must keep their shardings."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sdtpu.parallel.mesh import make_mesh
    from sdtpu.parallel.sharding import shard_params

    unet_params, frozen, batch = setup
    opt = make_optimizer(lr=1e-3)
    key = jax.random.PRNGKey(4)

    # single-device reference
    state0 = init_train_state(unet_params, opt)
    step = jit_train_step(TINY, opt, donate=False)
    ref_state, ref_metrics = step(state0, frozen, batch, key)

    mesh = make_mesh(data=2, model=4)
    sp = shard_params(unet_params, mesh)
    sfrozen = jax.device_put(frozen, NamedSharding(mesh, P()))
    sbatch = {
        "latents": jax.device_put(
            batch["latents"], NamedSharding(mesh, P("data", None, None, None))),
        "tokens": jax.device_put(
            batch["tokens"], NamedSharding(mesh, P("data", None))),
    }
    sstate = init_train_state(sp, opt)
    new_state, metrics = step(sstate, sfrozen, sbatch,
                              jax.device_put(key, NamedSharding(mesh, P())))
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-5)
    # params stay distributed over the full mesh after the update
    leaves = jax.tree.leaves(new_state.params)
    assert any(len(x.devices()) == 8 for x in leaves)
    # and one more step runs on the updated sharded state
    new_state2, metrics2 = step(new_state, sfrozen, sbatch, key)
    assert np.isfinite(float(metrics2["loss"]))


def test_ema_tracks_params(setup):
    unet_params, frozen, batch = setup
    opt = make_optimizer(lr=1e-2)
    from sdtpu.train import train_step
    state = init_train_state(unet_params, opt, ema=True)
    key = jax.random.PRNGKey(5)
    s1, _ = train_step(state, frozen, batch, key, TINY, opt, ema_decay=0.5)
    # ema moved halfway toward the updated params
    p = jax.tree.leaves(s1.params)[0]
    e = jax.tree.leaves(s1.ema)[0]
    p0 = jax.tree.leaves(unet_params)[0]
    np.testing.assert_allclose(np.asarray(e), np.asarray(0.5 * p0 + 0.5 * p),
                               rtol=1e-5, atol=1e-6)


def test_train_state_checkpoint_roundtrip(setup, tmp_path):
    """Save/restore the full training state (params + AdamW moments + step
    + EMA) and verify training CONTINUES identically — the resume
    guarantee (SURVEY §5.4)."""
    from sdtpu.train import load_train_state, save_train_state, train_step

    unet_params, frozen, batch = setup
    opt = make_optimizer(lr=1e-3)
    state = init_train_state(unet_params, opt, ema=True)
    key = jax.random.PRNGKey(6)
    state, _ = train_step(state, frozen, batch, key, TINY, opt)

    save_train_state(state, tmp_path / "ckpt")
    template = init_train_state(unet_params, opt, ema=True)
    restored = load_train_state(tmp_path / "ckpt", template)
    assert int(restored.step) == 1

    # one more step from each — must match exactly (same program, same data)
    a, ma = train_step(state, frozen, batch, key, TINY, opt)
    b, mb = train_step(restored, frozen, batch, key, TINY, opt)
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=0)
    la, lb = jax.tree.leaves(a.params)[0], jax.tree.leaves(b.params)[0]
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_bf16_training_grads(setup):
    """bf16 params + bf16 compute must differentiate (regression: jax's
    conv transpose rule rejects the f32-accumulating conv's cotangent
    against bf16 weights; layers._conv_f32acc carries a custom_vjp)."""
    import dataclasses

    unet_params, frozen, batch = setup
    cfg = dataclasses.replace(TINY, dtype="bfloat16")
    cast = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
    g = jax.grad(ldm_loss)(cast(unet_params), cast(frozen), batch,
                           jax.random.PRNGKey(9), cfg)
    leaves = jax.tree.leaves(g)
    assert leaves[0].dtype == jnp.bfloat16
    assert all(np.isfinite(np.asarray(x, np.float32)).all() for x in leaves)


def test_conv_custom_vjp_matches_autodiff_f32(setup):
    """At f32 (where jax's own rule works) the custom conv backward must
    reproduce autodiff gradients exactly."""
    from sdtpu.models.layers import _conv_raw, conv2d

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16), dtype=np.float32))
    p = {"w": jnp.asarray(rng.standard_normal((3, 3, 16, 24),
                                              dtype=np.float32)) * 0.1,
         "b": jnp.zeros((24,))}

    def via_layer(x, w):
        return jnp.sum(jnp.square(conv2d({"w": w, "b": p["b"]}, x)))

    def via_raw(x, w):
        return jnp.sum(jnp.square(
            _conv_raw(x, w, 1, 1, jnp.float32) + p["b"]))

    ga = jax.grad(via_layer, argnums=(0, 1))(x, p["w"])
    gb = jax.grad(via_raw, argnums=(0, 1))(x, p["w"])
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_v_objective_and_auto_follow_config(setup):
    """v-prediction target (Salimans & Ho 2022): distinct from eps, and
    objective="auto" must follow cfg.prediction exactly (same key, same
    program — bit-identical loss)."""
    import dataclasses

    unet_params, frozen, batch = setup
    k = jax.random.PRNGKey(30)
    l_eps = ldm_loss(unet_params, frozen, batch, k, TINY, objective="eps")
    l_v = ldm_loss(unet_params, frozen, batch, k, TINY, objective="v")
    assert np.isfinite(float(l_eps)) and np.isfinite(float(l_v))
    assert float(l_eps) != float(l_v)

    cfg_v = dataclasses.replace(TINY, prediction="v")
    l_auto = ldm_loss(unet_params, frozen, batch, k, cfg_v, objective="auto")
    np.testing.assert_array_equal(float(l_auto), float(l_v))
    l_auto_eps = ldm_loss(unet_params, frozen, batch, k, TINY,
                          objective="auto")
    np.testing.assert_array_equal(float(l_auto_eps), float(l_eps))


def test_min_snr_weighting_oracle(setup):
    """min-SNR (arXiv:2303.09556): for the eps objective, gamma -> inf
    gives weight min(SNR,g)/SNR = 1 — bit-identical to the unweighted
    loss; a finite gamma strictly reduces the weight on high-SNR samples
    so the loss changes (and stays finite)."""
    unet_params, frozen, batch = setup
    k = jax.random.PRNGKey(31)
    base = ldm_loss(unet_params, frozen, batch, k, TINY, objective="eps")
    inf_g = ldm_loss(unet_params, frozen, batch, k, TINY, objective="eps",
                     snr_gamma=1e9)
    np.testing.assert_allclose(float(inf_g), float(base), rtol=1e-6)
    small = ldm_loss(unet_params, frozen, batch, k, TINY, objective="eps",
                     snr_gamma=0.1)
    assert np.isfinite(float(small))
    # weights are min(snr,g)/snr <= 1, so the weighted loss cannot exceed
    # the unweighted one
    assert float(small) <= float(base) + 1e-6


def test_noise_offset_changes_loss_deterministically(setup):
    unet_params, frozen, batch = setup
    k = jax.random.PRNGKey(32)
    base = ldm_loss(unet_params, frozen, batch, k, TINY)
    off0 = ldm_loss(unet_params, frozen, batch, k, TINY, noise_offset=0.0)
    np.testing.assert_array_equal(float(off0), float(base))
    off = ldm_loss(unet_params, frozen, batch, k, TINY, noise_offset=0.1)
    off2 = ldm_loss(unet_params, frozen, batch, k, TINY, noise_offset=0.1)
    assert np.isfinite(float(off)) and float(off) != float(base)
    np.testing.assert_array_equal(float(off), float(off2))


def test_train_step_with_objective_knobs(setup):
    """The jitted step accepts the full knob set (v + min-SNR + offset)
    and still decreases loss on a fixed batch."""
    unet_params, frozen, batch = setup
    opt = make_optimizer(lr=1e-3)
    state = init_train_state(unet_params, opt)
    step = jit_train_step(TINY, opt, donate=False, objective="v",
                          snr_gamma=5.0, noise_offset=0.05)
    key = jax.random.PRNGKey(33)
    first = None
    for _ in range(6):
        state, metrics = step(state, frozen, batch, key)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first


def test_f32_masters_survive_small_lr_and_ema_in_bf16_compute(setup):
    """ADVICE r2 #1 regression: with bf16 COMPUTE the trainable params must
    stay float32 masters — training bf16 params directly loses lr-scale
    updates (below the bf16 ulp of typical weights) and freezes the EMA
    (0.9999 rounds to 1.0 in bf16). ldm_loss casts masters to the compute
    dtype internally, so f32 state + bf16 forward is the supported mode."""
    import dataclasses

    from sdtpu.train import train_step

    unet_params, frozen, batch = setup
    cfg = dataclasses.replace(TINY, dtype="bfloat16")
    bf16 = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
    frozen_bf16 = bf16(frozen)

    opt = make_optimizer(lr=1e-5)
    state = init_train_state(unet_params, opt, ema=True)
    key = jax.random.PRNGKey(11)
    s1, m1 = train_step(state, frozen_bf16, batch, key, cfg, opt)
    assert np.isfinite(float(m1["loss"]))

    # every updated param/EMA leaf is still float32
    assert all(x.dtype == jnp.float32 for x in jax.tree.leaves(s1.params))
    assert all(x.dtype == jnp.float32 for x in jax.tree.leaves(s1.ema))

    # lr=1e-5 updates survive (bf16 params would round most to zero)
    deltas = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                           - b.astype(jnp.float32)))),
        s1.params, state.params)
    assert max(jax.tree.leaves(deltas)) > 0.0

    # EMA accumulates at decay 0.9999 over a few larger steps (in bf16 the
    # update e*0.9999 + p*1e-4 is exactly a no-op)
    opt2 = make_optimizer(lr=1e-2)
    st = init_train_state(unet_params, opt2, ema=True)
    for i in range(3):
        st, _ = train_step(st, frozen_bf16, batch,
                           jax.random.PRNGKey(20 + i), cfg, opt2,
                           ema_decay=0.9999)
    ema_delta = jax.tree.map(
        lambda e, p0: float(jnp.max(jnp.abs(e - p0))),
        st.ema, unet_params)
    assert max(jax.tree.leaves(ema_delta)) > 0.0
