"""Sampler math golden tests (analogue of reference test_dpm.cpp:26-53, but
automated: schedule-table spot checks + convergence properties + comparison
against independently-coded textbook updates)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.samplers import ddim, dpm, euler, euler_a, get_sampler, plms, unipc
from sdtpu.samplers.schedule import NoiseSchedule


@pytest.fixture(scope="module")
def sched():
    return NoiseSchedule.sd_v1()


@pytest.mark.smoke
def test_schedule_tables(sched):
    # beta schedule endpoints (reference: dpm_solver.cpp:84-97 constants)
    betas = np.linspace(np.sqrt(0.00085), np.sqrt(0.0120), 1000) ** 2
    assert np.isclose(betas[0], 0.00085)
    assert np.isclose(betas[-1], 0.0120)
    assert np.allclose(sched.alphas_cumprod, np.cumprod(1 - betas))
    assert np.allclose(sched.log_alpha_grid, 0.5 * np.log(sched.alphas_cumprod))
    # marginals: alpha^2 + sigma^2 == 1
    t = np.linspace(0.001, 1.0, 57)
    a, s = sched.marginal_alpha(t), sched.marginal_sigma(t)
    assert np.allclose(a**2 + s**2, 1.0, atol=1e-12)
    # lambda = log(alpha/sigma)
    assert np.allclose(sched.marginal_lambda(t), np.log(a / s), atol=1e-10)


@pytest.mark.smoke
def test_sampling_time_grids(sched):
    ts = sched.sampling_times(20)
    assert ts.shape == (21,)
    assert np.isclose(ts[0], 1.0) and np.isclose(ts[-1], 0.001)
    # model-facing timesteps: (t - 1/N) * N  (reference: dpm_solver.cpp:115)
    mt = sched.model_times(ts)
    assert np.isclose(mt[0], 999.0) and np.isclose(mt[-1], 0.0)
    dd = sched.ddim_timesteps(20)
    assert dd[0] == 951 and dd[-1] == 1 and len(dd) == 20


def _run_sampler(mod, sched, steps, model_fn, x0_shape, seed=0):
    """Drive a sampler exactly as the pipeline's lax.scan will."""
    p = mod.plan(sched, steps)
    x = jax.random.normal(jax.random.PRNGKey(seed), x0_shape, jnp.float32)
    st = mod.init_state(x0_shape)

    def body(carry, i):
        x, st = carry
        eps = model_fn(x, p.model_t[i])
        x, st = mod.step(p, i, x, eps, st)
        return (x, st), None

    (x, _), _ = jax.lax.scan(body, (x, st), jnp.arange(steps))
    return np.asarray(x)


@pytest.mark.parametrize("name", ["dpm", "ddim", "plms", "euler", "unipc"])
def test_exact_trajectory_tracking(sched, name):
    """If the model's implied data prediction is a constant x0*, the
    probability-flow ODE trajectory is exactly x_t = alpha_t x0* + sigma_t c.
    DPM-2M, DDIM, Euler (the derivative is constant along the linear-in-sigma
    solution) and UniPC reproduce it exactly (up to fp32); PLMS to multistep
    truncation error. Check the endpoint against the analytic value."""
    mod = get_sampler(name)
    x0_star = np.linspace(-1, 1, 16).reshape(4, 4).astype(np.float32)

    if name in ("dpm", "euler", "unipc"):
        ts = sched.sampling_times(20)
        alphas = sched.marginal_alpha(ts)
        sigmas = sched.marginal_sigma(ts)

        def coeffs(i):  # marginals at the step's start time
            return alphas[i], sigmas[i]

        a_end, s_end = alphas[-1], sigmas[-1]
    else:
        dd = sched.ddim_timesteps(20)
        abar = sched.alphas_cumprod

        def coeffs(i):
            a2 = abar[dd[i]]
            return np.sqrt(a2), np.sqrt(1 - a2)

        a_end = np.sqrt(abar[0])
        s_end = np.sqrt(1 - abar[0])

    p = mod.plan(sched, 20)
    x_init = jax.random.normal(jax.random.PRNGKey(0), x0_star.shape, jnp.float32)
    a0, s0 = coeffs(0)
    c = (np.asarray(x_init) - a0 * x0_star) / s0  # trajectory constant

    x, st = x_init, mod.init_state(x0_star.shape)
    for i in range(20):
        a_i, s_i = coeffs(i)
        eps = (x - jnp.float32(a_i) * x0_star) / jnp.float32(s_i)
        x, st = mod.step(p, i, x, eps, st)
    expected = a_end * x0_star + s_end * c
    err = np.abs(np.asarray(x) - expected).max()
    tol = 5e-3 if name == "plms" else 2e-4
    assert err < tol, f"{name}: |x - exact endpoint| = {err}"
    # and the endpoint is close to x0* up to the residual sigma_end noise
    assert np.abs(np.asarray(x) - x0_star).max() < s_end * np.abs(c).max() + 0.01


def test_dpm_matches_textbook_implementation(sched):
    """Compare the table-driven DPM step against a direct textbook
    DPM-Solver++(2M) implementation recomputed from schedule marginals."""
    steps = 13
    p = dpm.plan(sched, steps)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3)).astype(np.float32)
    eps_seq = rng.standard_normal((steps, 2, 3)).astype(np.float32)

    # ours
    x_ours = jnp.asarray(x)
    st = dpm.init_state(x.shape)
    for i in range(steps):
        x_ours, st = dpm.step(p, i, x_ours, jnp.asarray(eps_seq[i]), st)
    x_ours = np.asarray(x_ours)

    # textbook
    ts = sched.sampling_times(steps)
    lam = sched.marginal_lambda(ts)
    alpha = sched.marginal_alpha(ts)
    sigma = sched.marginal_sigma(ts)
    x_ref = x.copy()
    prev_y = None
    for i in range(steps):
        s, t = i, i + 1
        h = lam[t] - lam[s]
        y = (x_ref - sigma[s] * eps_seq[i]) / alpha[s]
        if prev_y is None:
            d = y
        else:
            h_prev = lam[s] - lam[s - 1]
            r = h_prev / h
            d = (1 + 1 / (2 * r)) * y - (1 / (2 * r)) * prev_y
        x_ref = (sigma[t] / sigma[s]) * x_ref - alpha[t] * np.expm1(-h) * d
        prev_y = y
    assert np.allclose(x_ours, x_ref, atol=2e-4), np.abs(x_ours - x_ref).max()


def test_ddim_matches_textbook_implementation(sched):
    steps = 10
    p = ddim.plan(sched, steps)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 2)).astype(np.float32)
    eps_seq = rng.standard_normal((steps, 2, 2)).astype(np.float32)

    x_ours = jnp.asarray(x)
    st = ddim.init_state(x.shape)
    for i in range(steps):
        x_ours, st = ddim.step(p, i, x_ours, jnp.asarray(eps_seq[i]), st)

    ts = sched.ddim_timesteps(steps)
    abar = sched.alphas_cumprod
    x_ref = x.copy()
    for i, t in enumerate(ts):
        ap = abar[ts[i + 1]] if i + 1 < steps else abar[0]
        a = abar[t]
        x0 = (x_ref - np.sqrt(1 - a) * eps_seq[i]) / np.sqrt(a)
        x_ref = np.sqrt(ap) * x0 + np.sqrt(1 - ap) * eps_seq[i]
    assert np.allclose(np.asarray(x_ours), x_ref, atol=2e-4)


def test_euler_matches_kdiffusion_form(sched):
    """Table-driven Euler step vs the k-diffusion formulation computed
    directly in sigma_k space (x_k = x/alpha, d = eps, x_k += dsigma_k * d)."""
    steps = 9
    p = euler.plan(sched, steps)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 3)).astype(np.float32)
    eps_seq = rng.standard_normal((steps, 2, 3)).astype(np.float32)

    x_ours = jnp.asarray(x)
    st = euler.init_state(x.shape)
    for i in range(steps):
        x_ours, st = euler.step(p, i, x_ours, jnp.asarray(eps_seq[i]), st)

    ts = sched.sampling_times(steps)
    alpha = sched.marginal_alpha(ts)
    sigk = sched.marginal_sigma(ts) / alpha
    x_ref = x.copy()
    for i in range(steps):
        xk = x_ref / alpha[i]
        xk = xk + (sigk[i + 1] - sigk[i]) * eps_seq[i]
        x_ref = (alpha[i + 1] * xk).astype(np.float32)
    assert np.allclose(np.asarray(x_ours), x_ref, atol=2e-4)


def test_euler_a_matches_kdiffusion_form(sched):
    """Table-driven Euler-ancestral vs the k-diffusion get_ancestral_step
    formulation (sigma_up/sigma_down in sigma_k space + fresh noise)."""
    steps = 9
    p = euler_a.plan(sched, steps)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 3)).astype(np.float32)
    eps_seq = rng.standard_normal((steps, 2, 3)).astype(np.float32)
    noise_seq = rng.standard_normal((steps, 2, 3)).astype(np.float32)

    x_ours = jnp.asarray(x)
    st = euler_a.init_state(x.shape)
    for i in range(steps):
        x_ours, st = euler_a.step(p, i, x_ours, jnp.asarray(eps_seq[i]), st,
                                  noise=jnp.asarray(noise_seq[i]))

    ts = sched.sampling_times(steps)
    alpha = sched.marginal_alpha(ts)
    sigk = sched.marginal_sigma(ts) / alpha
    x_ref = x.copy()
    for i in range(steps):
        s, n = sigk[i], sigk[i + 1]
        up = np.sqrt(n**2 * (s**2 - n**2) / s**2)
        down = np.sqrt(n**2 - up**2)
        xk = x_ref / alpha[i]
        xk = xk + (down - s) * eps_seq[i] + up * noise_seq[i]
        x_ref = (alpha[i + 1] * xk).astype(np.float32)
    assert np.allclose(np.asarray(x_ours), x_ref, atol=2e-4)


def test_unipc_matches_bh_form_implementation(sched):
    """Table-driven UniPC vs a direct implementation in the UniPC paper's
    B(h) parametrization (bh2: B_h = expm1(hh), hh = -h for data prediction,
    rhos solved then multiplied back — algebraically equivalent at order 2,
    which this pins down numerically)."""
    steps = 11
    p = unipc.plan(sched, steps)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 3)).astype(np.float32)
    eps_seq = rng.standard_normal((steps, 2, 3)).astype(np.float32)

    x_ours = jnp.asarray(x)
    st = unipc.init_state(x.shape)
    for i in range(steps):
        x_ours, st = unipc.step(p, i, x_ours, jnp.asarray(eps_seq[i]), st)

    ts = sched.sampling_times(steps)
    lam = sched.marginal_lambda(ts)
    alpha = sched.marginal_alpha(ts)
    sigma = sched.marginal_sigma(ts)
    x_ref = x.copy()
    last_x = m_prev = None
    for i in range(steps):
        m = (x_ref - sigma[i] * eps_seq[i]) / alpha[i]
        if i > 0:
            # UniC (corrector) for the arrival transition i-1 -> i
            hh = -(lam[i] - lam[i - 1])
            h_phi_1 = np.expm1(hh)
            B_h = np.expm1(hh)  # bh2
            rhos_c = (h_phi_1 / hh - 1.0) / B_h
            x_t_ = (sigma[i] / sigma[i - 1]) * last_x \
                - alpha[i] * h_phi_1 * m_prev
            xc = x_t_ - alpha[i] * B_h * (rhos_c * (m - m_prev))
        else:
            xc = x_ref
        # UniP (predictor) for the transition i -> i+1
        h = lam[i + 1] - lam[i]
        hh = -h
        h_phi_1 = np.expm1(hh)
        B_h = np.expm1(hh)
        x_t_ = (sigma[i + 1] / sigma[i]) * xc - alpha[i + 1] * h_phi_1 * m
        if i > 0:
            rk = (lam[i - 1] - lam[i]) / h  # negative
            D1_0 = (m_prev - m) / rk
            rhos_p = (h_phi_1 / hh - 1.0) / B_h
            x_next = x_t_ - alpha[i + 1] * B_h * (rhos_p * D1_0)
        else:
            x_next = x_t_
        last_x, m_prev, x_ref = xc, m, x_next.astype(np.float32)
    assert np.allclose(np.asarray(x_ours), x_ref, atol=2e-4), \
        np.abs(np.asarray(x_ours) - x_ref).max()


def test_unipc_warm_start_restarts_history(sched):
    """img2img warm start: at the first executed step the corrector is off
    and the predictor is 1st order — junk history must not leak in."""
    ss = 8
    p = unipc.plan(sched, 20, start_step=ss)
    assert float(p.c_g[ss]) == 0.0 and float(p.c_g[ss + 1]) == 1.0
    assert float(p.p_d[ss]) == 0.0 and float(p.p_d[ss + 1]) != 0.0
    x = jnp.asarray(np.random.default_rng(0).standard_normal(16), jnp.float32)
    eps = jnp.asarray(np.random.default_rng(1).standard_normal(16), jnp.float32)
    a, _ = unipc.step(p, ss, x, eps, unipc.init_state(x.shape))
    b, _ = unipc.step(p, ss, x, eps,
                      unipc.State(last_x=100.0 * x, m_prev=-50.0 * x))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_new_samplers_e2e_and_cross_path_determinism():
    """euler / euler_a / unipc through the full Context: deterministic per
    seed, seed-sensitive, and batch-of-1 generate_batch bit-identical to the
    single path (the ancestral per-step noise is folded PER SAMPLE, so the
    stream must not depend on batch composition)."""
    import sdtpu

    for name in ("euler", "euler_a", "unipc", "dpm_sde"):
        ctx = sdtpu.Context(config="tiny", steps=4, sampler=name)
        a = ctx.generate("the horse", seed=7)
        b = ctx.generate("the horse", seed=7)
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, ctx.generate("the horse", seed=8))
        bat = ctx.generate_batch(
            [{"prompt": "the horse", "guidance": 7.5, "seed": 7}])
        np.testing.assert_array_equal(a, bat[0])


@pytest.mark.smoke
def test_cli_sampler_choices_match_registry():
    """cli.SAMPLER_CHOICES is a jax-import-free literal; keep it in sync."""
    from sdtpu.cli import SAMPLER_CHOICES
    from sdtpu.samplers import SAMPLERS

    assert SAMPLER_CHOICES == sorted(SAMPLERS)


def test_plms_ab_coefficients(sched):
    p = plms.plan(sched, 6)
    c = np.asarray(p.ab_coef)
    assert np.allclose(c[0], [1, 0, 0, 0])
    assert np.allclose(c[1], [1.5, -0.5, 0, 0])
    assert np.allclose(c[2], [23 / 12, -16 / 12, 5 / 12, 0])
    assert np.allclose(c[3], [55 / 24, -59 / 24, 37 / 24, -9 / 24])
    assert np.allclose(c[4], c[3]) and np.allclose(c[5], c[3])
    # AB weights sum to 1 (consistency)
    assert np.allclose(c.sum(-1), 1.0)


@pytest.mark.smoke
def test_steps_are_scannable_and_jittable(sched):
    """The whole denoise loop must trace into a single lax.scan under jit —
    this is the core TPU design requirement (no host round-trips,
    SURVEY.md §3.2)."""
    for name in ("dpm", "ddim", "plms", "euler", "euler_a", "unipc"):
        mod = get_sampler(name)
        steps = 7
        p = mod.plan(sched, steps)
        needs_noise = getattr(mod, "NEEDS_NOISE", False)

        @jax.jit
        def run(x):
            st = mod.init_state(x.shape)

            def body(carry, i):
                x, st = carry
                eps = 0.1 * x  # stand-in model
                if needs_noise:
                    n = jax.random.normal(
                        jax.random.fold_in(jax.random.PRNGKey(0), i), x.shape)
                    x, st = mod.step(p, i, x, eps, st, noise=n)
                else:
                    x, st = mod.step(p, i, x, eps, st)
                return (x, st), None

            (x, _), _ = jax.lax.scan(body, (x, st), jnp.arange(steps))
            return x

        out = run(jnp.ones((4, 4)))
        assert np.isfinite(np.asarray(out)).all()


def test_plms_exact_first_step_matches_compvis_recipe():
    """"plms_exact" spends a second UNet eval on the pseudo-improved-Euler
    first step (CompVis PLMS p_sample step 0). Oracle: walk the recipe
    eagerly — e_t at step 0, DDIM-step to x_mid, e_next at step 1, final
    step-0 update with (e_t+e_next)/2, history seeded with e_t — then plain
    AB steps; must match the jitted pipeline bit-for-bit."""
    import sdtpu
    from sdtpu.engine.pipeline import denoise, encode_text
    from sdtpu.models import temb as temb_mod
    from sdtpu.models import unet as unet_mod
    from sdtpu.samplers import NoiseSchedule

    ctx = sdtpu.Context(config="tiny", steps=4, sampler="plms_exact")
    cfg = ctx.cfg
    steps = 4
    tokens = jnp.asarray(
        [ctx.tokenizer.tokenize("the horse", cfg.clip.context_len)], jnp.int32)
    key = jax.random.PRNGKey(3)

    ours = np.asarray(denoise(
        ctx.params, encode_text(ctx.params, tokens, cfg), key,
        jnp.float32(1.0), cfg, "plms_exact", steps, use_cfg=False,
    ))

    pl = plms.plan(NoiseSchedule.sd_v1(), steps)
    context = encode_text(ctx.params, tokens, cfg)
    t_embs = temb_mod.apply(ctx.params["temb"], pl.model_t, cfg.unet,
                            dtype=cfg.compute_dtype)

    def ev(x, i):
        te = jnp.broadcast_to(t_embs[i], (1, t_embs.shape[-1]))
        return unet_mod.apply(
            ctx.params["unet"], x.astype(cfg.compute_dtype), te, context,
            cfg.unet).astype(jnp.float32)

    shape = (1, cfg.latent_size, cfg.latent_size, cfg.latent_channels)
    x = jax.random.normal(key, shape, jnp.float32)
    st0 = plms.init_state(shape)
    e_t = ev(x, 0)
    x_mid, _ = plms.step(pl, 0, x, e_t, st0)
    e_next = ev(x_mid, 1)
    x, _ = plms.step(pl, 0, x, 0.5 * (e_t + e_next), st0)
    st = plms.State(e1=e_t, e2=st0.e1, e3=st0.e2)
    for i in range(1, steps):
        x, st = plms.step(pl, i, x, ev(x, i), st)
    np.testing.assert_allclose(ours, np.asarray(x), atol=1e-5)


def test_plms_exact_differs_from_plms_only_via_first_step():
    import sdtpu

    a = sdtpu.Context(config="tiny", steps=3, sampler="plms").generate(
        "the horse", seed=5)
    b = sdtpu.Context(config="tiny", steps=3, sampler="plms_exact").generate(
        "the horse", seed=5)
    assert a.shape == b.shape
    assert not np.array_equal(a, b)  # the corrector changed step 0


def test_warm_start_restarts_solver_history(sched):
    """img2img truncates the trajectory at start_step: the first EXECUTED
    step must be pure 1st order, independent of the zero-initialised history
    buffers (ADVICE r1 high: zero history entering the 2nd-order blend gave
    D ~= 1.48*y on the default img2img path)."""
    ss = 8  # default img2img start (strength 0.6, 20 steps)
    p = dpm.plan(sched, 20, start_step=ss)
    assert float(p.i2r[ss]) == 0.0 and float(p.i2r[ss + 1]) > 0.0
    x = jnp.asarray(np.random.default_rng(0).standard_normal(16), jnp.float32)
    eps = jnp.asarray(np.random.default_rng(1).standard_normal(16), jnp.float32)
    a, st_a = dpm.step(p, ss, x, eps, dpm.init_state(x.shape))
    b, _ = dpm.step(p, ss, x, eps, dpm.State(prev_y=100.0 * x))  # junk history
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the NEXT step is 2nd order again (history now valid)
    c, _ = dpm.step(p, ss + 1, a, eps, st_a)
    d, _ = dpm.step(p, ss + 1, a, eps, dpm.State(prev_y=jnp.zeros_like(a)))
    assert np.abs(np.asarray(c) - np.asarray(d)).max() > 0

    # PLMS: the Adams-Bashforth order ramp restarts at 1 from start_step
    pl = plms.plan(sched, 20, start_step=ss)
    np.testing.assert_array_equal(np.asarray(pl.ab_coef[ss]), [1, 0, 0, 0])
    np.testing.assert_allclose(np.asarray(pl.ab_coef[ss + 1]),
                               [1.5, -0.5, 0, 0])
    np.testing.assert_allclose(
        np.asarray(pl.ab_coef[ss + 3]),
        [55 / 24, -59 / 24, 37 / 24, -9 / 24], atol=1e-7)


def test_karras_times_properties(sched):
    ts = sched.karras_times(20)
    assert ts.shape == (21,)
    assert ts[0] == 1.0 and np.isclose(ts[-1], 0.001)
    assert (np.diff(ts) < 0).all()  # strictly decreasing
    # sigma_k follows the rho=7 ramp between the endpoint sigmas
    alpha = sched.marginal_alpha(ts)
    sigk = sched.marginal_sigma(ts) / alpha
    s_max, s_min = sigk[0], sigk[-1]
    i = np.linspace(0, 1, 21)
    want = (s_max ** (1 / 7) + i * (s_min ** (1 / 7) - s_max ** (1 / 7))) ** 7
    # rtol bounded by the piecewise-linear inversion on the 1000-point
    # train grid (worst at the low-sigma tail where sigma_k(t) curves)
    np.testing.assert_allclose(sigk, want, rtol=1e-2)
    # denser near low noise than the uniform grid: the second-to-last karras
    # sigma sits far below the uniform one
    tu = sched.sampling_times(20)
    sigk_u = sched.marginal_sigma(tu) / sched.marginal_alpha(tu)
    assert sigk[-2] < sigk_u[-2] / 2


def test_karras_exact_trajectory(sched):
    """The constant-x0 oracle is spacing-independent: Karras-spaced Euler
    (and DPM) must land on the same analytic endpoint."""
    for name in ("euler_karras", "dpm_karras", "unipc_karras"):
        mod = get_sampler(name)
        p = mod.plan(sched, 20)
        x0_star = np.linspace(-1, 1, 16).reshape(4, 4).astype(np.float32)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 4), jnp.float32)
        a0 = float(p.alpha_s[0])
        s0 = float(p.sigma_s[0])
        c = (np.asarray(x) - a0 * x0_star) / s0
        st = mod.init_state((4, 4))
        for i in range(20):
            eps = (x - p.alpha_s[i] * x0_star) / p.sigma_s[i]
            x, st = mod.step(p, i, x, eps, st)
        t_end = 1.0 / sched.num_train_steps
        expected = (sched.marginal_alpha(np.array([t_end]))[0] * x0_star
                    + sched.marginal_sigma(np.array([t_end]))[0] * c)
        assert np.abs(np.asarray(x) - expected).max() < 5e-4, name


def test_karras_e2e_differs_and_deterministic():
    import sdtpu

    ctx_u = sdtpu.Context(config="tiny", steps=4, sampler="dpm")
    ctx_k = sdtpu.Context(config="tiny", steps=4, sampler="dpm_karras")
    a = ctx_u.generate("the horse", seed=2)
    b = ctx_k.generate("the horse", seed=2)
    assert not np.array_equal(a, b)  # the spacing changes the trajectory
    b2 = ctx_k.generate("the horse", seed=2)
    np.testing.assert_array_equal(b, b2)


def test_dpm_sde_matches_kdiffusion_form(sched):
    """Table-driven DPM++(2M) SDE vs the k-diffusion sample_dpmpp_2m_sde
    update (midpoint solver, eta=1), reassembled in sigma_k space."""
    from sdtpu.samplers import dpm_sde

    steps = 9
    p = dpm_sde.plan(sched, steps)
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 3)).astype(np.float32)
    eps_seq = rng.standard_normal((steps, 2, 3)).astype(np.float32)
    noise_seq = rng.standard_normal((steps, 2, 3)).astype(np.float32)

    x_ours = jnp.asarray(x)
    st = dpm_sde.init_state(x.shape)
    for i in range(steps):
        x_ours, st = dpm_sde.step(p, i, x_ours, jnp.asarray(eps_seq[i]), st,
                                  noise=jnp.asarray(noise_seq[i]))

    ts = sched.sampling_times(steps)
    alpha = sched.marginal_alpha(ts)
    sigma = sched.marginal_sigma(ts)
    sigk = sigma / alpha
    x_ref = x.copy()
    old_denoised = None
    h_last = None
    for i in range(steps):
        denoised = (x_ref - sigma[i] * eps_seq[i]) / alpha[i]
        # k-diffusion update (eta=1, s_noise=1, midpoint)
        xk = x_ref / alpha[i]
        t, s = -np.log(sigk[i]), -np.log(sigk[i + 1])
        h = s - t
        eta_h = h
        xk = (sigk[i + 1] / sigk[i]) * np.exp(-eta_h) * xk \
            - np.expm1(-h - eta_h) * denoised
        if old_denoised is not None:
            r = h_last / h
            xk = xk - 0.5 * np.expm1(-h - eta_h) * (1.0 / r) \
                * (denoised - old_denoised)
        xk = xk + noise_seq[i] * sigk[i + 1] * np.sqrt(-np.expm1(-2 * eta_h))
        x_ref = (alpha[i + 1] * xk).astype(np.float32)
        old_denoised, h_last = denoised, h
    assert np.allclose(np.asarray(x_ours), x_ref, atol=3e-4)


def test_dpm_sde_warm_start_and_noise_protocol(sched):
    """Warm starts zero the 2nd-order mix at the first executed step, and
    the sampler advertises NEEDS_NOISE for the pipeline's per-step draws."""
    from sdtpu.samplers import dpm_sde

    assert dpm_sde.NEEDS_NOISE
    p = dpm_sde.plan(sched, 8, start_step=3)
    mix = np.asarray(p.mix)
    assert np.all(mix[:4] == 0.0) and np.all(mix[4:] > 0.0)


def test_lms_matches_kdiffusion_form(sched):
    """Table-driven LMS vs a direct k-diffusion `sample_lms` re-derivation:
    integrated Lagrange-basis weights over each real sigma_k interval
    (np.polynomial quadrature as the independent integrator), AB history
    applied in sigma_k space."""
    from numpy.polynomial import polynomial as P

    from sdtpu.samplers import lms

    steps = 9
    p = lms.plan(sched, steps)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 3)).astype(np.float32)
    eps_seq = rng.standard_normal((steps, 2, 3)).astype(np.float32)

    x_ours = jnp.asarray(x)
    st = lms.init_state(x.shape)
    for i in range(steps):
        x_ours, st = lms.step(p, i, x_ours, jnp.asarray(eps_seq[i]), st)

    ts = sched.sampling_times(steps)
    alpha = np.asarray(sched.marginal_alpha(ts), np.float64)
    sigk = np.asarray(sched.marginal_sigma(ts), np.float64) / alpha

    def weight(i, j, order):
        # exact polynomial integration of the Lagrange basis (independent
        # of the trapezoid rule the implementation uses)
        poly = np.array([1.0])
        for m in range(order):
            if m != j:
                den = sigk[i - j] - sigk[i - m]
                poly = P.polymul(poly, np.array([-sigk[i - m], 1.0]) / den)
        anti = P.polyint(poly)
        return P.polyval(sigk[i + 1], anti) - P.polyval(sigk[i], anti)

    x_ref = x.copy().astype(np.float64)
    hist = []
    for i in range(steps):
        order = min(i + 1, 4)
        hist.insert(0, eps_seq[i].astype(np.float64))
        hist = hist[:4]
        xk = x_ref / alpha[i]
        for j in range(order):
            xk = xk + weight(i, j, order) * hist[j]
        x_ref = alpha[i + 1] * xk
    assert np.allclose(np.asarray(x_ours), x_ref.astype(np.float32),
                       atol=3e-4)


def test_lms_first_step_is_euler_and_warm_start(sched):
    """Order-1 LMS is exactly Euler (the integrated constant basis =
    dsigma_k); a warm start restarts the order ramp so the zero history
    never enters."""
    from sdtpu.samplers import euler, lms

    steps = 8
    pl, pe = lms.plan(sched, steps), euler.plan(sched, steps)
    np.testing.assert_allclose(np.asarray(pl.lms_coef[0, 0]),
                               np.asarray(pe.b_coef[0]), rtol=1e-5)
    assert np.all(np.asarray(pl.lms_coef[0, 1:]) == 0.0)
    pw = lms.plan(sched, steps, start_step=5)
    assert np.all(np.asarray(pw.lms_coef[5, 1:]) == 0.0)
    np.testing.assert_allclose(np.asarray(pw.lms_coef[5, 0]),
                               np.asarray(pe.b_coef[5]), rtol=1e-5)


def test_lms_e2e_and_karras(sched):
    """The lms / lms_karras registry entries drive the full pipeline."""
    import sdtpu

    for name in ("lms", "lms_karras"):
        ctx = sdtpu.Context(config="tiny", steps=5, sampler=name)
        img = ctx.generate("the horse", seed=2)
        assert img.shape == (16, 16, 3)
        np.testing.assert_array_equal(img, ctx.generate("the horse", seed=2))


def test_heun_matches_kdiffusion_form(sched):
    """Table-driven two-eval Heun vs the k-diffusion sample_heun formulation
    computed directly in sigma_k space (full Euler probe to sigma_next,
    derivative average)."""
    from sdtpu.samplers import heun

    steps = 9
    p = heun.plan(sched, steps)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 3)).astype(np.float32)
    # a fixed model: eps depends on the probe position, so the predictor
    # path is genuinely exercised (not just a precomputed eps sequence)
    w = rng.standard_normal((3, 3)).astype(np.float32)

    def model(xx, _t):
        return xx @ w

    x_ours = jnp.asarray(x)
    st = heun.init_state(x.shape)
    for i in range(steps):
        e1 = model(x_ours, p.model_t[i])
        x_mid = heun.predictor(p, i, x_ours, e1)
        e2 = model(x_mid, p.model_t2[i])
        x_ours, st = heun.step(p, i, x_ours, e1, st, eps2=e2)

    ts = sched.sampling_times(steps)
    alpha = sched.marginal_alpha(ts)
    sigk = sched.marginal_sigma(ts) / alpha
    x_ref = x.copy()
    for i in range(steps):
        xk = x_ref / alpha[i]
        d1 = np.asarray(model(jnp.asarray(x_ref), None))
        xk2 = xk + (sigk[i + 1] - sigk[i]) * d1
        x2 = (alpha[i + 1] * xk2).astype(np.float32)
        d2 = np.asarray(model(jnp.asarray(x2), None))
        xk = xk + (sigk[i + 1] - sigk[i]) * 0.5 * (d1 + d2)
        x_ref = (alpha[i + 1] * xk).astype(np.float32)
    np.testing.assert_allclose(np.asarray(x_ours), x_ref, atol=2e-4)


def test_dpm2_matches_kdiffusion_form(sched):
    """Table-driven DPM2 vs the k-diffusion sample_dpm_2 formulation
    (log-sigma midpoint probe, full step with the midpoint derivative)."""
    from sdtpu.samplers import dpm2

    steps = 9
    p = dpm2.plan(sched, steps)
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 3)).astype(np.float32)
    w = rng.standard_normal((3, 3)).astype(np.float32)

    def model(xx):
        return xx @ w

    x_ours = jnp.asarray(x)
    st = dpm2.init_state(x.shape)
    for i in range(steps):
        e1 = model(x_ours)
        x_mid = dpm2.predictor(p, i, x_ours, e1)
        e2 = model(x_mid)
        x_ours, st = dpm2.step(p, i, x_ours, e1, st, eps2=e2)

    ts = sched.sampling_times(steps)
    alpha = sched.marginal_alpha(ts)
    sigk = sched.marginal_sigma(ts) / alpha
    # alpha as a function of sigma_k on the train grid (for the midpoint)
    a_grid = np.exp(sched.log_alpha_grid)
    sigk_grid = np.sqrt(np.maximum(1.0 - a_grid**2, 1e-20)) / a_grid
    x_ref = x.copy()
    for i in range(steps):
        xk = x_ref / alpha[i]
        d1 = np.asarray(model(jnp.asarray(x_ref)))
        s_mid = np.exp(0.5 * (np.log(sigk[i]) + np.log(sigk[i + 1])))
        t_mid = np.interp(s_mid, sigk_grid, sched.t_grid)
        a_mid = sched.marginal_alpha(t_mid)
        xk2 = xk + (s_mid - sigk[i]) * d1
        x2 = (a_mid * xk2).astype(np.float32)
        d2 = np.asarray(model(jnp.asarray(x2)))
        xk = xk + (sigk[i + 1] - sigk[i]) * d2
        x_ref = (alpha[i + 1] * xk).astype(np.float32)
    np.testing.assert_allclose(np.asarray(x_ours), x_ref, atol=2e-4)


def test_two_eval_exact_trajectory(sched):
    """Constant-x0* model: the ODE derivative is constant along the linear
    solution, so Heun and DPM2 track the exact trajectory like Euler does."""
    from sdtpu.samplers import dpm2, heun

    x0_star = np.linspace(-1, 1, 16).reshape(4, 4).astype(np.float32)
    ts = sched.sampling_times(12)
    alphas = sched.marginal_alpha(ts)
    sigmas = sched.marginal_sigma(ts)

    for mod in (heun, dpm2):
        p = mod.plan(sched, 12)
        x_init = jax.random.normal(jax.random.PRNGKey(0), x0_star.shape,
                                   jnp.float32)
        c = (np.asarray(x_init) - alphas[0] * x0_star) / sigmas[0]

        def model(xx, a, s):
            return (xx - jnp.float32(a) * x0_star) / jnp.float32(s)

        x, st = x_init, mod.init_state(x0_star.shape)
        for i in range(12):
            e1 = model(x, alphas[i], sigmas[i])
            x_mid = mod.predictor(p, i, x, e1)
            e2 = model(x_mid, p.alpha_m[i], p.sigma_m[i])
            x, st = mod.step(p, i, x, e1, st, eps2=e2)
        expected = alphas[-1] * x0_star + sigmas[-1] * c
        err = np.abs(np.asarray(x) - expected).max()
        assert err < 2e-4, f"{mod.__name__}: |x - exact| = {err}"


def test_two_eval_samplers_e2e(sched):
    """heun / dpm2 (+ Karras) drive the full Context pipeline: shape,
    determinism, seed sensitivity, and batch-of-1 == single path."""
    import sdtpu

    for name in ("heun", "dpm2", "heun_karras", "dpm2_karras"):
        ctx = sdtpu.Context(config="tiny", steps=4, sampler=name)
        a = ctx.generate("the horse", seed=7)
        assert a.shape == (16, 16, 3)
        np.testing.assert_array_equal(a, ctx.generate("the horse", seed=7))
        assert not np.array_equal(a, ctx.generate("the horse", seed=8))
        bat = ctx.generate_batch(
            [{"prompt": "the horse", "guidance": 7.5, "seed": 7}])
        np.testing.assert_array_equal(a, bat[0])
