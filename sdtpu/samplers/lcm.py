"""LCM sampler (latent consistency models, Luo et al. 2023).

Serves DISTILLED checkpoints (e.g. LCM-Dreamshaper-v7) at 2-8 steps: the
student was trained to map any point on the trajectory near its consistency
boundary, so each step predicts x0 through the consistency parametrization
and re-noises to the next grid point (diffusers ``LCMScheduler``, matched
exactly so distilled weights sample identically):

* timestep grid: the original-DDIM subsequence ``k*i - 1`` (k = 1000/50)
  thinned to `steps` entries from the top — NOT the uniform continuous grid
  the ODE solvers use;
* boundary scalings at scaled time ``s = 10 * t``:
  ``c_skip = 0.25 / (s^2 + 0.25)``, ``c_out = s / sqrt(s^2 + 0.25)``
  (sigma_data = 0.5);
* update: ``denoised = c_out * x0_pred + c_skip * x`` then
  ``x' = alpha_next * denoised + sigma_next * noise`` (fresh noise each
  step — NEEDS_NOISE); the LAST step returns ``denoised`` unchanged
  (folded into the tables as alpha_next=1, sigma_next=0).

Guidance is NOT applied here: distilled models bake CFG in and consume the
scale through the UNet's guidance embedding
(config.UNetConfig.time_cond_proj_dim; engine/pipeline.denoise embeds
w = guidance - 1). Use with ``use_cfg`` off — the engine forces this for
LCM configs. Capability extension — the reference is a 20-step DPM engine
(reference: README.md:61, context.cpp:250-251).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from sdtpu.samplers.schedule import NoiseSchedule, to_f32

NEEDS_NOISE = True

#: diffusers LCMScheduler defaults
ORIGINAL_INFERENCE_STEPS = 50
TIMESTEP_SCALING = 10.0
SIGMA_DATA = 0.5


class Plan(NamedTuple):
    """Per-step tables, shape [steps]."""

    model_t: jnp.ndarray   # discrete UNet-facing timestep
    alpha_s: jnp.ndarray   # sqrt(alphas_cumprod[t])   (x0 extraction)
    sigma_s: jnp.ndarray   # sqrt(1 - alphas_cumprod[t])
    c_skip: jnp.ndarray    # consistency boundary scalings
    c_out: jnp.ndarray
    a_next: jnp.ndarray    # re-noise marginals at the NEXT grid point
    s_next: jnp.ndarray    # (last step: 1.0 / 0.0 -> returns denoised)


class State(NamedTuple):
    unused: jnp.ndarray  # stateless; uniform interface only


def timestep_grid(schedule: NoiseSchedule, steps: int,
                  original_steps: int = ORIGINAL_INFERENCE_STEPS):
    """The LCM timestep subsequence (diffusers LCMScheduler.set_timesteps):
    origin grid ``arange(1, original_steps+1) * (N // original_steps) - 1``,
    reversed, thinned by ``original_steps // steps``, first `steps` kept."""
    if steps > original_steps:
        raise ValueError(
            f"LCM supports at most original_steps={original_steps} steps, "
            f"got {steps}")
    k = schedule.num_train_steps // original_steps
    origin = np.arange(1, original_steps + 1, dtype=np.int64) * k - 1
    skip = original_steps // steps
    return origin[::-1][::skip][:steps]


def plan(schedule: NoiseSchedule, steps: int, start_step: int = 0) -> Plan:
    del start_step  # stateless: nothing to restart
    ts = timestep_grid(schedule, steps)
    abar = schedule.alphas_cumprod
    a = np.sqrt(abar[ts])
    s = np.sqrt(1.0 - abar[ts])
    a_next = np.concatenate([np.sqrt(abar[ts[1:]]), [1.0]])
    s_next = np.concatenate([np.sqrt(1.0 - abar[ts[1:]]), [0.0]])
    scaled = ts.astype(np.float64) * TIMESTEP_SCALING
    sd2 = SIGMA_DATA * SIGMA_DATA
    return Plan(
        model_t=to_f32(ts),
        alpha_s=to_f32(a),
        sigma_s=to_f32(s),
        c_skip=to_f32(sd2 / (scaled**2 + sd2)),
        c_out=to_f32(scaled / np.sqrt(scaled**2 + sd2)),
        a_next=to_f32(a_next),
        s_next=to_f32(s_next),
    )


def init_state(shape, dtype=jnp.float32) -> State:
    del shape
    return State(unused=jnp.zeros((), dtype))


def step(p: Plan, i, x, eps, state: State, noise=None):
    """Consistency update + re-noise to the next grid point. `noise` is a
    standard-normal draw (required — the pipeline supplies it when
    NEEDS_NOISE is set)."""
    x0 = (x - p.sigma_s[i] * eps) / p.alpha_s[i]
    denoised = p.c_out[i] * x0 + p.c_skip[i] * x
    return p.a_next[i] * denoised + p.s_next[i] * noise, state
