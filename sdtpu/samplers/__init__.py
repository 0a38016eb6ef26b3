"""Samplers: pure-function diffusion ODE solvers, designed for ``lax.scan``.

Each sampler exposes:

* ``plan(schedule, steps) -> Plan`` — precomputes per-step coefficient tables
  (the analogue of the reference's ``DPMSolver::prepare``,
  dpm_solver.cpp:101-133). A Plan is a pytree of ``[steps]``-shaped arrays,
  so the scan body indexes it with the loop counter — no host round-trips,
  no recompilation across step counts of the same value.
* ``step(plan, i, x, eps, state) -> (x_next, state)`` — one update, pure and
  jittable (the analogue of ``DPMSolver::update``, dpm_solver.cpp:139-181).

The model-facing timesteps live in ``plan.model_t`` — the engine embeds them
through the time-embedding MLP before the loop starts (the reference
precomputes the 1280-d embeddings the same way, context.cpp:256-279).
"""

from sdtpu.samplers.schedule import NoiseSchedule
from sdtpu.samplers import (dpm, dpm2, ddim, dpm_sde, euler, euler_a, heun,
                            lcm, lms, plms, unipc)

class _KarrasSpacing:
    """Same solver, Karras et al. (2022) sigma spacing instead of uniform
    time spacing (NoiseSchedule.karras_times): denser steps near low noise,
    the usual quality win at small step counts. Applies to the
    continuous-time solvers only (DDIM/PLMS are discrete-grid)."""

    def __init__(self, mod):
        self._mod = mod
        self.NEEDS_NOISE = getattr(mod, "NEEDS_NOISE", False)
        self.NEEDS_SECOND_EVAL = getattr(mod, "NEEDS_SECOND_EVAL", False)

    def predictor(self, *args, **kwargs):
        return self._mod.predictor(*args, **kwargs)

    def plan(self, schedule, steps, start_step=0):
        return self._mod.plan(schedule, steps, start_step, spacing="karras")

    def init_state(self, shape, dtype=None):
        if dtype is None:
            return self._mod.init_state(shape)
        return self._mod.init_state(shape, dtype)

    def step(self, *args, **kwargs):
        return self._mod.step(*args, **kwargs)


SAMPLERS = {
    "dpm": dpm,
    "dpm++": dpm,
    "ddim": ddim,
    "plms": plms,
    # CompVis-exact variant: the pipeline spends a second UNet eval on the
    # pseudo-improved-Euler first step (see engine/pipeline.denoise)
    "plms_exact": plms,
    "euler": euler,
    # ancestral: NEEDS_NOISE — the pipeline threads per-step noise into step()
    "euler_a": euler_a,
    # 4th-order Adams-Bashforth on the real sigma grid (k-diffusion "LMS")
    "lms": lms,
    # stochastic 2nd-order multistep (k-diffusion "DPM++ 2M SDE")
    "dpm_sde": dpm_sde,
    "unipc": unipc,
    # single-step 2nd-order, TWO UNet evals per step (NEEDS_SECOND_EVAL —
    # the pipeline runs the probe eval; see samplers/heun.py)
    "heun": heun,
    "dpm2": dpm2,
    # latent-consistency distilled checkpoints, 2-8 steps, guidance embedded
    "lcm": lcm,
    # Karras-spaced variants of the continuous-time solvers
    "dpm_karras": _KarrasSpacing(dpm),
    "dpm_sde_karras": _KarrasSpacing(dpm_sde),
    "euler_karras": _KarrasSpacing(euler),
    "euler_a_karras": _KarrasSpacing(euler_a),
    "unipc_karras": _KarrasSpacing(unipc),
    "lms_karras": _KarrasSpacing(lms),
    "heun_karras": _KarrasSpacing(heun),
    "dpm2_karras": _KarrasSpacing(dpm2),
}


def get_sampler(name: str):
    try:
        return SAMPLERS[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown sampler {name!r}; available: {sorted(SAMPLERS)}"
        ) from None


__all__ = ["NoiseSchedule", "SAMPLERS", "get_sampler", "dpm", "ddim",
           "dpm_sde", "plms", "euler", "euler_a", "unipc"]
