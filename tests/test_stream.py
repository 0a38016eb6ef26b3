"""Continuous (iteration-level) batching tests: the StreamScheduler's
images must reproduce the single Context.generate path (within one uint8
gray level — see assert_pixels_match) for the same (prompt, seed,
guidance) regardless of pool composition or admission order, across
sampler families (multistep state, ancestral noise, two-eval probes) and
the LCM guidance-embedded config."""

import numpy as np
import pytest

import sdtpu
from sdtpu.engine.stream import StreamScheduler

PROMPT = "the horse"


def assert_pixels_match(a, b):
    """The pooled step program compiles at a different UNet batch shape
    than the single path, so XLA may fuse/reduce in a different order —
    ulp-level f32 differences can flip a uint8 rounding boundary. The
    contract is therefore per-pixel agreement within ONE gray level (the
    per-sample noise/solver streams are identical by construction; any
    larger deviation means a scheduling bug)."""
    a = np.asarray(a, np.int16)
    b = np.asarray(b, np.int16)
    d = np.abs(a - b)
    assert d.max() <= 1, f"max pixel delta {d.max()}"
    assert (d > 0).mean() < 0.01, f"{(d > 0).mean():.2%} pixels differ"


@pytest.fixture(scope="module")
def ctx():
    return sdtpu.Context(config="tiny", steps=4, sampler="dpm")


def test_stream_matches_single_path(ctx):
    """A full pool of distinct requests: every image equals the single
    compiled path bit-for-bit."""
    sched = StreamScheduler(ctx, slots=2)
    ids = {}
    for s, g in [(1, 7.5), (2, 5.0), (3, 7.5)]:
        ids[sched.submit(PROMPT, guidance=g, seed=s)] = (s, g)
    out = sched.drain()
    assert set(out) == set(ids)
    for rid, (s, g) in ids.items():
        ref = ctx.generate(PROMPT, guidance=g, seed=s)
        assert_pixels_match(out[rid], ref)


def test_stream_mid_flight_admission(ctx):
    """A request admitted while another is mid-trajectory (the barrier-free
    property) still reproduces its single-path image exactly."""
    sched = StreamScheduler(ctx, slots=2)
    a = sched.submit(PROMPT, seed=11)
    sched.tick()
    sched.tick()          # a is now 2 steps in
    b = sched.submit("a fox", seed=12)  # admitted into the second slot
    out = sched.drain()
    assert_pixels_match(out[a], ctx.generate(PROMPT, seed=11))
    assert_pixels_match(out[b], ctx.generate("a fox", seed=12))
    # pool stats: b joined while a was live; total ticks < sequential sum
    assert sched.ticks < 2 * ctx.steps + 2


def test_stream_slot_reuse_and_negative_prompt(ctx):
    """More requests than slots: slots are re-admitted as they finish;
    per-request negative prompts ride the per-slot uncond rows."""
    sched = StreamScheduler(ctx, slots=2)
    ids = [sched.submit(PROMPT, seed=20 + i,
                        negative_prompt="blurry" if i % 2 else None)
           for i in range(5)]
    out = sched.drain()
    assert len(out) == 5
    for i, rid in enumerate(ids):
        ref = ctx.generate(PROMPT, seed=20 + i,
                           negative_prompt="blurry" if i % 2 else None)
        assert_pixels_match(out[rid], ref)


@pytest.mark.parametrize("sampler", ["euler_a", "heun", "plms"])
def test_stream_sampler_families(sampler):
    """Ancestral (per-step noise), two-eval (probe), and multistep-history
    samplers all step-schedule exactly."""
    c = sdtpu.Context(config="tiny", steps=3, sampler=sampler)
    sched = StreamScheduler(c, slots=2)
    r1 = sched.submit(PROMPT, seed=1)
    r2 = sched.submit("a fox", seed=2)
    out = sched.drain()
    assert_pixels_match(out[r1], c.generate(PROMPT, seed=1))
    assert_pixels_match(out[r2], c.generate("a fox", seed=2))


def test_stream_lcm_guidance_embedded():
    """The LCM config streams with per-slot guidance through the w
    embedding (no CFG batch), mixed scales in one pool."""
    c = sdtpu.Context(config="tiny_lcm", steps=4, sampler="lcm")
    sched = StreamScheduler(c, slots=2)
    r1 = sched.submit(PROMPT, guidance=8.0, seed=3)
    r2 = sched.submit(PROMPT, guidance=2.0, seed=3)
    out = sched.drain()
    assert_pixels_match(out[r1], c.generate(PROMPT, guidance=8.0, seed=3))
    assert_pixels_match(out[r2], c.generate(PROMPT, guidance=2.0, seed=3))
    assert not np.array_equal(out[r1], out[r2])


def test_stream_previews(ctx):
    """In-flight previews: latent-resolution RGB for every live request,
    changing as the trajectory advances."""
    sched = StreamScheduler(ctx, slots=1)
    rid = sched.submit(PROMPT, seed=5)
    sched.tick()
    p1 = sched.previews()
    s = ctx.cfg.latent_size
    assert p1[rid].shape == (s, s, 3) and p1[rid].dtype == np.uint8
    sched.tick()
    p2 = sched.previews()
    assert not np.array_equal(p1[rid], p2[rid])
    sched.drain()
    assert sched.previews() == {}


def test_stream_mixed_steps(ctx):
    """Heterogeneous pool: requests with DIFFERENT step counts share one
    pooled step program (per-slot solver plans); each image reproduces the
    single path at ITS step count."""
    sched = StreamScheduler(ctx, slots=2, step_choices=(2, 4, 6))
    ra = sched.submit(PROMPT, seed=31, steps=2)
    rb = sched.submit("a fox", seed=32, steps=6)
    rc = sched.submit(PROMPT, seed=33)          # default = ctx.steps (4)
    out = sched.drain()
    assert set(out) == {ra, rb, rc}
    for rid, (prompt, seed, steps) in {
            ra: (PROMPT, 31, 2), rb: ("a fox", 32, 6),
            rc: (PROMPT, 33, 4)}.items():
        old = ctx.steps
        ctx.set_steps(steps)
        try:
            ref = ctx.generate(prompt, seed=seed)
        finally:
            ctx.set_steps(old)
        assert_pixels_match(out[rid], ref)
    # the 2-step request retired early and freed its slot while the 6-step
    # one was still mid-trajectory: total ticks < sum of sequential runs
    assert sched.ticks < 2 + 6 + 4


def test_stream_mixed_steps_multistep_history():
    """Multistep solvers (per-slot State history) under heterogeneous
    plans: the solver's i2r/coefficient rows come from the REQUEST's plan,
    not the pool's longest one."""
    c = sdtpu.Context(config="tiny", steps=3, sampler="unipc")
    sched = StreamScheduler(c, slots=2, step_choices=(3, 5))
    r1 = sched.submit(PROMPT, seed=41, steps=5)
    r2 = sched.submit("a fox", seed=42, steps=3)
    out = sched.drain()
    c.set_steps(5)
    ref1 = c.generate(PROMPT, seed=41)
    c.set_steps(3)
    ref2 = c.generate("a fox", seed=42)
    assert_pixels_match(out[r1], ref1)
    assert_pixels_match(out[r2], ref2)


def test_stream_block_ticks_match_single_ticks(ctx):
    """max_block > 1 dispatches k pooled steps as ONE program (lax.scan of
    the same step body): images are IDENTICAL to k=1 scheduling, dispatch
    count collapses toward steps/k, and per-slot completion semantics are
    unchanged (the block never overruns the earliest completion)."""
    base = StreamScheduler(ctx, slots=2)
    b1 = {base.submit(PROMPT, seed=50 + i): 50 + i for i in range(3)}
    out1 = base.drain()

    blk = StreamScheduler(ctx, slots=2, max_block=4)
    b2 = {blk.submit(PROMPT, seed=50 + i): 50 + i for i in range(3)}
    out2 = blk.drain()

    for (r1, s1), (r2, s2) in zip(sorted(b1.items(), key=lambda kv: kv[1]),
                                  sorted(b2.items(), key=lambda kv: kv[1])):
        assert s1 == s2
        np.testing.assert_array_equal(out1[r1], out2[r2])
    assert base.dispatches == base.ticks            # k=1: one program/step
    assert blk.ticks == base.ticks                  # same total step work
    assert blk.dispatches < base.dispatches         # fewer dispatches


def test_stream_block_ticks_heterogeneous(ctx):
    """Blocks are bounded by min-remaining: a 2-step request in a pool with
    a 6-step one still completes after exactly 2 steps and its slot is
    re-admitted; images match the single path."""
    sched = StreamScheduler(ctx, slots=2, step_choices=(2, 6),
                            max_block=8)
    ra = sched.submit(PROMPT, seed=61, steps=2)
    rb = sched.submit("a fox", seed=62, steps=6)
    rc = sched.submit(PROMPT, seed=63, steps=2)
    out = sched.drain()
    assert set(out) == {ra, rb, rc}
    for rid, (prompt, seed, steps) in {
            ra: (PROMPT, 61, 2), rb: ("a fox", 62, 6),
            rc: (PROMPT, 63, 2)}.items():
        old = ctx.steps
        ctx.set_steps(steps)
        try:
            ref = ctx.generate(prompt, seed=seed)
        finally:
            ctx.set_steps(old)
        assert_pixels_match(out[rid], ref)
    assert sched.dispatches < sched.ticks


def test_stream_batched_decode(ctx):
    """Slots completing on the same tick share ONE batched VAE decode: two
    same-step requests admitted together finish together and both images
    come back correct from the single pending decode."""
    sched = StreamScheduler(ctx, slots=2)
    r1 = sched.submit(PROMPT, seed=71)
    r2 = sched.submit("a fox", seed=72)
    for _ in range(ctx.steps):
        sched.tick()
    assert len(sched._pending) == 1          # one decode dispatch for both
    assert len(sched._pending[0][0]) == 2
    out = sched.completed()
    assert_pixels_match(out[r1], ctx.generate(PROMPT, seed=71))
    assert_pixels_match(out[r2], ctx.generate("a fox", seed=72))


def test_stream_mixed_steps_rejects_unplanned(ctx):
    sched = StreamScheduler(ctx, slots=1, step_choices=(4, 8))
    with pytest.raises(ValueError, match="step_choices"):
        sched.submit(PROMPT, steps=6)


def test_stream_rejects_unsupported(ctx):
    sched = StreamScheduler(ctx, slots=1)
    with pytest.raises(ValueError, match="long/weighted"):
        sched.submit("word " * 200)
    with pytest.raises(ValueError, match="plms_exact"):
        StreamScheduler(sdtpu.Context(config="tiny", steps=2,
                                      sampler="plms_exact"))
