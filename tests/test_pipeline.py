"""End-to-end pipeline tests on the TINY config (the automated analogue of
the reference's simple_app E2E probe, test/simple_app.cpp:6-38, run on the
CPU 'simulator' backend per SURVEY.md §4)."""

import numpy as np
import pytest

import sdtpu
from sdtpu.engine.errors import ErrorCode, SdtpuError

PROMPT = "a photograph of an astronaut riding a horse"


@pytest.fixture(scope="module")
def ctx():
    return sdtpu.Context(config="tiny", steps=4, threads=3)


@pytest.mark.smoke
def test_generate_shape_dtype(ctx):
    img = ctx.generate(PROMPT, guidance=7.5, seed=42)
    size = ctx.cfg.image_size
    assert img.shape == (size, size, 3)
    assert img.dtype == np.uint8


@pytest.mark.smoke
def test_fixed_seed_determinism(ctx):
    a = ctx.generate(PROMPT, guidance=7.5, seed=123)
    b = ctx.generate(PROMPT, guidance=7.5, seed=123)
    assert np.array_equal(a, b)
    c = ctx.generate(PROMPT, guidance=7.5, seed=124)
    assert not np.array_equal(a, c)


def test_seed_stream_advances(ctx):
    ctx.set_seed(7)
    a = ctx.generate(PROMPT)
    b = ctx.generate(PROMPT)
    assert not np.array_equal(a, b)  # seed auto-advances per call
    ctx.set_seed(7)
    assert np.array_equal(a, ctx.generate(PROMPT))


def test_guidance_changes_without_recompile(ctx):
    """guidance is traced, not static: different values reuse one executable
    (the CFG-mix lives inside the compiled scan)."""
    n0 = len(ctx._gen_cache)
    a = ctx.generate(PROMPT, guidance=7.5, seed=5)
    b = ctx.generate(PROMPT, guidance=3.0, seed=5)
    assert len(ctx._gen_cache) == max(n0, 1)
    assert not np.array_equal(a, b)


def test_no_cfg_path(ctx):
    """guidance == 1 skips the uncond half entirely (reference skips the 2nd
    UNet launch, context.cpp:356-375)."""
    img = ctx.generate(PROMPT, guidance=1.0, seed=5)
    assert img.shape == (ctx.cfg.image_size, ctx.cfg.image_size, 3)
    assert any(k[:4] == (1, ctx.steps, ctx.sampler, False)
               for k in ctx._gen_cache)


def test_batched_prompts(ctx):
    imgs = ctx.generate([PROMPT, "the horse"], guidance=7.5, seed=9)
    assert imgs.shape == (2, ctx.cfg.image_size, ctx.cfg.image_size, 3)


def test_out_buffer_reuse(ctx):
    """Caller-allocated output protocol (reference: api/libsdod.h:91-114)."""
    size = ctx.cfg.image_size
    buf = np.zeros((size, size, 3), np.uint8)
    ret = ctx.generate(PROMPT, seed=1, out=buf)
    assert ret is buf and buf.any()
    bad = np.zeros((size, size, 4), np.uint8)
    with pytest.raises(SdtpuError) as ei:
        ctx.generate(PROMPT, seed=1, out=bad)
    assert ei.value.code == ErrorCode.INVALID_ARGUMENT


def test_set_steps_recompiles(ctx):
    ctx.set_steps(2)
    try:
        img = ctx.generate(PROMPT, seed=3)
        assert img.shape[0] == ctx.cfg.image_size
    finally:
        ctx.set_steps(4)


@pytest.mark.smoke
def test_error_surfaces():
    with pytest.raises(SdtpuError) as ei:
        sdtpu.Context(config="tiny", steps=0)
    assert ei.value.code == ErrorCode.INVALID_ARGUMENT


def test_failed_context_gives_up(ctx_cls=sdtpu.Context):
    """A failed phase latches the context (reference: _failed_and_gave_up)."""
    try:
        bad = ctx_cls(config="tiny", steps=0)
    except SdtpuError:
        pass
    else:  # pragma: no cover
        pytest.fail("expected failure")


@pytest.mark.smoke
def test_empty_prompt_list(ctx):
    with pytest.raises(SdtpuError) as ei:
        ctx.generate([])
    assert ei.value.code == ErrorCode.INVALID_ARGUMENT


def test_negative_prompt(ctx):
    """negative_prompt swaps the uncond embedding — changes output, no new
    executable compiled."""
    n0 = len(ctx._gen_cache)
    a = ctx.generate(PROMPT, guidance=7.5, seed=5)
    b = ctx.generate(PROMPT, guidance=7.5, seed=5, negative_prompt="the horse")
    assert len(ctx._gen_cache) == max(n0, 1)
    assert not np.array_equal(a, b)
    # negative == "" behaves like default uncond
    c = ctx.generate(PROMPT, guidance=7.5, seed=5, negative_prompt=None)
    assert np.array_equal(a, c)


def test_generate_async_matches_sync(ctx):
    """Async dispatch (the execute_async analogue) returns the same image."""
    fut = ctx.generate_async(PROMPT, guidance=7.5, seed=77)
    sync = ctx.generate(PROMPT, guidance=7.5, seed=77)
    assert np.array_equal(np.asarray(fut)[0], sync)


def test_single_step_generation(ctx):
    """steps=1 must work for every sampler (the reference hardcoded 20)."""
    ctx.set_steps(1)
    try:
        for s in ("dpm", "ddim", "plms"):
            ctx.sampler = s
            img = ctx.generate(PROMPT, seed=0)
            assert img.shape == (ctx.cfg.image_size, ctx.cfg.image_size, 3)
    finally:
        ctx.set_steps(4)
        ctx.sampler = "dpm"


def test_fuse_qkv_context_option():
    ctx = sdtpu.Context(config="tiny", steps=2, fuse_qkv=True)
    assert "qkv" in ctx.params["unet"]["mid"]["st"]["attn1"]
    img = ctx.generate(PROMPT, seed=0)
    assert img.shape == (ctx.cfg.image_size, ctx.cfg.image_size, 3)
