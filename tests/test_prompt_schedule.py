"""A1111 prompt editing ([from:to:when], [to:when], [from::when], [a|b]
alternation): host-side resolution to a per-step variant table
(sdtpu.text.schedule_table), one compiled program with an in-scan gather
(engine/pipeline cond_schedule)."""

import numpy as np
import pytest

import sdtpu
from sdtpu import text as text_mod
from sdtpu.engine.errors import SdtpuError


def test_schedule_parser_forms():
    at = text_mod.schedule_at
    assert at("[a:b:0.5]", 0, 4) == "a" and at("[a:b:0.5]", 2, 4) == "b"
    assert at("[b:2]", 1, 4) == "" and at("[b:2]", 2, 4) == "b"
    assert at("[a::0.5]", 0, 4) == "a" and at("[a::0.5]", 3, 4) == ""
    assert at("[x|y|z]", 4, 8) == "y"
    # attention-down brackets (no schedule) are untouched, nesting resolves
    assert at("keep [this] intact", 1, 4) == "keep [this] intact"
    assert at("[[i:d:0.5]:o:0.75]", 1, 4) == "i"
    assert at("[[i:d:0.5]:o:0.75]", 3, 4) == "o"
    assert text_mod.has_schedule("[a:b:0.5]", 4)
    assert not text_mod.has_schedule("plain [x] (y:1.2)", 4)

    variants, idx = text_mod.schedule_table(["[a:b:0.5]", "same"], 4)
    assert variants == [["a", "same"], ["b", "same"]]
    assert idx.tolist() == [0, 0, 1, 1]


def test_degenerate_schedule_is_bit_identical_to_plain():
    """A schedule whose variants are all the same text must reproduce the
    unscheduled program exactly — the strongest available oracle (the
    gather, table layout and k=1 weighted encode all cancel out only if
    they are implemented correctly)."""
    ctx = sdtpu.Context(config="tiny", steps=4)
    plain = ctx.generate("the horse", seed=3)
    a = ctx.generate("[the horse:the horse:0.5]", seed=3)
    np.testing.assert_array_equal(plain, a)
    b = ctx.generate("[the horse|the horse]", seed=3)
    np.testing.assert_array_equal(plain, b)
    # switch at 0: "to" everywhere
    c = ctx.generate("[a photograph:the horse:0]", seed=3)
    np.testing.assert_array_equal(plain, c)


def test_schedule_acts_and_is_deterministic():
    ctx = sdtpu.Context(config="tiny", steps=4)
    a = ctx.generate("[the horse:a photograph:0.5]", seed=5)
    a2 = ctx.generate("[the horse:a photograph:0.5]", seed=5)
    np.testing.assert_array_equal(a, a2)
    horse = ctx.generate("the horse", seed=5)
    photo = ctx.generate("a photograph", seed=5)
    assert not np.array_equal(a, horse) and not np.array_equal(a, photo)
    # weights inside a variant work (k=1 weighted encode)
    w = ctx.generate("[(the horse:1.3):a photograph:0.5]", seed=5)
    assert not np.array_equal(w, a)
    # batch of prompts with different schedules
    out = ctx.generate(["[the horse:a photograph:0.5]", "[x|y]"], seed=2)
    assert out.shape[0] == 2


def test_schedule_on_mesh_matches_single_device():
    ctx1 = sdtpu.Context(config="tiny", steps=4)
    ctx8 = sdtpu.Context(config="tiny", steps=4, mesh=(2, 4))
    prompts = ["[the horse:a photograph:0.5]", "the horse rides"]
    a = ctx1.generate(prompts, seed=6)
    b = ctx8.generate(prompts, seed=6)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_schedule_guards():
    ctx = sdtpu.Context(config="tiny", steps=4)
    with pytest.raises(SdtpuError):
        ctx.generate("[a:b:0.5]", negative_prompt="[x:y:0.5]")
    with pytest.raises(SdtpuError):
        ctx.generate("[a:b:0.5]", output="latent", denoising_end=0.5)
    with pytest.raises(SdtpuError):
        ctx.generate_batch([{"prompt": "[a:b:0.5]"}])
    size = ctx.cfg.image_size
    img = np.zeros((size, size, 3), np.uint8)
    with pytest.raises(SdtpuError):
        ctx.img2img("[a:b:0.5]", img)
    xl = sdtpu.Context(config="tiny_xl", steps=4)
    with pytest.raises(SdtpuError):
        xl.generate("[a:b:0.5]")
