"""Prompt attention syntax + long-prompt chunking tests (sdtpu.text).

Capability extension beyond the reference's fixed 77-token prompts
(reference: tokenizer.h:24)."""

import numpy as np
import pytest

import sdtpu
from sdtpu.text import (
    chunked_tokens,
    has_attention_syntax,
    needs_chunking,
    parse_weighted,
)


def test_parse_plain():
    assert parse_weighted("a horse") == [("a horse", 1.0)]
    assert not has_attention_syntax("a horse")


def test_parse_round_and_square():
    frags = parse_weighted("a (red) horse [at night]")
    assert frags == [("a ", 1.0), ("red", 1.1), (" horse ", 1.0),
                     ("at night", pytest.approx(1 / 1.1))]


def test_parse_explicit_weight_and_nesting():
    assert parse_weighted("(fox:1.5)") == [("fox", 1.5)]
    frags = parse_weighted("((fox))")
    assert frags == [("fox", pytest.approx(1.21))]
    frags = parse_weighted("(a (b:2.0) c)")
    assert frags == [("a ", pytest.approx(1.1)), ("b", pytest.approx(2.2)),
                     (" c", pytest.approx(1.1))]


def test_parse_escapes_and_unbalanced():
    assert parse_weighted(r"\(literal\)") == [("(literal)", 1.0)]
    # unmatched close is literal text; unclosed open weights the rest
    assert parse_weighted("a) b") == [("a) b", 1.0)]
    assert parse_weighted("a (b") == [("a ", 1.0), ("b", 1.1)]


def test_parse_merges_adjacent_equal_weights():
    assert parse_weighted("a (b:1.0) c") == [("a b c", 1.0)]


@pytest.fixture(scope="module")
def ctx():
    return sdtpu.Context(config="tiny", steps=2)


def test_chunked_tokens_shapes(ctx):
    tok = ctx.tokenizer
    L = ctx.cfg.clip.context_len  # 16 -> body 14
    t, w = chunked_tokens(tok, "the horse", L)
    assert t.shape == (1, L) and w.shape == (1, L)
    assert t[0, 0] == tok.sot and (w == 1.0).all()
    # the single-chunk form must agree with the legacy tokenize()
    np.testing.assert_array_equal(t[0], tok.tokenize("the horse", L))

    long = " ".join(["the horse riding"] * 6)
    assert needs_chunking(tok, long, L)
    t2, w2 = chunked_tokens(tok, long, L)
    assert t2.shape[0] >= 2
    assert (t2[:, 0] == tok.sot).all()
    # ids survive the split: concatenating chunk bodies == raw encoding
    body = []
    for row in t2:
        ids = [i for i in row[1:] if i not in (tok.sot, tok.eot)]
        body.extend(ids)
    assert body == tok.encode(long)

    t3, _ = chunked_tokens(tok, "the horse", L, min_chunks=3)
    assert t3.shape == (3, L)
    np.testing.assert_array_equal(t3[0], t[0])
    assert (t3[1:, 1:] == tok.eot).all()


def test_weighted_prompt_with_unit_weights_is_bit_exact(ctx):
    """'(x:1.0)' carries no effective weighting: the syntax is STRIPPED and
    the request takes the legacy single-window path — identical image
    (regression: the raw string once reached the tokenizer, encoding the
    brackets as literal tokens)."""
    a = ctx.generate("the horse", seed=4)
    b = ctx.generate("(the horse:1.0)", seed=4)
    np.testing.assert_array_equal(a, b)
    c = ctx.generate(r"the \(horse\)", seed=4)  # escaped = literal brackets
    assert not np.array_equal(a, c)


def test_chunked_encode_k1_unit_weights_matches_legacy(ctx):
    """The chunked encode path at k=1 with unit weights is bit-identical to
    the legacy [B, T] encode (the normalization is an exact no-op)."""
    import jax.numpy as jnp

    from sdtpu.engine.pipeline import encode_text

    L = ctx.cfg.clip.context_len
    tokens = jnp.asarray([ctx.tokenizer.tokenize("the horse", L)], jnp.int32)
    legacy = encode_text(ctx.params, tokens, ctx.cfg)
    chunked = encode_text(ctx.params, tokens[:, None, :], ctx.cfg,
                          jnp.ones((1, 1, L), jnp.float32))
    np.testing.assert_array_equal(np.asarray(legacy), np.asarray(chunked))


def test_weighted_prompt_changes_output(ctx):
    a = ctx.generate("the horse riding", seed=4)
    b = ctx.generate("the (horse:1.8) riding", seed=4)
    assert not np.array_equal(a, b)
    # deterministic
    b2 = ctx.generate("the (horse:1.8) riding", seed=4)
    np.testing.assert_array_equal(b, b2)


def test_long_prompt_uses_all_chunks(ctx):
    """A detail appearing past the 77-token (here 16-token) window must
    influence the image — the legacy path would truncate it away."""
    filler = " ".join(["the horse riding"] * 6)
    a = ctx.generate(filler + " in the photograph", seed=6)
    b = ctx.generate(filler + " of an astronaut", seed=6)
    assert not np.array_equal(a, b)


def test_long_negative_prompt(ctx):
    long_neg = " ".join(["the horse riding"] * 6)
    a = ctx.generate("the horse", seed=7, negative_prompt=long_neg)
    assert a.shape == (ctx.cfg.image_size, ctx.cfg.image_size, 3)
    b = ctx.generate("the horse", seed=7, negative_prompt="the horse")
    assert not np.array_equal(a, b)


def test_xl_weighted_and_long_prompts():
    """Dual-tower (XL) configs take the chunked/weighted path too: unit
    weights strip to the legacy request bit-exactly, real weights and
    past-window detail change the image, and the path is deterministic."""
    ctx_xl = sdtpu.Context(config="tiny_xl", steps=2)
    a = ctx_xl.generate("the horse riding", seed=4)
    a2 = ctx_xl.generate("(the horse riding:1.0)", seed=4)
    np.testing.assert_array_equal(a, a2)  # unit weights = legacy path
    b = ctx_xl.generate("the (horse:1.8) riding", seed=4)
    assert not np.array_equal(a, b)
    b2 = ctx_xl.generate("the (horse:1.8) riding", seed=4)
    np.testing.assert_array_equal(b, b2)
    # long prompt: detail past the context window must act on the image
    filler = " ".join(["the horse riding"] * 6)
    c = ctx_xl.generate(filler + " in the photograph", seed=6)
    d = ctx_xl.generate(filler + " of an astronaut", seed=6)
    assert not np.array_equal(c, d)


def test_weighted_prompt_batch1_matches_single(ctx):
    """The micro-batched serving path must route long/weighted prompts
    through the same chunked encode — batch-of-1 stays bit-identical."""
    single = ctx.generate("the (horse:1.8) riding", seed=11)
    bat = ctx.generate_batch(
        [{"prompt": "the (horse:1.8) riding", "guidance": 7.5, "seed": 11}])
    np.testing.assert_array_equal(single, bat[0])


def test_mixed_batch_pads_chunks(ctx):
    """One long + one short prompt in a batch: both pad to the same chunk
    count and match their single-path outputs... the short one cannot be
    bit-identical to its k=1 single run (its context is wider), but both
    must decode to valid, distinct images deterministically."""
    long = " ".join(["the horse riding"] * 6)
    out = ctx.generate_batch([
        {"prompt": long, "guidance": 7.5, "seed": 1},
        {"prompt": "the horse", "guidance": 7.5, "seed": 2},
    ])
    assert len(out) == 2
    assert not np.array_equal(out[0], out[1])
    out2 = ctx.generate_batch([
        {"prompt": long, "guidance": 7.5, "seed": 1},
        {"prompt": "the horse", "guidance": 7.5, "seed": 2},
    ])
    np.testing.assert_array_equal(out[0], out2[0])
    np.testing.assert_array_equal(out[1], out2[1])


def test_async_matches_sync_on_weighted_prompt(ctx):
    """generate_async must route long/weighted prompts through the same
    chunked encode as generate (the async/sync bit-identity contract)."""
    p = " ".join(["the horse riding"] * 4) + " (astronaut:1.4)"
    fut = ctx.generate_async(p, guidance=7.5, seed=21)
    sync = ctx.generate(p, guidance=7.5, seed=21)
    np.testing.assert_array_equal(np.asarray(fut)[0], sync)


def test_img2img_inpaint_weighted_prompts(ctx):
    """Weighted/long prompts act on the image-conditioned paths too, with
    unit weights stripping to the legacy request bit-exactly."""
    rng = np.random.default_rng(3)
    size = ctx.cfg.image_size
    img = rng.integers(0, 256, (size, size, 3), np.uint8)
    a = ctx.img2img("the horse riding", img, strength=0.5, seed=5)
    a2 = ctx.img2img("(the horse riding:1.0)", img, strength=0.5, seed=5)
    np.testing.assert_array_equal(a, a2)
    b = ctx.img2img("the (horse:1.8) riding", img, strength=0.5, seed=5)
    assert not np.array_equal(a, b)
    long = " ".join(["the horse riding"] * 6)
    c = ctx.img2img(long + " in the photograph", img, strength=0.5, seed=5)
    d = ctx.img2img(long + " of an astronaut", img, strength=0.5, seed=5)
    assert not np.array_equal(c, d)
    mask = np.zeros((size, size), np.uint8)
    mask[: size // 2] = 255
    e = ctx.inpaint("the (horse:1.8) riding", img, mask, seed=5)
    e2 = ctx.inpaint("the (horse:1.8) riding", img, mask, seed=5)
    np.testing.assert_array_equal(e, e2)
    f = ctx.inpaint("the horse riding", img, mask, seed=5)
    assert not np.array_equal(e, f)
