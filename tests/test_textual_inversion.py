"""Textual-inversion embeddings (Context.load_embedding): learned
placeholder vectors appended to the CLIP token-embedding table, trigger
words registered on the tokenizer (the A1111 "embeddings/" / diffusers
load_textual_inversion feature; the reference has a fixed vocab).

Exact oracle: registering the embedding rows of an EXISTING word under a
placeholder must reproduce that word's generations bit-for-bit — the
gather returns identical vectors, so the whole trajectory is identical."""

import numpy as np
import pytest

import sdtpu
from sdtpu.engine.errors import SdtpuError


def _rows(ctx, word, tower="clip"):
    ids = ctx.tokenizer.encode(word)
    table = np.asarray(ctx.params[tower]["token_embedding"])
    return np.stack([table[i] for i in ids])


def test_placeholder_reproduces_word_bit_exact():
    ctx = sdtpu.Context(config="tiny", steps=3)
    ref = ctx.generate("the horse rides", seed=9)
    ctx.load_embedding("<h>", _rows(ctx, "horse"))
    assert ctx.embedding_names() == ["<h>"]
    out = ctx.generate("the <h> rides", seed=9)
    np.testing.assert_array_equal(ref, out)
    # and it actually is a different token stream
    assert ctx.tokenizer.encode("the <h> rides") != ctx.tokenizer.encode(
        "the horse rides")


def test_multi_vector_placeholder():
    ctx = sdtpu.Context(config="tiny", steps=3)
    ref = ctx.generate("the horse rides a photograph", seed=4)
    vecs = _rows(ctx, "horse rides")  # k > 1 BPE tokens
    assert vecs.shape[0] >= 2
    ctx.load_embedding("<hr>", vecs)
    out = ctx.generate("the <hr> a photograph", seed=4)
    np.testing.assert_array_equal(ref, out)


def test_placeholder_through_weighted_and_batched_paths():
    ctx = sdtpu.Context(config="tiny", steps=3)
    ctx.load_embedding("<h>", _rows(ctx, "horse"))
    filler = " ".join(["the photograph of"] * 5)
    ref = ctx.generate(f"{filler} (horse:1.3)", seed=2)
    out = ctx.generate(f"{filler} (<h>:1.3)", seed=2)
    np.testing.assert_array_equal(ref, out)

    ra = ctx.generate_batch([{"prompt": "a <h>", "seed": 5},
                             {"prompt": "a photograph", "seed": 6}])
    rb = ctx.generate_batch([{"prompt": "a horse", "seed": 5},
                             {"prompt": "a photograph", "seed": 6}])
    for x, y in zip(ra, rb):
        np.testing.assert_array_equal(x, y)


def test_embedding_file_formats(tmp_path):
    ctx = sdtpu.Context(config="tiny", steps=2)
    vecs = _rows(ctx, "horse")
    npz = tmp_path / "h.npz"
    np.savez(npz, emb=vecs)
    st_path = tmp_path / "h.safetensors"
    import safetensors.numpy as st

    st.save_file({"emb_params": vecs.astype(np.float32)}, str(st_path))

    a = sdtpu.Context(config="tiny", steps=2, embeddings={"<h>": str(npz)})
    b = sdtpu.Context(config="tiny", steps=2,
                      embeddings={"<h>": str(st_path)})
    ref = sdtpu.Context(config="tiny", steps=2).generate("a horse", seed=1)
    np.testing.assert_array_equal(a.generate("a <h>", seed=1), ref)
    np.testing.assert_array_equal(b.generate("a <h>", seed=1), ref)


def test_xl_dual_tower_embedding():
    ctx = sdtpu.Context(config="tiny_xl", steps=2)
    ref = ctx.generate("the horse", seed=3)
    ctx.load_embedding("<h>", {"clip_l": _rows(ctx, "horse", "clip"),
                               "clip_g": _rows(ctx, "horse", "clip2")})
    out = ctx.generate("the <h>", seed=3)
    np.testing.assert_array_equal(ref, out)


def test_embedding_error_paths():
    ctx = sdtpu.Context(config="tiny", steps=2)
    d = np.asarray(ctx.params["clip"]["token_embedding"]).shape[1]
    with pytest.raises(SdtpuError):
        ctx.load_embedding("<bad>", np.zeros((2, d + 1), np.float32))
    with pytest.raises(ValueError):
        ctx.load_embedding("two words", np.zeros((1, d), np.float32))
    xl = sdtpu.Context(config="tiny_xl", steps=2)
    with pytest.raises(SdtpuError):
        xl.load_embedding("<x>", np.zeros((1, 32), np.float32))


def test_embedding_with_lora_overlay():
    """Loading an embedding invalidates cached LoRA overlays so adapters
    see the widened table."""
    import jax

    from sdtpu.train.lora import extract_lora, inject_lora, save_lora_npz

    ctx = sdtpu.Context(config="tiny", steps=2)
    adapters = extract_lora(
        inject_lora(ctx.params["unet"], rank=2, key=jax.random.PRNGKey(1)))
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        path = td + "/a.npz"
        save_lora_npz(adapters, path)
        ctx.load_lora("style", path)
        ctx.generate("a horse", seed=1, lora="style")  # prime the overlay
        ctx.load_embedding("<h>", _rows(ctx, "horse"))
        a = ctx.generate("a <h>", seed=1, lora="style")
        b = ctx.generate("a horse", seed=1, lora="style")
        np.testing.assert_array_equal(a, b)
