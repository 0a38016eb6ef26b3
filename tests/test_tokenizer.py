"""Tokenizer parity tests.

Strategy (SURVEY.md §4): golden comparison against a trusted reference
implementation. Here the trusted reference is an *independent* in-test
implementation of the published CLIP BPE algorithm (regex-module pattern +
textbook lowest-rank merge), plus a cross-check against
``transformers.CLIPTokenizer`` on ASCII prompts (its no-ftfy preprocessing
deviates from CLIP on CJK/HTML-entities, so those cases are excluded there).
"""

import html
import json

import pytest

from sdtpu.tokenizer import (
    CONTEXT_LEN,
    EOT_TEXT,
    SOT_TEXT,
    Tokenizer,
    bytes_to_unicode,
    pretokenize,
    whitespace_clean,
)

# ---------------------------------------------------------------------------
# independent reference implementation (regex-based, textbook BPE)
# ---------------------------------------------------------------------------

regex = pytest.importorskip("regex")

CLIP_PAT = regex.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    regex.IGNORECASE,
)


def ref_get_pairs(word):
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


def ref_bpe(token, ranks):
    word = tuple(token[:-1]) + (token[-1] + "</w>",)
    pairs = ref_get_pairs(word)
    if not pairs:
        return [token + "</w>"]
    while True:
        bigram = min(pairs, key=lambda p: ranks.get(p, float("inf")))
        if bigram not in ranks:
            break
        first, second = bigram
        new_word = []
        i = 0
        while i < len(word):
            try:
                j = word.index(first, i)
            except ValueError:
                new_word.extend(word[i:])
                break
            new_word.extend(word[i:j])
            i = j
            if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                new_word.append(first + second)
                i += 2
            else:
                new_word.append(word[i])
                i += 1
        word = tuple(new_word)
        if len(word) == 1:
            break
        pairs = ref_get_pairs(word)
    return list(word)


def ref_encode(text, encoder, ranks):
    be = bytes_to_unicode()
    text = whitespace_clean(html.unescape(html.unescape(text))).lower()
    ids = []
    for tok in CLIP_PAT.findall(text):
        tok = "".join(be[b] for b in tok.encode("utf-8"))
        ids.extend(encoder[t] for t in ref_bpe(tok, ranks))
    return ids


# ---------------------------------------------------------------------------
# synthetic merge table (chained merges exercise the ranking logic)
# ---------------------------------------------------------------------------

MERGES = [
    ("t", "h"),
    ("th", "e</w>"),
    ("a", "n"),
    ("i", "n"),
    ("in", "g</w>"),
    ("e", "r</w>"),
    ("an", "d</w>"),
    ("o", "f</w>"),
    ("r", "i"),
    ("ri", "d"),
    ("rid", "ing</w>"),
    ("h", "o"),
    ("ho", "r"),
    ("hor", "s"),
    ("hors", "e</w>"),
    ("1", "2"),
    ("'", "s</w>"),
    (".", "."),
    ("..", ".</w>"),
    ("ph", "o"),
    ("p", "h"),  # deliberately ranked AFTER ("ph","o") — can never fire first
    ("é", "é"),
]

PROMPTS = [
    "a photograph of an astronaut riding a horse",
    "The   QUICK brownfox ...",
    "it's 123 things, isn't it?",
    "hello,world!!!don't 'll x",
    "trailing space ",
    " ",
    "",
    "résumé café née",
    "emoji 🚀🚀 test",
    "日本語のテキスト",
    "mixed 日本 and english",
    "a&amp;b &lt;tag&gt;",
    "quote's and can't and we're and I'm and you'll and he'd and they've",
    "'s at start",
    "word'sword",
    "a'x not a contraction",
    "numbers 0 1 22 333 4444",
    "...!?.:;",
    "ing ing inging",
    # punctuation-run-then-contraction adjacency: CLIP's regex consumes the
    # apostrophe greedily inside the run ("!!'s" -> ["!!'", "s"])
    "!!'s",
    "(.'s wow",
    "--'ll #'t",
    "!'s ''s x''ve",
]


@pytest.fixture(scope="module")
def tok():
    return Tokenizer.from_merges(MERGES)


def test_vocab_construction(tok):
    # 256 byte chars + 256 </w> variants + merges + 2 specials
    assert tok.vocab_size == 512 + len(MERGES) + 2
    assert tok.encoder[SOT_TEXT] == tok.vocab_size - 2
    assert tok.encoder[EOT_TEXT] == tok.vocab_size - 1


def test_pretokenize_matches_clip_regex(tok):
    for p in PROMPTS:
        cleaned = whitespace_clean(html.unescape(html.unescape(p))).lower()
        ours = list(pretokenize(cleaned))
        theirs = CLIP_PAT.findall(cleaned)
        assert ours == theirs, f"pretokenize mismatch on {p!r}: {ours} vs {theirs}"


def test_encode_matches_reference_impl(tok):
    for p in PROMPTS:
        ours = tok.encode(p)
        theirs = ref_encode(p, tok.encoder, tok.bpe_ranks)
        assert ours == theirs, f"encode mismatch on {p!r}"


def test_tokenize_padding(tok):
    ids = tok.tokenize("a horse")
    assert len(ids) == CONTEXT_LEN
    assert ids[0] == tok.sot
    assert tok.eot in ids
    first_eot = ids.index(tok.eot)
    assert all(i == tok.eot for i in ids[first_eot:])


def test_tokenize_truncation(tok):
    ids = tok.tokenize("x " * 500)
    assert len(ids) == CONTEXT_LEN
    assert ids[0] == tok.sot and ids[-1] == tok.eot


def test_empty_prompt(tok):
    # the uncond-embedding prompt (reference: context.cpp:233-239)
    ids = tok.tokenize("")
    assert ids[0] == tok.sot
    assert all(i == tok.eot for i in ids[1:])


def test_decode_roundtrip(tok):
    text = "a photograph of an astronaut riding a horse"
    ids = tok.encode(text)
    assert tok.decode(ids).strip() == text


def test_flat_file_roundtrip(tok, tmp_path):
    # flat single-file asset format (reference: tokenizer.cpp:228-255)
    base = list(bytes_to_unicode().values())
    lines = base + [c + "</w>" for c in base] + [f"{a} {b}" for a, b in MERGES]
    path = tmp_path / "ctokenizer.txt"
    path.write_text("\n".join(lines) + "\n", encoding="utf-8")
    tok2 = Tokenizer.from_flat_file(path)
    assert tok2.vocab_size == tok.vocab_size
    for p in PROMPTS:
        assert tok2.tokenize(p) == tok.tokenize(p)


def test_hf_cross_check(tok, tmp_path):
    transformers = pytest.importorskip("transformers")
    vocab = {t: i for t, i in tok.encoder.items()}
    (tmp_path / "vocab.json").write_text(json.dumps(vocab), encoding="utf-8")
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in MERGES) + "\n",
        encoding="utf-8",
    )
    hf = transformers.CLIPTokenizer(
        str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt")
    )
    ascii_prompts = [
        p for p in PROMPTS
        if p.strip() and p.isascii() and "&" not in p
    ]
    for p in ascii_prompts:
        ours = tok.tokenize(p)
        theirs = hf(
            p, padding="max_length", max_length=CONTEXT_LEN, truncation=True
        ).input_ids
        assert ours == theirs, f"hf mismatch on {p!r}"
