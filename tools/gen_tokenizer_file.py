"""Generate the flat single-file tokenizer asset (``ctokenizer.txt``).

Parity with the reference's tokenizer-asset generator
(reference: gen_tokenizer_file.py:1-42): converts CLIP's
``bpe_simple_vocab_16e6.txt.gz`` (or HF vocab.json+merges.txt) into the flat
format consumed by sdtpu.Tokenizer.from_flat_file and the native C++
tokenizer: 512 byte-unicode vocab lines (+ ``</w>`` variants) followed by
one ``A B`` line per merge in rank order.

Usage:
    python tools/gen_tokenizer_file.py --gz bpe_simple_vocab_16e6.txt.gz out.txt
    python tools/gen_tokenizer_file.py --hf vocab.json merges.txt out.txt
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from sdtpu.tokenizer import Tokenizer, bytes_to_unicode  # noqa: E402


def write_flat(merges, out_path: str) -> None:
    base = list(bytes_to_unicode().values())
    lines = base + [c + "</w>" for c in base] + [f"{a} {b}" for a, b in merges]
    with open(out_path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--gz", help="CLIP bpe_simple_vocab_16e6.txt.gz")
    g.add_argument("--hf", nargs=2, metavar=("VOCAB_JSON", "MERGES_TXT"))
    p.add_argument("out")
    args = p.parse_args(argv)

    if args.gz:
        tok = Tokenizer.from_openai_gz(args.gz)
    else:
        tok = Tokenizer.from_hf_files(*args.hf)
    merges = [None] * len(tok.bpe_ranks)
    for pair, rank in tok.bpe_ranks.items():
        merges[rank] = pair
    write_flat(merges, args.out)
    # self-check: reload and compare a canonical prompt
    tok2 = Tokenizer.from_flat_file(args.out)
    probe = "a photograph of an astronaut riding a horse"
    assert tok2.tokenize(probe) == tok.tokenize(probe), "flat-file round trip"
    print(f"wrote {args.out}: {tok2.vocab_size} vocab, {len(merges)} merges")
    return 0


if __name__ == "__main__":
    sys.exit(main())
