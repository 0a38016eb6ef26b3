"""Post-GSPMD HLO inspection: count what the partitioner actually emitted.

The TP plan in parallel/sharding.py is *declarative* — shardings are
annotated and GSPMD inserts the ICI collectives. That indirection needs
evidence: these helpers parse the compiled (SPMD-partitioned) HLO text and
count collectives and per-shard op shapes, so tests can pin the emitted
communication pattern (tests/test_tp_hlo.py) and tools/analyze_tp_hlo.py
can print it for humans. The reference has no multi-device story
(SURVEY.md §2.4); this is TPU-native observability for the mesh path.
"""

from __future__ import annotations

import collections
import re

COLLECTIVES = ("all-reduce", "all-gather", "collective-permute",
               "reduce-scatter", "all-to-all")

# Real-TPU compiles can emit collectives as fusion ROOTs or in async form
# (all-reduce-start / all-reduce-done); match the ROOT prefix and count a
# start/done pair once (the -start carries the op, -done is bookkeeping).
_OP_DEF = re.compile(
    r"(?:ROOT )?%?[\w.-]+ = (\S+) ("
    + "|".join(COLLECTIVES) + r")(-start)?\(")
_CONV_DEF = re.compile(r"(?:ROOT )?%?[\w.-]+ = (\S+) convolution\(")
_DOT_DEF = re.compile(r"(?:ROOT )?%?[\w.-]+ = (\S+) dot\(")


def collective_counts(hlo_text: str) -> dict[str, int]:
    """Count collective op DEFINITIONS (one per op, including inside fusions
    and while bodies, sync or async-start form) in compiled HLO text. Ops
    that were never emitted appear with count 0."""
    counts = collections.Counter({k: 0 for k in COLLECTIVES})
    for line in hlo_text.splitlines():
        m = _OP_DEF.match(line.strip())
        if m:
            counts[m.group(2)] += 1
    return dict(counts)


def op_output_shapes(hlo_text: str) -> dict[str, collections.Counter]:
    """Per-shard output shapes of convolution and dot ops (shape string ->
    count). On a TP mesh, dot shapes shrink with the model axis (sharded
    matmuls) while conv shapes should NOT (convs replicate by design)."""
    convs: collections.Counter = collections.Counter()
    dots: collections.Counter = collections.Counter()
    for line in hlo_text.splitlines():
        s = line.strip()
        m = _CONV_DEF.match(s)
        if m:
            convs[m.group(1)] += 1
        m = _DOT_DEF.match(s)
        if m:
            dots[m.group(1)] += 1
    return {"convolution": convs, "dot": dots}
