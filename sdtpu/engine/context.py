"""Context: the pipeline orchestrator (placeholder — built out with the models).

Mirrors the phased-init design of the reference's ``Context``
(reference: context.h:27-52): init -> load models -> load tokenizer ->
prepare solver -> prepare buffers -> prepare schedule -> generate.
"""

from __future__ import annotations


class Context:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "sdtpu.Context lands with the model stack (engine milestone)"
        )
