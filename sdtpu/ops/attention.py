"""Flash attention for TPU (Pallas). Placeholder dispatch until the fused
kernel lands: routes to the XLA path (correct, unfused)."""

from __future__ import annotations


def flash_attention(q, k, v, heads: int):
    from sdtpu.models.layers import sdpa

    return sdpa(q, k, v, heads, kernel="xla")
