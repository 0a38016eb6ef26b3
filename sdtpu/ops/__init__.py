"""Pallas TPU kernels: flash attention, fused GroupNorm(+SiLU), int8 matmul.

Each kernel has an XLA-native fallback in sdtpu.models.layers; the dispatch
knob is the ``attn_kernel``/``impl`` argument threaded through the models
(the analogue of the reference's custom-op mechanism, sdod/efficient_gn.py +
csrc/sdod_ops).
"""
