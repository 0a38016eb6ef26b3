"""Pallas TPU kernels.

Shipping kernels and their dispatch policy (the ``kernels=`` knob threaded
through the models — the analogue of the reference's custom-op mechanism,
sdod/efficient_gn.py + csrc/sdod_ops):

* ``attention.flash_attention`` — online-softmax flash attention for the
  UNet's spatial self-attention; the one kernel that beats XLA in-program
  (policy ``pallas``, the TPU default).
* ``groupnorm.fused_group_norm`` — single-pass GroupNorm(+SiLU); correct but
  loses to XLA's fusion in-program, kept behind policy ``pallas_gn``.
* cross-attention padded-kv flash — behind ``attention.CROSS_FLASH``.

Every kernel has an XLA-native fallback in ``sdtpu.models.layers`` and a
Pallas-interpreter parity test; in-program benchmarks that set each default
are recorded in docs/PERF_NOTES.md.
"""
