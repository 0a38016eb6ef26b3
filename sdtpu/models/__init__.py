"""Model stack: time-embedding MLP, CLIP text encoder, UNet, VAE decoder.

Functional style: every module is a pair ``init(key, cfg) -> params`` /
``apply(params, ...) -> out`` over plain dict pytrees — trivially jittable,
shardable (tree_map a PartitionSpec tree onto params), and checkpointable.
"""

from sdtpu.models import clip, temb, unet, vae

__all__ = ["clip", "temb", "unet", "vae"]
