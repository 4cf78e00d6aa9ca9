"""Dense prediction decoder with skip connections and depth / seg heads.

The reference decodes fused features to dense monocular depth and/or semantic
segmentation with an upsampling conv decoder (SURVEY.md section 2.1
"Decoder", reconstructed — reference mount empty). TPU-first choices:
nearest-resize + 3x3 conv upsampling (avoids conv-transpose checkerboard and
lowers cleanly to XLA), NHWC throughout.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mrp_gnn_tpu.models.encoder import ConvBlock


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    V, H, W, C = x.shape
    return jax.image.resize(x, (V, H * 2, W * 2, C), method="nearest")


class Decoder(nn.Module):
    """Mirror of the encoder: per-stage upsample + skip concat.

    Returns full-resolution decoder features [V, H, W, C0].
    """

    channels: Sequence[int] = (32, 64, 128)  # encoder stage widths
    norm_groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, skips: list, bottleneck: jnp.ndarray) -> jnp.ndarray:
        x = bottleneck
        # Walk encoder stages in reverse; skips[i] has the resolution of
        # stage i's output, so stage i's up-block consumes skips[i-1].
        for i in reversed(range(len(self.channels))):
            x = _upsample2x(x)
            if i > 0:
                x = jnp.concatenate([x, skips[i - 1]], axis=-1)
            x = ConvBlock(self.channels[max(i - 1, 0)], 1, self.norm_groups,
                          self.dtype, name=f"up{i}")(x)
        return x


class DepthHead(nn.Module):
    """1x1 conv -> scaled sigmoid depth in (min_depth, max_depth).

    Sigmoid parameterization starts mid-range at init (raw ~ 0 -> depth ~
    (min+max)/2) and keeps gradients well-scaled across the whole range —
    softplus starts near min_depth and crawls for far targets.
    """

    min_depth: float = 0.1
    max_depth: float = 20.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        raw = nn.Conv(1, (1, 1), dtype=self.dtype, name="out")(x)[..., 0]
        return self.min_depth + (self.max_depth - self.min_depth) * nn.sigmoid(raw)


class SegHead(nn.Module):
    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="out")(x)
