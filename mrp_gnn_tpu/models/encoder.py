"""Per-robot CNN encoder.

The reference encodes each robot's RGB view with a ResNet-style conv encoder
(SURVEY.md section 2.1 "CNN encoder"; paper arXiv:2201.01760 — reference
mount empty, architecture reconstructed). TPU-first choices here:

- NHWC layout (XLA TPU native), channels sized in MXU-friendly multiples;
- GroupNorm instead of BatchNorm: batch-stat-free, so the jitted step is a
  pure function and sharding the node axis needs no cross-device stat sync;
- all robot views of the whole batch are encoded as one [V, H, W, C] conv
  batch — the per-robot loop of the reference becomes a single MXU-saturating
  convolution ("feature-encoder sharding", BASELINE.json:5).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class ConvBlock(nn.Module):
    features: int
    stride: int = 1
    norm_groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", use_bias=False, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=min(self.norm_groups, self.features),
                         dtype=self.dtype)(x)
        return nn.relu(x)


class ResidualBlock(nn.Module):
    features: int
    norm_groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = ConvBlock(self.features, 1, self.norm_groups, self.dtype)(x)
        h = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=min(self.norm_groups, self.features),
                         dtype=self.dtype)(h)
        return nn.relu(x + h)


class Encoder(nn.Module):
    """Stem + downsampling residual stages; returns per-stage skip features.

    Input  [V, H, W, 3]  (V = padded robot-view nodes)
    Output list of [V, H/2^s, W/2^s, C_s] for s = 1..num_stages, plus the
    final bottleneck as the last element.
    """

    channels: Sequence[int] = (32, 64, 128)
    norm_groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[list, jnp.ndarray]:
        x = ConvBlock(self.channels[0], 1, self.norm_groups, self.dtype,
                      name="stem")(x)
        skips = []
        for i, ch in enumerate(self.channels):
            x = ConvBlock(ch, 2, self.norm_groups, self.dtype,
                          name=f"down{i}")(x)
            x = ResidualBlock(ch, self.norm_groups, self.dtype,
                              name=f"res{i}")(x)
            skips.append(x)
        return skips, x
