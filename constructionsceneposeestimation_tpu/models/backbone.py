"""Keypoint-heatmap backbone (flax.linen), TPU-first.

Simple-Baselines-style architecture (Xiao et al. 2018): ResNet-ish encoder ->
three transposed-conv upsampling blocks -> 1x1 heatmap head at 1/4 input
resolution. Choices made for the MXU rather than for GPU parity:

* NHWC layout, channel counts multiples of 128 where it matters;
* bfloat16 activations/compute with float32 params and a float32 head
  (``param_dtype=f32, dtype=bf16`` — XLA keeps the MXU in bf16);
* GroupNorm instead of BatchNorm: no cross-device batch-stat sync on the DP
  mesh, fully deterministic, and fuses into neighboring ops.

The reference repo has no model at all (SURVEY.md section 0); this implements
the keypoint-heatmap backbone called for by BASELINE.json's north star.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class ResBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)(x)
        y = nn.GroupNorm(num_groups=min(32, self.features), dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = nn.GroupNorm(num_groups=min(32, self.features), dtype=self.dtype)(y)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)(residual)
            residual = nn.GroupNorm(num_groups=min(32, self.features), dtype=self.dtype)(residual)
        return nn.relu(y + residual)


class HeatmapBackbone(nn.Module):
    """images (B, H, W, 3) float32 -> heatmaps
    (B, H/output_stride, W/output_stride, num_channels) f32."""

    num_channels: int
    stage_features: Sequence[int] = (64, 128, 256, 512)
    blocks_per_stage: Sequence[int] = (2, 2, 2, 2)
    deconv_features: int = 256
    output_stride: int = 4  # 4 -> three deconvs; 2 -> four
    use_skips: bool = True  # FPN-style laterals: encoder /16, /8, /4 (and /2)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        assert self.output_stride in (2, 4), "output_stride must be 2 or 4"
        x = x.astype(self.dtype)
        # Stem: /4
        x = nn.Conv(64, (7, 7), strides=(2, 2), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.GroupNorm(num_groups=32, dtype=self.dtype)(x)
        x = nn.relu(x)
        stem2 = x  # /2 (for output_stride=2 decoders)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        # Encoder: /32, keeping per-stage outputs for the lateral skips. Far
        # objects (a worker at 25 m is ~12 px at 512^2) vanish through the /32
        # bottleneck; the laterals carry their high-frequency evidence back up.
        skips = []  # stage outputs at /4, /8, /16, /32
        for i, (feats, n_blocks) in enumerate(zip(self.stage_features, self.blocks_per_stage)):
            for b in range(n_blocks):
                stride = 2 if (b == 0 and i > 0) else 1
                x = ResBlock(feats, stride, self.dtype)(x)
            skips.append(x)
        # Decoder: 4x4 stride-2 deconvs down to the output stride, each fused
        # with a 1x1-projected encoder lateral at its resolution (FPN-style).
        n_deconv = 3 if self.output_stride == 4 else 4
        laterals = [skips[2], skips[1], skips[0], stem2]  # /16, /8, /4, /2
        for d in range(n_deconv):
            x = nn.ConvTranspose(self.deconv_features, (4, 4), strides=(2, 2),
                                 use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)(x)
            if self.use_skips:
                x = x + nn.Conv(self.deconv_features, (1, 1), use_bias=False,
                                dtype=self.dtype,
                                param_dtype=jnp.float32)(laterals[d])
            x = nn.GroupNorm(num_groups=32, dtype=self.dtype)(x)
            x = nn.relu(x)
        # Head in f32 for stable regression targets.
        x = nn.Conv(self.num_channels, (1, 1), dtype=jnp.float32,
                    param_dtype=jnp.float32)(x.astype(jnp.float32))
        return x


class LiteBackbone(nn.Module):
    """Small/fast variant for the >=5k img/s decode-path benchmarks and tests."""

    num_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = x.astype(self.dtype)
        x = nn.Conv(32, (7, 7), strides=(2, 2), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.GroupNorm(num_groups=8, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = ResBlock(64, 2, self.dtype)(x)
        x = ResBlock(128, 2, self.dtype)(x)
        x = nn.ConvTranspose(128, (4, 4), strides=(2, 2), use_bias=False,
                             dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.GroupNorm(num_groups=32, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.num_channels, (1, 1), dtype=jnp.float32,
                    param_dtype=jnp.float32)(x.astype(jnp.float32))
        return x
