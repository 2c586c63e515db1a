"""Fused image preprocessing (pure JAX; XLA fuses the elementwise chain).

The north star folds "decode, resize, normalize, domain-randomized
texture/lighting/camera augmentation" into the input pipeline. Our frames are
born on-device, so preprocessing = resize + photometric augmentation +
normalization, all fused by XLA into the first conv's input. Augmentations
are key-deterministic (fold_in per frame).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# numpy, not jnp: no backend init at import (multi-process bring-up).
IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def resize_bilinear(img: Array, out_h: int, out_w: int) -> Array:
    """(H, W, C) -> (out_h, out_w, C), align_corners=False semantics."""
    return jax.image.resize(img, (out_h, out_w, img.shape[-1]), method="bilinear")


def photometric_augment(key: Array, img: Array,
                        brightness: float = 0.2,
                        contrast: float = 0.2,
                        hue_shift: float = 0.05,
                        noise_std: float = 0.02) -> Array:
    """img float32 in [0,1] -> jittered image in [0,1]."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    b = 1.0 + jax.random.uniform(k1, (), minval=-brightness, maxval=brightness)
    c = 1.0 + jax.random.uniform(k2, (), minval=-contrast, maxval=contrast)
    mean = jnp.mean(img, axis=(-2, -3), keepdims=True)
    img = (img - mean) * c + mean * b
    # Cheap hue-ish jitter: per-channel gains.
    gains = 1.0 + jax.random.uniform(k3, (3,), minval=-hue_shift, maxval=hue_shift)
    img = img * gains
    img = img + noise_std * jax.random.normal(k4, img.shape)
    return jnp.clip(img, 0.0, 1.0)


def normalize(img: Array) -> Array:
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def preprocess_frame(key: Array, rgb_u8: Array, out_h: int, out_w: int,
                     augment: bool = True) -> Array:
    """uint8 (H, W, 3) -> normalized float32 (out_h, out_w, 3)."""
    img = rgb_u8.astype(jnp.float32) / 255.0
    if img.shape[0] != out_h or img.shape[1] != out_w:
        img = resize_bilinear(img, out_h, out_w)
    if augment:
        img = photometric_augment(key, img)
    return normalize(img)
