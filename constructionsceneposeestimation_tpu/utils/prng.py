"""Deterministic key management.

The reference samples from global numpy RNG, so no frame is individually
reproducible. Here everything folds out of one seed:

  scene for frame f     = fold(fold(seed, 1), f // cadence)
  frame randomness      = fold(fold(seed, 2), f)

(the constants match parallel/pipeline.py). Any frame regenerates
bit-identically in isolation — the basis of manifest resume and of the
determinism tests (same seed -> identical batch bytes).
"""

from __future__ import annotations

import jax

Array = jax.Array

SCENE_STREAM = 1
FRAME_STREAM = 2


def scene_key(seed: Array, frame_id, cadence: int) -> Array:
    return jax.random.fold_in(jax.random.fold_in(seed, SCENE_STREAM),
                              frame_id // cadence)


def frame_key(seed: Array, frame_id) -> Array:
    return jax.random.fold_in(jax.random.fold_in(seed, FRAME_STREAM), frame_id)
