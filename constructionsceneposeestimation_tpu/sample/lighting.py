"""Lighting domain randomization (jittable).

The reference fixes one dome + one distant light (setup_scene_lighting,
generate_construction_data.py:1289-1345); the TPU build jitters their
parameters per frame for DR (BASELINE.json config 2): sun direction over an
elevation/azimuth range, intensities multiplicatively, dome color around the
reference sky blue.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import LightingConfig
from ..render.shading import Lighting

Array = jax.Array


def sample_lighting(key: Array, cfg: LightingConfig = LightingConfig()) -> Lighting:
    ks = jax.random.split(key, 7)
    elev = jnp.deg2rad(jax.random.uniform(
        ks[0], (), minval=cfg.sun_elevation_range[0], maxval=cfg.sun_elevation_range[1]))
    azim = jnp.deg2rad(jax.random.uniform(
        ks[1], (), minval=cfg.sun_azimuth_range[0], maxval=cfg.sun_azimuth_range[1]))
    # Direction light TRAVELS (from sun toward the ground): negative z.
    sun_dir = jnp.stack([
        jnp.cos(elev) * jnp.cos(azim),
        jnp.cos(elev) * jnp.sin(azim),
        -jnp.sin(elev),
    ])
    jit = cfg.intensity_jitter
    sun_i = 1.0 + jax.random.uniform(ks[2], (), minval=-jit, maxval=jit)
    dome_i = 1.0 + jax.random.uniform(ks[3], (), minval=-jit, maxval=jit)
    base = jnp.asarray(cfg.dome_color, jnp.float32)
    return Lighting(
        sun_dir=sun_dir,
        sun_intensity=sun_i * (cfg.distant_intensity_cap / 1500.0),
        dome_intensity=dome_i * (cfg.dome_intensity / 500.0),
        dome_color=base,
        # Procedural-texture DR (render/shading.procedural_albedo): stripe
        # phase, noise strength, lower-body grime.
        tex_phase=jax.random.uniform(ks[4], ()),
        tex_strength=jax.random.uniform(ks[5], (), minval=0.5, maxval=1.5),
        dirt=jax.random.uniform(ks[6], (), minval=0.0, maxval=0.8),
    )
