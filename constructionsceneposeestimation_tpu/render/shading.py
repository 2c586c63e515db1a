"""RGB synthesis: Lambert shading under a dome + distant light (pure JAX).

Replaces the reference's RTX render for the image modality. Its lighting setup
(setup_scene_lighting, generate_construction_data.py:1289-1345) — DomeLight
intensity 500, sky-blue (0.75, 0.85, 1.0), DistantLight capped at 1500 — maps
to an ambient term plus one directional sun; the sky background is the dome
color (the reason the reference added the dome: black-sky renders, 1292-1294).
Albedo gets a cheap hash-noise texture so domain-randomized images aren't
flat-shaded (BASELINE.json config 2 texture jitter).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class Lighting(NamedTuple):
    sun_dir: Array  # (3,) unit, pointing FROM the sun (light travel direction)
    sun_intensity: Array  # scalar, 1.0 ~ reference DistantLight 1500
    dome_intensity: Array  # scalar, 1.0 ~ reference DomeLight 500 * 3 (full sky)
    dome_color: Array  # (3,)


def default_lighting() -> Lighting:
    d = jnp.asarray([0.4, 0.2, -0.89], jnp.float32)
    return Lighting(
        sun_dir=d / jnp.linalg.norm(d),
        sun_intensity=jnp.float32(1.0),
        dome_intensity=jnp.float32(1.0),
        dome_color=jnp.asarray([0.75, 0.85, 1.0], jnp.float32),
    )


def _hash_noise(p: Array, scale: float = 7.0) -> Array:
    """Cheap value noise from hit position (N, 3) -> (N,) in [0, 1)."""
    q = jnp.sin(p[..., 0] * 12.9898 * scale + p[..., 1] * 78.233 * scale
                + p[..., 2] * 37.719 * scale)
    return jnp.abs(q * 43758.5453) % 1.0


def shade(
    hit: Dict[str, Array],
    ray_o: Array,
    ray_d: Array,
    albedo: Array,
    lighting: Lighting,
    shadow_t: Array | None = None,
    texture_strength: float = 0.15,
) -> Array:
    """Shade rays -> linear RGB in [0, 1], (N, 3).

    hit: raycast output dict (t, inst, normal). albedo: per-ray base color
    (N, 3). shadow_t: optional occlusion distances toward the sun (INF = lit).
    """
    n = hit["normal"]
    t = hit["t"]
    is_hit = jnp.isfinite(t)
    p = ray_o[None, :] + jnp.where(is_hit, t, 0.0)[..., None] * ray_d

    tex = 1.0 + texture_strength * (_hash_noise(p) - 0.5) * 2.0
    albedo = albedo * tex[..., None]

    ndotl = jnp.maximum(-jnp.sum(n * lighting.sun_dir, -1), 0.0)
    lit = jnp.ones_like(ndotl) if shadow_t is None else (shadow_t >= 1e9).astype(jnp.float32)
    direct = lighting.sun_intensity * ndotl * lit

    # Hemispheric ambient: brighter for up-facing normals.
    sky_frac = 0.5 * (1.0 + n[..., 2])
    ambient = lighting.dome_intensity * (0.25 + 0.35 * sky_frac)

    color = albedo * (direct[..., None] + ambient[..., None] * lighting.dome_color)

    # Sky background: dome color with a horizon-to-zenith gradient.
    up = jnp.clip(ray_d[..., 2], 0.0, 1.0)[..., None]
    sky = lighting.dome_color * (0.85 + 0.15 * up) * jnp.maximum(lighting.dome_intensity, 0.3)
    color = jnp.where(is_hit[..., None], color, sky)
    return jnp.clip(color, 0.0, 1.0)


def linear_to_srgb_u8(rgb: Array) -> Array:
    """Tone-map linear RGB [0,1] -> uint8 sRGB-ish (gamma 2.2)."""
    g = jnp.power(jnp.clip(rgb, 0.0, 1.0), 1.0 / 2.2)
    return jnp.round(g * 255.0).astype(jnp.uint8)
