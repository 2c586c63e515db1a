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
    # Procedural-texture DR knobs (sim-to-real: the reference renders MDL
    # textures — hi-vis vests, striped cones, painted crane — this is the
    # analytic stand-in; sample/lighting.py jitters them per frame).
    # Python-float defaults (a jnp default here would create a device array
    # at import time and break multi-process bring-up ordering).
    tex_phase: Array = 0.0  # stripe phase in [0, 1)
    tex_strength: Array = 1.0  # hash-noise multiplier
    dirt: Array = 0.4  # lower-body grime strength [0, 1]


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


_HIVIS = (0.85, 0.95, 0.05)  # EN ISO 20471 yellow-green
_WHITE = (0.92, 0.92, 0.92)
_SIGNAL_RED = (0.75, 0.10, 0.08)
_TRUNK_BROWN = (0.30, 0.20, 0.10)
_CAB_GRAY = (0.35, 0.38, 0.40)


def procedural_albedo(
    albedo: Array,  # (N, 3) base per-ray color
    p_local: Array,  # (N, 3) hit position in the OWNING INSTANCE's frame
    class_id: Array,  # (N,) taxonomy class of the hit instance (-1 ground)
    lighting: Lighting,
) -> Array:
    """Class-conditioned procedural texturing (sim-to-real pass).

    The reference renders MDL materials — striped traffic cones, a hi-vis
    vest on the DHGen worker, painted crane steel (SURVEY §2.2: bark3.mdl,
    vest textures). This is the analytic counterpart, in the object's local
    frame so patterns ride the object under DR: cone reflective bands, crane
    boom/telescopic hazard stripes, dumper cab two-tone + grime, fence wire
    grid, tree trunk/foliage split, worker vest. All selections are
    elementwise ``where``s — XLA fuses them into the shading epilogue.
    Class ids per scene/taxonomy: cone 0, tree 1, fence 2, dumper 4,
    human 5, crane base/column/boom/telescopic 6-9."""
    x, y, z = p_local[..., 0], p_local[..., 1], p_local[..., 2]
    r_xy = jnp.sqrt(x * x + y * y)
    phase = lighting.tex_phase

    def col(c):
        return jnp.asarray(c, jnp.float32)

    out = albedo
    # Traffic cone: two white reflective bands.
    band = ((z > 0.28) & (z < 0.40)) | ((z > 0.50) & (z < 0.58))
    out = jnp.where(((class_id == 0) & band)[..., None], col(_WHITE), out)
    # Tree: brown trunk below the canopy, foliage keeps the base green.
    trunk = (class_id == 1) & (r_xy < 0.45) & (z < 3.2)
    out = jnp.where(trunk[..., None], col(_TRUNK_BROWN), out)
    # Fence: wire-mesh grid modulation (35 cm cells, slight darkening).
    grid = (jnp.sin(x * 18.0) * jnp.sin(z * 18.0)) > 0.0
    out = jnp.where(((class_id == 2) & grid)[..., None], out * 0.75, out)
    # Dumper: gray cab ahead of the bed + wheel-arch grime below 0.55 m.
    cab = (class_id == 4) & (x > 1.2) & (z > 0.6)
    out = jnp.where(cab[..., None], col(_CAB_GRAY), out)
    grime = (class_id == 4) & (z < 0.55)
    out = jnp.where(grime[..., None], out * (1.0 - 0.5 * lighting.dirt), out)
    # Worker: hi-vis vest over the torso + two reflective stripes.
    vest = (class_id == 5) & (z > 1.02) & (z < 1.48)
    out = jnp.where(vest[..., None], col(_HIVIS), out)
    stripe_h = (class_id == 5) & (((z > 1.10) & (z < 1.16))
                                  | ((z > 1.30) & (z < 1.36)))
    out = jnp.where(stripe_h[..., None], col(_WHITE), out)
    # Crane boom/telescopic: alternating red/white hazard stripes along the
    # member axis (local +X), 0.5 m pitch, DR phase.
    stripes = (jnp.floor(x * 2.0 + phase) % 2.0) < 1.0
    boom_tel = (class_id == 8) | (class_id == 9)
    out = jnp.where((boom_tel & stripes)[..., None], col(_WHITE), out)
    out = jnp.where((boom_tel & ~stripes)[..., None], col(_SIGNAL_RED), out)
    return out


def shade(
    hit: Dict[str, Array],
    ray_o: Array,
    ray_d: Array,
    albedo: Array,
    lighting: Lighting,
    shadow_t: Array | None = None,
    texture_strength: float = 0.15,
    ao: Array | None = None,
) -> Array:
    """Shade rays -> linear RGB in [0, 1], (N, 3).

    hit: raycast output dict (t, inst, normal). albedo: per-ray base color
    (N, 3). shadow_t: optional occlusion distances toward the sun (INF = lit).
    ao: optional (N,) ambient-occlusion factor in [0, 1] (contact shadows).
    """
    n = hit["normal"]
    t = hit["t"]
    is_hit = jnp.isfinite(t)
    p = ray_o[None, :] + jnp.where(is_hit, t, 0.0)[..., None] * ray_d

    tex = 1.0 + texture_strength * lighting.tex_strength \
        * (_hash_noise(p) - 0.5) * 2.0
    albedo = albedo * tex[..., None]

    ndotl = jnp.maximum(-jnp.sum(n * lighting.sun_dir, -1), 0.0)
    lit = jnp.ones_like(ndotl) if shadow_t is None else (shadow_t >= 1e9).astype(jnp.float32)
    direct = lighting.sun_intensity * ndotl * lit

    # Hemispheric ambient: brighter for up-facing normals.
    sky_frac = 0.5 * (1.0 + n[..., 2])
    ambient = lighting.dome_intensity * (0.25 + 0.35 * sky_frac)
    if ao is not None:
        ambient = ambient * ao

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
