"""RGB synthesis: Lambert shading under a dome + distant light (pure JAX).

Replaces the reference's RTX render for the image modality. Its lighting setup
(setup_scene_lighting, generate_construction_data.py:1289-1345) — DomeLight
intensity 500, sky-blue (0.75, 0.85, 1.0), DistantLight capped at 1500 — maps
to an ambient term plus one directional sun; the sky background is the dome
color (the reason the reference added the dome: black-sky renders, 1292-1294).
Albedo gets a cheap hash-noise texture so domain-randomized images aren't
flat-shaded (BASELINE.json config 2 texture jitter).

TPU layout: every function here works on structure-of-arrays COMPONENT PLANES
— (N,) r/g/b and x/y/z arrays — never (N, 3) vectors. A trailing dim of 3
pads to the 128-lane tile (~43x wasted VPU work and HBM on every materialized
intermediate); the shading epilogue runs ~6x faster in SoA (v5e, 512x512).
The only (H, W, 3) tensor is the final uint8 image.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
Planes3 = Tuple[Array, Array, Array]


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


def _hash_noise(x: Array, y: Array, z: Array, scale: float = 7.0) -> Array:
    """Cheap value noise from hit-position planes -> (N,) in [0, 1).

    Always evaluated in f32 regardless of the shading compute dtype: the sin
    argument reaches ~1500 at yard scale, where bf16's ulp is ~8 — the phase
    would be pure rounding noise (banded, backend-dependent), not hash noise.
    """
    f32 = jnp.float32
    q = jnp.sin(x.astype(f32) * (12.9898 * scale)
                + y.astype(f32) * (78.233 * scale)
                + z.astype(f32) * (37.719 * scale))
    return (jnp.abs(q * 43758.5453) % 1.0).astype(x.dtype)


_HIVIS = (0.85, 0.95, 0.05)  # EN ISO 20471 yellow-green
_WHITE = (0.92, 0.92, 0.92)
_SIGNAL_RED = (0.75, 0.10, 0.08)
_TRUNK_BROWN = (0.30, 0.20, 0.10)
_CAB_GRAY = (0.35, 0.38, 0.40)


def _override(rgb: Planes3, mask: Array, color) -> Planes3:
    # Python-float colors are weakly typed: the select stays in the incoming
    # compute dtype (f32 or bf16) instead of promoting every plane to f32.
    return tuple(jnp.where(mask, c, ch) for ch, c in zip(rgb, color))


def procedural_albedo(
    albedo: Planes3,  # per-ray base color planes, (N,) each
    x: Array, y: Array, z: Array,  # hit position in the OWNING INSTANCE frame
    class_id: Array,  # (N,) f32 taxonomy class of the hit instance (-1 ground)
    lighting: Lighting,
) -> Planes3:
    """Class-conditioned procedural texturing (sim-to-real pass).

    The reference renders MDL materials — striped traffic cones, a hi-vis
    vest on the DHGen worker, painted crane steel (SURVEY §2.2: bark3.mdl,
    vest textures). This is the analytic counterpart, in the object's local
    frame so patterns ride the object under DR: cone reflective bands, crane
    boom/telescopic hazard stripes, dumper cab two-tone + grime, fence wire
    grid, tree trunk/foliage split, worker vest. All selections are
    elementwise ``where``s on component planes — XLA fuses them into the
    shading epilogue. ``class_id`` arrives as f32 (it rides the one-hot table
    contraction in annotate.render_frame; small ints are exact in both the
    default f32 and the opt-in bf16 contraction — |id| <= 256 in bf16).
    Class ids per scene/taxonomy: cone 0, tree 1, fence 2, dumper 4,
    human 5, crane base/column/boom/telescopic 6-9."""
    r_xy = jnp.sqrt(x * x + y * y)
    phase = lighting.tex_phase

    out = albedo
    # Traffic cone: two white reflective bands.
    band = ((z > 0.28) & (z < 0.40)) | ((z > 0.50) & (z < 0.58))
    out = _override(out, (class_id == 0.0) & band, _WHITE)
    # Tree: brown trunk below the canopy, foliage keeps the base green.
    trunk = (class_id == 1.0) & (r_xy < 0.45) & (z < 3.2)
    out = _override(out, trunk, _TRUNK_BROWN)
    # Fence: wire-mesh grid modulation (35 cm cells, slight darkening).
    # sin args reach ~67 on a 3.7 m panel — evaluate in f32 (bf16 ulp there
    # is ~0.25 rad, a quarter-cell of phase noise); the boolean is dtype-free.
    f32 = jnp.float32
    grid = (jnp.sin(x.astype(f32) * 18.0) * jnp.sin(z.astype(f32) * 18.0)) > 0.0
    fence_dark = (class_id == 2.0) & grid
    out = tuple(jnp.where(fence_dark, ch * 0.75, ch) for ch in out)
    # Dumper: gray cab ahead of the bed + wheel-arch grime below 0.55 m.
    cab = (class_id == 4.0) & (x > 1.2) & (z > 0.6)
    out = _override(out, cab, _CAB_GRAY)
    grime = (class_id == 4.0) & (z < 0.55)
    # Cast: lighting.dirt may be an f32 scalar, and an f32 dirt_mul would
    # silently promote the whole downstream plane chain out of bf16.
    dirt_mul = jnp.asarray(1.0 - 0.5 * lighting.dirt, out[0].dtype)
    out = tuple(jnp.where(grime, ch * dirt_mul, ch) for ch in out)
    # Worker: hi-vis vest over the torso + two reflective stripes.
    vest = (class_id == 5.0) & (z > 1.02) & (z < 1.48)
    out = _override(out, vest, _HIVIS)
    stripe_h = (class_id == 5.0) & (((z > 1.10) & (z < 1.16))
                                    | ((z > 1.30) & (z < 1.36)))
    out = _override(out, stripe_h, _WHITE)
    # Crane boom/telescopic: alternating red/white hazard stripes along the
    # member axis (local +X), 0.5 m pitch, DR phase.
    stripes = (jnp.floor(x * 2.0 + phase) % 2.0) < 1.0
    boom_tel = (class_id == 8.0) | (class_id == 9.0)
    out = _override(out, boom_tel & stripes, _WHITE)
    out = _override(out, boom_tel & ~stripes, _SIGNAL_RED)
    return out


def perturb_normal(normal: Planes3, du: Array, dv: Array,
                   strength: float = 0.6) -> Planes3:
    """Tangent-space normal perturbation from sampled normal-map offsets.

    The proxies carry no UV tangent charts, so the tangent frame is the
    standard chart-free construction: t1 = n x up (x-axis fallback near the
    poles), t2 = n x t1. ``du``/``dv`` are [-1, 1] offsets already weighted
    by the per-pixel map weight (textures.apply_image_textures with_nr), so
    unmapped pixels (du = dv = 0) return the input normal exactly up to the
    renormalize (which is exact for unit inputs). RGB-only: labels never
    read normals."""
    nx, ny, nz = normal
    dt = nx.dtype
    # t1 = normalize(n x up), up = +z -> (ny, -nx, 0); degenerate when the
    # normal is vertical: fall back to +x.
    mag = jnp.sqrt(nx * nx + ny * ny)
    deg = mag < 1e-4
    inv = 1.0 / jnp.where(deg, jnp.asarray(1.0, dt), mag)
    t1x = jnp.where(deg, jnp.asarray(1.0, dt), ny * inv)
    t1y = jnp.where(deg, jnp.asarray(0.0, dt), -nx * inv)
    t1z = jnp.zeros_like(nx)
    # t2 = n x t1.
    t2x = ny * t1z - nz * t1y
    t2y = nz * t1x - nx * t1z
    t2z = nx * t1y - ny * t1x
    s = jnp.asarray(strength, dt)
    px = nx + s * (du * t1x + dv * t2x)
    py = ny + s * (du * t1y + dv * t2y)
    pz = nz + s * (du * t1z + dv * t2z)
    rn = 1.0 / jnp.sqrt(jnp.maximum(px * px + py * py + pz * pz, 1e-12))
    return (px * rn, py * rn, pz * rn)


def shade(
    t: Array,  # (N,) hit distance, +inf on miss
    normal: Planes3,  # (N,) world-frame normal planes
    hit_pos: Planes3,  # (N,) world-frame hit position planes
    ray_d: Planes3,  # (N,) ray direction planes
    albedo: Planes3,  # (N,) base color planes
    lighting: Lighting,
    shadow_t: Array | None = None,
    texture_strength: float = 0.15,
    ao: Array | None = None,
    rough: Array | None = None,  # (N,) roughness in [0, 1] (image-tex tier)
    spec_w: Array | None = None,  # (N,) specular weight (0 = no response)
) -> Planes3:
    """Shade rays -> linear RGB planes in [0, 1], (N,) each.

    shadow_t: optional occlusion distances toward the sun (INF = lit).
    ao: optional (N,) ambient-occlusion factor in [0, 1] (contact shadows).

    The compute dtype follows ``albedo`` (f32 or bf16 component planes — see
    annotate.render_frame's shading-tier cast). All lighting scalars and
    geometry inputs are cast to it; hash noise stays f32 internally
    (``_hash_noise``). RGB in [0, 1] at bf16 precision is ~0.4% relative —
    sub-u8-level after tone-mapping.
    """
    dt = albedo[0].dtype
    cast = lambda v: jnp.asarray(v, dt)  # Lighting fields may be python floats
    nx, ny, nz = (cast(n) for n in normal)
    is_hit = jnp.isfinite(t)

    if texture_strength == 0.0:  # trace-time skip (roofline rgb ablation)
        tex = jnp.asarray(1.0, dt)
    else:
        tex = 1.0 + texture_strength * cast(lighting.tex_strength) \
            * (cast(_hash_noise(*hit_pos)) - 0.5) * 2.0

    sd = cast(lighting.sun_dir)
    ndotl = jnp.maximum(-(nx * sd[0] + ny * sd[1] + nz * sd[2]), 0.0)
    lit = (jnp.ones_like(ndotl) if shadow_t is None
           else (shadow_t >= 1e9).astype(dt))
    direct = cast(lighting.sun_intensity) * ndotl * lit

    # Hemispheric ambient: brighter for up-facing normals.
    dome_i = cast(lighting.dome_intensity)
    sky_frac = 0.5 * (1.0 + nz)
    ambient = dome_i * (0.25 + 0.35 * sky_frac)
    if ao is not None:
        ambient = ambient * cast(ao)

    # Sky background: dome color with a horizon-to-zenith gradient.
    up = jnp.clip(cast(ray_d[2]), 0.0, 1.0)
    sky_base = (0.85 + 0.15 * up) * jnp.maximum(dome_i, 0.3)

    spec = None
    if rough is not None and spec_w is not None:
        # Blinn-Phong roughness response (the MDL reflection_roughness
        # channel the reference binds, bark3.mdl:16-24): half-vector of the
        # sun and view directions; exponent from roughness so matte fabric
        # (r ~ 0.8) gets a broad sheen and smooth leaf (r ~ 0.3) a tight
        # highlight. Weighted by spec_w — 0 where no map applies, keeping
        # those pixels bit-identical to the rough=None path after the final
        # add of an exact 0.
        r = cast(rough)
        hx = -cast(ray_d[0]) - sd[0]
        hy = -cast(ray_d[1]) - sd[1]
        hz = -cast(ray_d[2]) - sd[2]
        hn = 1.0 / jnp.sqrt(jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-12))
        ndoth = jnp.maximum((nx * hx + ny * hy + nz * hz) * hn, 0.0)
        shin = 2.0 / jnp.maximum(r * r, 0.02)
        gloss = jnp.square(1.0 - r)
        spec = (cast(spec_w) * gloss * cast(lighting.sun_intensity) * lit
                * jnp.power(ndoth, shin))

    dome_c = cast(lighting.dome_color)
    # NOTE: tex/direct/ambient/sky_base feed all three channel fusion roots
    # below, but a lax.optimization_barrier here measured NEUTRAL on the real
    # chip (round 4: 1633.8 vs 1634.6 f/s) — unlike the albedo chain in
    # annotate.render_frame (1.35x), XLA does not re-evaluate these DAGs per
    # channel, so no barrier is placed.
    out = []
    for ch, alb in enumerate(albedo):
        color = (alb * tex) * (direct + ambient * dome_c[ch])
        if spec is not None:
            color = color + spec
        color = jnp.where(is_hit, color, dome_c[ch] * sky_base)
        out.append(jnp.clip(color, 0.0, 1.0))
    return tuple(out)


def screen_space_normals(pos: Planes3, ray_d: Planes3,
                         dtype=None) -> Planes3:
    """World-space normal planes from finite differences of the (H, W)
    hit-position planes — replaces the per-ray primitive-gather normal phase,
    which costs ~10x the whole ray sweep on TPU. Exact on flat interiors;
    only silhouette pixels differ from analytic normals.

    ``dtype``: optional compute dtype for the cross/normalize chain. The
    finite DIFFERENCES are always taken in the incoming (f32) precision —
    neighbor positions at ~16 m agree to ~mm, so a bf16 subtract would be
    pure cancellation noise — but the post-difference products are relative
    math and safe to run in bf16 (unit normals to ~0.4%, sub-u8 shading)."""
    def d_along(p, axis):
        app = p[:, -1:] if axis == 1 else p[-1:, :]
        d = jnp.diff(p, axis=axis, append=app)
        return d if dtype is None else d.astype(dtype)

    # n = dy x dx (dy = d/drow, dx = d/dcol), matching the original
    # jnp.cross(dy, dx) of the (H, W, 3) formulation.
    dxx, dxy, dxz = (d_along(p, 1) for p in pos)
    dyx, dyy, dyz = (d_along(p, 0) for p in pos)
    nx = dyy * dxz - dyz * dxy
    ny = dyz * dxx - dyx * dxz
    nz = dyx * dxy - dyy * dxx
    inv = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-18))
    nx, ny, nz = nx * inv, ny * inv, nz * inv
    rdx, rdy, rdz = ((r if dtype is None else r.astype(dtype)) for r in ray_d)
    flip = nx * rdx + ny * rdy + nz * rdz > 0
    sgn = jnp.where(flip, -1.0, 1.0).astype(nx.dtype)
    return nx * sgn, ny * sgn, nz * sgn


def _gamma22(c: Array) -> Array:
    """x^(1/2.2) on [0, 1] via a sqrt-chain fit instead of pow.

    pow lowers to exp(log(x)/2.2) — two transcendentals per pixel per
    channel; this uses 3 sqrt + 1 rsqrt + a 3-term correction on the
    x^(7/16) basis. Max |error| vs exact is 8e-2 of one u8 level
    (coefficients fit by least squares on [1e-4, 1]), i.e. byte-identical
    after rounding except exactly at rounding boundaries."""
    s1 = jnp.sqrt(c)  # x^(1/2)
    s2 = jnp.sqrt(s1)  # x^(1/4)
    s3 = jnp.sqrt(s2)  # x^(1/8)
    a = s1 * jax.lax.rsqrt(jnp.maximum(s3, 1e-30))  # x^(7/16)
    return a * (0.7844735 + 0.29726508 * s3 - 0.08179099 * s2)


def linear_to_srgb_u8(rgb: Planes3, h: int, w: int,
                      gamma: bool = True) -> Array:
    """Tone-map linear RGB planes [0,1] -> (H, W, 3) uint8 sRGB-ish
    (gamma 2.2). The stack is the ONLY trailing-3 tensor on the RGB path.
    The gamma chain runs in the incoming plane dtype (bf16 is ~0.4% relative
    ≈ ±1 u8 level); the final *255 + round is f32 so the u8 quantization
    itself is exact. ``gamma=False`` (roofline rgb ablation only) writes
    linear u8."""
    curve = _gamma22 if gamma else (lambda c: c)
    chans = [jnp.round(curve(jnp.clip(c, 0.0, 1.0)).astype(jnp.float32)
                       * 255.0).astype(jnp.uint8).reshape(h, w) for c in rgb]
    return jnp.stack(chans, axis=-1)
