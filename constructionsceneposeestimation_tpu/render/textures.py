"""Image-texture sampling from the reference's REAL texture assets — as MXU
contractions against low-rank factors, never per-pixel gathers.

The reference binds these images as MDL materials (bark:
generate_construction_data.py:1286; tree channel maps:
cad_models/tree/materials/bark3.mdl; garment fabrics under people_assets).
A per-pixel image gather (``tex[idx]`` at 262k indices) is the measured 14x
TPU anti-pattern (CLAUDE.md / docs/PERFORMANCE.md), so sampling here uses the
separable low-rank form baked by tools/build_texture_atlas.py:

    img[u, v, c] ~= sum_k U[u, k, c] * V[v, k, c]

Runtime per pixel: quantize (u, v) to B bins, build ONE combined one-hot over
(texture, bin) rows — (T*B, N), generation fused into the dot by XLA — and
contract against the packed factor tables:

    F = U_packed^T @ onehot_u    # (3K, N)   one MXU dot
    G = V_packed^T @ onehot_v    # (3K, N)   one MXU dot
    color_c = sum_k F[cK+k] * G[cK+k]        # VPU epilogue, fused

This is the same machinery as the per-instance albedo table in
annotate.render_frame, widened from O+2 rows to T*B=1024 rows. It rides the
image-texture tier (``--image-textures`` on viz/hifi/datagen paths), OFF by
default on the headline bench path.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
Planes3 = Tuple[Array, Array, Array]

_DATA = os.path.join(os.path.dirname(__file__), "..", "..", "data",
                     "texture_factors.npz")

# Fixed slot order (build_texture_atlas.SOURCES + NR_SOURCES); index = tex
# id at runtime. The *_nr slots pack [nx, ny, roughness] composites (normal
# z reconstructed at runtime) — the material channels the reference's MDL
# binds (cad_models/tree/materials/bark3.mdl:7-42) from the images that
# genuinely ship (the per-garment {ao,normal,curvature,seam} sets, color
# charts and microskin sources are LFS stubs upstream — PARITY.md).
TEX = {"bark": 0, "branches": 1, "leaf": 2, "bark_rough": 3,
       "twill": 4, "denim": 5, "ground": 6, "dirt": 7, "cot_ox": 8,
       "denim_nr": 9, "cot_ox_nr": 10, "twill_nr": 11, "leaf_nr": 12}


class TextureFactors(NamedTuple):
    """Packed low-rank factor tables (device arrays; static bins/rank)."""
    U: Array  # (T*B, 3K) f32 — rows grouped per texture
    V: Array  # (T*B, 3K)
    bins: int
    rank: int
    n_tex: int


@functools.lru_cache(maxsize=1)
def _load_np(path: str = _DATA):
    z = np.load(os.path.abspath(path))
    return (z["U"].astype(np.float32), z["V"].astype(np.float32),
            int(z["bins"]), int(z["rank"]), [str(n) for n in z["names"]])


def load_factors(path: str = _DATA) -> TextureFactors:
    """Load + pack the committed factor file -> device tables."""
    U, V, bins, rank, names = _load_np(path)
    assert [n for n in names] == sorted(TEX, key=TEX.get), names
    T = U.shape[0]
    # (T, B, K, 3) -> (T*B, 3K) with channel-major columns [c*K + k].
    pack = lambda a: jnp.asarray(
        a.transpose(0, 1, 3, 2).reshape(T * bins, 3 * rank))
    return TextureFactors(U=pack(U), V=pack(V), bins=bins, rank=rank, n_tex=T)


def sample(factors: TextureFactors, u: Array, v: Array,
           tex_id: Array) -> Planes3:
    """Sample per-pixel textures -> linear RGB planes, (N,) each.

    u, v: (N,) coordinates, any real (wrapped mod 1 — all sources tile).
    tex_id: (N,) int32 slot id in [0, T).
    """
    B, K, T = factors.bins, factors.rank, factors.n_tex
    ub = (jnp.floor(u * B).astype(jnp.int32)) % B
    vb = (jnp.floor(v * B).astype(jnp.int32)) % B
    rows_u = tex_id * B + ub  # (N,)
    rows_v = tex_id * B + vb
    iota = jnp.arange(T * B, dtype=jnp.int32)[:, None]
    # One-hot operands: XLA fuses the compare into the dot's operand read, so
    # the (T*B, N) matrices never round-trip HBM (same pattern as the
    # instance-table contraction in annotate.render_frame).
    oh_u = (iota == rows_u[None, :]).astype(jnp.float32)
    oh_v = (iota == rows_v[None, :]).astype(jnp.float32)
    F = jnp.einsum("rc,rn->cn", factors.U, oh_u,
                   precision=jax.lax.Precision.DEFAULT)  # (3K, N)
    G = jnp.einsum("rc,rn->cn", factors.V, oh_v,
                   precision=jax.lax.Precision.DEFAULT)
    out = []
    for c in range(3):
        s = jnp.sum(F[c * K:(c + 1) * K] * G[c * K:(c + 1) * K], axis=0)
        out.append(jnp.clip(s, 0.0, 1.0))
    return tuple(out)


def _mix(albedo: Planes3, tex: Planes3, w: Array) -> Planes3:
    return tuple(a * (1.0 - w) + t_ * w for a, t_ in zip(albedo, tex))


def apply_image_textures(
    albedo: Planes3,  # procedural albedo planes (after procedural_albedo)
    lx: Array, ly: Array, lz: Array,  # hit position, owning-instance frame
    pwx: Array, pwy: Array,  # world-frame hit position (ground UVs)
    class_id: Array,  # (N,) f32 taxonomy class (-1 ground, -2 sky)
    factors: TextureFactors,
    tex_phase: Array | float = 0.0,  # DR offset (sample/lighting.py jitter)
    with_nr: bool = False,
):
    """Class-conditioned image texturing over the procedural base.

    Mapping (all UVs from local/world coordinate planes — the proxies carry
    no UV charts, so trunk/limbs use cylindrical projection and broad
    surfaces use planar tiling, standard projective texturing):

      ground (-1):   `ground` planar 6 m tiles, 45% blend over base dirt
      tree (1) trunk: `bark` cylindrical, ambient scaled by `bark_rough`
      tree (1) crown: `leaf` + `branches` planar tiles, 50% blend
      dumper (4) low: `dirt` grime mask modulates the existing two-tone
      human (5) legs:  `denim` cargo-pant wrap, 50% blend
      human (5) vest:  `twill` fabric weave modulates the hi-vis band
      human (5) chest: `cot_ox` cotton-oxford shirt, 60% blend

    ``with_nr=True`` additionally samples the packed [nx, ny, roughness]
    composites (`*_nr` slots) for the surfaces that ship normal/roughness
    maps (leaf crown, denim/twill/cot_ox fabrics) and returns
    ``(albedo, (du, dv, rough, w_nr))``: tangent-space normal offsets in
    [-1, 1], roughness in [0, 1], and a per-pixel weight that is 0 where no
    map applies. Labels never read any of this (geometry-only)."""
    one = jnp.ones_like(lx)
    r_xy = jnp.sqrt(lx * lx + ly * ly)
    theta = jnp.arctan2(ly, lx) * (0.5 / np.pi) + 0.5  # [0, 1)
    phase = jnp.asarray(tex_phase, lx.dtype)

    # Per-pixel (u, v, tex, weight) via the same mask ladder as
    # procedural_albedo — selects fuse; only ONE sample pair runs.
    u = pwx * (1.0 / 6.0) + phase
    v = pwy * (1.0 / 6.0)
    tex = jnp.full_like(class_id, TEX["ground"])
    w = jnp.where(class_id == -1.0, 0.45, 0.0)

    def place(mask, uu, vv, tid, ww):
        nonlocal u, v, tex, w
        u = jnp.where(mask, uu, u)
        v = jnp.where(mask, vv, v)
        tex = jnp.where(mask, float(tid), tex)
        w = jnp.where(mask, ww, w)

    is_tree = class_id == 1.0
    trunk = is_tree & (r_xy < 0.45) & (lz < 3.2)
    crown = is_tree & ~trunk
    place(trunk, theta + phase, lz * (1.0 / 2.5), TEX["bark"], 0.85)
    # Crown: leaf color tiles at 1.5 m; branches add silhouette-scale
    # structure at 4 m (two scales from one sample by alternating texture
    # per 4 m cell would double the sample cost — leaf carries the look).
    place(crown, lx * (1.0 / 1.5) + phase, lz * (1.0 / 1.5), TEX["leaf"], 0.5)

    is_dumper = class_id == 4.0
    place(is_dumper & (lz < 0.55), lx * 0.35 + phase, ly * 0.35,
          TEX["dirt"], 0.5)

    is_human = class_id == 5.0
    vest = is_human & (lz > 1.02) & (lz < 1.48)
    legs = is_human & (lz <= 1.02)
    shirt = is_human & (lz >= 1.48) & (lz < 1.58)  # shoulders/upper chest
    # Fabric weave modulates (multiplies) rather than replaces the hi-vis
    # color: sample grayscale twill, blend toward albedo*twill.
    place(vest, theta * 4.0 + phase, lz * 2.0, TEX["twill"], 0.0)  # w below
    place(legs, theta * 2.0 + phase, lz * 1.2, TEX["denim"], 1.0)
    place(shirt, theta * 3.0 + phase, lz * 1.6, TEX["cot_ox"], 1.0)

    tex_rgb = sample(factors, u, v, tex.astype(jnp.int32))

    # Garment tints: the shipped fabric diffuses are channel-packed
    # GRAYSCALE (R = diff); the color charts that would colorize them are
    # LFS stubs upstream (PARITY.md), so the tier tints them to standard
    # work-wear colors in linear space — tint = target_color / mean_gray
    # (measured means: denim 0.096, cot_ox 0.328), making the garment zones
    # REPLACE the base albedo (w=1) with [target hue x fabric structure].
    one3 = jnp.ones_like(lx)
    tint = [one3, one3, one3]
    for mask, col in ((legs, (0.83, 1.15, 2.90)),     # indigo cargo pants
                      (shirt, (0.95, 1.08, 1.33))):   # blue-gray oxford
        tint = [jnp.where(mask, jnp.asarray(c, lx.dtype), t_)
                for c, t_ in zip(col, tint)]
    tex_rgb = tuple(jnp.clip(t_ * s, 0.0, 1.0)
                    for t_, s in zip(tint, tex_rgb))

    out = _mix(albedo, tex_rgb, w)
    # Multiplicative fabric weave on the vest band: the twill sample (w=0
    # above, so _mix left the hi-vis base) modulates instead of replacing —
    # the EN ISO hue survives, the weave structure shows.
    weave = 0.6 + 0.8 * tex_rgb[0]
    out = tuple(jnp.where(vest, a * weave, o)
                for a, o in zip(albedo, out))
    if not with_nr:
        return out

    # Normal/roughness composite sample — same UVs, the matching *_nr slot.
    # One extra sample() pair covers every mapped surface; weight 0 elsewhere
    # keeps the un-mapped pixels' shading bit-identical (du=dv=0, w_nr=0).
    crown = (class_id == 1.0) & ~((r_xy < 0.45) & (lz < 3.2))
    nr_tex = jnp.zeros_like(class_id)
    w_nr = jnp.zeros_like(lx)
    for mask, tid, ww in ((crown, TEX["leaf_nr"], 0.8),
                          (legs, TEX["denim_nr"], 1.0),
                          (vest, TEX["twill_nr"], 1.0),
                          (shirt, TEX["cot_ox_nr"], 1.0)):
        nr_tex = jnp.where(mask, float(tid), nr_tex)
        w_nr = jnp.where(mask, ww, w_nr)
    nx_s, ny_s, rough = sample(factors, u, v, nr_tex.astype(jnp.int32))
    du = (2.0 * nx_s - 1.0) * w_nr
    dv = (2.0 * ny_s - 1.0) * w_nr
    return out, (du, dv, rough, w_nr)
