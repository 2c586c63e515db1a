"""Bake the reference's REAL texture images into low-rank factor tables.

The reference ships usable texture data that its script binds as MDL
materials (generate_construction_data.py:1286 BarkDecidious0107_M.jpg;
cad_models/tree/materials/bark3.mdl basecolor/roughness channels;
people_assets garment fabrics). Isaac samples them as UV-mapped images on
the GPU; a per-pixel image gather is the measured 14x TPU anti-pattern
(CLAUDE.md), so the TPU-native form is LOW-RANK FACTORIZATION:

    img[u, v, c]  ~=  sum_k  U[u, k, c] * V[v, k, c]      (rank K SVD)

and runtime sampling becomes two one-hot MXU contractions (row factor and
column factor) plus a K-term elementwise dot — no gathers at all
(render/textures.py). Rank 12 at 128x128 bins keeps the *look* (the
high-frequency residual is carried by the existing hash-noise detail term);
the factors for all textures fit in ~200 KB and are committed at
data/texture_factors.npz.

Images are converted sRGB -> linear before factorization (shading multiplies
albedo in linear space). Single-channel sources (roughness/masks) are
replicated to 3 channels.

Usage: python tools/build_texture_atlas.py [--bins 128] [--rank 12]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

REF = "/root/reference"

# (name, path, mode) — mode: "rgb" | "r" (take red channel) | "gray16"
SOURCES = [
    # Bound by the reference script itself (:1286) for the trees.
    ("bark", f"{REF}/textures/BarkDecidious0107_M.jpg", "rgb"),
    ("branches", f"{REF}/textures/Branches0018_1_S.png", "rgb"),
    # Tree MDL channel maps (cad_models/tree/materials/bark3.mdl).
    ("leaf", f"{REF}/cad_models/tree/materials/textures/"
             "beech_leaf_basecolor.png", "rgb"),
    ("bark_rough", f"{REF}/cad_models/tree/materials/textures/"
                   "bark3_roughness.png", "gray16"),
    # DHGen garment fabrics (people_assets ... vest/worker materials).
    ("twill", f"{REF}/people_assets/GENERIC_LIBRAIRIES/PUBLISH/"
              "65d4d7ecc7e4561af478d00d/textures/"
              "polyester_twill_multi_R_diff_G_rough_B_dirt.jpg", "r"),
    ("denim", f"{REF}/people_assets/GENERIC_LIBRAIRIES/PUBLISH/"
              "65d4d7ecc7e4561af478d00d/textures/denim_R_diff_G_mask.jpg",
     "r"),
    # Site ground / grime sources.
    ("ground", f"{REF}/people_assets/GENERIC_LIBRAIRIES/PUBLISH/"
               "6615516bb8a0782564bd8651/Textures/Ground/HiLowNoise_D.jpg",
     "rgb"),
    ("dirt", f"{REF}/people_assets/GENERIC_LIBRAIRIES/PUBLISH/"
             "65d4d7ecc7e4561af478d00d/textures/"
             "spongy_concrete_dirt_mask.jpg", "r"),
    # Worker shirt fabric (round 5): cotton-oxford diffuse — the REAL
    # non-stub garment appearance data that ships. NOTE the per-garment map
    # sets VERDICT round 4 names (GARMENT_DEV/PANT|SHIRT .../textures/
    # {ao,normal,curvature,seam}.png, the color charts, microskin/iris/hair)
    # are ALL git-LFS pointer stubs upstream (132-byte files) — verified by
    # byte inspection; PARITY.md People row documents the full inventory.
    ("cot_ox", f"{REF}/people_assets/GENERIC_LIBRAIRIES/PUBLISH/"
               "65d4d7ecc7e4561af478d00d/textures/cot_ox_R_diff_G_mask.jpg",
     "r"),
]

_PUB = f"{REF}/people_assets/GENERIC_LIBRAIRIES/PUBLISH"
_TREE = f"{REF}/cad_models/tree/materials/textures"

# Packed normal+roughness composites (round 5, VERDICT ask 7): channel
# layout [nx, ny, roughness] so ONE low-rank sample yields the whole
# material response (z is reconstructed at runtime). Normal maps and
# roughness/data channels are loaded RAW (no sRGB decode — they encode
# vectors/scalars, not colors). These realize the MDL channel bindings the
# reference declares (cad_models/tree/materials/bark3.mdl:7-42 roughness +
# normal + detail bump) from the images that actually ship.
# (name, normal_path, rough_path, rough_channel)
NR_SOURCES = [
    ("denim_nr",
     f"{_PUB}/65d4d7ecc7e4561af478d00d/textures/denim_norm.jpg",
     f"{_PUB}/65d4d7ecc7e4561af478d00d/textures/"
     "denim_R_rough_G_ao_B_height.jpg", 0),
    ("cot_ox_nr",
     f"{_PUB}/65d4d7ecc7e4561af478d00d/textures/cot_ox_norm.jpg",
     f"{_PUB}/65d4d7ecc7e4561af478d00d/textures/"
     "cot_ox_R_rough_G_ao_B_height.jpg", 0),
    ("twill_nr",
     f"{_PUB}/65d4d7ecc7e4561af478d00d/textures/polyester_twill_norm.jpg",
     f"{_PUB}/65d4d7ecc7e4561af478d00d/textures/"
     "polyester_twill_multi_R_diff_G_rough_B_dirt.jpg", 1),
    ("leaf_nr",
     f"{_TREE}/beech_leaf_normal.png",
     f"{_TREE}/beech_leaf_roughness.png", 0),
]


def load_linear(path: str, mode: str, bins: int) -> np.ndarray:
    """Load -> (bins, bins, 3) linear-RGB float32 in [0, 1]."""
    from PIL import Image

    im = Image.open(path)
    if mode == "gray16":
        a = np.asarray(im, np.float32) / 65535.0
        a = np.repeat(a[..., None], 3, -1)
        srgb = False
    else:
        im = im.convert("RGB")
        a = np.asarray(im, np.float32) / 255.0
        if mode == "r":
            a = np.repeat(a[..., 0:1], 3, -1)
        srgb = True
    # Box-downsample to bins x bins (crop to a multiple first).
    h, w, _ = a.shape
    s = min(h // bins, w // bins)
    if s >= 1:
        a = a[: bins * s, : bins * s]
        a = a.reshape(bins, s, bins, s, 3).mean((1, 3))
    else:  # upscale tiny images by nearest
        yi = (np.arange(bins) * h // bins).clip(0, h - 1)
        xi = (np.arange(bins) * w // bins).clip(0, w - 1)
        a = a[yi][:, xi]
    if srgb:
        a = np.power(a, 2.2, dtype=np.float32)
    return a.astype(np.float32)


def _load_raw(path: str, bins: int) -> np.ndarray:
    """Load -> (bins, bins, C) float32 in [0, 1], NO sRGB decode (data maps:
    normals, roughness). 16-bit sources divide by 65535."""
    from PIL import Image

    im = Image.open(path)
    a = np.asarray(im, np.float32)
    scale = 65535.0 if a.dtype == np.float32 and a.max() > 256.0 else 255.0
    a = a / scale
    if a.ndim == 2:
        a = a[..., None]
    h, w = a.shape[:2]
    s = min(h // bins, w // bins)
    if s >= 1:
        a = a[: bins * s, : bins * s]
        a = a.reshape(bins, s, bins, s, -1).mean((1, 3))
    else:
        yi = (np.arange(bins) * h // bins).clip(0, h - 1)
        xi = (np.arange(bins) * w // bins).clip(0, w - 1)
        a = a[yi][:, xi]
    return a.astype(np.float32)


def load_nr(norm_path: str, rough_path: str, rough_ch: int,
            bins: int) -> np.ndarray:
    """Composite [nx, ny, roughness] plane set, all raw-linear."""
    n = _load_raw(norm_path, bins)
    r = _load_raw(rough_path, bins)
    out = np.empty((bins, bins, 3), np.float32)
    out[..., 0] = n[..., 0]
    out[..., 1] = n[..., 1 % n.shape[-1]]
    out[..., 2] = r[..., min(rough_ch, r.shape[-1] - 1)]
    return out


def factorize(img: np.ndarray, rank: int):
    """(B, B, 3) -> U (B, K, 3), V (B, K, 3) with img[...,c] ~= U_c @ V_c^T."""
    B = img.shape[0]
    U = np.zeros((B, rank, 3), np.float32)
    V = np.zeros((B, rank, 3), np.float32)
    err = []
    for c in range(3):
        u, s, vt = np.linalg.svd(img[..., c], full_matrices=False)
        sq = np.sqrt(s[:rank])
        U[:, :, c] = u[:, :rank] * sq[None, :]
        V[:, :, c] = vt[:rank].T * sq[None, :]
        rec = U[:, :, c] @ V[:, :, c].T
        err.append(float(np.sqrt(np.mean((rec - img[..., c]) ** 2))))
    return U, V, err


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bins", type=int, default=128)
    ap.add_argument("--rank", type=int, default=12)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "data", "texture_factors.npz"))
    args = ap.parse_args()

    names, Us, Vs = [], [], []
    items = [(name, lambda p=path, m=mode: load_linear(p, m, args.bins),
              path) for name, path, mode in SOURCES]
    items += [(name, lambda np_=npth, rp=rpth, rc=rch: load_nr(
        np_, rp, rc, args.bins), npth)
        for name, npth, rpth, rch in NR_SOURCES]
    for name, loader, path in items:
        img = loader()
        U, V, err = factorize(img, args.rank)
        # PSNR of the rank-K reconstruction in linear space.
        psnr = -20.0 * np.log10(max(np.mean(err), 1e-6))
        print(f"{name:12s} {os.path.basename(path):45s} "
              f"rank-{args.rank} PSNR {psnr:5.1f} dB")
        names.append(name)
        Us.append(U)
        Vs.append(V)

    out = os.path.abspath(args.out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out,
        names=np.asarray(names),
        U=np.stack(Us).astype(np.float16),  # (T, B, K, 3)
        V=np.stack(Vs).astype(np.float16),
        bins=np.int32(args.bins),
        rank=np.int32(args.rank),
    )
    print(f"wrote {out} ({os.path.getsize(out) / 1024:.0f} KB)")


if __name__ == "__main__":
    main()
