"""Fused Pallas TPU kernel for multi-peak heatmap decoding.

One HBM read of the heatmaps produces the final per-channel top-K sub-pixel
peaks: relu -> 3x3 Gaussian blur -> 3x3 NMS -> K max+suppress rounds ->
3x3 log-neighborhood DARK refinement, all inside VMEM. The pure-XLA pipeline
(ops/decode.extract_peaks) traverses HBM ~10x per map (blur pads, maxpool
pads, peak select, per-round block-map reads, neighborhood einsums); this
kernel is the "native tier" answer (SURVEY.md section 2.3) for the decode
north star (BASELINE.json: >=5k img/s).

Semantics match ops/decode.extract_peaks exactly EXCEPT tie-breaking order of
equal-score peaks (both orders are valid top-K sets) and neighborhood content
at border peaks, where DARK refinement is zeroed by the interior gate in both
implementations anyway.

TPU notes (per the Pallas guide + CLAUDE.md):
 - edge padding is done with ``pltpu.roll`` + an iota-edge fix instead of
   jnp.pad (no lane-misaligned copies, no H+2 tiling break);
 - the K selection rounds never re-write the (M, H, W) peak map: previously
   taken entries are re-suppressed in the extracted (M, W) row vector, so a
   round costs ONE read of the map (one-hot row extraction) plus vector ops;
 - 3x3 neighborhoods come from two batched MXU ``dot_general`` contractions
   with one-hot selector matrices (scalar gathers are the documented TPU
   anti-pattern);
 - integer iota then cast; python-float constants only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _shift_rows(a: Array, dy: int, row: Array, h: int) -> Array:
    """a[..., y - dy, :] with edge clamp, via roll + border fix. ``row`` is a
    broadcasted row-index iota of a's shape."""
    rolled = pltpu.roll(a, dy % h, axis=a.ndim - 2)  # roll needs shift >= 0
    if dy > 0:
        return jnp.where(row < dy, a, rolled)
    return jnp.where(row >= h + dy, a, rolled)


def _shift_lanes(a: Array, dx: int, col: Array, w: int) -> Array:
    rolled = pltpu.roll(a, dx % w, axis=a.ndim - 1)
    if dx > 0:
        return jnp.where(col < dx, a, rolled)
    return jnp.where(col >= w + dx, a, rolled)


def _peak_kernel(x_ref, sc_ref, u_ref, v_ref, *, m, h, w, k_peaks, blur, eps):
    x = jnp.maximum(x_ref[:], 0.0)  # (M, H, W)
    row = jax.lax.broadcasted_iota(jnp.int32, (m, h, w), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (m, h, w), 2)

    if blur:
        up = _shift_rows(x, 1, row, h)
        dn = _shift_rows(x, -1, row, h)
        b1 = 0.25 * up + 0.5 * x + 0.25 * dn
        lf = _shift_lanes(b1, 1, col, w)
        rt = _shift_lanes(b1, -1, col, w)
        hb = 0.25 * lf + 0.5 * b1 + 0.25 * rt
    else:
        hb = x

    # 3x3 max-pool of the blurred map, edge-clamped.
    m1 = jnp.maximum(jnp.maximum(_shift_rows(hb, 1, row, h), hb),
                     _shift_rows(hb, -1, row, h))
    mp = jnp.maximum(jnp.maximum(_shift_lanes(m1, 1, col, w), m1),
                     _shift_lanes(m1, -1, col, w))
    peak = jnp.where(hb >= mp, x, 0.0)  # scores = RAW amplitude

    iota_h = jax.lax.broadcasted_iota(jnp.int32, (m, h), 1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (m, w), 1)

    # K max+suppress rounds on the row-max factorization. The (M, H, W) map
    # is read once per round (one-hot row extraction); suppression of already
    # taken entries happens in the extracted (M, W) vector, never in the map.
    row_max = jnp.max(peak, axis=2)  # (M, H)
    taken = []  # (r, c) per round, each (M,)
    rs, cs, vs = [], [], []
    for _ in range(k_peaks):
        mval = jnp.max(row_max, axis=1, keepdims=True)  # (M, 1)
        r = jnp.min(jnp.where(row_max == mval, iota_h, h), axis=1)  # (M,)
        selr = iota_h == r[:, None]  # (M, H)
        # Mosaic can't minor-dim-reshape i1 vectors: contract the f32 one-hot
        # against the map on the MXU instead of where(selr[:, :, None], ...)
        # — a batched (1, H) @ (H, W) matvec is ~free vs a VPU full-map pass.
        selr_f = selr.astype(jnp.float32)
        rowvec = jax.lax.dot_general(
            selr_f[:, None, :], peak, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0, :]
        for rj, cj in taken:
            rowvec = jnp.where((rj[:, None] == r[:, None])
                               & (iota_w == cj[:, None]), 0.0, rowvec)
        cval = jnp.max(rowvec, axis=1, keepdims=True)
        c = jnp.min(jnp.where(rowvec == cval, iota_w, w), axis=1)
        remaining = jnp.max(jnp.where(iota_w == c[:, None], 0.0, rowvec),
                            axis=1)
        row_max = jnp.where(selr, remaining[:, None], row_max)
        taken.append((r, c))
        rs.append(r)
        cs.append(c)
        vs.append(cval[:, 0])

    # 3x3 blurred neighborhoods for all K peaks at once, via two batched MXU
    # contractions with one-hot selectors. Windows use a CLAMPED START
    # (contiguous rows/cols) rather than clamped duplicate indices — they
    # differ only at border peaks, where refinement is zeroed anyway.
    py = jnp.stack(rs, axis=1)  # (M, K)
    px = jnp.stack(cs, axis=1)
    y0 = jnp.clip(py - 1, 0, h - 3)
    x0 = jnp.clip(px - 1, 0, w - 3)
    d3 = jax.lax.broadcasted_iota(jnp.int32, (m, k_peaks, 3), 2)
    ry = y0[:, :, None] + d3  # (M, K, 3)
    rx = x0[:, :, None] + d3
    ih = jax.lax.broadcasted_iota(jnp.int32, (m, k_peaks, 3, h), 3)
    iw = jax.lax.broadcasted_iota(jnp.int32, (m, k_peaks, 3, w), 3)
    sy = (ry[..., None] == ih).astype(jnp.float32).reshape(m, 3 * k_peaks, h)
    sx = (rx[..., None] == iw).astype(jnp.float32).reshape(m, 3 * k_peaks, w)
    rows_nb = jax.lax.dot_general(  # (M, 3K, W)
        sy, hb, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    prod = jax.lax.dot_general(  # (M, 3K[dy], 3K[dx])
        rows_nb, sx, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

    # DARK refinement per peak on (M,) vectors; diagonal 3x3 blocks of prod.
    for k in range(k_peaks):
        ln = [jnp.log(jnp.maximum(prod[:, 3 * k + dy, 3 * k + dx], eps))
              for dy in range(3) for dx in range(3)]
        dx_ = 0.5 * (ln[5] - ln[3])
        dy_ = 0.5 * (ln[7] - ln[1])
        dxx = ln[5] - 2.0 * ln[4] + ln[3]
        dyy = ln[7] - 2.0 * ln[4] + ln[1]
        dxy = 0.25 * (ln[8] - ln[6] - ln[2] + ln[0])
        det = dxx * dyy - dxy * dxy
        det_safe = jnp.where(jnp.abs(det) < eps, jnp.sign(det) * eps + eps,
                             det)
        off_x = -(dyy * dx_ - dxy * dy_) / det_safe
        off_y = -(dxx * dy_ - dxy * dx_) / det_safe
        pxk = px[:, k]
        pyk = py[:, k]
        interior = (pxk > 0) & (pxk < w - 1) & (pyk > 0) & (pyk < h - 1)
        sane = ((dxx < 0.0) & (dyy < 0.0)
                & (jnp.abs(off_x) < 1.0) & (jnp.abs(off_y) < 1.0))
        ok = interior & sane
        u = pxk.astype(jnp.float32) + jnp.where(ok, off_x, 0.0)
        v = pyk.astype(jnp.float32) + jnp.where(ok, off_y, 0.0)
        sc_ref[:, k:k + 1] = vs[k][:, None]
        u_ref[:, k:k + 1] = u[:, None]
        v_ref[:, k:k + 1] = v[:, None]


def extract_peaks_pallas(heatmaps: Array, max_peaks: int = 8,
                         blur: bool = True, eps: float = 1e-8,
                         block_maps: int = 32, interpret: bool = False):
    """(..., H, W) -> (uv (..., K, 2), scores (..., K)) — fused TPU kernel.

    Drop-in for decode.extract_peaks (same outputs, modulo equal-score peak
    order). Requires W % 128 == 0 and H % 8 == 0; callers should fall back to
    the XLA path otherwise (decode.extract_peaks handles the dispatch).
    """
    *lead, h, w = heatmaps.shape
    if w % 128 != 0 or h % 8 != 0:
        raise ValueError(f"extract_peaks_pallas needs lane/sublane-aligned "
                         f"maps, got {(h, w)}")
    n = 1
    for d in lead:
        n *= d
    x = heatmaps.reshape(n, h, w).astype(jnp.float32)
    m = block_maps
    n_pad = -(-n // m) * m
    if n_pad != n:
        x = jnp.concatenate(
            [x, jnp.zeros((n_pad - n, h, w), jnp.float32)], axis=0)

    kernel = functools.partial(_peak_kernel, m=m, h=h, w=w,
                               k_peaks=max_peaks, blur=blur, eps=eps)
    out_spec = pl.BlockSpec((m, max_peaks), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    sc, u, v = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((n_pad, max_peaks), jnp.float32)] * 3,
        grid=(n_pad // m,),
        in_specs=[pl.BlockSpec((m, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[out_spec] * 3,
        interpret=interpret,
    )(x)
    uv = jnp.stack([u[:n], v[:n]], axis=-1).reshape(tuple(lead)
                                                    + (max_peaks, 2))
    return uv, sc[:n].reshape(tuple(lead) + (max_peaks,))
