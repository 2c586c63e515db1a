"""Gaussian keypoint-heatmap rasterization.

Heatmap targets for the keypoint backbone (BASELINE.json north star): channel
c holds ``max over keypoints of exp(-d^2 / 2 sigma^2)`` for the keypoints
assigned to c (scene/assets.keypoint_channel_table), masked by visibility.

Two implementations with identical semantics:

* ``render_heatmaps`` — pure jnp reference (materializes an (N, H, W)
  intermediate; fine for tests/small batches).
* ``render_heatmaps_pallas`` — TPU Pallas kernel: the output tile stays in
  VMEM and each keypoint accumulates via a running max, so nothing of size
  (N, H, W) ever exists. Visible keypoints are compacted to the front and
  the kernel loops a dynamic (scalar-prefetched) trip count, so pad and
  invisible slots cost nothing.

This kernel is the TPU analogue of the "native tier" called out in SURVEY.md
section 2.3 (the reference's equivalent work happened inside Isaac's closed
CUDA annotators).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def render_heatmaps(
    uv: Array,  # (N, 2) keypoint pixel coords at FULL resolution
    channel: Array,  # (N,) int32 target channel
    visible: Array,  # (N,) bool / {0,1}
    num_channels: int,
    height: int,  # heatmap height
    width: int,
    sigma: float,
    stride: float = 1.0,
) -> Array:
    """Reference jnp implementation -> (C, H, W) float32."""
    u = uv[..., 0] / stride
    v = uv[..., 1] / stride
    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    d2 = (
        (xs[None, None, :] - u[:, None, None]) ** 2
        + (ys[None, :, None] - v[:, None, None]) ** 2
    )
    g = jnp.exp(-d2 / (2.0 * sigma * sigma)) * visible[:, None, None].astype(jnp.float32)
    out = jnp.zeros((num_channels, height, width), jnp.float32)
    return out.at[channel].max(g)


def _heatmap_kernel(cnt_ref, u_ref, v_ref, ch_ref, out_ref, *, height, width,
                    inv2s2, band, align):
    """Grid = (batch,). The whole (C, H, W) heatmap for the current frame
    stays resident in VMEM; a ``fori_loop`` with a DYNAMIC trip count (the
    frame's visible-keypoint tally, scalar-prefetched via SMEM) lays down one
    Gaussian per iteration, limited to a ``band``-row window around the
    keypoint (the Gaussian is numerically zero beyond ~4.25 sigma), and
    max-merges it into its channel via a dynamic-index read-modify-write.

    The caller compacts visible keypoints to the front of the axis, so pad /
    invisible slots never reach the loop. A first version used grid
    ``(batch, keypoint)`` with one predicated step per SLOT; at the datagen
    roster's 680 slots vs ~50-120 visible, per-step grid overhead dominated —
    the compacted dynamic loop measured 16.8 -> 9.7 ms on a synthetic
    128-frame batch at 122 visible/frame, and more where visibility is
    sparser (max-merge is order-independent, so compaction is semantics-free).
    """
    out_ref[:] = jnp.zeros_like(out_ref)
    cnt = cnt_ref[0, 0, 0]

    def body(k, carry):
        u = u_ref[0, 0, k]
        v = v_ref[0, 0, k]
        ch = ch_ref[0, 0, k]
        # Sublane-aligned window start (``align``): Mosaic must statically
        # prove the dynamic row index is a multiple of 8 at hm widths beyond
        # one 128-lane tile (e.g. 192 at 768^2 input — unaligned
        # vector.load start is a compile error there). The (//8)*8 form is
        # the provable pattern; ``band`` then includes +8 rows of slack so
        # aligning DOWN never drops the +4.25-sigma top edge. At width <=
        # 128 the unaligned form compiles and is kept — it is the program
        # every headline bench number was measured on.
        y0 = jnp.clip(v.astype(jnp.int32) - band // 2, 0, height - band)
        if align:
            y0 = (y0 // 8) * 8
        # Mosaic requires integer iota; cast after.
        ys = (jax.lax.broadcasted_iota(jnp.int32, (band, width), 0) + y0).astype(jnp.float32)
        xs = jax.lax.broadcasted_iota(jnp.int32, (band, width), 1).astype(jnp.float32)
        d2 = (xs - u) ** 2 + (ys - v) ** 2
        g = jnp.exp(-d2 * inv2s2)
        cur = out_ref[0, ch, pl.ds(y0, band), :]
        out_ref[0, ch, pl.ds(y0, band), :] = jnp.maximum(cur, g)
        return carry

    jax.lax.fori_loop(0, cnt, body, 0)


def render_heatmaps_pallas(
    uv: Array,
    channel: Array,
    visible: Array,
    num_channels: int,
    height: int,
    width: int,
    sigma: float,
    stride: float = 1.0,
) -> Array:
    """Pallas TPU kernel with identical semantics to ``render_heatmaps``.

    Accepts unbatched (N, 2) or batched (B, N, 2) inputs; returns
    (C, H, W) / (B, C, H, W). VMEM budget: C*H*W*4 bytes must fit (~5.4 MB at
    83x128x128); larger maps should drop to the jnp path or a spatially
    blocked variant.
    """
    # VMEM guard: the per-frame heatmap block must fit on-chip TWICE (Mosaic
    # double-buffers the output window) alongside working registers — ~16 MB
    # v5e total, so the block itself must stay under ~8 MB. The 768^2 detect
    # eval (71 x 192 x 192 = 10.5 MB) sat between the old 12 MB guard and
    # reality and OOM'd VMEM at compile; larger maps now fall back to the
    # equivalence-pinned jnp path (eval-only cost at current configs).
    if num_channels * height * width * 4 > 8 * 1024 * 1024:
        return render_heatmaps(uv, channel, visible, num_channels, height,
                               width, sigma, stride) if uv.ndim == 2 else jax.vmap(
            lambda u, c, v: render_heatmaps(u, c, v, num_channels, height,
                                            width, sigma, stride)
        )(uv, channel, visible)

    batched = uv.ndim == 3
    if not batched:
        uv, channel, visible = uv[None], channel[None], visible[None]
    if channel.ndim == 1:
        channel = jnp.broadcast_to(channel, visible.shape)
    B, n = uv.shape[0], uv.shape[1]
    # Compact visible keypoints to the front of the axis so the kernel's
    # dynamic loop only ever touches real work (stable sort on the visibility
    # bit; max-merge is order-independent so reordering is semantics-free).
    order = jnp.argsort(jnp.where(visible, 0, 1).astype(jnp.int32), axis=1)
    uv = jnp.take_along_axis(uv, order[..., None], axis=1)
    channel = jnp.take_along_axis(channel, order, axis=1)
    cnt = visible.sum(axis=1).astype(jnp.int32)[:, None, None]
    # Shape (B, 1, n) so the per-frame SMEM block (1, 1, n) equals the array's
    # trailing dims (the Mosaic block-shape divisibility rule).
    u = (uv[..., 0] / stride).astype(jnp.float32)[:, None, :]
    v = (uv[..., 1] / stride).astype(jnp.float32)[:, None, :]
    ch = channel.astype(jnp.int32)[:, None, :]
    inv2s2 = 1.0 / (2.0 * sigma * sigma)
    # Row window covering +-4.25 sigma (beyond that exp < 1.3e-8 of peak),
    # rounded to the sublane granule; wide maps (width > one 128-lane tile)
    # need an 8-aligned window start, paid for with +8 rows of slack.
    align = width > 128
    band = int(min(height,
                   max(8, -((-2 * int(4.25 * sigma + 1)) // 8) * 8)
                   + (8 if align else 0)))

    kernel = functools.partial(_heatmap_kernel, height=height, width=width,
                               inv2s2=inv2s2, band=band, align=align)
    smem = lambda k: pl.BlockSpec((1, 1, k), lambda b: (b, 0, 0), memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, num_channels, height, width), jnp.float32),
        grid=(B,),
        in_specs=[smem(1), smem(n), smem(n), smem(n)],
        out_specs=pl.BlockSpec(
            (1, num_channels, height, width), lambda b: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(cnt, u, v, ch)
    return out if batched else out[0]


def frame_heatmaps(
    kpt_uv: Array,  # (O, K, 2)
    kpt_visible: Array,  # (O, K)
    kpt_channel: Array,  # (O, K) with -1 padding
    num_channels: int,
    height: int,
    width: int,
    sigma: float,
    stride: float,
    use_pallas: bool = False,
) -> Array:
    """Flatten per-object keypoints and rasterize one frame's target heatmaps."""
    uv = kpt_uv.reshape(-1, 2)
    vis = kpt_visible.reshape(-1) & (kpt_channel.reshape(-1) >= 0)
    ch = jnp.maximum(kpt_channel.reshape(-1), 0)
    fn = render_heatmaps_pallas if use_pallas else render_heatmaps
    return fn(uv, ch, vis, num_channels, height, width, sigma, stride)
