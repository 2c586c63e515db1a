"""End-to-end evaluation pipelines (BASELINE.json configs 3 + 4).

* ``evaluate_decode``: render frames -> GT heatmaps -> DARK/soft-argmax decode
  -> PCK@alpha against the projected GT keypoints. With GT heatmaps this
  measures the decode pipeline's own error floor; with model heatmaps it
  measures the trained network.
* ``evaluate_equipment_6dof``: decoded equipment keypoints -> batched PnP ->
  camera-frame pose -> ADD / ADD-0.1d against the ground-truth pose derived
  from the scene parameters.

Everything stays on-device; only final scalars come back to the host.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..core import camera as cam_mod
from ..core import rotation
from ..ops import decode as decode_ops
from ..ops import pnp as pnp_ops
from ..scene import assets
from . import metrics

Array = jax.Array


def decode_heatmaps(heatmaps: Array, stride: float, use_dark: bool = True):
    """(B, C, h, w) -> uv at full res (B, C, 2), scores (B, C)."""
    fn = decode_ops.dark_decode if use_dark else decode_ops.soft_argmax
    uv, score = fn(heatmaps)
    return uv * stride, score


def evaluate_decode(
    batch, roster, stride: float, alpha: float = 0.5, use_dark: bool = True,
    score_threshold: float = 0.3, max_peaks: int = 8,
) -> Dict[str, Array]:
    """PCK of decoded heatmap keypoints vs the projected GT (pipeline
    FrameBatch). Channels are class-level and may hold one blob per instance
    (20 fence panels share a channel), so decoding extracts the top
    ``max_peaks`` local maxima per channel and each GT keypoint is scored
    against its nearest above-threshold peak."""
    uv_pk, sc_pk = decode_ops.extract_peaks(batch.heatmaps, max_peaks)  # (B,C,P,2)
    uv_pk = uv_pk * stride
    ch = jnp.asarray(roster.inst_kpt_channel)  # (O, K)
    gt_uv = batch.kpt_uv  # (B, O, K, 2)
    gt_vis = batch.kpt_visible  # (B, O, K)

    ch_flat = ch.reshape(-1)  # (OK,)
    gt_flat = gt_uv.reshape(gt_uv.shape[0], -1, 2)  # (B, OK, 2)
    vis_flat = gt_vis.reshape(gt_vis.shape[0], -1)  # (B, OK)
    pk_per_kpt = jnp.take(uv_pk, jnp.maximum(ch_flat, 0), axis=1)  # (B, OK, P, 2)
    sc_per_kpt = jnp.take(sc_pk, jnp.maximum(ch_flat, 0), axis=1)  # (B, OK, P)
    d_all = jnp.linalg.norm(pk_per_kpt - gt_flat[..., None, :], axis=-1)
    d_all = jnp.where(sc_per_kpt >= score_threshold, d_all, jnp.inf)
    d = jnp.min(d_all, axis=-1)  # nearest qualifying peak
    valid = vis_flat & (ch_flat >= 0)[None, :]
    score_per_kpt = jnp.max(sc_per_kpt, -1)

    # Normalization: object 2D bbox extent from its projected keypoints.
    span = jnp.where(
        gt_vis[..., None], gt_uv, jnp.nan
    )
    bbox_wh = jnp.nanmax(span, axis=-2) - jnp.nanmin(span, axis=-2)  # (B, O, 2)
    bbox_size = jnp.nan_to_num(jnp.max(bbox_wh, -1), nan=1.0)  # (B, O)
    thr = alpha * jnp.repeat(bbox_size, ch.shape[1], axis=-1)  # (B, OK)

    correct = (d <= jnp.maximum(thr, 2.0)) & valid & (score_per_kpt >= score_threshold)
    n_eval = jnp.sum(valid)
    return {
        "pck": jnp.sum(correct) / jnp.maximum(n_eval, 1),
        "mean_px_error_matched": jnp.sum(jnp.where(correct, d, 0.0)) / jnp.maximum(jnp.sum(correct), 1),
        "n_keypoints": n_eval,
    }


def evaluate_decode_associated(
    batch, roster, stride: float, alpha: float = 0.5,
    score_threshold: float = 0.3, max_peaks: int = 8, margin: float = 8.0,
) -> Dict[str, Array]:
    """Instance-resolved PCK: peaks routed to owners via bbox2d
    (ops/decode.associate_peaks), then each GT keypoint is scored against the
    peak ASSIGNED to its own instance — stricter than nearest-peak PCK, and
    the decode floor that matters for multi-instance PnP."""
    uv_pk, sc_pk = decode_ops.extract_peaks(batch.heatmaps, max_peaks)
    uv_pk = uv_pk * stride
    ch = jnp.asarray(roster.inst_kpt_channel)  # (O, K)
    uv, sc = decode_ops.associate_peaks(uv_pk, sc_pk, ch, batch.bbox2d, margin)
    d = jnp.linalg.norm(uv - batch.kpt_uv, axis=-1)  # (B, O, K)
    valid = batch.kpt_visible & (ch >= 0)[None]
    matched = sc >= score_threshold

    span = jnp.where(batch.kpt_visible[..., None], batch.kpt_uv, jnp.nan)
    bbox_wh = jnp.nanmax(span, axis=-2) - jnp.nanmin(span, axis=-2)
    bbox_size = jnp.nan_to_num(jnp.max(bbox_wh, -1), nan=1.0)  # (B, O)
    thr = jnp.maximum(alpha * bbox_size[..., None], 2.0)

    correct = (d <= thr) & valid & matched
    n_eval = jnp.sum(valid)
    return {
        "pck": jnp.sum(correct) / jnp.maximum(n_eval, 1),
        "recall": jnp.sum(matched & valid) / jnp.maximum(n_eval, 1),
        "mean_px_error_matched": jnp.sum(jnp.where(correct, d, 0.0))
        / jnp.maximum(jnp.sum(correct), 1),
        "n_keypoints": n_eval,
    }


def evaluate_human_pck(
    batch, roster, stride: float, heatmaps: Optional[Array] = None,
    alpha: float = 0.5, score_threshold: float = 0.3, use_dark: bool = True,
) -> Dict[str, Array]:
    """Human-specific PCK@alpha over the worker's 17 COCO keypoints
    (BASELINE config 3: "17-kpt COCO heatmap targets"; reference worker
    handling at generate_construction_data.py:1158-1200, class 5 at :75).

    Unlike ``evaluate_decode``, which buries the human among every class
    channel, this scores ONLY the human instance(s): each of the 17 dedicated
    channels is densely decoded (DARK or soft-argmax) and compared to the
    articulated GT joint projection, normalized by the human's projected bbox
    extent. Returns the aggregate PCK plus ``pck_per_kpt`` (17,) in COCO
    order (assets.COCO_KEYPOINT_NAMES)."""
    h0, h1 = roster.human_slice
    assert h1 > h0, "roster has no human instance"
    ch = jnp.asarray(roster.inst_kpt_channel[h0:h1])  # (H, Kmax)
    kpt_valid = jnp.asarray(roster.inst_kpt_valid[h0:h1])  # (H, Kmax)
    hms = heatmaps if heatmaps is not None else batch.heatmaps
    uv_all, score = decode_heatmaps(hms, stride, use_dark)  # (B, C, 2)
    B = uv_all.shape[0]
    H, Kmax = ch.shape
    uv = jnp.take(uv_all, jnp.maximum(ch, 0).reshape(-1), axis=1)
    uv = uv.reshape(B, H, Kmax, 2)
    sc = jnp.take(score, jnp.maximum(ch, 0).reshape(-1), axis=1)
    sc = sc.reshape(B, H, Kmax)

    gt_uv = batch.kpt_uv[:, h0:h1]  # (B, H, Kmax, 2)
    gt_vis = batch.kpt_visible[:, h0:h1]  # (B, H, Kmax)
    valid = gt_vis & kpt_valid[None] & (ch >= 0)[None]

    span = jnp.where(gt_vis[..., None], gt_uv, jnp.nan)
    bbox_wh = jnp.nanmax(span, axis=-2) - jnp.nanmin(span, axis=-2)  # (B, H, 2)
    bbox_size = jnp.nan_to_num(jnp.max(bbox_wh, -1), nan=1.0)  # (B, H)
    thr = jnp.maximum(alpha * bbox_size[..., None], 2.0)  # (B, H, 1)

    d = jnp.linalg.norm(uv - gt_uv, axis=-1)  # (B, H, Kmax)
    correct = (d <= thr) & valid & (sc >= score_threshold)
    n_per_kpt = jnp.sum(valid, axis=(0, 1))  # (Kmax,)
    n_eval = jnp.sum(valid)
    return {
        "pck": jnp.sum(correct) / jnp.maximum(n_eval, 1),
        "pck_per_kpt": jnp.sum(correct, axis=(0, 1))
        / jnp.maximum(n_per_kpt, 1),
        "n_per_kpt": n_per_kpt,
        "mean_px_error": jnp.sum(jnp.where(valid, d, 0.0))
        / jnp.maximum(n_eval, 1),
        "n_keypoints": n_eval,
    }


def _in_site(t_cam: Array, R_wp: Array, cam_pos: Array,
             margin: float = 2.0) -> Array:
    """Site-bounds acceptance gate, applied uniformly by every ground-prior
    evaluator: equipment lives inside the fence (reference placement bounds,
    generate_construction_data.py:935-936, + margin). Rare bad GN basins land
    tens of meters outside with plausible reprojection; reject them.

    ``t_cam`` (..., 3) camera-frame translation; ``R_wp``/(…,3,3) and
    ``cam_pos`` broadcast against it."""
    from ..config import RandomizationConfig
    rc = RandomizationConfig()
    t_world = jnp.einsum("...ij,...j->...i", R_wp, t_cam) + cam_pos
    return (
        (t_world[..., 0] >= rc.fence_x[0] - margin)
        & (t_world[..., 0] <= rc.fence_x[1] + margin)
        & (t_world[..., 1] >= rc.fence_y[0] - margin)
        & (t_world[..., 1] <= rc.fence_y[1] + margin)
    )


def gt_camera_frame_pose(roster, batch, inst_index: int):
    """Ground-truth (R, t) mapping object-local points -> pinhole camera frame
    for one instance, derived from the emitted labels: p_cam = R_wp^T (R_obj
    X + t_obj - cam)."""
    pose7 = batch.camera_pose7
    R_wp = rotation.matrix_from_quat_xyzw(pose7[..., 3:])  # world-from-pinhole
    cam = pose7[..., :3]
    euler = batch.euler_deg[:, inst_index]
    rx = rotation.matrix_rot_x_degrees(euler[..., 0])
    ry = rotation.matrix_rot_y_degrees(euler[..., 1])
    rz = rotation.matrix_rot_z_degrees(euler[..., 2])
    R_obj = rz @ ry @ rx  # extrinsic xyz
    # center = R_obj @ aabb_center + t  =>  t_obj = center - R_obj @ c_local
    c_local = jnp.asarray((roster.inst_aabb_min[inst_index]
                           + roster.inst_aabb_max[inst_index]) / 2.0)
    t_obj = batch.center[:, inst_index] - jnp.einsum("...ij,j->...i", R_obj, c_local)
    R_cam = jnp.swapaxes(R_wp, -1, -2) @ R_obj
    t_cam = jnp.einsum("...ji,...j->...i", R_wp, t_obj - cam)
    return R_cam, t_cam


def evaluate_equipment_6dof(
    batch, roster, intr: cam_mod.Intrinsics, class_name: str = "dumper",
    stride: float = 4.0, use_gt_keypoints: bool = False,
    heatmaps: Optional[Array] = None, score_threshold: float = 0.3,
    rmse_gate_px: float = 8.0, inlier_px: float = 10.0,
    use_ransac: bool = True, key: Optional[Array] = None,
    ground_prior: bool = False,
) -> Dict[str, Array]:
    """PnP pose recovery + ADD metrics for one equipment class.

    ``use_gt_keypoints=True`` feeds the projected GT keypoints into PnP (the
    pipeline's error floor); otherwise decodes ``heatmaps`` (default: the
    batch's GT heatmaps — decode-floor evaluation)."""
    # Roster index of the (single) instance of this class. Multi-instance
    # classes go through evaluate_equipment_6dof_multi (peak-to-instance
    # association); the articulated crane through evaluate_crane_6dof.
    idx = [i for i, n in enumerate(roster.inst_class_names) if n == class_name]
    assert len(idx) == 1, (
        f"{class_name}: expected exactly one instance; use "
        "evaluate_equipment_6dof_multi for multi-instance classes")
    o = idx[0]
    tpl = assets.all_templates()[class_name]
    model_pts = jnp.asarray(tpl.keypoints)
    K = tpl.num_keypoints

    if use_gt_keypoints:
        uv = batch.kpt_uv[:, o, :K]
        w = batch.kpt_visible[:, o, :K].astype(jnp.float32)
    else:
        hms = heatmaps if heatmaps is not None else batch.heatmaps
        uv_all, score = decode_heatmaps(hms, stride)
        ch = jnp.asarray(roster.inst_kpt_channel[o, :K])
        uv = jnp.take(uv_all, ch, axis=1)
        sc = jnp.take(score, ch, axis=1)
        w = jnp.where(sc >= score_threshold, sc, 0.0)

    x = pnp_ops.normalize_pixels(uv, intr.fx, intr.fy, intr.cx, intr.cy)
    B = x.shape[0]
    Xb = jnp.broadcast_to(model_pts, (B,) + model_pts.shape)
    # Thresholds calibrated in PIXELS, converted to normalized coords.
    px2n = 1.0 / float(intr.fx)
    if ground_prior:
        pose7 = batch.camera_pose7
        R_wp = rotation.matrix_from_quat_xyzw(pose7[..., 3:])
        res = jax.vmap(pnp_ops.solve_ground_pose)(
            Xb, x, w, R_wp, pose7[..., :3])
    elif use_ransac and not use_gt_keypoints:
        keys = jax.random.split(key if key is not None else jax.random.PRNGKey(0), B)
        res = jax.vmap(lambda k, X, xx, ww: pnp_ops.solve_pnp_ransac(
            k, X, xx, ww, inlier_thresh=inlier_px * px2n))(keys, Xb, x, w)
    else:
        res = jax.vmap(pnp_ops.solve_pnp)(Xb, x, w)
    R_gt, t_gt = gt_camera_frame_pose(roster, batch, o)
    add = metrics.add_metric(res.R, res.t, R_gt, t_gt, model_pts)
    dia = metrics.model_diameter(model_pts)
    valid = res.valid & batch.inst_visible[:, o]
    # Acceptance gate: reprojection RMSE (pixel-calibrated). Long-range PnP
    # from noisy keypoints is ill-conditioned; production consumers reject
    # high-residual solutions rather than trust them.
    accepted = valid & (res.rmse <= rmse_gate_px * px2n)
    if ground_prior:
        accepted = accepted & _in_site(res.t, R_wp, pose7[..., :3])
    return {
        "add_mean": jnp.sum(jnp.where(accepted, add, 0.0)) / jnp.maximum(jnp.sum(accepted), 1),
        "add_0_1d": metrics.add_accuracy(add, dia, accepted),
        "n_valid": jnp.sum(valid),
        "n_accepted": jnp.sum(accepted),
        "rmse": jnp.sum(jnp.where(valid, res.rmse, 0.0)) / jnp.maximum(jnp.sum(valid), 1),
    }


def evaluate_equipment_6dof_multi(
    batch, roster, intr: cam_mod.Intrinsics, class_name: str = "dumper",
    stride: float = 4.0, use_gt_keypoints: bool = False,
    heatmaps: Optional[Array] = None, score_threshold: float = 0.3,
    rmse_gate_px: float = 8.0, max_peaks: int = 8, margin: float = 8.0,
) -> Dict[str, Array]:
    """Multi-instance equipment pose: peaks -> instances via bbox2d
    association (ops/decode.associate_peaks), then a ground-prior solve per
    (frame, instance). Lifts the single-instance restriction of
    ``evaluate_equipment_6dof`` — multi-dumper scenes (SceneConfig.n_dumpers)
    evaluate per instance, aggregated over all of them."""
    idxs = [i for i, n in enumerate(roster.inst_class_names) if n == class_name]
    assert idxs, f"no instances of {class_name}"
    tpl = assets.all_templates()[class_name]
    model_pts = jnp.asarray(tpl.keypoints)
    K = tpl.num_keypoints
    oi = jnp.asarray(idxs)

    if use_gt_keypoints:
        uv = batch.kpt_uv[:, oi, :K]  # (B, I, K, 2)
        w = batch.kpt_visible[:, oi, :K].astype(jnp.float32)
    else:
        hms = heatmaps if heatmaps is not None else batch.heatmaps
        uv_pk, sc_pk = decode_ops.extract_peaks(hms, max_peaks)
        uv_all, sc_all = decode_ops.associate_peaks(
            uv_pk * stride, sc_pk, jnp.asarray(roster.inst_kpt_channel),
            batch.bbox2d, margin)
        uv = uv_all[:, oi, :K]
        sc = sc_all[:, oi, :K]
        w = jnp.where(sc >= score_threshold, sc, 0.0)

    x = pnp_ops.normalize_pixels(uv, intr.fx, intr.fy, intr.cx, intr.cy)
    pose7 = batch.camera_pose7
    R_wp = rotation.matrix_from_quat_xyzw(pose7[..., 3:])
    B = x.shape[0]
    Xb = jnp.broadcast_to(model_pts, (len(idxs),) + model_pts.shape)
    res = jax.vmap(  # over frames
        lambda xx, ww, Rw, cp: jax.vmap(  # over instances
            lambda X, xi, wi: pnp_ops.solve_ground_pose(X, xi, wi, Rw, cp)
        )(Xb, xx, ww)
    )(x, w, R_wp, pose7[..., :3])

    px2n = 1.0 / float(intr.fx)
    accepted = (res.valid & (res.rmse <= rmse_gate_px * px2n)
                & _in_site(res.t, R_wp[:, None], pose7[:, None, :3]))  # (B, I)

    adds = []
    gates = []
    for col, o in enumerate(idxs):
        R_gt, t_gt = gt_camera_frame_pose(roster, batch, o)
        add = metrics.add_metric(res.R[:, col], res.t[:, col], R_gt, t_gt, model_pts)
        adds.append(add)
        gates.append(accepted[:, col] & batch.inst_visible[:, o])
    add = jnp.stack(adds, -1)  # (B, I)
    gate = jnp.stack(gates, -1)
    dia = metrics.model_diameter(model_pts)
    return {
        "add_mean": jnp.sum(jnp.where(gate, add, 0.0)) / jnp.maximum(jnp.sum(gate), 1),
        "add_0_1d": metrics.add_accuracy(add, dia, gate),
        "n_instances_evaluated": jnp.sum(gate),
        "n_valid": jnp.sum(res.valid),
        "n_accepted": jnp.sum(accepted),
    }


def evaluate_crop_6dof(
    batch, roster, intr: cam_mod.Intrinsics, model, params,
    class_name: str = "dumper", crop_size: int = 128,
    score_threshold: float = 0.3, rmse_gate_px: float = 8.0,
    loss: str = "focal", min_box_px: float = 6.0,
    boxes: Optional[Array] = None,
) -> Dict[str, Array]:
    """Two-stage (detect-then-crop) equipment 6DoF: ROI from the bbox2d label
    (detector stand-in) or from ``boxes`` (B, 4) — a real detector's output
    (ops/detect.decode_detections) — then the second-stage net on the crop,
    DARK decode in crop coordinates mapped back to image pixels, ground-prior
    solve, ADD.

    ``min_box_px`` drops frames whose box is smaller than a detector would
    report (sliver visibility through occluders).

    With multiple roster instances of ``class_name`` (--n-dumpers 2) and a
    real detector box, the box is associated per frame to the GT instance it
    overlaps most — comparing the best-scoring detection against instance 0
    unconditionally scored the pose against the WRONG dumper in half the
    frames (measured ADD mean 5.8 m ~= the inter-dumper distance)."""
    from ..models import pose_net
    from ..ops import crop as crop_ops
    from ..ops import preprocess

    idxs = [i for i, n in enumerate(roster.inst_class_names)
            if n == class_name]
    o = idxs[0]
    tpl = assets.all_templates()[class_name]
    K = tpl.num_keypoints
    model_pts = jnp.asarray(tpl.keypoints)
    stride = getattr(model, "output_stride", 4)

    bbox = (boxes.astype(jnp.float32) if boxes is not None
            else batch.bbox2d[:, o].astype(jnp.float32))
    sel = None
    if boxes is not None and len(idxs) > 1:
        ii = jnp.asarray(idxs)
        gtb = batch.bbox2d[:, ii].astype(jnp.float32)  # (B, I, 4)
        iou = _iou(bbox[:, None, :], gtb)  # (B, I)
        iou = jnp.where(batch.inst_visible[:, ii], iou, -1.0)
        sel = jnp.argmax(iou, axis=1)  # (B,) GT instance per frame
    cu, cv, half = crop_ops.square_roi(bbox)

    def one(rgb, cu1, cv1, h1):
        img = crop_ops.crop_resize(rgb.astype(jnp.float32) / 255.0,
                                   cu1, cv1, h1, crop_size)
        return preprocess.normalize(img)

    imgs = jax.vmap(one)(batch.rgb, cu, cv, half)
    hm = pose_net.output_to_heatmaps(
        pose_net.forward(model, params, imgs), loss)
    uv_c, sc = decode_ops.dark_decode(hm)
    uv = crop_ops.crop_to_uv(uv_c * stride, cu[:, None], cv[:, None],
                             half[:, None], crop_size)
    w = jnp.where(sc >= score_threshold, sc, 0.0)

    x = pnp_ops.normalize_pixels(uv, intr.fx, intr.fy, intr.cx, intr.cy)
    pose7 = batch.camera_pose7
    R_wp = rotation.matrix_from_quat_xyzw(pose7[..., 3:])
    B = x.shape[0]
    res = jax.vmap(pnp_ops.solve_ground_pose)(
        jnp.broadcast_to(model_pts, (B,) + model_pts.shape), x, w,
        R_wp, pose7[..., :3])

    if sel is None:
        R_gt, t_gt = gt_camera_frame_pose(roster, batch, o)
        vis_o = batch.inst_visible[:, o]
    else:
        Rs, ts = zip(*(gt_camera_frame_pose(roster, batch, i) for i in idxs))
        R_all = jnp.stack(Rs, 1)  # (B, I, 3, 3)
        t_all = jnp.stack(ts, 1)  # (B, I, 3)
        R_gt = jnp.take_along_axis(R_all, sel[:, None, None, None], 1)[:, 0]
        t_gt = jnp.take_along_axis(t_all, sel[:, None, None], 1)[:, 0]
        vis_o = jnp.take_along_axis(
            batch.inst_visible[:, jnp.asarray(idxs)], sel[:, None], 1)[:, 0]
    add = metrics.add_metric(res.R, res.t, R_gt, t_gt, model_pts)
    dia = metrics.model_diameter(model_pts)
    box_px = jnp.maximum(bbox[:, 2] - bbox[:, 0], bbox[:, 3] - bbox[:, 1])
    detectable = vis_o & (box_px >= min_box_px)
    valid = res.valid & detectable
    px2n = 1.0 / float(intr.fx)
    accepted = (valid & (res.rmse <= rmse_gate_px * px2n)
                & _in_site(res.t, R_wp, pose7[..., :3]))
    return {
        "add_mean": jnp.sum(jnp.where(accepted, add, 0.0))
        / jnp.maximum(jnp.sum(accepted), 1),
        "add_0_1d": metrics.add_accuracy(add, dia, accepted),
        "n_detectable": jnp.sum(detectable),
        "n_valid": jnp.sum(valid),
        "n_accepted": jnp.sum(accepted),
        "rmse": jnp.sum(jnp.where(valid, res.rmse, 0.0))
        / jnp.maximum(jnp.sum(valid), 1),
    }


def match_boxes_to_instances(det_boxes: Array, det_scores: Array,
                             gt_boxes: Array, det_threshold: float = 0.3,
                             min_iou: float = 0.25):
    """Assign detector boxes (B, D, 4)/(B, D) to GT instance slots
    (B, I, 4) one-to-one by IoU: each instance column takes its
    highest-IoU unclaimed above-threshold detection. Returns
    (boxes (B, I, 4), matched (B, I)) — unmatched slots keep the GT box
    shape but are masked out by ``matched``."""
    B, D = det_scores.shape
    I = gt_boxes.shape[1]
    iou = _iou(det_boxes[:, :, None, :], gt_boxes[:, None, :, :])  # (B, D, I)
    iou = jnp.where((det_scores >= det_threshold)[:, :, None], iou, 0.0)
    taken = jnp.zeros((B, D), bool)
    out_boxes, out_matched = [], []
    for col in range(I):
        col_iou = jnp.where(taken, 0.0, iou[:, :, col])  # (B, D)
        best = jnp.argmax(col_iou, axis=-1)  # (B,)
        best_iou = jnp.max(col_iou, axis=-1)
        hit = best_iou >= min_iou
        taken = taken | ((jnp.arange(D)[None] == best[:, None]) & hit[:, None])
        chosen = jnp.take_along_axis(det_boxes, best[:, None, None], axis=1)[:, 0]
        out_boxes.append(jnp.where(hit[:, None], chosen, gt_boxes[:, col]))
        out_matched.append(hit)
    return jnp.stack(out_boxes, 1), jnp.stack(out_matched, 1)


def evaluate_crop_6dof_multi(
    batch, roster, intr: cam_mod.Intrinsics, model, params,
    class_name: str = "dumper", crop_size: int = 128,
    score_threshold: float = 0.3, rmse_gate_px: float = 8.0,
    loss: str = "focal", min_box_px: float = 6.0,
    boxes: Optional[Array] = None, box_scores: Optional[Array] = None,
    det_threshold: float = 0.3,
) -> Dict[str, Array]:
    """Multi-instance crop-stage 6DoF: one ROI per (frame, instance) of the
    class — every instance's box through the same crop net, solved and scored
    independently. Lifts the crop path to multi-dumper scenes
    (SceneConfig.n_dumpers > 1).

    Boxes come from the bbox2d label by default (detector stand-in); pass
    ``boxes`` (B, D, 4) + ``box_scores`` (B, D) — one detection class's raw
    decode_detections output — for the label-free path: detections are
    IoU-assigned one-to-one to instance slots (match_boxes_to_instances) and
    unmatched instances count as not detectable."""
    from ..models import pose_net
    from ..ops import crop as crop_ops
    from ..ops import preprocess

    idxs = [i for i, n in enumerate(roster.inst_class_names) if n == class_name]
    tpl = assets.all_templates()[class_name]
    K = tpl.num_keypoints
    model_pts = jnp.asarray(tpl.keypoints)
    stride = getattr(model, "output_stride", 4)
    I = len(idxs)
    oi = jnp.asarray(idxs)

    bbox = batch.bbox2d[:, oi].astype(jnp.float32)  # (B, I, 4)
    det_matched = None
    if boxes is not None:
        assert box_scores is not None, "detector boxes need their scores"
        bbox, det_matched = match_boxes_to_instances(
            boxes.astype(jnp.float32), box_scores, bbox, det_threshold)
    cu, cv, half = crop_ops.square_roi(bbox)  # (B, I)

    def one(rgb, c1, v1, h1):
        img = crop_ops.crop_resize(rgb.astype(jnp.float32) / 255.0,
                                   c1, v1, h1, crop_size)
        return preprocess.normalize(img)

    imgs = jax.vmap(lambda rgb, cs, vs, hs: jax.vmap(
        lambda c1, v1, h1: one(rgb, c1, v1, h1))(cs, vs, hs))(
            batch.rgb, cu, cv, half)  # (B, I, c, c, 3)
    B = imgs.shape[0]
    hm = pose_net.output_to_heatmaps(
        pose_net.forward(model, params,
                         imgs.reshape((B * I,) + imgs.shape[2:])), loss)
    uv_c, sc = decode_ops.dark_decode(hm)  # (B*I, K, 2)
    uv_c = uv_c.reshape(B, I, K, 2)
    sc = sc.reshape(B, I, K)
    uv = crop_ops.crop_to_uv(uv_c * stride, cu[..., None], cv[..., None],
                             half[..., None], crop_size)
    w = jnp.where(sc >= score_threshold, sc, 0.0)

    x = pnp_ops.normalize_pixels(uv, intr.fx, intr.fy, intr.cx, intr.cy)
    pose7 = batch.camera_pose7
    R_wp = rotation.matrix_from_quat_xyzw(pose7[..., 3:])
    Xb = jnp.broadcast_to(model_pts, (I,) + model_pts.shape)
    res = jax.vmap(
        lambda xx, ww, Rw, cp: jax.vmap(
            lambda X, xi, wi: pnp_ops.solve_ground_pose(X, xi, wi, Rw, cp)
        )(Xb, xx, ww)
    )(x, w, R_wp, pose7[..., :3])

    px2n = 1.0 / float(intr.fx)
    box_px = jnp.maximum(bbox[..., 2] - bbox[..., 0],
                         bbox[..., 3] - bbox[..., 1])
    detectable = batch.inst_visible[:, oi] & (box_px >= min_box_px)
    if det_matched is not None:
        detectable = detectable & det_matched
    accepted = (res.valid & detectable & (res.rmse <= rmse_gate_px * px2n)
                & _in_site(res.t, R_wp[:, None], pose7[:, None, :3]))

    adds, gates = [], []
    for col, o in enumerate(idxs):
        R_gt, t_gt = gt_camera_frame_pose(roster, batch, o)
        adds.append(metrics.add_metric(res.R[:, col], res.t[:, col],
                                       R_gt, t_gt, model_pts))
        gates.append(accepted[:, col])
    add = jnp.stack(adds, -1)
    gate = jnp.stack(gates, -1)
    dia = metrics.model_diameter(model_pts)
    return {
        "add_mean": jnp.sum(jnp.where(gate, add, 0.0))
        / jnp.maximum(jnp.sum(gate), 1),
        "add_0_1d": metrics.add_accuracy(add, dia, gate),
        "n_detectable": jnp.sum(detectable),
        "n_accepted": jnp.sum(gate),
    }


def _iou(a: Array, b: Array) -> Array:
    """IoU of boxes a (..., 4) vs b (..., 4) [u0, v0, u1, v1]."""
    iw = jnp.maximum(0.0, jnp.minimum(a[..., 2], b[..., 2])
                     - jnp.maximum(a[..., 0], b[..., 0]))
    ih = jnp.maximum(0.0, jnp.minimum(a[..., 3], b[..., 3])
                     - jnp.maximum(a[..., 1], b[..., 1]))
    inter = iw * ih
    area = lambda x: jnp.maximum(0.0, x[..., 2] - x[..., 0]) * \
        jnp.maximum(0.0, x[..., 3] - x[..., 1])
    return inter / jnp.maximum(area(a) + area(b) - inter, 1e-9)


def evaluate_detector(
    batch, roster, model, params, score_threshold: float = 0.3,
    iou_thresh: float = 0.5, max_det: int = 8, analysis: bool = False,
) -> Dict[str, Array]:
    """Detection quality vs the renderer's pixel-tight boxes: per-class and
    aggregate precision/recall at IoU>=``iou_thresh`` under ONE-TO-ONE greedy
    score-ordered matching (duplicates of a matched GT count as FP), plus
    per-class all-point AP@IoU (``ap_<cls>``, mean in ``map``) and the best
    dumper box for the crop hand-off. Returns the decoded boxes too.

    ``analysis=True`` additionally splits each class's MISSED ground truths
    (oracle-IoU diagnosis, recall = 1 - sum of the three):
      ``miss_score_<c>`` — a same-class detection localizes it (IoU >= thr)
        but scored below threshold / lost the one-to-one match;
      ``miss_cls_<c>``  — some OTHER class's detection localizes it
        (classification confusion);
      ``miss_loc_<c>``  — no detection of any class localizes it.
    """
    from ..models import pose_net
    from ..ops import detect as detect_ops
    from ..ops import preprocess
    from ..train import detect_loop

    imgs = jax.vmap(lambda r: preprocess.normalize(
        r.astype(jnp.float32) / 255.0))(batch.rgb)
    pred = pose_net.forward(model, params, imgs)  # (B, C+4, h, w)
    stride = getattr(model, "output_stride", 4)
    boxes, scores = jax.vmap(
        lambda p: detect_ops.decode_detections(p, float(stride), max_det))(pred)

    inst_cls = detect_loop.extended_inst_classes(roster)
    gt_boxes, gt_vis = detect_loop.crane_extended_boxes(batch, roster)

    C = len(detect_ops.DET_CLASSES)
    O = gt_boxes.shape[1]
    D = boxes.shape[2]
    out: Dict[str, Array] = {}
    tps, fps, gts = [], [], []
    for ci, cname in enumerate(detect_ops.DET_CLASSES):
        det_b = boxes[:, ci]  # (B, D, 4), score-descending (decoder order)
        det_s = scores[:, ci]
        keep = det_s >= score_threshold
        gsel = (inst_cls == ci)[None, :] & gt_vis  # (B, O)
        iou = _iou(det_b[:, :, None, :], gt_boxes[:, None, :, :])  # (B, D, O)
        iou = jnp.where(gsel[:, None, :], iou, 0.0)
        # ONE-TO-ONE greedy matching in score order: each detection claims at
        # most one unmatched GT, each GT at most one detection — duplicate
        # detections of the same instance count as FP. Below-threshold dets
        # are processed after every kept one (score order), so they cannot
        # steal a kept detection's GT; one pass therefore serves both the
        # thresholded P/R and the ranked AP.
        taken = jnp.zeros((iou.shape[0], O), bool)
        taken_kept = jnp.zeros((iou.shape[0], O), bool)
        hits = []
        for d in range(D):
            iou_d = jnp.where(taken, 0.0, iou[:, d])  # (B, O)
            best = jnp.argmax(iou_d, axis=-1)
            hit = jnp.max(iou_d, axis=-1) >= iou_thresh
            claimed = (jnp.arange(O)[None, :] == best[:, None]) & hit[:, None]
            taken = taken | claimed
            taken_kept = taken_kept | (claimed & keep[:, d][:, None])
            hits.append(hit)
        det_hit = jnp.stack(hits, 1)  # (B, D)
        if analysis:
            # Oracle-IoU split of the misses (see docstring). Same-class
            # localization ignores score and the one-to-one claim; any-class
            # localization uses every decoded box of every class.
            missed = gsel & ~taken_kept  # (B, O)
            same_loc = jnp.max(iou, axis=1) >= iou_thresh  # (B, O)
            all_b = boxes.reshape(boxes.shape[0], -1, 4)
            iou_any = _iou(all_b[:, :, None, :], gt_boxes[:, None, :, :])
            any_loc = jnp.max(iou_any, axis=1) >= iou_thresh  # (B, O)
            n_gt_a = jnp.maximum(jnp.sum(gsel), 1)
            out[f"miss_score_{cname}"] = jnp.sum(missed & same_loc) / n_gt_a
            out[f"miss_cls_{cname}"] = jnp.sum(
                missed & ~same_loc & any_loc) / n_gt_a
            out[f"miss_loc_{cname}"] = jnp.sum(
                missed & ~any_loc) / n_gt_a
        tp = jnp.sum(det_hit & keep)
        fp = jnp.sum(~det_hit & keep)
        n_gt = jnp.sum(gsel)
        out[f"precision_{cname}"] = tp / jnp.maximum(tp + fp, 1)
        out[f"recall_{cname}"] = tp / jnp.maximum(n_gt, 1)
        # AP@IoU: all detections ranked by score across the batch; all-point
        # average precision over the one-to-one match outcomes.
        order = jnp.argsort(-det_s.reshape(-1))
        hit_sorted = jnp.take(det_hit.reshape(-1), order).astype(jnp.float32)
        cum_tp = jnp.cumsum(hit_sorted)
        prec = cum_tp / (jnp.arange(hit_sorted.shape[0]) + 1.0)
        out[f"ap_{cname}"] = jnp.sum(prec * hit_sorted) / jnp.maximum(n_gt, 1)
        tps.append(tp); fps.append(fp); gts.append(n_gt)
    tp, fp, n_gt = (jnp.sum(jnp.stack(v)) for v in (tps, fps, gts))
    out["precision"] = tp / jnp.maximum(tp + fp, 1)
    out["recall"] = tp / jnp.maximum(n_gt, 1)
    out["map"] = jnp.mean(jnp.stack(
        [out[f"ap_{c}"] for c in detect_ops.DET_CLASSES]))

    # Best dumper detection per frame (for the crop-stage hand-off).
    di = detect_ops.DET_CLASSES.index("dumper")
    best = jnp.argmax(scores[:, di], axis=-1)
    out["dumper_boxes"] = jnp.take_along_axis(
        boxes[:, di], best[:, None, None], axis=1)[:, 0]
    out["dumper_scores"] = jnp.take_along_axis(
        scores[:, di], best[:, None], axis=1)[:, 0]
    # Raw decoded detections (B, C, max_det, ...) for multi-instance and
    # per-part hand-offs (cli.cmd_infer, evaluate_crop_6dof_multi boxes=...).
    out["boxes"] = boxes
    out["scores"] = scores
    return out


def best_part_boxes(boxes: Array, scores: Array):
    """Detector outputs (B, C, D, 4)/(B, C, D) -> the best crane PART box per
    frame: ((B, 4, 4), (B, 4)) in roster part order base/column/boom/
    telescopic — the label-free per-part ROIs for the FK crop solve."""
    from ..ops import detect as detect_ops
    cidx = jnp.asarray([detect_ops.DET_CLASSES.index(p)
                        for p in detect_ops.CRANE_PART_CLASSES])
    pb = boxes[:, cidx]  # (B, 4, D, 4)
    ps = scores[:, cidx]  # (B, 4, D)
    best = jnp.argmax(ps, axis=-1)
    bb = jnp.take_along_axis(pb, best[..., None, None], axis=2)[:, :, 0]
    bs = jnp.take_along_axis(ps, best[..., None], axis=2)[..., 0]
    return bb, bs


def crane_part_keypoints(
    rgb, pboxes: Array, part_vis: Array, roster, model, params,
    crop_size: int = 128, score_threshold: float = 0.3, loss: str = "focal",
):
    """Per-part crane ROIs -> 4*Kp crop net -> DARK decode, mapped back to
    image pixels. ``pboxes`` (B, 4, 4) in roster part order (label boxes or
    detector best_part_boxes); ``part_vis`` (B, 4) gates a part's keypoint
    weights. Returns (uv (B, 4, Kp, 2), scores (B, 4, Kp), w (B, 4, Kp)) —
    feed w into ops/pnp.solve_crane_pose. Shared by the crane crop evaluator
    and the deployment infer loop."""
    from ..models import pose_net
    from ..ops import crop as crop_ops
    from ..ops import preprocess
    from ..train import crop_loop

    s0, Kp = crop_loop.crane_channels(roster)
    kpt_valid = jnp.asarray(roster.inst_kpt_valid[s0:s0 + 4, :Kp])
    stride = getattr(model, "output_stride", 4)
    B = rgb.shape[0]

    def one(img, cu1, cv1, hu1, hv1):
        c = crop_ops.crop_resize(img.astype(jnp.float32) / 255.0,
                                 cu1, cv1, hu1, crop_size, half_v=hv1)
        return preprocess.normalize(c)

    # min_half + ASPECT-MATCHED rect_roi match crop_loop's
    # crop_batch_crane_parts exactly (the net only ever saw that mapping).
    cu, cv, hu, hv = crop_ops.rect_roi(pboxes, min_half=24.0)  # (B, 4)
    imgs = jax.vmap(lambda img, cs, vs, hus, hvs: jax.vmap(
        lambda c1, v1, hu1, hv1: one(img, c1, v1, hu1, hv1))(cs, vs, hus,
                                                             hvs))(
            rgb, cu, cv, hu, hv)  # (B, 4, c, c, 3)
    hm = pose_net.output_to_heatmaps(
        pose_net.forward(model, params,
                         imgs.reshape((B * 4,) + imgs.shape[2:])), loss)
    uv_c, sc_all = decode_ops.dark_decode(hm)  # (B*4, 4*Kp, 2)
    uv_c = uv_c.reshape(B, 4, 4, Kp, 2)
    sc_all = sc_all.reshape(B, 4, 4, Kp)
    # Part pi's keypoints from ITS crop: diagonal over (crop, part-block).
    pidx = jnp.arange(4)
    uv_c = uv_c[:, pidx, pidx]  # (B, 4, Kp, 2)
    sc = sc_all[:, pidx, pidx]
    uv = crop_ops.crop_to_uv(uv_c * stride, cu[..., None], cv[..., None],
                             hu[..., None], crop_size,
                             half_v=hv[..., None])
    w = jnp.where((sc >= score_threshold) & kpt_valid
                  & part_vis[..., None], sc, 0.0)
    return uv, sc, w


def evaluate_crop_crane_6dof(
    batch, roster, intr: cam_mod.Intrinsics, model, params,
    crop_size: int = 128, score_threshold: float = 0.3,
    rmse_gate_px: float = 8.0, loss: str = "focal", min_box_px: float = 10.0,
    per_part: bool = False,
    part_boxes: Optional[Array] = None, part_scores: Optional[Array] = None,
    det_threshold: float = 0.3,
) -> Dict[str, Array]:
    """Two-stage crane pose: ROI(s) -> 4*Kp crop channels -> decoded
    keypoints mapped back to image pixels -> FK-constrained joint solve
    (ops/pnp.solve_crane_pose) -> per-part ADD.

    ``per_part=False``: one ROI around the 4-part union. ``per_part=True``:
    four ROIs (one per part box) through the same net, each part decoded from
    its own crop — boom/telescopic at full crop resolution. ``part_boxes``
    (B, 4, 4) + ``part_scores`` (B, 4) replace the label boxes with a real
    detector's per-part output (best_part_boxes) — the fully label-free
    path; a part below ``det_threshold`` contributes no keypoints."""
    from ..models import pose_net
    from ..ops import crop as crop_ops
    from ..ops import preprocess
    from ..train import crop_loop

    s0, Kp = crop_loop.crane_channels(roster)
    part_names = roster.inst_class_names[s0:s0 + 4]
    kpts_local = jnp.asarray(roster.inst_kpts[s0:s0 + 4, :Kp])
    kpt_valid = jnp.asarray(roster.inst_kpt_valid[s0:s0 + 4, :Kp])
    stride = getattr(model, "output_stride", 4)

    bbox, any_vis = crop_loop.crane_union_roi(batch, roster)

    def one(rgb, cu1, cv1, h1):
        img = crop_ops.crop_resize(rgb.astype(jnp.float32) / 255.0,
                                   cu1, cv1, h1, crop_size)
        return preprocess.normalize(img)

    B = batch.rgb.shape[0]
    if per_part:
        if part_boxes is not None:
            pboxes = part_boxes.astype(jnp.float32)  # (B, 4, 4)
        else:
            pboxes = batch.bbox2d[:, s0:s0 + 4].astype(jnp.float32)
        if part_scores is not None:  # label-free: detector confidence gates
            part_vis = part_scores >= det_threshold
        else:
            part_vis = batch.inst_visible[:, s0:s0 + 4]
        uv, sc, w = crane_part_keypoints(
            batch.rgb, pboxes, part_vis, roster, model, params,
            crop_size=crop_size, score_threshold=score_threshold, loss=loss)
    else:
        cu, cv, half = crop_ops.square_roi(bbox)
        imgs = jax.vmap(one)(batch.rgb, cu, cv, half)
        hm = pose_net.output_to_heatmaps(
            pose_net.forward(model, params, imgs), loss)
        uv_c, sc = decode_ops.dark_decode(hm)  # (B, 4*Kp, 2)
        uv = crop_ops.crop_to_uv(uv_c * stride, cu[:, None], cv[:, None],
                                 half[:, None], crop_size)
        uv = uv.reshape(B, 4, Kp, 2)
        sc = sc.reshape(B, 4, Kp)
        w = jnp.where((sc >= score_threshold) & kpt_valid, sc, 0.0)

    x = pnp_ops.normalize_pixels(uv, intr.fx, intr.fy, intr.cx, intr.cy)
    pose7 = batch.camera_pose7
    R_wp = rotation.matrix_from_quat_xyzw(pose7[..., 3:])
    res = jax.vmap(
        lambda xx, ww, Rw, cp: pnp_ops.solve_crane_pose(kpts_local, xx, ww, Rw, cp)
    )(x, w, R_wp, pose7[..., :3])

    px2n = 1.0 / float(intr.fx)
    box_px = jnp.maximum(bbox[:, 2] - bbox[:, 0], bbox[:, 3] - bbox[:, 1])
    detectable = any_vis & (box_px >= min_box_px)
    accepted = res.valid & detectable & (res.rmse <= rmse_gate_px * px2n)
    out: Dict[str, Array] = {
        "n_detectable": jnp.sum(detectable),
        "n_valid": jnp.sum(res.valid & detectable),
        "n_accepted": jnp.sum(accepted),
        "rmse": jnp.sum(jnp.where(res.valid, res.rmse, 0.0))
        / jnp.maximum(jnp.sum(res.valid), 1),
    }
    adds, add01s = [], []
    for pi, name in enumerate(part_names):
        o = s0 + pi
        # ADD over the part's geometry (AABB corners), not its learned
        # keypoints — axis keypoints under-span revolution parts and would
        # shrink the 0.1d threshold (see metrics.aabb_corners).
        model_pts = metrics.aabb_corners(roster.inst_aabb_min[o],
                                         roster.inst_aabb_max[o])
        add = metrics.add_metric(res.R[:, pi], res.t[:, pi],
                                 *gt_camera_frame_pose(roster, batch, o),
                                 model_pts)
        dia = metrics.model_diameter(model_pts)
        gate = accepted & batch.inst_visible[:, o]
        out[f"add_mean_{name}"] = (jnp.sum(jnp.where(gate, add, 0.0))
                                   / jnp.maximum(jnp.sum(gate), 1))
        out[f"add_0_1d_{name}"] = metrics.add_accuracy(add, dia, gate)
        # Error split (round-4 diagnosis): is a part's ADD loss translation
        # or rotation? Column/telescopic 0.1d gates are tight (~0.17/0.2 m),
        # so a ~0.2 m root (x, y) error alone fails them.
        R_gt, t_gt = gt_camera_frame_pose(roster, batch, o)
        t_err = jnp.linalg.norm(res.t[:, pi] - t_gt, axis=-1)
        out[f"t_err_{name}"] = (jnp.sum(jnp.where(gate, t_err, 0.0))
                                / jnp.maximum(jnp.sum(gate), 1))
        tr = jnp.einsum("bij,bij->b", res.R[:, pi], R_gt)  # trace(Re Rg^T)
        ang = jnp.degrees(jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)))
        out[f"rot_err_deg_{name}"] = (jnp.sum(jnp.where(gate, ang, 0.0))
                                      / jnp.maximum(jnp.sum(gate), 1))
        adds.append(out[f"add_mean_{name}"])
        add01s.append(out[f"add_0_1d_{name}"])
    out["add_mean"] = jnp.mean(jnp.stack(adds))
    out["add_0_1d"] = jnp.mean(jnp.stack(add01s))
    return out


def evaluate_crane_6dof(
    batch, roster, intr: cam_mod.Intrinsics, stride: float = 4.0,
    use_gt_keypoints: bool = False, heatmaps: Optional[Array] = None,
    score_threshold: float = 0.3, rmse_gate_px: float = 8.0,
) -> Dict[str, Array]:
    """Articulated-crane pose recovery (BASELINE config 4 is "crane/dumper"):
    FK-constrained fit of (x, y, column yaw, boom pitch, telescopic extension)
    over ALL four part keypoint sets jointly (ops/pnp.solve_crane_pose), then
    per-part ADD / ADD-0.1d against the ground-truth part poses the labels
    carry (reference part poses: generate_construction_data.py:1234-1279,
    1930-1975).

    Returns aggregate metrics plus per-part ``add_0_1d_<part>``; a frame
    counts only when at least ``min_points`` keypoints across parts are
    usable and the reprojection gate passes (pixel-calibrated, like the
    dumper evaluator).

    NOTE: like every extrinsics-prior evaluator here, this derives the
    camera rotation from ``batch.camera_pose7`` — the batch must come from
    the default (geometrically correct) pipeline, NOT ``bug_compatible``
    mode, whose quaternion faithfully reproduces the reference's degenerate
    camPosOri output (identity for horizontal aims) and carries no
    orientation information.
    """
    s0, s1 = roster.crane_slice
    assert s1 - s0 == 4, "roster must carry the 4 crane part instances"
    part_names = roster.inst_class_names[s0:s1]
    kpts_local = jnp.asarray(roster.inst_kpts[s0:s1])  # (4, Kmax, 3)
    kpt_valid = jnp.asarray(roster.inst_kpt_valid[s0:s1])  # (4, Kmax)

    if use_gt_keypoints:
        uv = batch.kpt_uv[:, s0:s1]  # (B, 4, Kmax, 2)
        w = (batch.kpt_visible[:, s0:s1] & kpt_valid).astype(jnp.float32)
    else:
        hms = heatmaps if heatmaps is not None else batch.heatmaps
        uv_all, score = decode_heatmaps(hms, stride)  # (B, C, 2), (B, C)
        ch = jnp.asarray(roster.inst_kpt_channel[s0:s1])  # (4, Kmax), -1 pads
        uv = jnp.take(uv_all, jnp.maximum(ch, 0).reshape(-1), axis=1)
        uv = uv.reshape(uv_all.shape[0], 4, ch.shape[1], 2)
        sc = jnp.take(score, jnp.maximum(ch, 0).reshape(-1), axis=1)
        sc = sc.reshape(uv_all.shape[0], 4, ch.shape[1])
        w = jnp.where((sc >= score_threshold) & kpt_valid & (ch >= 0), sc, 0.0)

    x = pnp_ops.normalize_pixels(uv, intr.fx, intr.fy, intr.cx, intr.cy)
    pose7 = batch.camera_pose7
    R_wp = rotation.matrix_from_quat_xyzw(pose7[..., 3:])
    res = jax.vmap(
        lambda xx, ww, Rw, cp: pnp_ops.solve_crane_pose(kpts_local, xx, ww, Rw, cp)
    )(x, w, R_wp, pose7[..., :3])

    px2n = 1.0 / float(intr.fx)
    accepted = res.valid & (res.rmse <= rmse_gate_px * px2n)

    out: Dict[str, Array] = {
        "n_valid": jnp.sum(res.valid),
        "n_accepted": jnp.sum(accepted),
        "rmse": jnp.sum(jnp.where(res.valid, res.rmse, 0.0))
        / jnp.maximum(jnp.sum(res.valid), 1),
    }
    adds = []
    add01s = []
    for pi, name in enumerate(part_names):
        o = s0 + pi
        # Geometry-based ADD points, matching evaluate_crop_crane_6dof.
        model_pts = metrics.aabb_corners(roster.inst_aabb_min[o],
                                         roster.inst_aabb_max[o])
        R_gt, t_gt = gt_camera_frame_pose(roster, batch, o)
        add = metrics.add_metric(res.R[:, pi], res.t[:, pi], R_gt, t_gt, model_pts)
        dia = metrics.model_diameter(model_pts)
        gate = accepted & batch.inst_visible[:, o]
        out[f"add_mean_{name}"] = (jnp.sum(jnp.where(gate, add, 0.0))
                                   / jnp.maximum(jnp.sum(gate), 1))
        out[f"add_0_1d_{name}"] = metrics.add_accuracy(add, dia, gate)
        adds.append(out[f"add_mean_{name}"])
        add01s.append(out[f"add_0_1d_{name}"])
    out["add_mean"] = jnp.mean(jnp.stack(adds))
    out["add_0_1d"] = jnp.mean(jnp.stack(add01s))
    return out
