"""Deployment tracker (eval/tracking.py): association, coasting, EMA
smoothing, and its integration with the sequence metrics."""

import numpy as np
from scipy.spatial.transform import Rotation

from constructionsceneposeestimation_tpu.eval import sequence_metrics, tracking


def rand_R(rng):
    return Rotation.random(random_state=rng).as_matrix()


def test_quat_roundtrip_matches_scipy():
    rng = np.random.RandomState(0)
    for _ in range(50):
        R = rand_R(rng)
        q = tracking.quat_from_matrix_np(R)
        qs = Rotation.from_matrix(R).as_quat()  # xyzw
        if np.dot(q, qs) < 0:
            qs = -qs
        np.testing.assert_allclose(q, qs, atol=1e-9)
        np.testing.assert_allclose(tracking.matrix_from_quat_np(q), R,
                                   atol=1e-9)


def det(cls, box, **kw):
    d = {"class": cls, "bbox2d": list(box), "score": 0.9}
    d.update(kw)
    return d


def test_track_id_continuity_and_new_ids():
    tr = tracking.Tracker()
    f0 = [det("dumper", (10, 10, 50, 40)), det("trafficcone", (100, 80, 110, 95))]
    tr.update(f0)
    ids0 = {d["class"]: d["track_id"] for d in f0}
    assert len({d["track_id"] for d in f0}) == 2
    # moved a little -> same ids; a new human -> new id
    f1 = [det("dumper", (14, 11, 54, 41)), det("trafficcone", (101, 81, 111, 96)),
          det("human", (200, 50, 206, 70))]
    tr.update(f1)
    ids1 = {d["class"]: d["track_id"] for d in f1}
    assert ids1["dumper"] == ids0["dumper"]
    assert ids1["trafficcone"] == ids0["trafficcone"]
    assert ids1["human"] not in ids0.values()
    # same-class disambiguation: two dumpers keep distinct ids by IoU
    tr2 = tracking.Tracker()
    g0 = [det("dumper", (0, 0, 30, 20)), det("dumper", (100, 0, 130, 20))]
    tr2.update(g0)
    g1 = [det("dumper", (101, 1, 131, 21)), det("dumper", (1, 1, 31, 21))]
    tr2.update(g1)
    assert g1[0]["track_id"] == g0[1]["track_id"]
    assert g1[1]["track_id"] == g0[0]["track_id"]


def test_track_coasts_through_misses():
    tr = tracking.Tracker(max_misses=2)
    a = det("dumper", (10, 10, 50, 40))
    tr.update([a])
    tr.update([])  # miss 1
    b = det("dumper", (12, 10, 52, 40))
    tr.update([b])
    assert b["track_id"] == a["track_id"]
    # after max_misses the track dies and the id is fresh
    tr.update([]); tr.update([]); tr.update([])
    c = det("dumper", (12, 10, 52, 40))
    tr.update([c])
    assert c["track_id"] != a["track_id"]


def cam7_identity():
    return [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0]


def test_ema_smoothing_reduces_jitter():
    rng = np.random.RandomState(3)
    R = np.eye(3)
    t_true = np.array([5.0, 2.0, 0.0])
    raw, smooth = [], []
    tr = tracking.Tracker(smooth=0.7)
    for k in range(30):
        t_noisy = t_true + rng.normal(0, 0.3, 3)
        d = det("dumper", (10, 10, 50, 40), pose_accepted=True,
                R_cam=R.tolist(), t_cam=t_noisy.tolist())
        tr.update([d], cam7_identity())
        raw.append(t_noisy)
        smooth.append(np.asarray(d["t_world"]))
    raw_j = np.linalg.norm(np.diff(np.asarray(raw), axis=0), axis=1).mean()
    sm_j = np.linalg.norm(np.diff(np.asarray(smooth), axis=0), axis=1).mean()
    assert sm_j < 0.5 * raw_j, (raw_j, sm_j)
    # smooth=0 is identity pass-through of the world pose
    tr0 = tracking.Tracker(smooth=0.0)
    d = det("dumper", (0, 0, 5, 5), pose_accepted=True,
            R_cam=R.tolist(), t_cam=[1.0, 2.0, 3.0])
    tr0.update([d], cam7_identity())
    d2 = det("dumper", (0, 0, 5, 5), pose_accepted=True,
             R_cam=R.tolist(), t_cam=[1.5, 2.0, 3.0])
    tr0.update([d2], cam7_identity())
    np.testing.assert_allclose(d2["t_world"], [1.5, 2.0, 3.0], atol=1e-12)


def test_crane_articulated_smoothing():
    tr = tracking.Tracker(smooth=0.5)
    def crane(tx):
        return {"class": "crane", "pose_accepted": True,
                "parts": [{"name": "cranebase", "bbox2d": [0, 0, 40, 40],
                           "R_cam": np.eye(3).tolist(),
                           "t_cam": [tx, 0.0, 10.0]},
                          {"name": "craneboom", "bbox2d": [10, 0, 80, 20],
                           "R_cam": np.eye(3).tolist(),
                           "t_cam": [tx + 2.0, 0.0, 14.0]}]}
    c0 = crane(4.0)
    tr.update([c0], cam7_identity())
    c1 = crane(6.0)
    tr.update([c1], cam7_identity())
    assert c1["track_id"] == c0["track_id"]
    # EMA with keep 0.5: 0.5*4 + 0.5*6 = 5
    np.testing.assert_allclose(c1["parts"][0]["t_world"], [5.0, 0.0, 10.0])
    np.testing.assert_allclose(c1["parts"][1]["t_world"], [7.0, 0.0, 14.0])


def test_sequence_metrics_score_shipped_smoothed_poses():
    """Records carrying t_world (infer --track output) are scored on those
    fields: a perfectly smoothed static object gives ~zero pose delta even
    when the raw camera-frame poses jitter."""
    rng = np.random.RandomState(1)
    records = []
    for fid in range(10):
        records.append({
            "frame_id": fid, "camera_pose7": cam7_identity(),
            "detections": [{
                "class": "dumper", "score": 0.9, "track_id": 0,
                "bbox2d": [10, 10, 50, 40], "pose_accepted": True,
                "R_cam": np.eye(3).tolist(),
                "t_cam": (np.array([5.0, 2.0, 0.0])
                          + rng.normal(0, 0.5, 3)).tolist(),
                "R_world": np.eye(3).tolist(),
                "t_world": [5.0, 2.0, 0.0],
            }]})
    out = sequence_metrics.sequence_metrics(records, seq_len=10)
    assert out["id_stability"] == 1.0
    assert out["mean_t_delta_m"] < 1e-9
    # without the smoothed fields the raw jitter shows
    for r in records:
        for d in r["detections"]:
            d.pop("R_world"); d.pop("t_world")
    out_raw = sequence_metrics.sequence_metrics(records, seq_len=10)
    assert out_raw["mean_t_delta_m"] > 0.3


def test_sequence_metrics_id_switch_rate():
    recs = []
    for fid in range(4):
        # track id flips between 0 and 1 every frame: 100% switch rate
        recs.append({"frame_id": fid, "camera_pose7": cam7_identity(),
                     "detections": [det("dumper", (10, 10, 50, 40),
                                        track_id=fid % 2)]})
    out = sequence_metrics.sequence_metrics(recs, seq_len=4)
    assert out["id_switch_rate"] == 1.0
    for r in recs:
        r["detections"][0]["track_id"] = 7
    out2 = sequence_metrics.sequence_metrics(recs, seq_len=4)
    assert out2["id_switch_rate"] == 0.0
    # no ids -> metric absent
    for r in recs:
        r["detections"][0].pop("track_id")
    assert "id_switch_rate" not in sequence_metrics.sequence_metrics(recs, 4)
