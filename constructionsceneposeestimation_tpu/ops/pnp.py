"""Batched Perspective-n-Point 6-DoF recovery (pure JAX, MXU-friendly).

Equipment-pose inference (BASELINE.json config 4): decoded 2D keypoints +
their CAD-model 3D coordinates -> camera-frame pose, fully on TPU and batched
over (frames x objects) with vmap — the linear algebra (2Nx12 DLT SVD, 6x6
Gauss-Newton solves) maps onto batched matmuls.

Pipeline: weighted DLT initialization (smallest right-singular vector of the
projection constraint matrix, orthonormalized exactly like the reference
cleans annotator rotations, generate_construction_data.py:573-575) followed by
fixed-iteration Levenberg-damped Gauss-Newton on SE(3).

Conventions: ``points_2d`` are NORMALIZED image coordinates ((u-cx)/fx,
(v-cy)/fy); the returned (R, t) maps model points into the pinhole camera
frame (X right, Y down, Z forward): ``p_cam = R @ X + t``.
"""

from __future__ import annotations

import functools

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _pin_highest(fn):
    """Run the solver with every matmul at HIGHEST precision: TPU's default
    bf16 passes destroy the normal-equation solves (J^T J, FK chains) —
    observed rmse ~1e5 on v5e where CPU gives 1e-7."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


class PnPResult(NamedTuple):
    R: Array  # (..., 3, 3)
    t: Array  # (..., 3)
    rmse: Array  # (...,) weighted reprojection RMSE (normalized coords)
    valid: Array  # (...,) bool — enough weight mass to solve


def _hat(w: Array) -> Array:
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], -1),
            jnp.stack([wz, z, -wx], -1),
            jnp.stack([-wy, wx, z], -1),
        ],
        -2,
    )


def _exp_so3(w: Array) -> Array:
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    theta = jnp.maximum(theta, 1e-12)
    k = w / theta
    K = _hat(k)
    th = theta[..., None]
    I = jnp.eye(3, dtype=w.dtype)
    return I + jnp.sin(th) * K + (1.0 - jnp.cos(th)) * (K @ K)


def dlt_init(points_3d: Array, points_2d: Array, weights: Array):
    """Weighted DLT: (N, 3), (N, 2), (N,) -> (R, t)."""
    N = points_3d.shape[-2]
    X = jnp.concatenate([points_3d, jnp.ones_like(points_3d[..., :1])], -1)  # (N, 4)
    u = points_2d[..., 0:1]
    v = points_2d[..., 1:2]
    zeros = jnp.zeros_like(X)
    w = jnp.sqrt(jnp.maximum(weights, 0.0))[..., None]
    r1 = jnp.concatenate([X, zeros, -u * X], -1) * w  # (N, 12)
    r2 = jnp.concatenate([zeros, X, -v * X], -1) * w
    A = jnp.concatenate([r1, r2], -2)  # (2N, 12)
    # Smallest right-singular vector via eigh of A^T A (12x12 — cheap, batched).
    AtA = jnp.einsum("...ni,...nj->...ij", A, A, precision=jax.lax.Precision.HIGHEST)
    evals, evecs = jnp.linalg.eigh(AtA)
    p = evecs[..., :, 0]
    P = p.reshape(p.shape[:-1] + (3, 4))
    M = P[..., :, :3]
    # Cheirality: weighted mean depth must be positive.
    z = jnp.einsum("...j,...nj->...n", P[..., 2, :], X)
    sign = jnp.sign(jnp.sum(z * weights, -1))
    sign = jnp.where(sign == 0, 1.0, sign)
    P = P * sign[..., None, None]
    M = P[..., :, :3]
    U, S, Vt = jnp.linalg.svd(M)
    detUV = jnp.linalg.det(U @ Vt)
    D = jnp.stack([jnp.ones_like(detUV), jnp.ones_like(detUV), detUV], -1)
    R = (U * D[..., None, :]) @ Vt
    scale = jnp.mean(S * jnp.stack([jnp.ones_like(detUV)] * 2 + [detUV], -1), -1)
    scale = jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
    t = P[..., :, 3] / scale[..., None]
    return R, t


def _project(R, t, X):
    p = jnp.einsum("...ij,...nj->...ni", R, X, precision=jax.lax.Precision.HIGHEST) + t[..., None, :]
    z = jnp.where(jnp.abs(p[..., 2]) < 1e-9, 1e-9, p[..., 2])
    return p[..., :2] / z[..., None], p


@_pin_highest
def solve_pnp(
    points_3d: Array,  # (N, 3) model-frame points
    points_2d: Array,  # (N, 2) normalized image coords
    weights: Array,  # (N,) >= 0
    iters: int = 8,
    damping: float = 1e-4,
    min_points: int = 6,
) -> PnPResult:
    """DLT + Gauss-Newton. vmap over leading batch dims for fleets of objects.

    ``min_points`` counts correspondences with POSITIVE weight (not weight
    mass — confidence weights are fractional): the DLT system needs 6 for a
    unique projective solution; 4-5 yield garbage initializations that
    Gauss-Newton cannot recover from (observed as ~8 m ADD outliers)."""
    n_usable = jnp.sum(weights > 0, -1)
    valid = n_usable >= min_points
    w_safe = jnp.where(valid[..., None], weights, jnp.ones_like(weights))

    R0, t0 = dlt_init(points_3d, points_2d, w_safe)

    def gn_step(carry, _):
        R, t = carry
        proj, p_cam = _project(R, t, points_3d)
        r = (proj - points_2d) * w_safe[..., None]  # (N, 2)
        X, Y, Z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
        Zs = jnp.where(jnp.abs(Z) < 1e-9, 1e-9, Z)
        iz = 1.0 / Zs
        # d(proj)/d(p_cam): (N, 2, 3)
        zr = jnp.zeros_like(iz)
        Jp = jnp.stack(
            [
                jnp.stack([iz, zr, -X * iz * iz], -1),
                jnp.stack([zr, iz, -Y * iz * iz], -1),
            ],
            -2,
        )
        # dp/d[omega, dt] with left perturbation: dp/domega = -[p]x, dp/ddt = I.
        Jw = -_hat(p_cam)  # (N, 3, 3)
        I3 = jnp.broadcast_to(jnp.eye(3, dtype=Jw.dtype), Jw.shape)
        Jpose = jnp.concatenate([Jw, I3], -1)  # (N, 3, 6)
        J = jnp.einsum("...nij,...njk->...nik", Jp, Jpose,
                       precision=jax.lax.Precision.HIGHEST)  # (N, 2, 6)
        J = J * w_safe[..., None, None]
        Jf = J.reshape(J.shape[:-3] + (-1, 6))
        rf = r.reshape(r.shape[:-2] + (-1,))
        H = jnp.einsum("...ni,...nj->...ij", Jf, Jf, precision=jax.lax.Precision.HIGHEST)
        g = jnp.einsum("...ni,...n->...i", Jf, rf, precision=jax.lax.Precision.HIGHEST)
        H = H + damping * jnp.eye(6, dtype=H.dtype)
        delta = -jnp.linalg.solve(H, g[..., None])[..., 0]
        dR = _exp_so3(delta[..., :3])
        R_new = dR @ R
        t_new = jnp.einsum("...ij,...j->...i", dR, t) + delta[..., 3:]
        return (R_new, t_new), None

    (R, t), _ = jax.lax.scan(gn_step, (R0, t0), None, length=iters)
    proj, _ = _project(R, t, points_3d)
    err2 = jnp.sum((proj - points_2d) ** 2, -1) * w_safe
    rmse = jnp.sqrt(jnp.sum(err2, -1) / jnp.maximum(jnp.sum(w_safe, -1), 1e-9))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    R = jnp.where(valid[..., None, None], R, eye)
    t = jnp.where(valid[..., None], t, jnp.zeros_like(t))
    return PnPResult(R=R, t=t, rmse=rmse, valid=valid)


def normalize_pixels(uv: Array, fx: Array, fy: Array, cx: Array, cy: Array) -> Array:
    """Pixel -> normalized image coordinates."""
    return jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], -1)


@_pin_highest
def solve_ground_pose(
    points_3d: Array,  # (N, 3) model-frame points (z up, object on z=0)
    points_2d: Array,  # (N, 2) normalized image coords
    weights: Array,  # (N,)
    R_wp: Array,  # (3, 3) world-from-pinhole camera rotation
    cam_pos: Array,  # (3,) camera position (world)
    yaw_candidates: int = 16,
    iters: int = 12,
    damping: float = 1e-5,
    min_points: int = 3,
    huber: float = 0.02,
) -> PnPResult:
    """Pose with the construction-site ground prior: the object stands
    upright on the ground plane, so only (x, y, yaw) are free.

    Full 6-DoF PnP at 15-30 m range is rotation-ambiguous under weak
    perspective (measured 30-105 deg errors from 2-3 px keypoint noise);
    the 3-DoF ground-constrained solve is well-conditioned. Requires the
    camera extrinsics (calibrated in deployment; exact at datagen).
    Initialization: centroid ray dropped to the object's half-height plane +
    a yaw grid; refinement: Gauss-Newton on (x, y, yaw). Returns the pose in
    the CAMERA frame (like solve_pnp) for metric compatibility.
    """
    n_usable = jnp.sum(weights > 0, -1)
    valid = n_usable >= min_points
    w_safe = jnp.where(valid, weights, jnp.ones_like(weights))
    wsum = jnp.maximum(jnp.sum(w_safe), 1e-9)

    # --- init: intersect the weighted-centroid ray with z = z_center ---
    z_c = jnp.mean(points_3d[:, 2])
    uvc = jnp.sum(points_2d * w_safe[:, None], 0) / wsum
    d_pin = jnp.concatenate([uvc, jnp.ones(1, points_2d.dtype)])
    d_w = R_wp @ d_pin
    s = (z_c - cam_pos[2]) / jnp.where(jnp.abs(d_w[2]) < 1e-6, 1e-6, d_w[2])
    s = jnp.clip(s, 0.5, 500.0)
    xy0 = (cam_pos + s * d_w)[:2]

    def residuals(params, w=None):
        x, y, yaw = params[0], params[1], params[2]
        c, si = jnp.cos(yaw), jnp.sin(yaw)
        Rz = jnp.array([[c, -si, 0.0], [si, c, 0.0], [0.0, 0.0, 1.0]])
        p_w = points_3d @ Rz.T + jnp.stack([x, y, jnp.zeros_like(x)])
        p_cam = (p_w - cam_pos) @ R_wp  # R_wp^T applied row-wise
        z = jnp.where(jnp.abs(p_cam[:, 2]) < 1e-6, 1e-6, p_cam[:, 2])
        proj = p_cam[:, :2] / z[:, None]
        ww = w_safe if w is None else w
        return ((proj - points_2d) * ww[:, None]).reshape(-1), p_cam

    def irls_weights(params):
        """Huber reweighting: a confidently-detected but WRONG keypoint (a
        corner confused with its neighbor) otherwise twists the 3-DoF fit by
        tens of degrees. ``huber`` is in normalized coords (~2.5 px)."""
        r, _ = residuals(params, jnp.ones_like(w_safe))
        pn = jnp.linalg.norm(r.reshape(-1, 2), axis=-1)
        return w_safe * jnp.minimum(1.0, huber / jnp.maximum(pn, 1e-9))

    # --- yaw grid, pick the best start ---
    yaws = jnp.arange(yaw_candidates) * (2.0 * jnp.pi / yaw_candidates)

    def score(yaw):
        r, _ = residuals(jnp.stack([xy0[0], xy0[1], yaw]))
        return jnp.sum(r * r)

    best_yaw = yaws[jnp.argmin(jax.vmap(score)(yaws))]

    def gn(params, _):
        w = irls_weights(params)  # IRLS: weights fixed within the step
        J = jax.jacfwd(lambda p: residuals(p, w)[0])(params)  # (2N, 3)
        r, _ = residuals(params, w)
        H = J.T @ J + damping * jnp.eye(3)
        delta = -jnp.linalg.solve(H, J.T @ r)
        return params + delta, None

    # Symmetric-aware refinement: near-symmetric bodies (the dumper's cab vs
    # bed) put the coarse yaw grid within noise of the pi-mirrored basin, and
    # Gauss-Newton cannot cross between basins. Refine BOTH hypotheses and
    # keep the lower-residual one — the small asymmetric features (wheel
    # hubs, cab corners) decide. Scoring uses the ROBUST weights so an
    # outlier cannot veto the true basin.
    def refine(yaw0):
        p0 = jnp.stack([xy0[0], xy0[1], yaw0])
        params, _ = jax.lax.scan(gn, p0, None, length=iters)
        r, p_cam = residuals(params, irls_weights(params))
        return params, jnp.sum(r * r), p_cam

    (params2, sq2, pcam2) = jax.vmap(refine)(
        jnp.stack([best_yaw, best_yaw + jnp.pi]))
    pick = jnp.argmin(sq2)
    params = params2[pick]
    p_cam = pcam2[pick]
    rmse = jnp.sqrt(sq2[pick] / jnp.maximum(jnp.sum(w_safe), 1e-9))

    c, si = jnp.cos(params[2]), jnp.sin(params[2])
    Rz = jnp.array([[c, -si, 0.0], [si, c, 0.0], [0.0, 0.0, 1.0]])
    t_w = jnp.stack([params[0], params[1], jnp.zeros(())])
    # Camera-frame pose: p_cam = R_wp^T (Rz X + t_w - cam).
    R_cam = R_wp.T @ Rz
    t_cam = R_wp.T @ (t_w - cam_pos)
    cheirality = jnp.mean(p_cam[:, 2] * (w_safe > 0)) > 0
    valid = valid & cheirality
    eye = jnp.eye(3, dtype=R_cam.dtype)
    return PnPResult(
        R=jnp.where(valid, R_cam, eye),
        t=jnp.where(valid, t_cam, jnp.zeros_like(t_cam)),
        rmse=rmse,
        valid=valid,
    )


class CranePnPResult(NamedTuple):
    params: Array  # (..., 5) [x, y, yaw_col_rad, pitch_rad, ext_m]
    R: Array  # (..., 4, 3, 3) per-part camera-frame rotations (CRANE_PART_ORDER)
    t: Array  # (..., 4, 3)
    rmse: Array  # (...,) weighted reprojection RMSE (normalized coords)
    valid: Array  # (...,) bool


def solve_crane_pose(
    kpts_local: Array,  # (4, K, 3) part-local keypoints, kinematics.CRANE_PART_ORDER
    points_2d: Array,  # (4, K, 2) normalized image coords
    weights: Array,  # (4, K) >= 0
    R_wp: Array,  # (3, 3) world-from-pinhole camera rotation
    cam_pos: Array,  # (3,) camera position (world)
    yaw_candidates: int = 16,
    pitch_grid: Tuple[float, ...] = (15.0, 35.0, 55.0, 75.0),
    iters: int = 20,
    damping: float = 1e-4,
    min_points: int = 6,
    robust_width: float = 0.004,
) -> CranePnPResult:
    """FK-constrained crane pose: jointly recover (x, y, column yaw, boom
    pitch, telescopic extension) from the 2D keypoints of all four articulated
    parts at once.

    The construction-site prior makes this well-posed where per-part PnP is
    not: the crane root never rotates and sits on the ground (reference
    randomizer, generate_construction_data.py:1096/1104 — translation only),
    and the parts are rigidly coupled through the kinematic chain
    (scene/kinematics.crane_fk; reference part semantics at 110-121,
    1234-1279). 5 unknowns vs 24 part-DOF means even a handful of visible
    corners across parts pins the whole machine.

    Initialization: centroid ray dropped to mid-crane height + a
    (yaw x pitch) grid, all candidates scored batched; refinement:
    IRLS Levenberg-Marquardt on the 5 parameters with joint-limit clamping
    and a Cauchy robust loss of width ``robust_width`` (normalized-image
    units; ~4 px at fx~1000) — a single mislocalized keypoint that clears
    the caller's score gate must not drag the whole machine (measured on
    predicted base corners: median 24-48 crop-px outliers at score ~0.45).
    Returns per-part camera-frame poses (like solve_pnp) for ADD metrics.
    """
    from ..scene import kinematics  # here to keep ops/ -> scene/ one-way at import

    # TPU default matmul precision is bf16: the LM normal equations
    # (J^T J, 3x3 FK chains) lose the solve entirely at bf16 (observed rmse
    # ~1e5 on v5e where CPU gives 1e-7). Pin everything in the solver.
    with jax.default_matmul_precision("highest"):
        return _solve_crane_pose_f32(
            kpts_local, points_2d, weights, R_wp, cam_pos, kinematics,
            yaw_candidates, pitch_grid, iters, damping, min_points,
            robust_width)


def _solve_crane_pose_f32(kpts_local, points_2d, weights, R_wp, cam_pos,
                          kinematics, yaw_candidates, pitch_grid, iters,
                          damping, min_points, robust_width) -> CranePnPResult:
    w_flat = weights.reshape(-1)
    n_usable = jnp.sum(w_flat > 0)
    valid = n_usable >= min_points
    w_safe = jnp.where(valid, weights, jnp.ones_like(weights))

    def part_world(params):
        """(5,) -> per-part world (R (4,3,3), t (4,3))."""
        joints_deg = jnp.stack([
            jnp.rad2deg(params[2]), jnp.rad2deg(params[3]), params[4]])
        fk = kinematics.crane_fk(joints_deg)
        R_parts = jnp.stack([fk[p][0] for p in kinematics.CRANE_PART_ORDER])
        t_parts = jnp.stack([fk[p][1] for p in kinematics.CRANE_PART_ORDER])
        root = jnp.stack([params[0], params[1], jnp.zeros_like(params[0])])
        return R_parts, t_parts + root

    def raw_residuals(params):
        R_parts, t_parts = part_world(params)
        p_w = (jnp.einsum("pij,pkj->pki", R_parts, kpts_local,
                          precision=jax.lax.Precision.HIGHEST)
               + t_parts[:, None, :])  # (4, K, 3)
        p_cam = jnp.einsum("pkj,ji->pki", p_w - cam_pos, R_wp,
                           precision=jax.lax.Precision.HIGHEST)
        z = jnp.where(jnp.abs(p_cam[..., 2]) < 1e-6, 1e-6, p_cam[..., 2])
        proj = p_cam[..., :2] / z[..., None]
        return (proj - points_2d).reshape(-1, 2), p_cam  # per-point (4K, 2)

    def residuals(params):
        rr, p_cam = raw_residuals(params)
        return (rr * w_safe.reshape(-1, 1)).reshape(-1), p_cam

    # --- init: (yaw, pitch) grid with a per-candidate root-xy estimate ---
    # The visible-keypoint centroid sits wherever the boom points, meters from
    # the root, so a single centroid-ray xy is a bad anchor. Instead, for each
    # joint candidate: take the FK keypoint centroid in the ROOT frame
    # (weighted like the observations), drop the observed 2D centroid's ray to
    # that centroid's height, and subtract the centroid's horizontal offset —
    # a closed-form root-xy consistent with that articulation hypothesis.
    wsum = jnp.maximum(jnp.sum(w_safe), 1e-9)
    uvc = jnp.sum(points_2d * w_safe[..., None], (0, 1)) / wsum
    d_pin = jnp.concatenate([uvc, jnp.ones(1, points_2d.dtype)])
    d_w = R_wp @ d_pin

    yaws = jnp.arange(yaw_candidates) * (2.0 * jnp.pi / yaw_candidates) - jnp.pi
    pitches = jnp.deg2rad(jnp.asarray(pitch_grid, jnp.float32))
    grid = jnp.stack(jnp.meshgrid(yaws, pitches, indexing="ij"), -1).reshape(-1, 2)

    def candidate_params(yp):
        p5 = jnp.stack([jnp.float32(0.0), jnp.float32(0.0), yp[0], yp[1],
                        jnp.float32(1.0)])
        R_parts, t_parts = part_world(p5)
        p_root = (jnp.einsum("pij,pkj->pki", R_parts, kpts_local,
                             precision=jax.lax.Precision.HIGHEST)
                  + t_parts[:, None, :])  # (4, K, 3) root at origin
        c = jnp.sum(p_root * w_safe[..., None], (0, 1)) / wsum
        s = (c[2] - cam_pos[2]) / jnp.where(jnp.abs(d_w[2]) < 1e-6, 1e-6, d_w[2])
        s = jnp.clip(s, 0.5, 500.0)
        xy = (cam_pos + s * d_w)[:2] - c[:2]
        return jnp.stack([xy[0], xy[1], yp[0], yp[1], jnp.float32(1.0)])

    def score(yp):
        p5 = candidate_params(yp)
        r, _ = residuals(p5)
        return jnp.sum(r * r), p5

    scores, cands = jax.vmap(score)(grid)

    # Joint limits + site bounds (crane lives inside the fence; reference
    # placement bounds at generate_construction_data.py:935-941).
    lo = jnp.asarray([-20.0, -20.0, -7.0, jnp.deg2rad(5.0), -0.5], jnp.float32)
    hi = jnp.asarray([20.0, 20.0, 7.0, jnp.deg2rad(85.0), 2.5], jnp.float32)

    def lm(carry, _):
        params, lam = carry
        J = jax.jacfwd(lambda p: residuals(p)[0])(params)  # (2*4K, 5)
        r, _ = residuals(params)
        H = J.T @ J + lam * jnp.eye(5)
        delta = -jnp.linalg.solve(H, J.T @ r)
        cand = jnp.clip(params + delta, lo, hi)
        r_new, _ = residuals(cand)
        better = jnp.sum(r_new * r_new) < jnp.sum(r * r)
        params = jnp.where(better, cand, params)
        lam = jnp.where(better, jnp.maximum(lam * 0.3, 1e-8), lam * 5.0)
        return (params, lam), None

    # Multi-start refinement: near-collinear boom/telescopic axis keypoints
    # admit a Necker-flip basin — a wrong (yaw, pitch, ext) that reprojects
    # the axis line to ~1 px rmse while the true basin sits at ~0.01 px.
    # LM cannot cross between basins, so refine the best ``n_starts`` grid
    # candidates in parallel (vmapped — TPU-shaped multi-start, no loops)
    # and keep the lowest final residual.
    n_starts = 8
    _, top_idx = jax.lax.top_k(-scores, n_starts)  # 64-entry grid: tiny sort
    starts = cands[top_idx]

    def refine(p0):
        (p, _), _ = jax.lax.scan(lm, (p0, jnp.float32(damping)), None,
                                 length=iters)
        r, p_cam = residuals(p)
        return p, jnp.sum(r * r), p_cam

    params_r, sq_r, pcam_r = jax.vmap(refine)(starts)
    best = jnp.argmin(sq_r)
    params = params_r[best]
    p_cam = pcam_r[best]
    rmse = jnp.sqrt(sq_r[best] / jnp.maximum(jnp.sum(w_safe), 1e-9))

    R_parts, t_parts = part_world(params)
    # Camera-frame part poses: p_cam = R_wp^T (R_part X + t_part - cam).
    R_cam = jnp.einsum("ji,pjk->pik", R_wp, R_parts,
                       precision=jax.lax.Precision.HIGHEST)
    t_cam = jnp.einsum("ji,pj->pi", R_wp, t_parts - cam_pos,
                       precision=jax.lax.Precision.HIGHEST)
    cheirality = jnp.sum(p_cam[..., 2] * (w_safe > 0)) > 0
    valid = valid & cheirality
    eye4 = jnp.broadcast_to(jnp.eye(3, dtype=R_cam.dtype), R_cam.shape)
    return CranePnPResult(
        params=params,
        R=jnp.where(valid, R_cam, eye4),
        t=jnp.where(valid, t_cam, jnp.zeros_like(t_cam)),
        rmse=rmse,
        valid=valid,
    )


@_pin_highest
def solve_pnp_ransac(
    key: Array,
    points_3d: Array,  # (N, 3)
    points_2d: Array,  # (N, 2) normalized
    weights: Array,  # (N,)
    hypotheses: int = 32,
    subset: int = 6,
    inlier_thresh: float = 0.01,  # normalized-coord reprojection radius
    iters: int = 8,
    min_points: int = 6,
) -> PnPResult:
    """Robust PnP: RANSAC over minimal DLT subsets + inlier-weighted refine.

    Decoded keypoints contain structured outliers (symmetric-feature swaps,
    hallucinated occluded corners) that wreck a single weighted solve. All
    ``hypotheses`` minimal solves run batched (vmap over a leading hypothesis
    axis — TPU-shaped RANSAC, no loops); the best-consensus hypothesis's
    inliers drive the final Gauss-Newton. vmap over objects as usual.
    """
    N = points_3d.shape[-2]
    usable = weights > 0

    # Sample `hypotheses` subsets of size `subset`, biased toward usable
    # points: per-hypothesis Gumbel top-k over masked scores.
    g = jax.random.gumbel(key, (hypotheses, N))
    g = jnp.where(usable[None, :], g, -jnp.inf)
    _, sub_idx = jax.lax.top_k(g, subset)  # (H, subset)

    def solve_one(idx):
        X = points_3d[idx]
        x = points_2d[idx]
        w = jnp.ones(subset, points_2d.dtype)
        return dlt_init(X, x, w)

    R_h, t_h = jax.vmap(solve_one)(sub_idx)  # (H, 3, 3), (H, 3)

    proj, p_cam = _project(R_h, t_h, jnp.broadcast_to(points_3d, (hypotheses, N, 3)))
    err = jnp.linalg.norm(proj - points_2d[None], axis=-1)  # (H, N)
    in_front = p_cam[..., 2] > 0
    inlier = (err <= inlier_thresh) & usable[None, :] & in_front
    score = jnp.sum(inlier, -1)
    best = jnp.argmax(score)
    best_inliers = inlier[best]

    # Refine on the consensus set (fall back to all usable points when the
    # consensus is too thin to be meaningful).
    enough = jnp.sum(best_inliers) >= subset
    w_final = jnp.where(enough, best_inliers.astype(weights.dtype) * weights,
                        weights)
    return solve_pnp(points_3d, points_2d, w_final, iters=iters,
                     min_points=min_points)
