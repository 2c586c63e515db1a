"""Hifi mesh render path (render/meshcast.py) vs a NumPy Möller–Trumbore
oracle, plus composite-caster semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from constructionsceneposeestimation_tpu.config import SceneConfig
from constructionsceneposeestimation_tpu.render import meshcast, raycast
from constructionsceneposeestimation_tpu.scene import world as world_mod


def mt_oracle(tris, origin, dirs):
    """Reference nearest-hit t per ray over a (T, 3, 3) world triangle soup."""
    v0 = tris[:, 0]
    e1 = tris[:, 1] - v0
    e2 = tris[:, 2] - v0
    s = (origin[None, :] - v0).astype(np.float32)
    q = np.cross(s, e1)
    te2q = np.einsum("tj,tj->t", e2, q)
    p = np.cross(dirs[:, None, :], e2[None, :, :])
    det = np.einsum("tj,ntj->nt", e1, p)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(np.abs(det) < 1e-9, np.inf, 1.0 / det)
        u = np.einsum("tj,ntj->nt", s, p) * inv
        v = np.einsum("nj,tj->nt", dirs, q) * inv
        t = te2q[None, :] * inv
        ok = (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-6)
    return np.where(ok, t, np.inf).min(1)


@pytest.fixture(scope="module")
def scene():
    cfg = SceneConfig()
    roster = world_mod.make_roster(cfg)
    pose = world_mod.default_pose(roster, cfg)
    world = world_mod.build_world(roster, pose)
    return cfg, roster, world


@pytest.fixture(scope="module")
def templates():
    tpl = meshcast.load_templates()
    if not tpl:
        pytest.skip("mesh_templates.npz not baked")
    return tpl


def look_at_rays(cam, target, res=48, half_fov=0.3):
    fwd = np.asarray(target, np.float32) - cam
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0.0, 0.0, 1.0])
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    xs = np.linspace(-half_fov, half_fov, res, dtype=np.float32)
    uu, vv = np.meshgrid(xs, xs)
    return (fwd[None] + right[None] * uu.reshape(-1, 1)
            + up[None] * -vv.reshape(-1, 1)).astype(np.float32)


def test_templates_match_calibrated_dims(templates):
    """Baked templates carry the PARITY.md-measured CAD dimensions and the
    proxy canonical frame (bottom-center origin)."""
    expect = {  # class -> (w, d, h) from tools/calibrate_proxies.py
        "trafficcone": (0.519, 0.519, 0.686),
        "fence": (3.731, 0.898, 2.001),
        "tree": (4.24, 4.99, 7.59),
    }
    for cls, (verts, faces) in templates.items():
        size = verts.max(0) - verts.min(0)
        ew, ed, eh = expect[cls]
        # decimation shrinks extremal verts a little; tree clustering is coarse
        tol = 0.35 if cls == "tree" else 0.12
        assert abs(size[2] - eh) / eh < tol, (cls, size)
        assert abs(size[0] - ew) / ew < tol or abs(size[1] - ed) / ed < tol
        lo = verts.min(0)
        hi = verts.max(0)
        assert abs(lo[2]) < 1e-3  # ground contact at z=0
        assert abs(lo[0] + hi[0]) < 1e-2 and abs(lo[1] + hi[1]) < 1e-2
        assert faces.min() >= 0 and faces.max() < len(verts)


def test_mesh_sweep_matches_numpy_oracle(scene, templates):
    cfg, roster, world = scene
    mesh = meshcast.make_mesh_caster(roster, templates, tri_block=512)
    assert mesh is not None
    c0, _ = roster.cone_slice
    cone_pos = np.asarray(world["inst_pos"])[c0]
    cam = (cone_pos + np.float32([2.5, 1.5, 1.2])).astype(np.float32)
    dirs = look_at_rays(cam, cone_pos + [0, 0, 0.3], res=40, half_fov=0.2)

    packed = mesh(world, jnp.asarray(cam), jnp.asarray(dirs))
    t, code = raycast._unpack(packed)
    t, code = np.asarray(t), np.asarray(code)

    # oracle over ALL meshed instances (the sweep's min is global)
    tris = []
    for cls, (v, f) in templates.items():
        for i, name in enumerate(roster.inst_class_names):
            if name != cls:
                continue
            R = np.asarray(world["inst_rot"])[i]
            p = np.asarray(world["inst_pos"])[i]
            tris.append((v @ R.T + p)[f])
    tris = np.concatenate(tris).astype(np.float32)
    tm = mt_oracle(tris, cam, dirs)

    hit_mine = t < raycast.INF * 0.99
    hit_oracle = np.isfinite(tm)
    assert (hit_mine == hit_oracle).mean() > 0.999
    both = hit_mine & hit_oracle
    assert both.sum() > 100
    # packed payload steals 6 mantissa bits: <= 2^-18 relative depth error
    assert np.abs(t[both] - tm[both]).max() < 1e-3
    # the cone must own the central pixels
    assert (code[both] - 2 == c0).any()


def test_tiled_grid_path_matches_chunk_path(scene, templates):
    """The image-tile reorder (grid_hw) must be a pure permutation: packed
    results are bit-identical to the contiguous-chunk path, which the numpy
    oracle test already pins."""
    cfg, roster, world = scene
    tiled = meshcast.make_mesh_caster(roster, templates, tile=1024,
                                      grid_hw=(64, 64))
    plain = meshcast.make_mesh_caster(roster, templates, tile=1024)
    cam = np.float32([14.0, -10.0, 2.5])
    dirs = look_at_rays(cam, [0.0, 0.0, 1.0], res=64, half_fov=0.6)
    ta, ca = raycast._unpack(tiled(world, jnp.asarray(cam), jnp.asarray(dirs)))
    tb, cb = raycast._unpack(plain(world, jnp.asarray(cam), jnp.asarray(dirs)))
    ta, ca, tb, cb = (np.asarray(x) for x in (ta, ca, tb, cb))
    hit = ta < raycast.INF * 0.99
    assert hit.sum() > 50  # scene actually in view
    np.testing.assert_array_equal(hit, tb < raycast.INF * 0.99)
    # identical depths + instance codes on hits (misses carry whatever code
    # the last visited block packed into the INF sentinel — masked by unpack)
    np.testing.assert_array_equal(ta[hit], tb[hit])
    np.testing.assert_array_equal(ca[hit], cb[hit])


def test_cull_skips_out_of_view_instances(scene, templates):
    """A tight ray bundle aimed at one cone must visit only a small fraction
    of the triangle blocks (the cull is the point of the rewrite)."""
    cfg, roster, world = scene
    mesh = meshcast.make_mesh_caster(roster, templates)
    c0, _ = roster.cone_slice
    cone_pos = np.asarray(world["inst_pos"])[c0]
    cam = (cone_pos + np.float32([2.0, 1.0, 0.8])).astype(np.float32)
    dirs = look_at_rays(cam, cone_pos + [0, 0, 0.3], res=32, half_fov=0.05)
    # count relevant instances with the same conservative AABB test
    R = np.asarray(world["inst_rot"])
    p = np.asarray(world["inst_pos"])
    n_rel = 0
    for cls, (v, f) in templates.items():
        lo_l, hi_l = v.min(0), v.max(0)
        for i, name in enumerate(roster.inst_class_names):
            if name != cls:
                continue
            cw = R[i] @ ((lo_l + hi_l) / 2) + p[i]
            hw = np.abs(R[i]) @ ((hi_l - lo_l) / 2)
            rel = np.asarray(meshcast._aabb_hit_any(
                jnp.asarray(cam), jnp.asarray(dirs),
                jnp.asarray((cw - hw)[None]), jnp.asarray((cw + hw)[None])))
            n_rel += int(rel[0])
    assert n_rel <= 4  # a handful of instances, not all ~34
    # and the sweep still hits the cone
    t, code = raycast._unpack(mesh(world, jnp.asarray(cam), jnp.asarray(dirs)))
    assert (np.asarray(code)[np.asarray(t) < raycast.INF * 0.99] - 2 == c0).any()


def test_hifi_preserves_unmeshed_classes(scene):
    """Rays that hit only non-meshed geometry (the dumper) return identical
    packed results through the composite and the plain analytic caster."""
    cfg, roster, world = scene
    hifi = meshcast.make_hifi_caster(roster, scene_cfg=cfg)
    if not hasattr(hifi, "mesh"):
        pytest.skip("mesh_templates.npz not baked")
    plain = raycast.make_raycaster(roster, scene_cfg=cfg)
    d0, _ = roster.dumper_slice
    dpos = np.asarray(world["inst_pos"])[d0]
    cam = (dpos + np.float32([4.0, 0.0, 1.5])).astype(np.float32)
    dirs = look_at_rays(cam, dpos + [0, 0, 0.8], res=32, half_fov=0.15)
    a = hifi.fast(world, jnp.asarray(cam), jnp.asarray(dirs))
    b = plain.fast(world, jnp.asarray(cam), jnp.asarray(dirs))
    on_dumper = np.asarray(b["inst"]) == d0
    assert on_dumper.sum() > 50
    np.testing.assert_array_equal(np.asarray(a["inst"])[on_dumper],
                                  np.asarray(b["inst"])[on_dumper])
    np.testing.assert_allclose(np.asarray(a["t"])[on_dumper],
                               np.asarray(b["t"])[on_dumper], rtol=1e-5)


def test_prim_mask_excludes_prims(scene):
    cfg, roster, world = scene
    c0, c1 = roster.cone_slice
    mask = ~np.isin(np.asarray(roster.prim_inst), np.arange(c0, c1))
    caster = raycast.make_raycaster(roster, scene_cfg=cfg, prim_mask=mask)
    cone_pos = np.asarray(world["inst_pos"])[c0]
    cam = (cone_pos + np.float32([2.0, 0.0, 0.5])).astype(np.float32)
    dirs = look_at_rays(cam, cone_pos + [0, 0, 0.3], res=24, half_fov=0.2)
    out = caster.fast(world, jnp.asarray(cam), jnp.asarray(dirs))
    inst = np.asarray(out["inst"])
    assert not np.isin(inst, np.arange(c0, c1)).any()
    # the unmasked caster DOES see the cone from here
    out2 = raycast.make_raycaster(roster, scene_cfg=cfg).fast(
        world, jnp.asarray(cam), jnp.asarray(dirs))
    assert np.isin(np.asarray(out2["inst"]), np.arange(c0, c1)).any()


def test_render_frame_hifi_labels_unchanged(scene):
    """6DoF labels (center/size/euler, from instance poses + template AABBs)
    are byte-identical between proxy and hifi renders; only the rendered
    surfaces move."""
    from constructionsceneposeestimation_tpu.core import camera as cam_mod
    from constructionsceneposeestimation_tpu.render import annotate

    cfg, roster, world = scene
    hifi = meshcast.make_hifi_caster(roster, scene_cfg=cfg)
    if not hasattr(hifi, "mesh"):
        pytest.skip("mesh_templates.npz not baked")
    plain = raycast.make_raycaster(roster, scene_cfg=cfg)
    intr = cam_mod.intrinsics_from_apertures(12.0, 25.0, 64, 64)
    cam = jnp.asarray([12.0, 6.0, 3.0], jnp.float32)
    tgt = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    a = annotate.render_frame(roster, hifi, world, cam, tgt, intr)
    b = annotate.render_frame(roster, plain, world, cam, tgt, intr)
    np.testing.assert_array_equal(np.asarray(a.center), np.asarray(b.center))
    np.testing.assert_array_equal(np.asarray(a.size), np.asarray(b.size))
    np.testing.assert_array_equal(np.asarray(a.euler_deg),
                                  np.asarray(b.euler_deg))
    # depth must be finite somewhere on meshed classes and the frame valid
    assert np.isfinite(np.asarray(a.depth)).any()
    assert int(a.pointcloud_count) > 100
