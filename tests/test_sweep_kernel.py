"""Fused Pallas pixel sweep (render/sweep_kernel.py) vs the jnp caster.

Expected divergence: only grazing (near-tangent) rays on curved quadrics,
where disc ~ 0 makes t catastrophically sensitive to ULP-level operand
differences — a few dozen silhouette pixels at ~1e-4 relative t. Hit set
and instance codes must agree everywhere else."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from constructionsceneposeestimation_tpu.config import Config
from constructionsceneposeestimation_tpu.core import camera
from constructionsceneposeestimation_tpu.render import raycast as rc
from constructionsceneposeestimation_tpu.render import sweep_kernel
from constructionsceneposeestimation_tpu.sample import placement
from constructionsceneposeestimation_tpu.scene import world as world_mod

CFG = Config()


@pytest.fixture(scope="module")
def scene():
    roster = world_mod.make_roster(CFG.scene)
    pose, _ = placement.randomize_scene(jax.random.PRNGKey(5), roster,
                                        CFG.scene, CFG.randomization,
                                        articulate_crane=True)
    world = world_mod.build_world(roster, pose)
    caster = rc.make_raycaster(roster, scene_cfg=CFG.scene)
    return roster, world, caster


@pytest.mark.parametrize("cam,tgt", [
    ((9.0, 4.0, 3.0), (0.0, 0.0, 1.5)),
    ((-14.0, 8.0, 6.0), (2.0, 0.0, 1.0)),
    ((0.1, 0.1, 25.0), (0.0, 0.0, 0.0)),  # top-down: axis-parallel rays
])
def test_sweep_kernel_matches_caster(scene, cam, tgt):
    roster, world, caster = scene
    intr = camera.intrinsics_from_apertures(12.0, 25.0, 256, 192)
    sweep = sweep_kernel.make_pixel_sweeper(roster, intr, interpret=True)
    cam = jnp.asarray(cam, jnp.float32)
    tgt = jnp.asarray(tgt, jnp.float32)
    M = camera.look_at_matrix(cam, tgt)
    _, dirs = camera.pixel_rays(intr, cam, M)
    ref = caster.fast(world, cam, dirs.reshape(-1, 3))
    t_p, code_p = rc._unpack(sweep(world, cam, M))
    hitp = np.asarray(t_p) < rc.INF * 0.99
    t_k = np.where(hitp, np.asarray(t_p), np.inf)
    i_k = np.asarray(code_p) - 2
    t_r = np.asarray(ref["t"])
    i_r = np.asarray(ref["inst"])
    hit_r = np.isfinite(t_r)
    assert (hitp == hit_r).mean() > 0.9995
    both = hitp & hit_r
    assert both.sum() > 10000
    rel = np.abs(t_k[both] - t_r[both]) / t_r[both]
    assert rel.max() < 2e-4, rel.max()
    assert (rel > 1e-5).mean() < 0.005  # grazing silhouettes only
    assert (i_k[both] == i_r[both]).mean() > 0.999


def test_sweep_kernel_unsupported_shape(scene):
    roster, _, _ = scene
    intr = camera.intrinsics_from_apertures(12.0, 25.0, 64, 60)
    assert sweep_kernel.make_pixel_sweeper(roster, intr) is None


def test_render_frame_with_sweeper_labels_match(scene):
    """render_frame with the sweeper: labels (keypoints, 6DoF, visibility)
    must be identical — they derive from poses and the SEGMENT sweep, which
    stays on the jnp caster; depth agrees to silhouette tolerance."""
    from constructionsceneposeestimation_tpu.render import annotate

    roster, world, caster = scene
    intr = camera.intrinsics_from_apertures(12.0, 25.0, 128, 96)
    sweep = sweep_kernel.make_pixel_sweeper(roster, intr, interpret=True)
    cam = jnp.asarray([9.0, 4.0, 3.0], jnp.float32)
    tgt = jnp.asarray([0.0, 0.0, 1.5], jnp.float32)
    a = annotate.render_frame(roster, caster, world, cam, tgt, intr)
    b = annotate.render_frame(roster, caster, world, cam, tgt, intr,
                              pixel_sweeper=sweep)
    np.testing.assert_array_equal(np.asarray(a.kpt_uv), np.asarray(b.kpt_uv))
    np.testing.assert_array_equal(np.asarray(a.kpt_visible),
                                  np.asarray(b.kpt_visible))
    np.testing.assert_array_equal(np.asarray(a.center), np.asarray(b.center))
    da, db = np.asarray(a.depth), np.asarray(b.depth)
    bothf = np.isfinite(da) & np.isfinite(db)
    assert (np.isfinite(da) == np.isfinite(db)).mean() > 0.999
    np.testing.assert_allclose(da[bothf], db[bothf], rtol=3e-4)
    same_inst = (np.asarray(a.instance) == np.asarray(b.instance)).mean()
    assert same_inst > 0.999, same_inst
