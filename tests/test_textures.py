"""Image-texture tier (render/textures.py): low-rank factor sampling of the
reference's real texture images — reconstruction fidelity, wrap semantics,
label invariance of the rendered frame."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from constructionsceneposeestimation_tpu.config import Config
from constructionsceneposeestimation_tpu.core import camera
from constructionsceneposeestimation_tpu.render import annotate
from constructionsceneposeestimation_tpu.render import raycast as rc
from constructionsceneposeestimation_tpu.render import textures as tx
from constructionsceneposeestimation_tpu.scene import world as world_mod

CFG = Config().scene


@pytest.fixture(scope="module")
def factors():
    return tx.load_factors()


def test_factor_file_matches_slot_order(factors):
    _, _, bins, rank, names = tx._load_np()
    assert names == sorted(tx.TEX, key=tx.TEX.get)
    assert factors.U.shape == (factors.n_tex * bins, 3 * rank)
    assert factors.bins == bins and factors.rank == rank


def test_sample_reconstructs_bark(factors):
    """Sampling every bin center must reproduce the rank-K reconstruction of
    the source image (nearest-bin + SVD truncation are the only errors)."""
    import tools.build_texture_atlas as bta

    bins = factors.bins
    img = bta.load_linear(bta.SOURCES[0][1], "rgb", bins)  # bark, linear
    uu, vv = np.meshgrid(np.arange(bins), np.arange(bins), indexing="ij")
    u = jnp.asarray((uu.reshape(-1) + 0.5) / bins, jnp.float32)
    v = jnp.asarray((vv.reshape(-1) + 0.5) / bins, jnp.float32)
    s = tx.sample(factors, u, v, jnp.zeros(bins * bins, jnp.int32))
    rec = np.stack([np.asarray(c).reshape(bins, bins) for c in s], -1)
    rmse = float(np.sqrt(np.mean((rec - img) ** 2)))
    assert rmse < 0.05, rmse  # rank-12 linear-space reconstruction


def test_sample_wraps_and_selects_texture(factors):
    u = jnp.asarray([0.25, 0.25 + 3.0, 0.25 - 2.0], jnp.float32)
    v = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)
    tid = jnp.zeros(3, jnp.int32)
    r0, g0, b0 = tx.sample(factors, u, v, tid)
    np.testing.assert_allclose(np.asarray(r0)[0], np.asarray(r0)[1], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r0)[0], np.asarray(r0)[2], rtol=1e-5)
    # A different slot at the same (u, v) gives a different color.
    other = tx.sample(factors, u, v, jnp.full(3, tx.TEX["leaf"], jnp.int32))
    assert abs(float(r0[0]) - float(other[0][0])) > 1e-4 or \
        abs(float(g0[0]) - float(other[1][0])) > 1e-4


def test_render_with_image_textures_changes_rgb_only(factors):
    roster = world_mod.make_roster(CFG)
    pose = world_mod.default_pose(roster, CFG)
    world = world_mod.build_world(roster, pose)
    caster = rc.make_raycaster(roster, scene_cfg=CFG)
    intr = camera.intrinsics_from_apertures(12.0, 25.0, 128, 96)
    cam = jnp.asarray([9.0, 4.0, 3.0], jnp.float32)
    tgt = jnp.asarray([0.0, 0.0, 1.5], jnp.float32)
    base = annotate.render_frame(roster, caster, world, cam, tgt, intr)
    texd = annotate.render_frame(roster, caster, world, cam, tgt, intr,
                                 texture_factors=factors)
    np.testing.assert_array_equal(np.asarray(base.depth),
                                  np.asarray(texd.depth))
    np.testing.assert_array_equal(np.asarray(base.instance),
                                  np.asarray(texd.instance))
    np.testing.assert_array_equal(np.asarray(base.kpt_visible),
                                  np.asarray(texd.kpt_visible))
    a = np.asarray(base.rgb, np.float32)
    b = np.asarray(texd.rgb, np.float32)
    changed = np.abs(a - b).max(-1) > 2
    assert changed.any()
    inst = np.asarray(base.instance)
    classes = set()
    names = roster.inst_class_names
    for i in np.unique(inst[changed]):
        classes.add("ground" if i == -1 else ("sky" if i == -2 else names[i]))
    # Mapped surfaces change; sky never does.
    assert "sky" not in classes
    assert "ground" in classes or "tree" in classes, classes
    # Cones and fences have no image-texture mapping: their pixels are
    # untouched (procedural bands/grid remain authoritative).
    for i in np.unique(inst):
        if i >= 0 and names[i] in ("cone", "fence"):
            assert not changed[inst == i].any(), names[i]


def test_nr_sample_decodes_normal_and_roughness(factors):
    """The *_nr composite slots carry [nx, ny, roughness]: sampling
    bin centers must reproduce the rank-K reconstruction of the packed
    composite built from the shipped normal + roughness images."""
    import tools.build_texture_atlas as bta

    bins = factors.bins
    name, npth, rpth, rch = bta.NR_SOURCES[0]  # denim_nr
    img = bta.load_nr(npth, rpth, rch, bins)
    uu, vv = np.meshgrid(np.arange(bins), np.arange(bins), indexing="ij")
    u = jnp.asarray((uu.reshape(-1) + 0.5) / bins, jnp.float32)
    v = jnp.asarray((vv.reshape(-1) + 0.5) / bins, jnp.float32)
    s = tx.sample(factors, u, v,
                  jnp.full(bins * bins, tx.TEX[name], jnp.int32))
    rec = np.stack([np.asarray(c).reshape(bins, bins) for c in s], -1)
    rmse = float(np.sqrt(np.mean((rec - np.clip(img, 0, 1)) ** 2)))
    assert rmse < 0.05, rmse
    # A normal map encodes (n+1)/2: its mean must sit near 0.5 on x/y.
    assert 0.35 < rec[..., 0].mean() < 0.65
    assert 0.35 < rec[..., 1].mean() < 0.65


def test_apply_with_nr_weights_and_perturb(factors):
    """with_nr returns zero offsets/weights off the mapped surfaces, and
    perturb_normal leaves unmapped pixels' normals exactly unit/unchanged."""
    from constructionsceneposeestimation_tpu.render import shading as sh

    n = 64
    lx = jnp.linspace(-1, 1, n)
    ly = jnp.zeros(n)
    lz = jnp.linspace(0.0, 2.0, n)
    cls = jnp.full(n, 5.0)  # human: legs/vest/shirt bands by lz
    alb = (jnp.full(n, 0.5),) * 3
    out, (du, dv, rough, w_nr) = tx.apply_image_textures(
        alb, lx, ly, lz, lx, ly, cls, factors, with_nr=True)
    w = np.asarray(w_nr)
    z = np.asarray(lz)
    assert (w[z <= 1.58] == 1.0).all()  # legs+vest+shirt all mapped
    assert (w[z > 1.58] == 0.0).all()   # head unmapped
    assert (np.asarray(du)[w == 0.0] == 0.0).all()
    # Ground pixels: no NR map.
    _, (_, _, _, w_g) = tx.apply_image_textures(
        alb, lx, ly, lz, lx, ly, jnp.full(n, -1.0), factors, with_nr=True)
    assert (np.asarray(w_g) == 0.0).all()
    # perturb_normal: zero offsets keep the normal; nonzero stays unit.
    nrm = (jnp.zeros(n), jnp.zeros(n), jnp.ones(n))
    px, py, pz = sh.perturb_normal(nrm, jnp.zeros(n), jnp.zeros(n))
    np.testing.assert_allclose(np.asarray(pz), 1.0, atol=1e-6)
    px, py, pz = sh.perturb_normal(nrm, du, dv)
    np.testing.assert_allclose(
        np.asarray(px ** 2 + py ** 2 + pz ** 2), 1.0, atol=1e-5)


def test_pipeline_hifi_plus_image_textures_compose():
    """The two fidelity tiers compose: CAD-mesh hifi geometry + real-image
    textures/NR in one pipeline (the --hifi --image-textures CLI path)."""
    from constructionsceneposeestimation_tpu.config import PipelineConfig
    from constructionsceneposeestimation_tpu.parallel import (
        pipeline as pipeline_mod)

    cfg = Config(pipeline=PipelineConfig(render_width=64, render_height=48,
                                         batch_size=1))
    pipe = pipeline_mod.Pipeline(cfg, vmap_chunk=1, hifi_mesh=True,
                                 image_textures=True)
    gen = jax.jit(pipe.make_generate_fn())
    batch = gen(jax.random.PRNGKey(1), jnp.arange(1))
    assert np.asarray(batch.rgb).std() > 5.0
    assert np.isfinite(np.asarray(batch.center)).all()


def test_shade_zero_spec_weight_is_bit_identical():
    """shade() with rough/spec_w planes of weight 0 must equal rough=None
    exactly — the per-pixel-weighted claim in render/shading.py."""
    from constructionsceneposeestimation_tpu.render import shading as sh

    n = 128
    k = jax.random.PRNGKey(0)
    t = jnp.abs(jax.random.normal(k, (n,))) * 10 + 1
    nrm = (jnp.full(n, 0.1), jnp.full(n, 0.2),
           jnp.full(n, np.sqrt(1 - 0.01 - 0.04)))
    pos = (jnp.zeros(n), jnp.zeros(n), jnp.ones(n))
    ray = (jnp.full(n, 0.6), jnp.zeros(n), jnp.full(n, -0.8))
    alb = (jnp.full(n, 0.5), jnp.full(n, 0.4), jnp.full(n, 0.3))
    lit = sh.default_lighting()
    base = sh.shade(t, nrm, pos, ray, alb, lit)
    spec0 = sh.shade(t, nrm, pos, ray, alb, lit,
                     rough=jnp.full(n, 0.7), spec_w=jnp.zeros(n))
    for a, b in zip(base, spec0):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Nonzero weight DOES brighten sun-facing pixels.
    spec1 = sh.shade(t, nrm, pos, ray, alb, lit,
                     rough=jnp.full(n, 0.3), spec_w=jnp.ones(n))
    assert float(jnp.max(spec1[0] - base[0])) > 1e-4


def test_pipeline_image_textures_flag():
    from constructionsceneposeestimation_tpu.config import PipelineConfig
    from constructionsceneposeestimation_tpu.parallel import (
        pipeline as pipeline_mod)

    cfg = Config(pipeline=PipelineConfig(render_width=64, render_height=48,
                                         batch_size=2))
    pipe = pipeline_mod.Pipeline(cfg, vmap_chunk=2, image_textures=True)
    gen = jax.jit(pipe.make_generate_fn())
    batch = gen(jax.random.PRNGKey(0), jnp.arange(2))
    assert np.asarray(batch.rgb).std() > 5.0
