"""io/usdc crate reader vs the reference's composed scene binary.

``cad_models/world2.usd.backup`` is the only non-LFS-stub scene file the
reference ships; the reader mines it for the proxy-calibration ground truth
recorded in PARITY.md (tools/calibrate_proxies.py)."""

import os

import numpy as np
import pytest

from constructionsceneposeestimation_tpu.io import usdc

CRATE = "/root/reference/cad_models/world2.usd.backup"

pytestmark = pytest.mark.skipif(not os.path.exists(CRATE),
                                reason="reference crate not present")


def crate():
    if not hasattr(crate, "_c"):
        crate._c = usdc.CrateFile.from_file(CRATE)
    return crate._c


def test_lz4_roundtrip_known_vector():
    # Hand-built LZ4 block: 5 literals "abcde" then a 4-byte match at
    # offset 5 -> "abcdeabcd".
    block = bytes([0x50]) + b"abcde" + bytes([0x05, 0x00]) + bytes([0x00])
    # token 0x50: 5 literals, matchlen 0+4; trailing token 0x00: 0 literals.
    out = usdc.lz4_block_decompress(block)
    assert out == b"abcdeabcd", out


def test_sections_and_tokens():
    c = crate()
    assert set(c.sections) == {"TOKENS", "STRINGS", "FIELDS", "FIELDSETS",
                               "PATHS", "SPECS"}
    assert "World" in c.tokens and "xformOp:translate" in c.tokens
    assert len(c.paths) == 9431


def test_prim_tree_and_references():
    c = crate()
    prims = c.prims()
    root = c.specs["/"][1]
    assert c.value(root["defaultPrim"]) == "World"
    gp = prims["/World/GroundPlane"]
    refs = gp["references"]
    assert "./crane/Pk7.501-SLD_PNR3879.usd" in refs
    assert "./dumper.usd" in refs
    assert "./TrafficCone/TrafficCone.usd" in refs
    kids = gp["primChildren"]
    assert "DHGen" in kids and "tn__Pk7501SLD_PNR3879_fPM" in kids


def test_transforms_and_geometry():
    c = crate()
    # Dumper placement + unit scale (mm asset).
    tr, _q, s = c.local_transform("/World/GroundPlane/tn__09684481_")
    np.testing.assert_allclose(tr, [-7.369, 0.0, 0.468], atol=1e-3)
    np.testing.assert_allclose(s, [0.001] * 3, atol=1e-6)
    # Flattened cone copy carries authored points; local AABB in cm.
    aabb = c.mesh_aabb("/World/GroundPlane/Cone001_01/Cone001")
    size = (aabb[1] - aabb[0]) * 0.01  # prim scale is 0.01
    np.testing.assert_allclose(size, [0.519, 0.519, 0.686], atol=5e-3)


def test_integer_decoder_roundtrip():
    # decode(encode) identity on a synthetic stream: common delta 1 with an
    # int8 and an int16 exception.
    vals = [0, 1, 2, 7, 8, 9, 1000, 1001]
    deltas = [vals[0]] + [b - a for a, b in zip(vals, vals[1:])]
    common = 1
    codes = []
    payload = b""
    for d in deltas:
        if d == common:
            codes.append(0)
        elif -128 <= d < 128:
            codes.append(1)
            payload += d.to_bytes(1, "little", signed=True)
        else:
            codes.append(2)
            payload += d.to_bytes(2, "little", signed=True)
    packed = bytearray((len(codes) + 3) // 4)
    for i, cd in enumerate(codes):
        packed[i >> 2] |= cd << ((i & 3) * 2)
    buf = common.to_bytes(4, "little", signed=True) + bytes(packed) + payload
    assert usdc.decode_integers(buf, len(vals), 4) == vals
