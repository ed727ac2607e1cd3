"""Baked 8x8 barycentric opacity cell masks (the in-kernel
raytrace_hit.rahit:1-39 equivalent): packing round-trip, EXACT cell
classification, masked-walker semantics (XLA fallback + Pallas interpret
parity), and end-to-end equivalence with the unmasked re-trace path."""

import numpy as np
import jax.numpy as jnp
import pytest

from glaze_tpu.accel import bvh as bvhmod
from glaze_tpu.accel import closest_hit_soa_masked_auto
from glaze_tpu.accel.bvh import (
    ALPHA_MASK_GRID,
    ALPHA_MASK_WORDS,
    attach_tri_payload,
    build_bvh_chunked,
    closest_hit_masked,
    pack_alpha_masks,
)
from glaze_tpu.core import (
    Light,
    LightType,
    Material,
    MaterialType,
    Texture,
    TextureFormat,
    TextureInfo,
)
from glaze_tpu.render import integrator as integ
from glaze_tpu.scene.flatten import (
    _classify_alpha_cells,
    flatten_scene,
)

from test_render import SceneBuilder


def _unpack_cell(words, cell):
    return (int(words[cell >> 4]) >> ((cell & 15) * 2)) & 3


def test_pack_alpha_masks_roundtrip():
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 3, size=(11, 64)).astype(np.int8)
    packed = pack_alpha_masks(codes)
    assert packed.shape == (11, ALPHA_MASK_WORDS)
    w = packed.view(np.uint32)
    for k in range(11):
        for c in range(64):
            assert _unpack_cell(w[k], c) == codes[k, c]


def _bilinear_alpha(arr, u, v):
    """The runtime opacity sample (ops/texture.py sample_r, Gray, no
    sRGB): repeat wrap, bilinear, /255."""
    h, w = arr.shape
    u = u - np.floor(u)
    v = v - np.floor(v)
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = int(np.floor(x))
    y0 = int(np.floor(y))
    fx = x - x0
    fy = y - y0
    tap = lambda xx, yy: arr[yy % h, xx % w] / 255.0
    top = tap(x0, y0) * (1 - fx) + tap(x0 + 1, y0) * fx
    bot = tap(x0, y0 + 1) * (1 - fx) + tap(x0 + 1, y0 + 1) * fx
    return top * (1 - fy) + bot * fy


def test_classify_alpha_cells_exact():
    """Cell codes must be EXACT: every bilinear sample inside an
    opaque/transparent-coded cell must actually be >= / < 0.5."""
    rng = np.random.default_rng(3)
    # blobby random binary texture (some structure so all codes appear)
    n = 32
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    field = np.sin(xx * 0.7) + np.cos(yy * 0.5) + rng.normal(0, 0.3, (n, n))
    arr = np.where(field > 0, 255, 0).astype(np.uint8)
    tex = Texture(TextureInfo("op", n, n, TextureFormat.Gray), [arr])

    tri_uv = np.asarray([
        [[0.05, 0.1], [0.9, 0.2], [0.3, 0.95]],   # generic triangle
        [[-0.2, 0.4], [1.3, -0.1], [0.6, 1.4]],   # wraps the texture
    ], np.float32).reshape(-1, 2)
    idx = np.asarray([[0, 1, 2], [3, 4, 5]])
    # _classify_alpha_cells takes per-vertex uv + triangle vertex ids
    codes = _classify_alpha_cells(tri_uv.reshape(-1, 3, 2),
                                  np.arange(2), tex)
    assert codes.shape == (2, 64)
    assert set(np.unique(codes)) <= {0, 1, 2}

    g = ALPHA_MASK_GRID
    for k in range(2):
        uv0, uv1, uv2 = tri_uv.reshape(-1, 3, 2)[k]
        for cell in range(g * g):
            code = codes[k, cell]
            if code == 0:
                continue
            cu, cv = cell % g, cell // g
            # random barycentric points inside the cell (and the
            # triangle domain u + v <= 1)
            us = (cu + rng.random(40)) / g
            vs = (cv + rng.random(40)) / g
            keep = us + vs <= 1.0
            for u, v in zip(us[keep], vs[keep]):
                tu = (1 - u - v) * uv0[0] + u * uv1[0] + v * uv2[0]
                tv = (1 - u - v) * uv0[1] + u * uv1[1] + v * uv2[1]
                a = _bilinear_alpha(arr, tu, tv)
                if code == 1:
                    assert a >= 0.5, (k, cell, u, v, a)
                else:
                    assert a < 0.5, (k, cell, u, v, a)


def _two_quads():
    """Two unit quads at z=1 (payload-bearing) and z=-1, as world tris."""
    def quad(z, s):
        a, b, c, d = ([-s, -s, z], [s, -s, z], [s, s, z], [-s, s, z])
        return [[a, b, c], [a, c, d]]

    return np.asarray(quad(1.0, 1.0) + quad(-1.0, 5.0), np.float32)


def test_masked_walker_skips_transparent_cells():
    """Payload-coded TRANSPARENT cells are skipped mid-walk; OPAQUE and
    MIXED cells are accepted, MIXED flagged. XLA fallback and Pallas
    interpret mode agree."""
    tris = _two_quads()
    bvh, order = build_bvh_chunked(tris)
    sent = order == bvhmod.SENTINEL
    local = np.where(sent, 0, order).astype(np.int64)

    # payload per ORIGINAL tri: tris 0/1 (front quad) get a mask that is
    # TRANSPARENT where u < 0.5... use full-transparent for tri 0,
    # full-opaque for tri 1; back quad (2/3) all MIXED (zero payload)
    codes = np.zeros((4, 64), np.int8)
    codes[0, :] = 2
    codes[1, :] = 1
    payload = pack_alpha_masks(codes)[local]
    payload[sent] = 0
    masked = attach_tri_payload(bvh, payload)

    # rays at x=+-0.5 hit the front quad's two triangles: the quad is
    # split (a, b, c) / (a, c, d) with a=(-1,-1), so x=0.5, y=-0.5 lies
    # in tri 0 (transparent -> skipped, lands on back quad) and
    # x=-0.5, y=0.5 in tri 1 (opaque -> accepted)
    o = (jnp.asarray([0.5, -0.5, 0.5]), jnp.asarray([-0.5, 0.5, -0.5]),
         jnp.asarray([5.0, 5.0, 5.0]))
    d = (jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([0.0, 0.0, 0.0]),
         jnp.asarray([-1.0, -1.0, -1.0]))

    hit = closest_hit_masked(masked, jnp.stack(o, -1), jnp.stack(d, -1))
    t = np.asarray(hit["t"])
    mixed = np.asarray(hit["mixed"])
    assert abs(t[0] - 6.0) < 1e-3          # skipped transparent tri
    assert abs(t[1] - 4.0) < 1e-3          # accepted opaque tri
    assert abs(t[2] - 6.0) < 1e-3
    assert not mixed[1]                     # opaque cell: no retest
    assert mixed[0] and mixed[2]            # back quad has no payload

    # Pallas kernel (interpret mode) agrees bit for bit
    from glaze_tpu.accel.traverse_pallas import closest_hit_soa_masked

    chunk = masked.chunks[0] if hasattr(masked, "chunks") else masked
    hp = closest_hit_soa_masked(chunk, o, d, interpret=True)
    np.testing.assert_allclose(np.asarray(hp["t"]), t, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(hp["tri"]),
                                  np.asarray(hit["tri"]))
    np.testing.assert_array_equal(np.asarray(hp["mixed"]), mixed)

    # zero payload == plain closest_hit with every hit mixed
    h0 = closest_hit_soa_masked_auto(bvh, o, d)
    assert abs(np.asarray(h0["t"])[0] - 4.0) < 1e-3
    assert np.asarray(h0["mixed"])[np.asarray(h0["tri"]) >= 0].all()


def _screen_scene(n_screens=3):
    """Stacked alpha screens with a 32x32 texture opaque ONLY in a
    corner blob: mixed at triangle level (stays in the alpha tree), but
    cells away from the blob classify TRANSPARENT."""
    sb = SceneBuilder()
    arr = np.zeros((32, 32), np.uint8)
    arr[:6, :6] = 255  # opaque blob at uv ~ (0..0.2, 0..0.2)
    sb._textures.append(
        Texture(TextureInfo("op", 32, 32, TextureFormat.Gray), [arr])
    )
    sb._materials = [
        Material(name="screen", mtype=MaterialType.LAMBERT, opacity=1),
        Material(name="wall", mtype=MaterialType.LAMBERT),
    ]
    for i in range(n_screens):
        z = 4.0 - i * 0.5
        sb.add_quad([-1, -1, z], [1, -1, z], [1, 1, z], [-1, 1, z],
                    [0, 0, 1], 0)
    sb.add_quad([-5, -5, 1.0], [5, -5, 1.0], [5, 5, 1.0], [-5, 5, 1.0],
                [0, 0, 1], 1)
    sb._lights = [Light(ltype=LightType.OMNI, position=[0, 0, 6],
                        intensity=5.0)]
    return sb


def test_in_walk_skipping_beats_round_budget(monkeypatch):
    """THREE stacked screens, all classified-transparent along the ray:
    with masks the walk skips them without consuming re-trace rounds, so
    alpha_rounds=1 still reaches the wall. With masks disabled
    (GLAZE_ALPHA_MASK=0) the same budget stops early — proving the
    masks do the skipping in-kernel."""
    sb = _screen_scene(3)
    scene, cam, host = flatten_scene(sb)
    assert scene.bvh_alpha is not None

    # ray through uv ~ (0.75, 0.75): far from the opaque blob
    o = (jnp.asarray([0.5]), jnp.asarray([0.5]), jnp.asarray([8.0]))
    d = (jnp.asarray([0.0]), jnp.asarray([0.0]), jnp.asarray([-1.0]))
    hit = integ.trace_alpha(scene, o, d, alpha_rounds=1)
    assert abs(float(hit["t"][0]) - 7.0) < 1e-3  # wall at z=1

    monkeypatch.setenv("GLAZE_ALPHA_MASK", "0")
    scene0, _, _ = flatten_scene(sb)
    hit0 = integ.trace_alpha(scene0, o, d, alpha_rounds=1)
    # one round resolves screen 1, screen 2's hit is treated opaque
    assert float(hit0["t"][0]) < 6.0

    # and through the opaque blob (uv ~ (0.08, 0.08) -> x,y ~ -0.84):
    # the first screen blocks, masks or not
    ob = (jnp.asarray([-0.84]), jnp.asarray([-0.84]), jnp.asarray([8.0]))
    hb = integ.trace_alpha(scene, ob, d, alpha_rounds=1)
    assert abs(float(hb["t"][0]) - 4.0) < 1e-3  # screen at z=4


def test_masked_anyhit_three_state():
    """Masked any-hit: OPAQUE-cell hit blocks, TRANSPARENT-cell hit
    never blocks, MIXED-cell-only lanes report pending. XLA fallback
    and Pallas interpret mode agree."""
    from glaze_tpu.accel.bvh import any_hit_masked
    from glaze_tpu.accel.traverse_pallas import any_hit_soa_masked

    tris = _two_quads()
    bvh, order = build_bvh_chunked(tris)
    sent = order == bvhmod.SENTINEL
    local = np.where(sent, 0, order).astype(np.int64)
    codes = np.zeros((4, 64), np.int8)
    codes[0, :] = 2   # front tri 0: transparent
    codes[1, :] = 1   # front tri 1: opaque
    # back quad (tris 2/3): zero payload -> mixed
    payload = pack_alpha_masks(codes)[local]
    payload[sent] = 0
    masked = attach_tri_payload(bvh, payload)

    o = (jnp.asarray([0.5, -0.5, 0.5]), jnp.asarray([-0.5, 0.5, -0.5]),
         jnp.asarray([5.0, 5.0, 5.0]))
    d = (jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([0.0, 0.0, 0.0]),
         jnp.asarray([-1.0, -1.0, -1.0]))
    # lane0: through transparent tri, t_max stops before the back quad
    # lane1: opaque tri at t=4 -> blocked
    # lane2: through transparent tri, reaches the MIXED back quad
    tmax = jnp.asarray([5.0, 5.0, 7.0])
    blk, pend = any_hit_masked(masked, jnp.stack(o, -1), jnp.stack(d, -1),
                               tmax)
    np.testing.assert_array_equal(np.asarray(blk), [False, True, False])
    np.testing.assert_array_equal(np.asarray(pend), [False, False, True])

    bp, pp = any_hit_soa_masked(masked, o, d, tmax, interpret=True)
    np.testing.assert_array_equal(np.asarray(bp), np.asarray(blk))
    np.testing.assert_array_equal(np.asarray(pp), np.asarray(pend))


def test_occlusion_masked_matches_fallback():
    """The single-walk 3-state occlusion equals the whole-scene
    re-trace on random shadow rays through the screen scene."""
    sb = _screen_scene(2)
    scene, cam, host = flatten_scene(sb)
    rng = np.random.default_rng(5)
    n = 256
    o = (jnp.asarray(rng.uniform(-2, 2, n), jnp.float32),
         jnp.asarray(rng.uniform(-2, 2, n), jnp.float32),
         jnp.asarray(np.full(n, 8.0), jnp.float32))
    d = (jnp.zeros(n), jnp.zeros(n), jnp.full((n,), -1.0))
    act = jnp.asarray(rng.random(n) < 0.8)
    t_max = jnp.asarray(rng.uniform(2.0, 9.0, n), jnp.float32)

    got = integ._occlusion_sorted(scene, o, d, t_max, act, 4)
    ref = integ.trace_alpha_sorted(
        scene, o, d, t_max=jnp.where(act, t_max, -1.0),
        alpha_rounds=4)["tri"] >= 0
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_prefix_narrowed_rounds_match_full(monkeypatch):
    """The candidate-first prefix narrowing of the re-test rounds is
    exact while the candidates fit the prefix: a 4096-lane wavefront
    with ~1/4 alpha candidates traces identically at prefix 0.25 and
    at full width."""
    sb = _screen_scene(2)
    scene, cam, host = flatten_scene(sb)
    rng = np.random.default_rng(11)
    n = 4096
    # first 900 rays aim through the screens (candidates), the rest
    # start behind the wall pointing away (never candidates)
    ox = np.where(np.arange(n) < 900, rng.uniform(-0.9, 0.9, n), 50.0)
    oy = rng.uniform(-0.9, 0.9, n)
    oz = np.where(np.arange(n) < 900, 8.0, -5.0)
    dz = np.where(np.arange(n) < 900, -1.0, -1.0)
    o = tuple(jnp.asarray(c, jnp.float32) for c in (ox, oy, oz))
    d = (jnp.zeros(n), jnp.zeros(n), jnp.asarray(dz, jnp.float32))

    monkeypatch.setattr(integ, "ALPHA_PREFIX", 0.25)
    a = integ.trace_alpha_sorted(scene, o, d, alpha_rounds=2)
    monkeypatch.setattr(integ, "ALPHA_PREFIX", 1.0)
    b = integ.trace_alpha_sorted(scene, o, d, alpha_rounds=2)
    np.testing.assert_array_equal(np.asarray(a["tri"]), np.asarray(b["tri"]))
    np.testing.assert_allclose(np.asarray(a["t"]), np.asarray(b["t"]),
                               atol=1e-5)


def test_masked_render_matches_unmasked(monkeypatch):
    """End-to-end: with a round budget high enough for the unmasked
    path to resolve every layer, masked and unmasked renders agree."""
    from glaze_tpu.render.renderer import RayTraceRenderer

    sb = _screen_scene(2)
    scene, cam, host = flatten_scene(sb)
    o = (jnp.asarray([0.5, -0.84]), jnp.asarray([0.5, -0.84]),
         jnp.asarray([8.0, 8.0]))
    d = (jnp.asarray([0.0, 0.0]), jnp.asarray([0.0, 0.0]),
         jnp.asarray([-1.0, -1.0]))
    h_m = integ.trace_alpha(scene, o, d, alpha_rounds=4)

    monkeypatch.setenv("GLAZE_ALPHA_MASK", "0")
    scene0, _, _ = flatten_scene(sb)
    h_u = integ.trace_alpha(scene0, o, d, alpha_rounds=4)
    np.testing.assert_allclose(np.asarray(h_m["t"]), np.asarray(h_u["t"]),
                               atol=2e-3)
    np.testing.assert_array_equal(np.asarray(h_m["tri"]),
                                  np.asarray(h_u["tri"]))

    monkeypatch.delenv("GLAZE_ALPHA_MASK")
    r_m = RayTraceRenderer(sb, width=16, height=16, seed=5)
    r_m._alpha_rounds = 4
    img_m = r_m.draw(4)
    monkeypatch.setenv("GLAZE_ALPHA_MASK", "0")
    r_u = RayTraceRenderer(sb, width=16, height=16, seed=5)
    r_u._alpha_rounds = 4
    img_u = r_u.draw(4)
    assert np.abs(img_m.astype(int) - img_u.astype(int)).max() <= 2
