"""Unit tests for the device ops layer (rng, spectra, fresnel, ggx,
shading, texture)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glaze_tpu.core.spectrum import Spectrum
from glaze_tpu.ops import fresnel as fr
from glaze_tpu.ops import microfacet as mf
from glaze_tpu.ops import rng as rng_mod
from glaze_tpu.ops import shading
from glaze_tpu.ops import spectra
from glaze_tpu.ops import texture as tx


# ---------------------------------------------------------------------------
# rng
# ---------------------------------------------------------------------------


def _ref_hash(seed):
    """random.glsl:7-12 in numpy uint32."""
    seed = np.uint32(seed)
    state = np.uint32(seed * np.uint32(747796405) + np.uint32(2891336453))
    shift = np.uint32((state >> np.uint32(28)) + np.uint32(4))
    word = np.uint32(((state >> shift) ^ state) * np.uint32(277803737))
    return np.uint32((word >> np.uint32(22)) ^ word)


def test_hash_matches_reference_formula():
    with np.errstate(over="ignore"):
        for s in [0, 1, 12345, 0xDEADBEEF, 2**32 - 1]:
            got = int(rng_mod.hash_u32(jnp.uint32(s)))
            assert got == int(_ref_hash(s)), s


def test_uniform_floats_in_range_and_distributed():
    state = rng_mod.srand_f32x3(
        jnp.full((10000,), 7.0), jnp.arange(10000, dtype=jnp.float32),
        jnp.zeros(10000)
    )
    state, f = rng_mod.next_f32(state)
    f = np.asarray(f)
    assert f.min() >= 0.0 and f.max() < 1.0
    assert abs(f.mean() - 0.5) < 0.02
    # chain decorrelates
    state, f2 = rng_mod.next_f32(state)
    assert abs(np.corrcoef(f, np.asarray(f2))[0, 1]) < 0.05


# ---------------------------------------------------------------------------
# spectra
# ---------------------------------------------------------------------------


def test_from_rgb_matches_cpu_core():
    rng = np.random.default_rng(5)
    rgbs = rng.uniform(0, 1, (64, 3)).astype(np.float32)
    for is_light in (False, True):
        dev = np.asarray(spectra.from_rgb(jnp.asarray(rgbs), is_light))
        for i in range(len(rgbs)):
            cpu = Spectrum.from_rgb(rgbs[i], is_light).wavelength
            np.testing.assert_allclose(dev[i], cpu, atol=1e-6)


def test_luminance_and_xyz_match_cpu():
    rng = np.random.default_rng(6)
    sp = rng.uniform(0, 1, (16,)).astype(np.float32)
    dev_y = float(spectra.luminance(jnp.asarray(sp)))
    cpu_y = Spectrum(sp).luminance()
    assert abs(dev_y - cpu_y) < 1e-5
    xyz = np.asarray(spectra.to_xyz(jnp.asarray(sp)))
    cpu_xyz = Spectrum(sp).to_xyz()
    # core to_xyz scales by 100
    np.testing.assert_allclose(xyz * 100.0, [cpu_xyz.x, cpu_xyz.y, cpu_xyz.z],
                               rtol=1e-4, atol=1e-4)


def test_white_spectrum_roundtrip_rgb():
    """Smits white through the reference's XYZ->sRGB matrix: the spectrum is
    equal-energy so the D65-normalized matrix lands near but not at (1,1,1)
    (spectrum.glsl:74-81); pin the actual values as a regression anchor."""
    white = spectra.from_rgb(jnp.asarray([1.0, 1.0, 1.0]), False)
    xyz = np.asarray(spectra.to_xyz(white))
    np.testing.assert_allclose(xyz, [0.9966, 0.9984, 0.9943], atol=2e-3)
    rgb = np.asarray(spectra.to_rgb(white))
    np.testing.assert_allclose(rgb, [1.1992, 0.9483, 0.9030], atol=2e-3)


# ---------------------------------------------------------------------------
# fresnel
# ---------------------------------------------------------------------------


def test_fresnel_dielectric_bounds_and_tir():
    f_normal = float(fr.fresnel_dielectric(jnp.asarray(1.0), 1.0, 1.5))
    # normal incidence: ((n-1)/(n+1))^2 = 0.04
    assert abs(f_normal - 0.04) < 1e-3
    # total internal reflection from the dense side at grazing angle
    f_tir = float(fr.fresnel_dielectric(jnp.asarray(0.1), 1.5, 1.0))
    assert f_tir == 1.0


def test_fresnel_conductor_below_one():
    eta = jnp.full((16,), 0.15)
    k2 = eta * eta + jnp.full((16,), 3.0) ** 2
    f = np.asarray(fr.fresnel_conductor(jnp.asarray(0.7), eta, k2))
    assert np.all(f > 0.5) and np.all(f <= 1.0)


# ---------------------------------------------------------------------------
# microfacets
# ---------------------------------------------------------------------------


def test_ggx_d_integrates_to_one():
    """Integral of D(wh) cos(wh) over the hemisphere == 1."""
    n = 256
    theta = (np.arange(n) + 0.5) * (np.pi / 2) / n
    phi = (np.arange(n) + 0.5) * 2 * np.pi / n
    tt, pp = np.meshgrid(theta, phi, indexing="ij")
    wh = np.stack(
        [np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp), np.cos(tt)], -1
    ).reshape(-1, 3).astype(np.float32)
    a = jnp.broadcast_to(jnp.asarray([0.3, 0.3]), (wh.shape[0], 2))
    d = np.asarray(mf.ggx_d(jnp.asarray(wh), a))
    integrand = d * np.cos(tt).reshape(-1) * np.sin(tt).reshape(-1)
    integral = integrand.sum() * (np.pi / 2 / n) * (2 * np.pi / n)
    assert abs(integral - 1.0) < 0.02


def test_ggx_sample_wh_upper_hemisphere():
    rng = np.random.default_rng(3)
    wo = np.array([[0.3, 0.1, 0.95]] * 512, np.float32)
    wo /= np.linalg.norm(wo, axis=1, keepdims=True)
    rand = rng.uniform(0, 1, (512, 2)).astype(np.float32)
    a = jnp.broadcast_to(jnp.asarray([0.4, 0.4]), (512, 2))
    wh = np.asarray(mf.ggx_sample_wh(jnp.asarray(wo), jnp.asarray(rand), a))
    assert np.all(wh[:, 2] > 0)
    np.testing.assert_allclose(np.linalg.norm(wh, axis=1), 1.0, atol=1e-5)


# ---------------------------------------------------------------------------
# shading space
# ---------------------------------------------------------------------------


def test_shading_space_roundtrip():
    rng = np.random.default_rng(11)
    n = rng.normal(size=(32, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    dpdu = rng.normal(size=(32, 3)).astype(np.float32)
    frame = shading.new_shading_space(jnp.asarray(dpdu), jnp.asarray(n))
    f = np.asarray(frame)
    # orthonormal rows
    for i in range(3):
        np.testing.assert_allclose(np.linalg.norm(f[:, i], axis=1), 1.0, atol=1e-4)
    assert np.allclose((f[:, 0] * f[:, 2]).sum(1), 0, atol=1e-4)
    w = rng.normal(size=(32, 3)).astype(np.float32)
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    local = shading.to_shading_space(jnp.asarray(w), frame)
    back = np.asarray(shading.to_world_space(local, frame))
    np.testing.assert_allclose(back, w, atol=1e-4)
    # normal maps to +z
    nz = np.asarray(shading.to_shading_space(jnp.asarray(n), frame))
    np.testing.assert_allclose(nz[:, 2], 1.0, atol=1e-4)


# ---------------------------------------------------------------------------
# texture atlas
# ---------------------------------------------------------------------------


def _atlas_from_arrays(arrays, fmts):
    from glaze_tpu.core.texture import Texture, TextureFormat, TextureInfo

    texs = []
    for arr, fmt in zip(arrays, fmts):
        info = TextureInfo("t", arr.shape[1], arr.shape[0], fmt)
        texs.append(Texture(info, [arr]))
    return tx.build_atlas(texs)


def test_atlas_nearest_texel_exact():
    from glaze_tpu.core.texture import TextureFormat

    rng = np.random.default_rng(8)
    img = rng.integers(0, 255, (4, 8, 4), dtype=np.uint8)
    atlas = _atlas_from_arrays([img], [TextureFormat.RgbaNorm])
    # sample exactly at texel centers -> bilinear == the texel
    ys, xs = np.meshgrid(np.arange(4), np.arange(8), indexing="ij")
    uv = np.stack([(xs + 0.5) / 8, (ys + 0.5) / 4], -1).reshape(-1, 2).astype(np.float32)
    got = np.asarray(
        tx.sample_rgba(atlas, jnp.zeros(32, jnp.int32), jnp.asarray(uv))
    )
    want = img.reshape(-1, 4).astype(np.float32) / 255.0
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_atlas_srgb_decode_and_gray():
    from glaze_tpu.core.texture import TextureFormat

    srgb_img = np.full((2, 2, 4), 128, np.uint8)
    gray = np.full((2, 2), 51, np.uint8)
    atlas = _atlas_from_arrays(
        [srgb_img, gray], [TextureFormat.RgbaSrgb, TextureFormat.Gray]
    )
    uv = jnp.asarray([[0.5, 0.5]], jnp.float32)
    rgb = float(tx.sample_rgb(atlas, jnp.asarray([0]), uv)[0, 0])
    assert abs(rgb - ((128 / 255 + 0.055) / 1.055) ** 2.4) < 1e-3
    r = float(tx.sample_r(atlas, jnp.asarray([1]), uv)[0])
    assert abs(r - 0.2) < 1e-3  # gray is linear

def test_atlas_wrap_repeat():
    from glaze_tpu.core.texture import TextureFormat

    img = np.zeros((1, 2, 4), np.uint8)
    img[0, 0] = [255, 0, 0, 255]
    img[0, 1] = [0, 255, 0, 255]
    atlas = _atlas_from_arrays([img], [TextureFormat.RgbaNorm])
    a = np.asarray(tx.sample_rgb(atlas, jnp.asarray([0]), jnp.asarray([[0.25, 0.5]])))
    b = np.asarray(tx.sample_rgb(atlas, jnp.asarray([0]), jnp.asarray([[1.25, 0.5]])))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_atlas_bilinear_matches_numpy():
    """Off-center samples exercise all four 2x2-quad taps (incl. the
    down/down-right neighbors and y wrap) against a NumPy reference."""
    from glaze_tpu.core.texture import TextureFormat

    rng = np.random.default_rng(12)
    h, w = 4, 8
    img = rng.integers(0, 255, (h, w, 4), dtype=np.uint8)
    atlas = _atlas_from_arrays([img], [TextureFormat.RgbaNorm])
    uv = rng.random((64, 2)).astype(np.float32)
    uv[:4] = [[0.99, 0.99], [0.01, 0.99], [0.5, 0.999], [0.0, 0.0]]

    got = np.asarray(tx.sample_rgba_v(
        atlas, jnp.zeros(64, jnp.int32),
        jnp.asarray(uv[:, 0]), jnp.asarray(uv[:, 1])))  # (4, 64)

    tex = img.astype(np.float64) / 255.0
    x = uv[:, 0] * w - 0.5
    y = uv[:, 1] * h - 0.5
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    fx = x - x0
    fy = y - y0
    c00 = tex[y0 % h, x0 % w]
    c10 = tex[y0 % h, (x0 + 1) % w]
    c01 = tex[(y0 + 1) % h, x0 % w]
    c11 = tex[(y0 + 1) % h, (x0 + 1) % w]
    want = ((c00 * (1 - fx)[:, None] + c10 * fx[:, None]) * (1 - fy)[:, None]
            + (c01 * (1 - fx)[:, None] + c11 * fx[:, None]) * fy[:, None])
    np.testing.assert_allclose(np.stack(got, -1), want, atol=2e-3)
