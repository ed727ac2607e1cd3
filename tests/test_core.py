"""Numeric unit tests for the device-independent core.

Ports the reference's inline tests for spectrum (spectrum.rs:728+),
color (color.rs:325+), camera (camera.rs:295-308), texture mips
(texture.rs:294+), plus distribution sanity checks.
"""

import math

import numpy as np
import pytest

import glaze_tpu as g
from glaze_tpu.core.distribution import Distribution1D, Distribution2D
from glaze_tpu.core.spectrum import SPECTRUM_CYAN
from glaze_tpu.core.texture import gen_mipmaps_np, ilog2


# -- spectrum ---------------------------------------------------------------

def test_spectrum_black():
    res = g.Spectrum.black().to_xyz().to_rgb()
    assert res.r < 0.05 and res.g < 0.05 and res.b < 0.05


def test_spectrum_white():
    res = g.Spectrum.white().to_xyz().to_rgb()
    assert res.r > 0.95 and res.g > 0.95 and res.b > 0.95


def test_spectrum_rgb_to_spectrum():
    sp = g.Spectrum.from_rgb(g.ColorRGB(1.0, 1.0, 1.0), False)
    res = sp.to_xyz().to_rgb()
    assert res.r > 0.95 and res.g > 0.95 and res.b > 0.95


def test_spectrum_to_xyz():
    # spectrum.rs:763-770
    sp = g.Spectrum.from_rgb(g.ColorRGB(1.0, 0.0, 1.0), False)
    res = sp.to_xyz()
    assert res.x == pytest.approx(63.915726, abs=1e-4)
    assert res.y == pytest.approx(31.252344, abs=1e-4)
    assert res.z == pytest.approx(86.988340, abs=1e-4)


def test_spectrum_luminance():
    sp = g.Spectrum.from_rgb(g.ColorRGB(1.0, 0.0, 1.0), False)
    assert sp.luminance() == pytest.approx(0.31252345, abs=1e-5)


def test_spectrum_blackbody_zero():
    sp = g.Spectrum.from_blackbody(0.0)
    assert np.all(sp.wavelength == 0.0)


def test_spectrum_blackbody_red():
    rgb = g.Spectrum.from_blackbody(800.0).to_xyz().to_rgb()
    assert rgb.r == pytest.approx(0.4153538, abs=1e-4)
    assert rgb.g == 0.0
    assert rgb.b == 0.0


def test_spectrum_blackbody_white():
    rgb = g.Spectrum.from_blackbody(6500.0).to_xyz().to_rgb()
    assert rgb.r > 0.9 and rgb.g > 0.9 and rgb.b > 0.9


def test_spectrum_blackbody_blue():
    rgb = g.Spectrum.from_blackbody(20000.0).to_xyz().to_rgb()
    assert rgb.b > 0.8 and rgb.b > rgb.r and rgb.b > rgb.g


def test_spectrum_byte_roundtrip():
    sp = g.Spectrum(SPECTRUM_CYAN)
    assert g.Spectrum.from_le_bytes(sp.to_le_bytes()) == sp


def test_spectrum_operators():
    sp = g.Spectrum.from_rgb(g.ColorRGB(0.5, 0.5, 0.5), False)
    np.testing.assert_allclose((sp + sp).wavelength, sp.wavelength * 2, atol=1e-5)
    np.testing.assert_allclose((sp - sp).wavelength, 0.0, atol=1e-6)
    np.testing.assert_allclose((sp * sp).wavelength, sp.wavelength**2, atol=1e-5)
    np.testing.assert_allclose((sp / sp).wavelength, 1.0, atol=1e-5)
    np.testing.assert_allclose((sp * 0.1).wavelength, sp.wavelength * 0.1, atol=1e-6)
    np.testing.assert_allclose((sp / 0.1).wavelength, sp.wavelength / 0.1, atol=1e-4)


# -- color ------------------------------------------------------------------

def test_xyz_to_rgb():
    rgb = g.ColorXYZ(23.954, 19.020, 13.234).to_rgb()
    assert rgb.r == pytest.approx(0.67843, abs=1e-5)
    assert rgb.g == pytest.approx(0.39608, abs=1e-5)
    assert rgb.b == pytest.approx(0.37255, abs=1e-5)


def test_rgb_to_xyz():
    xyz = g.ColorRGB(0.67843, 0.39608, 0.37255).to_xyz()
    assert xyz.x == pytest.approx(23.954, abs=1e-3)
    assert xyz.y == pytest.approx(19.020, abs=1e-3)
    assert xyz.z == pytest.approx(13.234, abs=1e-3)


# -- camera -----------------------------------------------------------------

def test_fovx_to_fovy():
    cam = g.PerspectiveCam(
        position=[0, 0, 0], target=[0, 0, -1], up=[0, 1, 0],
        fovx=math.radians(91.0), near=0.1, far=100.0,
    )
    assert cam.fovy(1.453) == pytest.approx(math.radians(70.0), abs=1e-3)


def test_camera_controls():
    cam = g.Camera(g.PerspectiveCam(position=[0, 0, 0], target=[0, 0, 10]))
    cam.advance(2.0)
    np.testing.assert_allclose(cam.position(), [0, 0, 2], atol=1e-6)
    cam.elevate(1.0)
    np.testing.assert_allclose(cam.position(), [0, 1, 2], atol=1e-6)
    cam.strafe(1.0)
    assert abs(cam.position()[0]) > 0.5  # moved sideways
    tgt_before = cam.target().copy()
    cam.look_around(0.3, 0.0)
    assert not np.allclose(cam.target(), tgt_before)
    # distance to target preserved by look_around
    d0 = np.linalg.norm(tgt_before - cam.position())
    d1 = np.linalg.norm(cam.target() - cam.position())
    assert d1 == pytest.approx(d0, rel=1e-5)


def test_look_at_projection_invertible():
    cam = g.Camera(g.PerspectiveCam(position=[1, 2, 3], target=[0, 0, 0]))
    view = cam.look_at_rh()
    proj = cam.projection(640, 480)
    assert np.isfinite(np.linalg.inv(view)).all()
    assert np.isfinite(np.linalg.inv(proj)).all()
    # view maps camera position to origin
    p = view @ np.array([1, 2, 3, 1.0], np.float32)
    np.testing.assert_allclose(p[:3], 0.0, atol=1e-5)


# -- metals ------------------------------------------------------------------

def test_metal_tables():
    for metal in g.Metal.all_types():
        ior = metal.index_of_refraction()
        k = metal.absorption()
        assert ior.shape == (16,) and k.shape == (16,)
        assert np.all(ior > 0) and np.all(k > 0)
    assert g.Metal.from_u8(200) == g.Metal.SILVER
    assert g.Metal(2).display_name == "Gold"


# -- textures ----------------------------------------------------------------

def test_ilog2():
    for i in range(31):
        assert ilog2(1 << i) == i


def test_mipmap_generation():
    img = np.random.default_rng(0).integers(0, 255, (64, 512, 4), dtype=np.uint8)
    mips = gen_mipmaps_np(img)
    assert len(mips) == 10
    widths = [m.shape[1] for m in mips]
    heights = [m.shape[0] for m in mips]
    assert widths == [512, 256, 128, 64, 32, 16, 8, 4, 2, 1]
    assert heights == [64, 32, 16, 8, 4, 2, 1, 1, 1, 1]


def test_texture_mipmap_api():
    info = g.TextureInfo("t", 16, 16, g.TextureFormat.RgbaNorm)
    tex = g.Texture.new_rgba(info, np.zeros((16, 16, 4), np.uint8))
    assert tex.max_mipmap_levels() == 5
    assert not tex.has_mipmaps()
    tex.gen_mipmaps()
    assert tex.has_mipmaps()
    assert tex.dimensions(2) == (4, 4)
    assert tex.size_bytes(0) == 16 * 16 * 4


# -- distributions ------------------------------------------------------------

def test_distribution1d():
    d = Distribution1D([1.0, 2.0, 3.0, 2.0])
    cdf = d.cdf()
    assert len(cdf) == 5
    assert cdf[0] == 0.0 and cdf[-1] == pytest.approx(1.0)
    assert d.integral() == pytest.approx(2.0)  # (1+2+3+2)/4


def test_distribution1d_zero():
    d = Distribution1D([0.0, 0.0])
    np.testing.assert_allclose(d.cdf(), [0.0, 0.5, 1.0])
    assert d.integral() == 0.0


def test_distribution2d():
    vals = np.arange(12, dtype=np.float32) + 1
    d = Distribution2D(vals, 4)
    assert d.dimensions_values() == (4, 3)
    assert d.dimensions_cdf() == (5, 3)
    m = d.marginal()
    assert m.cdf()[-1] == pytest.approx(1.0)
    # conditional cdfs are monotone ending at 1
    cdfs = d.conditional_cdf()
    assert np.all(np.diff(cdfs, axis=1) >= 0)
    np.testing.assert_allclose(cdfs[:, -1], 1.0, atol=1e-6)


# -- lights / materials capability predicates ---------------------------------

def test_light_type_predicates():
    lt = g.LightType
    assert lt.OMNI.is_delta() and lt.SUN.is_delta()
    assert not lt.AREA.is_delta() and not lt.SKY.is_delta()
    assert lt.OMNI.has_position() and not lt.SUN.has_position()
    assert lt.SUN.has_direction()
    assert lt.AREA.has_resources() and lt.SKY.has_resources()


def test_material_type_predicates():
    mt = g.MaterialType
    assert mt.MIRROR.is_specular() and mt.GLASS.is_specular()
    assert not mt.UBER.is_specular()
    assert mt.UBER.is_fresnel_conductor() and mt.UBER.is_fresnel_dielectric()
    assert mt.FLAT.has_emission() and mt.LAMBERT.has_emission()
    assert not mt.METAL.has_emission()
    # SBT-compatible dispatch indices (material.rs:244-258)
    assert mt.LAMBERT.bsdf_index() == 4
    assert mt.UBER.bsdf_index() == 14
    assert mt.FLAT.bsdf_family() == mt.LAMBERT.bsdf_family() == 0


def test_light_rotation_matrix():
    l = g.Light(ltype=g.LightType.SKY, yaw_deg=90.0)
    m = l.rotation_matrix()
    v = m[:3, :3] @ np.array([1.0, 0.0, 0.0], np.float32)
    np.testing.assert_allclose(v, [0, 0, -1], atol=1e-6)
