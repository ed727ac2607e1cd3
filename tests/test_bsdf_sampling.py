"""BSDF sampling validation: pdf-vs-histogram and reciprocity-style checks
(the reference ships no such tests; SURVEY §4 calls for them)."""

import numpy as np
import jax.numpy as jnp
import pytest

import __graft_entry__ as graft
from glaze_tpu.ops import microfacet as mf
from glaze_tpu.ops import rng as rng_mod
from glaze_tpu.render import bsdf as bsdf_mod


def _uniform(n, seed):
    state = rng_mod.srand_f32x3(
        jnp.full((n,), float(seed)), jnp.arange(n, dtype=jnp.float32),
        jnp.zeros(n)
    )
    state, a = rng_mod.next_f32(state)
    state, b = rng_mod.next_f32(state)
    state, c = rng_mod.next_f32(state)
    return a, b, c


def test_cosine_hemisphere_pdf_histogram():
    """Lambert sampling: wi.z distribution matches pdf = cos/pi."""
    n = 100000
    a, b, c = _uniform(n, 3)
    wo = (jnp.zeros(n), jnp.zeros(n), jnp.ones(n))
    wi = bsdf_mod._cosine_hemisphere(a, b, wo[2])
    z = np.asarray(wi[2])
    assert (z >= 0).all()
    # P(z < t) for cosine-weighted = t^2
    for t in (0.3, 0.5, 0.8):
        frac = (z < t).mean()
        assert abs(frac - t * t) < 0.01


def test_ggx_vndf_sampling_consistency():
    """Sampled half-vectors reproduce their own analytic pdf: for any
    region of the hemisphere, fraction of samples ~ integral of pdf."""
    n = 200000
    a, b, _ = _uniform(n, 5)
    wo = (jnp.full((n,), 0.4), jnp.full((n,), 0.1), jnp.full((n,), 0.91))
    wo = tuple(w / jnp.sqrt(sum(x * x for x in wo)) for w in wo)
    ax = jnp.full((n,), 0.5)
    wh = mf.ggx_sample_wh_v(wo, a, b, ax, ax)
    whz = np.asarray(wh[2])
    assert (whz > 0).mean() > 0.999  # VNDF: always wo's hemisphere here

    # Monte-Carlo check: E[f(wh)] computed two ways must agree.
    # Use the pdf itself: E[1/pdf] over samples = area of support (~2pi ish)
    d = mf.ggx_d_v(wh, ax, ax)
    pdf = np.asarray(mf.ggx_pdf_v(d, ax, ax, wo, wh))
    ok = pdf > 1e-6
    est = (1.0 / pdf[ok]).mean() * ok.mean()
    # integral of d(omega) over supported region is <= 2pi and > 1
    assert 0.5 < est < 2.0 * np.pi + 1.0


def test_glass_energy_split():
    """Glass sampling: reflect fraction approximates the Fresnel term."""
    from glaze_tpu.ops import fresnel as fr

    scene, _ = graft._tiny_scene(8, 8)
    n = 50000
    a, b, c = _uniform(n, 7)
    cos_i = 0.7
    s = np.sqrt(1 - cos_i * cos_i)
    wo = (jnp.full((n,), s), jnp.zeros(n), jnp.full((n,), cos_i))
    mat = {
        "bsdf": jnp.full((n,), bsdf_mod.FAMILY_GLASS, jnp.int32),
        "scalars": jnp.tile(
            jnp.asarray([1.5, 1, 0, 0, 1, 1, 1, 1], jnp.float32)[:, None],
            (1, n),
        ),
        "tex": jnp.zeros((5, n), jnp.int32),
        "metal_ior": jnp.ones((16, n)),
        "metal_fresnel": jnp.ones((16, n)),
    }
    uv = (jnp.zeros(n), jnp.zeros(n))
    wi, value, pdf = bsdf_mod._glass_sample(scene, mat, wo, uv, (a, b, c))
    reflected = np.asarray(wi[2]) > 0
    f = float(fr.fresnel_dielectric(jnp.asarray(cos_i), 1.000293, 1.5))
    assert abs(reflected.mean() - f) < 0.01
    # refracted rays obey Snell: sin_t = sin_i * etai/etat
    sin_t = np.sqrt(np.asarray(wi[0])**2 + np.asarray(wi[1])**2)
    snell = s * 1.000293 / 1.5
    np.testing.assert_allclose(sin_t[~reflected], snell, atol=1e-3)


def test_mirror_reflects_exactly():
    scene, _ = graft._tiny_scene(8, 8)
    n = 128
    wo = (jnp.full((n,), 0.6), jnp.full((n,), 0.0), jnp.full((n,), 0.8))
    mat = {
        "bsdf": jnp.full((n,), bsdf_mod.FAMILY_MIRROR, jnp.int32),
        "scalars": jnp.zeros((8, n)),
        "tex": jnp.zeros((5, n), jnp.int32),
        "metal_ior": jnp.full((16, n), 0.15),
        "metal_fresnel": jnp.full((16, n), 9.0),
    }
    uv = (jnp.zeros(n), jnp.zeros(n))
    wi, value, pdf = bsdf_mod._mirror_sample(scene, mat, wo, uv,
                                             (jnp.zeros(n),) * 3)
    np.testing.assert_allclose(np.asarray(wi[0]), -0.6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(wi[2]), 0.8, atol=1e-6)
    assert (np.asarray(pdf) == 1.0).all()
    # conductor reflectance is below 1 everywhere
    v = np.asarray(value)
    assert (v >= 0).all() and (v * 0.8 <= 1.0 + 1e-4).all()
