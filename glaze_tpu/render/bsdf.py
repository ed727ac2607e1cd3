"""BSDF evaluation and sampling, all six families, branchless-batched SoA.

TPU port of the 12 material callable shaders (``mat_*_value.rcall`` /
``mat_*_sample_value.rcall``). Where the reference dispatches per-ray
callables through the SBT, here every family is evaluated masked over the
whole ray batch and the result selected by material family id.

Layout: directions are (x, y, z) tuples of (R,) float32 (rays on VPU
lanes); spectra are (16, R); uv is a (u, v) tuple. All material fields
come pre-gathered per ray via :func:`gather_material`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from glaze_tpu.ops import fresnel as fr
from glaze_tpu.ops import microfacet as mf
from glaze_tpu.ops import spectra
from glaze_tpu.ops import texture as tx
from glaze_tpu.ops import vec
from glaze_tpu.scene.flatten import (
    MS_ANISOTROPY,
    MS_DIFFUSE_B,
    MS_DIFFUSE_G,
    MS_DIFFUSE_R,
    MS_IOR,
    MS_IS_SPECULAR,
    MS_METALNESS_MUL,
    MS_ROUGHNESS_MUL,
    MT_DIFFUSE,
    MT_METALNESS,
    MT_NORMAL,
    MT_OPACITY,
    MT_ROUGHNESS,
)

PI = np.float32(3.1415926)
INV_PI = np.float32(0.3183099)
TWO_PI = np.float32(6.2831853)

FAMILY_LAMBERT = 0
FAMILY_MIRROR = 1
FAMILY_GLASS = 2
FAMILY_METAL = 3
FAMILY_FROSTED = 4
FAMILY_UBER = 5


def gather_material(scene, mat_id):
    """Per-ray material record. Row gathers (the only fast TPU gather
    form), transposed to the (K, R) compute layout afterwards. The bsdf
    family rides the scalar row (a separate 1D gather fuses into a
    multi-ms serial op).

    CONTRACT: the returned dict must not outlive the jit trace that
    called this — bsdf_value/bsdf_sample memoize traced texture fetches
    inside it (``_texmemo``), so reusing it across traces would leak
    tracers. Build it fresh per launch step (launch_step does)."""
    scalars = scene.mat_scalars[mat_id].T  # (MS_ROWS, R)
    tex = scene.mat_tex[mat_id].T  # (5, R)
    from glaze_tpu.scene.flatten import MS_BSDF

    return {
        "bsdf": scalars[MS_BSDF].astype(jnp.int32),
        "scalars": scalars,
        "tex": tex,
        "metal_ior": scene.mat_metal_ior[mat_id].T,  # (16, R)
        "metal_fresnel": scene.mat_metal_fresnel[mat_id].T,
    }


def _nan0(x):
    return jnp.where(jnp.isnan(x), jnp.float32(0.0), x)


def _cosine_hemisphere(r0, r1, woz):
    """lambert_sample_value's mapping (mat_lambert_sample_value.rcall:20-29)."""
    t = TWO_PI * r0
    r = jnp.sqrt(r1)
    x = r * jnp.cos(t)
    y = r * jnp.sin(t)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - y * y)) * jnp.sign(woz)
    return (x, y, z)


def _dielectric_etas(mat, woz):
    from_outside = woz >= 0.0
    ior = mat["scalars"][MS_IOR]
    etai = jnp.where(from_outside, fr.DEFAULT_IOR, ior)
    etat = jnp.where(from_outside, ior, fr.DEFAULT_IOR)
    return etai, etat


def _tex_memo(mat, uv, key, fn):
    """Per-trace memo of a texture fetch keyed on the uv tuple IDENTITY.

    bsdf_value (NEE) and bsdf_sample (bounce) are evaluated for the same
    hit in every launch step; without this each would re-issue the atlas
    row gathers (XLA does not CSE gathers across the two call trees —
    measured ~18 ms per 1M-ray gather on chip). The cache lives in the
    ``mat`` dict, which gather_material builds fresh per launch step, and
    is keyed on ``uv`` object identity so distinct uvs never alias.
    """
    cache = mat.setdefault("_texmemo", {})
    hit = cache.get(key)
    if hit is not None and hit[0] is uv:
        return hit[1]
    val = fn()
    cache[key] = (uv, val)
    return val


def _diffuse_texel(scene, mat, uv):
    """diffuse texture * diffuse_mul -> (r, g, b) each (R,).

    Texture-slot gates: when NO material in the scene assigns a texture
    to a slot (scene.tex_slots, static jit aux), the fetch is the
    multiplier alone — sampling texture 0 (the 1x1 white default) always
    yields 1.0, and the skipped atlas row-gather costs ~40 ms/launch at
    1080p (op-overhead-bound at ~20 ns/row; xplane-profiled)."""
    def fetch():
        s = mat["scalars"]
        if MT_DIFFUSE not in scene.tex_slots:
            return s[MS_DIFFUSE_R], s[MS_DIFFUSE_G], s[MS_DIFFUSE_B]
        r, g, b = tx.sample_rgb_v(scene.atlas, mat["tex"][MT_DIFFUSE],
                                  uv[0], uv[1])
        return r * s[MS_DIFFUSE_R], g * s[MS_DIFFUSE_G], b * s[MS_DIFFUSE_B]
    return _tex_memo(mat, uv, "diffuse", fetch)


def _roughness(scene, mat, uv):
    if MT_ROUGHNESS not in scene.tex_slots:
        return mat["scalars"][MS_ROUGHNESS_MUL]
    return _tex_memo(mat, uv, "rough", lambda: (
        tx.sample_r_v(scene.atlas, mat["tex"][MT_ROUGHNESS], uv[0], uv[1])
        * mat["scalars"][MS_ROUGHNESS_MUL]
    ))


def _metalness(scene, mat, uv):
    if MT_METALNESS not in scene.tex_slots:
        return mat["scalars"][MS_METALNESS_MUL]
    return _tex_memo(mat, uv, "metal", lambda: (
        tx.sample_r_v(scene.atlas, mat["tex"][MT_METALNESS], uv[0], uv[1])
        * mat["scalars"][MS_METALNESS_MUL]
    ))


def _alpha(mat, rough):
    """(alpha_x, alpha_y) tuple (microfacets.glsl to_anisotropic)."""
    aniso = mat["scalars"][MS_ANISOTROPY]
    return rough * (1.0 + aniso), rough * (1.0 - aniso)


def _oren_nayar_term(wo, wi, roughness):
    """Oren-Nayar diffuse term (mat_uber_value.rcall:57-76).

    Documented deviation (bug fix): the reference's
    ``mix(sinto, sinti, step(|wo.z|, |wi.z|))`` picks the sin of the
    SMALLER incidence angle for sin(alpha) (and mismatched tan(beta)) —
    the arms of its mix() are swapped relative to the standard
    Oren-Nayar definition (alpha = larger angle, beta = smaller; pbrt
    9.4.1). This port keeps the correct orientation: when |wi.z| >=
    |wo.z|, wo has the larger angle, so sin(alpha)=sin(theta_o) and
    tan(beta)=sin(theta_i)/|wi.z|. Found by tests/oracle.py."""
    sigma = roughness * 0.5
    sigma2 = sigma * sigma
    a = 1.0 - sigma2 / (2.0 * (sigma2 + 0.33))
    b = 0.45 * sigma2 / (sigma2 + 0.09)
    woz, wiz = wo[2], wi[2]
    sinto = jnp.sqrt(jnp.maximum(0.0, 1.0 - woz * woz))
    sinti = jnp.sqrt(jnp.maximum(0.0, 1.0 - wiz * wiz))
    sinpi = wi[1] / sinti
    cospi = wi[0] / sinti
    sinpo = wo[1] / sinto
    cospo = wo[0] / sinto
    maxcos = _nan0(jnp.maximum(0.0, cospi * cospo + sinpi * sinpo))
    wi_ge_wo = jnp.abs(wiz) >= jnp.abs(woz)
    sinalpha = jnp.where(wi_ge_wo, sinto, sinti)
    tanbeta = _nan0(
        jnp.where(wi_ge_wo, sinti / jnp.abs(wiz), sinto / jnp.abs(woz))
    )
    return INV_PI * (a + b * maxcos * sinalpha * tanbeta)


def _ggx_reflect_terms(wo, wi, wh, ax, ay):
    costwo = jnp.abs(wo[2])
    costwi = jnp.abs(wi[2])
    dotwowh = vec.dot(wo, wh)
    d = mf.ggx_d_v(wh, ax, ay)
    g = mf.ggx_g_v(wo, wi, ax, ay)
    pdf = mf.ggx_pdf_v(d, ax, ay, wo, wh) / (4.0 * dotwowh)
    term = d * g / (4.0 * costwo * costwi)
    return term, pdf


# ---------------------------------------------------------------------------
# value (NEE): given wo and wi in shading space, return ((16,R), pdf (R,))
# ---------------------------------------------------------------------------


def _lambert_value(scene, mat, wo, wi, uv, rand):
    same_hemi = (wo[2] * wi[2] >= 0.0).astype(jnp.float32)
    r, g, b = _diffuse_texel(scene, mat, uv)
    value = spectra.from_surface_color_t(r * INV_PI, g * INV_PI, b * INV_PI)
    pdf = same_hemi * jnp.abs(wi[2]) * INV_PI
    return value, pdf


def _metal_value(scene, mat, wo, wi, uv, rand):
    wh = vec.normalize(vec.add(wo, wi))
    same = wo[2] * wi[2] > 0.0
    f = fr.fresnel_conductor_t(vec.dot(wi, wh), mat["metal_ior"],
                               mat["metal_fresnel"])
    rough = _roughness(scene, mat, uv)
    ax, ay = _alpha(mat, rough)
    term, pdf = _ggx_reflect_terms(wo, wi, wh, ax, ay)
    pdf = jnp.where(same, _nan0(pdf), 0.0)
    value = f * jnp.where(same, _nan0(term), 0.0)
    return value, pdf


def _frosted_value(scene, mat, wo, wi, uv, rand):
    rough = _roughness(scene, mat, uv)
    ax, ay = _alpha(mat, rough)
    woz = wo[2]
    same = woz * wi[2] > 0.0
    etai, etat = _dielectric_etas(mat, woz)
    eta = etai / etat
    costwo = jnp.abs(woz)
    costwi = jnp.abs(wi[2])

    # reflected lobe (mat_frosted_value.rcall:36-50)
    wh_r = vec.normalize(vec.add(wo, wi))
    dotwowh_r = vec.dot(wo, wh_r)
    dotwiwh_r = vec.dot(wi, wh_r)
    costi_r = vec.dot(wi, vec.scale(wh_r, jnp.sign(wh_r[2])))
    f_r = fr.fresnel_dielectric(costi_r, etai, etat)
    d_r = (woz >= 0.0).astype(jnp.float32) * mf.ggx_d_v(wh_r, ax, ay)
    g_r = (
        (dotwowh_r >= 0.0).astype(jnp.float32)
        * (dotwiwh_r >= 0.0).astype(jnp.float32)
        * mf.ggx_g_v(wo, wi, ax, ay)
    )
    pdf_r = _nan0(mf.ggx_pdf_v(d_r, ax, ay, wo, wh_r) / (4.0 * dotwowh_r))
    term_r = d_r * g_r * f_r / (4.0 * costwo * costwi)

    # transmitted lobe (:51-69)
    wh_t = vec.normalize(vec.add(wo, vec.scale(wi, eta)))
    wh_t = vec.scale(wh_t, jnp.sign(woz))
    dotwowh_t = vec.dot(wo, wh_t)
    dotwiwh_t = vec.dot(wi, wh_t)
    f_t = fr.fresnel_dielectric(dotwowh_t, etai, etat)
    denom = dotwowh_t + eta * dotwiwh_t
    d_t = mf.ggx_d_v(wh_t, ax, ay)
    g_t = mf.ggx_g_v(wo, wi, ax, ay)
    pdf_t = _nan0(
        mf.ggx_pdf_v(d_t, ax, ay, wo, wh_t)
        * jnp.abs(eta * eta * dotwiwh_t) / (denom * denom)
    )
    term_t = (
        d_t * g_t * (1.0 - f_t) * jnp.abs(dotwiwh_t) * jnp.abs(dotwowh_t)
        / (denom * denom * costwo * costwi)
    )

    term = jnp.where(same, term_r, term_t)
    pdf = jnp.where(same, pdf_r, pdf_t)
    return spectra.uniform_t(_nan0(term)), _nan0(pdf)


def _uber_value(scene, mat, wo, wi, uv, rand):
    rough = _roughness(scene, mat, uv)
    same_hemi = (wo[2] * wi[2] >= 0.0).astype(jnp.float32)
    spec_branch = rand < 0.5

    # specular half (mat_uber_value.rcall:28-54); keeps the reference's
    # roughness*roughness_mul^2 quirk in to_anisotropic's argument
    ax, ay = _alpha(mat, rough * mat["scalars"][MS_ROUGHNESS_MUL])
    wh = vec.normalize(vec.add(wo, wi))
    metalness = _metalness(scene, mat, uv)
    woz = wo[2]
    etai, etat = _dielectric_etas(mat, woz)
    dotwowh = vec.dot(wo, wh)
    dotwiwh = vec.dot(wi, wh)
    costi = vec.dot(wi, vec.scale(wh, jnp.sign(wh[2])))
    fd = spectra.uniform_t(fr.fresnel_dielectric(costi, etai, etat))
    fc = fr.fresnel_conductor_t(costi, mat["metal_ior"], mat["metal_fresnel"])
    f = fd + (fc - fd) * metalness
    d = (woz >= 0.0).astype(jnp.float32) * mf.ggx_d_v(wh, ax, ay)
    g = (
        (dotwowh >= 0.0).astype(jnp.float32)
        * (dotwiwh >= 0.0).astype(jnp.float32)
        * mf.ggx_g_v(wo, wi, ax, ay)
    )
    pdf_spec = _nan0(
        same_hemi * 0.5 * mf.ggx_pdf_v(d, ax, ay, wo, wh) / (4.0 * dotwowh)
    )
    term_spec = _nan0(d * g / (4.0 * jnp.abs(woz) * jnp.abs(wi[2])))
    value_spec = f * term_spec

    # diffuse half: Oren-Nayar (:55-77)
    r, g2, b = _diffuse_texel(scene, mat, uv)
    term_on = _oren_nayar_term(wo, wi, rough)
    value_diff = spectra.from_surface_color_t(
        r * term_on, g2 * term_on, b * term_on
    )
    pdf_diff = _nan0(same_hemi * 0.5 * jnp.abs(wi[2]) * INV_PI)

    value = jnp.where(spec_branch, value_spec, value_diff)
    pdf = jnp.where(spec_branch, pdf_spec, pdf_diff)
    return value, pdf


_VALUE_FNS = {
    FAMILY_LAMBERT: _lambert_value,
    FAMILY_METAL: _metal_value,
    FAMILY_FROSTED: _frosted_value,
    FAMILY_UBER: _uber_value,
}


def bsdf_value(scene, mat, wo, wi, uv, rand):
    """NEE-side evaluation: (value (16, R), pdf (R,)).

    MIRROR and GLASS are delta distributions: pdf 0
    (mat_mirror_value.rcall, mat_glass_value.rcall). Only the families in
    ``scene.mat_families`` (static) are evaluated — the wavefront analogue
    of the SBT dispatching exactly one BSDF callable per ray."""
    present = [f for f in scene.mat_families if f in _VALUE_FNS]
    if not present:
        r = wo[2].shape[0]
        return jnp.zeros((16, r), jnp.float32), jnp.zeros((r,), jnp.float32)
    fam = mat["bsdf"]
    value = pdf = None
    for f in present:
        v, p = _VALUE_FNS[f](scene, mat, wo, wi, uv, rand)
        if value is None:
            # single-family scenes skip the select entirely, but delta
            # families (absent from _VALUE_FNS) must still zero out
            if len(present) == len(scene.mat_families) == 1:
                return v, p
            sel = fam == f
            value = jnp.where(sel, v, 0.0)
            pdf = jnp.where(sel, p, 0.0)
        else:
            sel = fam == f
            value = jnp.where(sel, v, value)
            pdf = jnp.where(sel, p, pdf)
    return value, pdf


# ---------------------------------------------------------------------------
# sample (bounce): given wo, return (wi tuple, value (16, R), pdf (R,))
# ---------------------------------------------------------------------------


def _lambert_sample(scene, mat, wo, uv, r3):
    wi = _cosine_hemisphere(r3[0], r3[1], wo[2])
    pdf = jnp.abs(wi[2]) * INV_PI
    r, g, b = _diffuse_texel(scene, mat, uv)
    value = spectra.from_surface_color_t(r * INV_PI, g * INV_PI, b * INV_PI)
    return wi, value, pdf


def _mirror_sample(scene, mat, wo, uv, r3):
    wi = (-wo[0], -wo[1], wo[2])
    f = fr.fresnel_conductor_t(wo[2], mat["metal_ior"], mat["metal_fresnel"])
    value = f / jnp.maximum(jnp.abs(wo[2]), 1e-20)
    pdf = jnp.ones_like(wo[2])
    return wi, value, pdf


def _glass_sample(scene, mat, wo, uv, r3):
    woz = wo[2]
    from_outside = woz >= 0.0
    ior = mat["scalars"][MS_IOR]
    etai = jnp.where(from_outside, fr.DEFAULT_IOR, ior)
    etat = jnp.where(from_outside, ior, fr.DEFAULT_IOR)
    costi = jnp.where(from_outside, woz, jnp.abs(woz))
    f = fr.fresnel_dielectric(costi, etai, etat)

    wi_refl = (-wo[0], -wo[1], woz)
    eval_refl = f / jnp.maximum(jnp.abs(woz), 1e-20)

    zeros = jnp.zeros_like(woz)
    n = (zeros, zeros, jnp.sign(woz))
    wi_refr = vec.refract(wo, n, etai / etat)
    eval_refr = (
        (1.0 - f) * (etai * etai)
        / jnp.maximum(etat * etat * jnp.abs(wi_refr[2]), 1e-20)
    )

    reflect = r3[2] < f
    wi = vec.where(reflect, wi_refl, wi_refr)
    value = spectra.uniform_t(jnp.where(reflect, eval_refl, eval_refr))
    pdf = jnp.where(reflect, f, 1.0 - f)
    return wi, value, pdf


def _metal_sample(scene, mat, wo, uv, r3):
    rough = _roughness(scene, mat, uv)
    ax, ay = _alpha(mat, rough)
    wh = mf.ggx_sample_wh_v(wo, r3[0], r3[1], ax, ay)
    wi = vec.normalize(vec.neg(vec.reflect(wo, wh)))
    same = wo[2] * wi[2] > 0.0
    f = fr.fresnel_conductor_t(vec.dot(wi, wh), mat["metal_ior"],
                               mat["metal_fresnel"])
    term, pdf = _ggx_reflect_terms(wo, wi, wh, ax, ay)
    value = f * jnp.where(same, _nan0(term), 0.0)
    pdf = jnp.where(same, _nan0(pdf), 0.0)
    return wi, value, pdf


def _frosted_sample(scene, mat, wo, uv, r3):
    rough = _roughness(scene, mat, uv)
    ax, ay = _alpha(mat, rough)
    wh = mf.ggx_sample_wh_v(wo, r3[0], r3[1], ax, ay)
    woz = wo[2]
    etai, etat = _dielectric_etas(mat, woz)
    eta = etai / etat
    costwo = jnp.abs(woz)

    # reflect branch (mat_frosted_sample_value.rcall:31-50)
    wi_r = vec.normalize(vec.neg(vec.reflect(wo, wh)))
    dotwowh_r = vec.dot(wo, wh)
    dotwiwh_r = vec.dot(wi_r, wh)
    costi_r = vec.dot(wi_r, vec.scale(wh, jnp.sign(wh[2])))
    f_r = fr.fresnel_dielectric(costi_r, etai, etat)
    d_r = (woz >= 0.0).astype(jnp.float32) * mf.ggx_d_v(wh, ax, ay)
    g_r = (
        (dotwowh_r >= 0.0).astype(jnp.float32)
        * (dotwiwh_r >= 0.0).astype(jnp.float32)
        * mf.ggx_g_v(wo, wi_r, ax, ay)
    )
    pdf_r = _nan0(0.5 * mf.ggx_pdf_v(d_r, ax, ay, wo, wh) / (4.0 * dotwowh_r))
    term_r = d_r * g_r * f_r / (4.0 * costwo * jnp.abs(wi_r[2]))

    # refract branch (:51-70)
    wi_t = vec.normalize(vec.refract(wo, wh, eta))
    dotwowh_t = vec.dot(wo, wh)
    dotwiwh_t = vec.dot(wi_t, wh)
    f_t = fr.fresnel_dielectric(dotwowh_t, etai, etat)
    denom = dotwowh_t + eta * dotwiwh_t
    d_t = mf.ggx_d_v(wh, ax, ay)
    g_t = mf.ggx_g_v(wo, wi_t, ax, ay)
    pdf_t = _nan0(
        0.5 * mf.ggx_pdf_v(d_t, ax, ay, wo, wh)
        * jnp.abs(eta * eta * dotwiwh_t) / (denom * denom)
    )
    pdf_t = jnp.where(dotwowh_t * dotwiwh_t < 0.0, pdf_t, 0.0)
    term_t = (
        d_t * g_t * (1.0 - f_t) * jnp.abs(dotwiwh_t) * jnp.abs(dotwowh_t)
        / (denom * denom * costwo * jnp.abs(wi_t[2]))
    )

    refl = r3[2] < 0.5
    wi = vec.where(refl, wi_r, wi_t)
    value = spectra.uniform_t(_nan0(jnp.where(refl, term_r, term_t)))
    pdf = jnp.where(refl, pdf_r, pdf_t)
    return wi, value, pdf


def _uber_sample(scene, mat, wo, uv, r3):
    rough = _roughness(scene, mat, uv)
    woz = wo[2]

    # specular branch (mat_uber_sample_value.rcall:28-56)
    ax, ay = _alpha(mat, rough * mat["scalars"][MS_ROUGHNESS_MUL])
    wh = mf.ggx_sample_wh_v(wo, r3[0], r3[1], ax, ay)
    wi_s = vec.normalize(vec.neg(vec.reflect(wo, wh)))
    metalness = _metalness(scene, mat, uv)
    etai, etat = _dielectric_etas(mat, woz)
    dotwowh = vec.dot(wo, wh)
    dotwiwh = vec.dot(wi_s, wh)
    costi = vec.dot(wi_s, vec.scale(wh, jnp.sign(wh[2])))
    fd = spectra.uniform_t(fr.fresnel_dielectric(costi, etai, etat))
    fc = fr.fresnel_conductor_t(costi, mat["metal_ior"], mat["metal_fresnel"])
    f = fd + (fc - fd) * metalness
    d = (woz >= 0.0).astype(jnp.float32) * mf.ggx_d_v(wh, ax, ay)
    g = (
        (dotwowh >= 0.0).astype(jnp.float32)
        * (dotwiwh >= 0.0).astype(jnp.float32)
        * mf.ggx_g_v(wo, wi_s, ax, ay)
    )
    pdf_s = _nan0(0.5 * mf.ggx_pdf_v(d, ax, ay, wo, wh) / (4.0 * dotwowh))
    term_s = _nan0(d * g / (4.0 * jnp.abs(woz) * jnp.abs(wi_s[2])))
    value_s = f * term_s

    # diffuse branch (:57-83)
    wi_d = _cosine_hemisphere(r3[0], r3[1], woz)
    r, g2, b = _diffuse_texel(scene, mat, uv)
    term_on = _oren_nayar_term(wo, wi_d, rough)
    value_d = spectra.from_surface_color_t(r * term_on, g2 * term_on,
                                           b * term_on)
    pdf_d = 0.5 * jnp.abs(wi_d[2]) * INV_PI

    spec = r3[2] < 0.5
    wi = vec.where(spec, wi_s, wi_d)
    value = jnp.where(spec, value_s, value_d)
    pdf = jnp.where(spec, pdf_s, pdf_d)
    return wi, value, pdf


_SAMPLE_FNS = {
    FAMILY_LAMBERT: _lambert_sample,
    FAMILY_MIRROR: _mirror_sample,
    FAMILY_GLASS: _glass_sample,
    FAMILY_METAL: _metal_sample,
    FAMILY_FROSTED: _frosted_sample,
    FAMILY_UBER: _uber_sample,
}


def bsdf_sample(scene, mat, wo, uv, r3):
    """Bounce sampling: (wi tuple, value (16, R), pdf (R,)).

    ``r3``: tuple of three (R,) uniforms. Only the families in
    ``scene.mat_families`` (static) are evaluated."""
    present = list(scene.mat_families) or [FAMILY_LAMBERT]
    fam = mat["bsdf"]
    wi, value, pdf = _SAMPLE_FNS[present[0]](scene, mat, wo, uv, r3)
    for family in present[1:]:
        w, v, p = _SAMPLE_FNS[family](scene, mat, wo, uv, r3)
        sel = fam == family
        wi = vec.where(sel, w, wi)
        value = jnp.where(sel, v, value)
        pdf = jnp.where(sel, p, pdf)
    return wi, value, pdf