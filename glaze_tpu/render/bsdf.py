"""BSDF evaluation and sampling, all six families, branchless-batched.

TPU port of the 12 material callable shaders (``mat_*_value.rcall`` /
``mat_*_sample_value.rcall``). Where the reference dispatches per-ray
callables through the SBT, here every family is evaluated masked over the
whole ray batch and the result selected by material family id — dense
vector work that XLA fuses into a handful of VPU loops. (A sorted
wavefront-compaction path can be added when profiling shows the GGX
branches dominating; families are numbered per
``MaterialType.bsdf_family``.)

All directions are in shading space (n = +z). Inputs are batched (R, ...).
``mat`` is a dict of per-ray gathered material fields (see
``gather_material``).
"""

from __future__ import annotations

import jax.numpy as jnp

from glaze_tpu.ops import fresnel as fr
from glaze_tpu.ops import microfacet as mf
from glaze_tpu.ops import spectra
from glaze_tpu.ops import texture as tx

PI = jnp.float32(3.1415926)
INV_PI = jnp.float32(0.3183099)
TWO_PI = jnp.float32(6.2831853)

FAMILY_LAMBERT = 0
FAMILY_MIRROR = 1
FAMILY_GLASS = 2
FAMILY_METAL = 3
FAMILY_FROSTED = 4
FAMILY_UBER = 5


def gather_material(scene, mat_id):
    """Per-ray material record (the RTMaterial fetch in each callable)."""
    return {
        "bsdf": scene.mat_bsdf[mat_id],
        "is_specular": scene.mat_is_specular[mat_id],
        "diffuse_mul": scene.mat_diffuse_mul[mat_id],
        "metal_ior": scene.mat_metal_ior[mat_id],
        "metal_fresnel": scene.mat_metal_fresnel[mat_id],
        "ior": scene.mat_ior[mat_id],
        "roughness_mul": scene.mat_roughness_mul[mat_id],
        "metalness_mul": scene.mat_metalness_mul[mat_id],
        "anisotropy": scene.mat_anisotropy[mat_id],
        "diffuse_tex": scene.mat_diffuse_tex[mat_id],
        "roughness_tex": scene.mat_roughness_tex[mat_id],
        "metalness_tex": scene.mat_metalness_tex[mat_id],
        "opacity_tex": scene.mat_opacity_tex[mat_id],
        "normal_tex": scene.mat_normal_tex[mat_id],
    }


def _nan_to_zero(x):
    return jnp.where(jnp.isnan(x), jnp.float32(0.0), x)


def _glsl_refract(i, n, eta):
    """GLSL refract(): returns 0 on total internal reflection."""
    ndi = jnp.sum(n * i, axis=-1, keepdims=True)
    k = 1.0 - eta[..., None] * eta[..., None] * (1.0 - ndi * ndi)
    r = eta[..., None] * i - (eta[..., None] * ndi + jnp.sqrt(jnp.maximum(k, 0.0))) * n
    return jnp.where(k < 0.0, jnp.zeros_like(r), r)


def _glsl_reflect(i, n):
    """GLSL reflect(): i - 2 dot(n,i) n."""
    return i - 2.0 * jnp.sum(n * i, axis=-1, keepdims=True) * n


def _cosine_hemisphere(rand2, woz):
    """lambert_sample_value's mapping (mat_lambert_sample_value.rcall:20-29)."""
    t = TWO_PI * rand2[..., 0]
    r = jnp.sqrt(rand2[..., 1])
    x = r * jnp.cos(t)
    y = r * jnp.sin(t)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - y * y)) * jnp.sign(woz)
    return jnp.stack([x, y, z], axis=-1)


def _dielectric_etas(mat, woz):
    """(etai, etat) picked by which side wo is on (glass/frosted/uber)."""
    from_outside = woz >= 0.0
    etai = jnp.where(from_outside, fr.DEFAULT_IOR, mat["ior"])
    etat = jnp.where(from_outside, mat["ior"], fr.DEFAULT_IOR)
    return etai, etat


def _oren_nayar_term(wo, wi, roughness):
    """Oren-Nayar diffuse term shared by uber value/sample
    (mat_uber_value.rcall:57-76)."""
    sigma = roughness * 0.5
    sigma2 = sigma * sigma
    a = 1.0 - sigma2 / (2.0 * (sigma2 + 0.33))
    b = 0.45 * sigma2 / (sigma2 + 0.09)
    woz, wiz = wo[..., 2], wi[..., 2]
    sinto = jnp.sqrt(jnp.maximum(0.0, 1.0 - woz * woz))
    sinti = jnp.sqrt(jnp.maximum(0.0, 1.0 - wiz * wiz))
    sinpi = wi[..., 1] / sinti
    cospi = wi[..., 0] / sinti
    sinpo = wo[..., 1] / sinto
    cospo = wo[..., 0] / sinto
    maxcos = jnp.maximum(0.0, cospi * cospo + sinpi * sinpo)
    maxcos = _nan_to_zero(maxcos)  # sinti/sinto == 0
    wi_ge_wo = jnp.abs(wiz) >= jnp.abs(woz)
    sinalpha = jnp.where(wi_ge_wo, sinto, sinti)
    tanbeta = jnp.where(wi_ge_wo, sinti / jnp.abs(wiz), sinto / jnp.abs(woz))
    tanbeta = _nan_to_zero(tanbeta)
    return INV_PI * (a + b * maxcos * sinalpha * tanbeta)


def _ggx_reflect_common(mat, wo, wi, wh, alpha):
    """Shared d/g/pdf/cost terms of the GGX reflection lobes."""
    costwo = jnp.abs(wo[..., 2])
    costwi = jnp.abs(wi[..., 2])
    dotwowh = jnp.sum(wo * wh, axis=-1)
    d = mf.ggx_d(wh, alpha)
    g = mf.ggx_g(wo, wi, alpha)
    pdf = mf.ggx_pdf(d, alpha, wo, wh) / (4.0 * dotwowh)
    term = d * g / (4.0 * costwo * costwi)
    return d, g, term, pdf


# ---------------------------------------------------------------------------
# value (NEE): given wo and wi, return (spectrum, pdf)
# ---------------------------------------------------------------------------


def _lambert_value(scene, mat, wo, wi, uv, rand):
    same_hemi = (wo[..., 2] * wi[..., 2] >= 0.0).astype(jnp.float32)
    texel = tx.sample_rgb(scene.atlas, mat["diffuse_tex"], uv)
    value = spectra.from_surface_color(texel * mat["diffuse_mul"] * INV_PI)
    pdf = same_hemi * jnp.abs(wi[..., 2]) * INV_PI
    return value, pdf


def _metal_value(scene, mat, wo, wi, uv, rand):
    wh = wo + wi
    wh = wh / jnp.maximum(jnp.linalg.norm(wh, axis=-1, keepdims=True), 1e-20)
    same = wo[..., 2] * wi[..., 2] > 0.0
    f = fr.fresnel_conductor(
        jnp.sum(wi * wh, axis=-1), mat["metal_ior"], mat["metal_fresnel"]
    )
    rough = tx.sample_r(scene.atlas, mat["roughness_tex"], uv) * mat["roughness_mul"]
    alpha = mf.to_anisotropic(rough, mat["anisotropy"])
    _, _, term, pdf = _ggx_reflect_common(mat, wo, wi, wh, alpha)
    value = f * _nan_to_zero(term)[..., None]
    pdf = _nan_to_zero(pdf)
    zero = jnp.zeros_like(pdf)
    return (
        jnp.where(same[..., None], value, jnp.zeros_like(value)),
        jnp.where(same, pdf, zero),
    )


def _frosted_value(scene, mat, wo, wi, uv, rand):
    rough = tx.sample_r(scene.atlas, mat["roughness_tex"], uv) * mat["roughness_mul"]
    alpha = mf.to_anisotropic(rough, mat["anisotropy"])
    woz = wo[..., 2]
    same = woz * wi[..., 2] > 0.0
    etai, etat = _dielectric_etas(mat, woz)
    eta = etai / etat

    # reflected lobe (mat_frosted_value.rcall:36-50)
    wh_r = wo + wi
    wh_r = wh_r / jnp.maximum(jnp.linalg.norm(wh_r, axis=-1, keepdims=True), 1e-20)
    dotwowh_r = jnp.sum(wo * wh_r, axis=-1)
    dotwiwh_r = jnp.sum(wi * wh_r, axis=-1)
    costi_r = jnp.sum(wi * jnp.sign(wh_r[..., 2:3]) * wh_r, axis=-1)
    f_r = fr.fresnel_dielectric(costi_r, etai, etat)
    d_r = (woz >= 0.0).astype(jnp.float32) * mf.ggx_d(wh_r, alpha)
    g_r = (
        (dotwowh_r >= 0.0).astype(jnp.float32)
        * (dotwiwh_r >= 0.0).astype(jnp.float32)
        * mf.ggx_g(wo, wi, alpha)
    )
    costwo = jnp.abs(woz)
    costwi = jnp.abs(wi[..., 2])
    pdf_r = _nan_to_zero(mf.ggx_pdf(d_r, alpha, wo, wh_r) / (4.0 * dotwowh_r))
    term_r = d_r * g_r * f_r / (4.0 * costwo * costwi)

    # transmitted lobe (mat_frosted_value.rcall:51-69)
    wh_t = wo + eta[..., None] * wi
    wh_t = wh_t / jnp.maximum(jnp.linalg.norm(wh_t, axis=-1, keepdims=True), 1e-20)
    wh_t = wh_t * jnp.sign(woz)[..., None]
    dotwowh_t = jnp.sum(wo * wh_t, axis=-1)
    dotwiwh_t = jnp.sum(wi * wh_t, axis=-1)
    f_t = fr.fresnel_dielectric(dotwowh_t, etai, etat)
    denom = dotwowh_t + eta * dotwiwh_t
    d_t = mf.ggx_d(wh_t, alpha)
    g_t = mf.ggx_g(wo, wi, alpha)
    pdf_t = _nan_to_zero(
        mf.ggx_pdf(d_t, alpha, wo, wh_t)
        * jnp.abs(eta * eta * dotwiwh_t)
        / (denom * denom)
    )
    term_t = (
        d_t
        * g_t
        * (1.0 - f_t)
        * jnp.abs(dotwiwh_t)
        * jnp.abs(dotwowh_t)
        / (denom * denom * costwo * costwi)
    )

    term = jnp.where(same, term_r, term_t)
    pdf = jnp.where(same, pdf_r, pdf_t)
    return spectra.uniform(_nan_to_zero(term)), _nan_to_zero(pdf)


def _uber_value(scene, mat, wo, wi, uv, rand):
    rough = tx.sample_r(scene.atlas, mat["roughness_tex"], uv) * mat["roughness_mul"]
    same_hemi = (wo[..., 2] * wi[..., 2] >= 0.0).astype(jnp.float32)
    spec_branch = rand < 0.5

    # specular half (mat_uber_value.rcall:28-54); keeps the reference's
    # roughness*roughness_mul^2 quirk in to_anisotropic's argument
    alpha = mf.to_anisotropic(rough * mat["roughness_mul"], mat["anisotropy"])
    wh = wo + wi
    wh = wh / jnp.maximum(jnp.linalg.norm(wh, axis=-1, keepdims=True), 1e-20)
    metalness = (
        tx.sample_r(scene.atlas, mat["metalness_tex"], uv) * mat["metalness_mul"]
    )
    woz = wo[..., 2]
    etai, etat = _dielectric_etas(mat, woz)
    dotwowh = jnp.sum(wo * wh, axis=-1)
    dotwiwh = jnp.sum(wi * wh, axis=-1)
    costi = jnp.sum(wi * jnp.sign(wh[..., 2:3]) * wh, axis=-1)
    fd = spectra.uniform(fr.fresnel_dielectric(costi, etai, etat))
    fc = fr.fresnel_conductor(costi, mat["metal_ior"], mat["metal_fresnel"])
    f = fd + (fc - fd) * metalness[..., None]
    d = (woz >= 0.0).astype(jnp.float32) * mf.ggx_d(wh, alpha)
    g = (
        (dotwowh >= 0.0).astype(jnp.float32)
        * (dotwiwh >= 0.0).astype(jnp.float32)
        * mf.ggx_g(wo, wi, alpha)
    )
    pdf_spec = _nan_to_zero(
        same_hemi * 0.5 * mf.ggx_pdf(d, alpha, wo, wh) / (4.0 * dotwowh)
    )
    term_spec = d * g / (4.0 * jnp.abs(woz) * jnp.abs(wi[..., 2]))
    value_spec = f * _nan_to_zero(term_spec)[..., None]

    # diffuse half: Oren-Nayar (mat_uber_value.rcall:55-77)
    texel = tx.sample_rgb(scene.atlas, mat["diffuse_tex"], uv)
    term_on = _oren_nayar_term(wo, wi, rough)
    value_diff = spectra.from_surface_color(texel * mat["diffuse_mul"] * term_on[..., None])
    pdf_diff = _nan_to_zero(same_hemi * 0.5 * jnp.abs(wi[..., 2]) * INV_PI)

    value = jnp.where(spec_branch[..., None], value_spec, value_diff)
    pdf = jnp.where(spec_branch, pdf_spec, pdf_diff)
    return value, pdf


def bsdf_value(scene, mat, wo, wi, uv, rand):
    """NEE-side evaluation: (value (R,16), pdf (R,)).

    MIRROR and GLASS are delta distributions: pdf 0
    (mat_mirror_value.rcall, mat_glass_value.rcall).
    """
    lam_v, lam_p = _lambert_value(scene, mat, wo, wi, uv, rand)
    met_v, met_p = _metal_value(scene, mat, wo, wi, uv, rand)
    fro_v, fro_p = _frosted_value(scene, mat, wo, wi, uv, rand)
    ube_v, ube_p = _uber_value(scene, mat, wo, wi, uv, rand)

    fam = mat["bsdf"]
    zero_v = jnp.zeros_like(lam_v)
    zero_p = jnp.zeros_like(lam_p)

    value = jnp.select(
        [
            (fam == FAMILY_LAMBERT)[..., None],
            (fam == FAMILY_METAL)[..., None],
            (fam == FAMILY_FROSTED)[..., None],
            (fam == FAMILY_UBER)[..., None],
        ],
        [lam_v, met_v, fro_v, ube_v],
        zero_v,
    )
    pdf = jnp.select(
        [
            fam == FAMILY_LAMBERT,
            fam == FAMILY_METAL,
            fam == FAMILY_FROSTED,
            fam == FAMILY_UBER,
        ],
        [lam_p, met_p, fro_p, ube_p],
        zero_p,
    )
    return value, pdf


# ---------------------------------------------------------------------------
# sample (bounce): given wo, return (wi, spectrum, pdf)
# ---------------------------------------------------------------------------


def _lambert_sample(scene, mat, wo, uv, rand3):
    wi = _cosine_hemisphere(rand3[..., :2], wo[..., 2])
    pdf = jnp.abs(wi[..., 2]) * INV_PI
    texel = tx.sample_rgb(scene.atlas, mat["diffuse_tex"], uv)
    value = spectra.from_surface_color(texel * mat["diffuse_mul"] * INV_PI)
    return wi, value, pdf


def _mirror_sample(scene, mat, wo, uv, rand3):
    wi = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], axis=-1)
    f = fr.fresnel_conductor(wo[..., 2], mat["metal_ior"], mat["metal_fresnel"])
    value = f / jnp.maximum(jnp.abs(wo[..., 2]), 1e-20)[..., None]
    pdf = jnp.ones_like(wo[..., 2])
    return wi, value, pdf


def _glass_sample(scene, mat, wo, uv, rand3):
    woz = wo[..., 2]
    from_outside = woz >= 0.0
    etai = jnp.where(from_outside, fr.DEFAULT_IOR, mat["ior"])
    etat = jnp.where(from_outside, mat["ior"], fr.DEFAULT_IOR)
    costi = jnp.where(from_outside, woz, jnp.abs(woz))
    # NOTE mix(abs, signed, from_outside): costi = |woz| when inside
    costi = jnp.where(from_outside, woz, jnp.abs(woz))
    f = fr.fresnel_dielectric(costi, etai, etat)

    wi_refl = jnp.stack([-wo[..., 0], -wo[..., 1], woz], axis=-1)
    eval_refl = f / jnp.maximum(jnp.abs(wi_refl[..., 2]), 1e-20)

    n = jnp.concatenate(
        [jnp.zeros_like(wo[..., :2]), jnp.sign(woz)[..., None]], axis=-1
    )
    wi_refr = _glsl_refract(wo, n, etai / etat)
    eval_refr = (
        (1.0 - f)
        * (etai * etai)
        / jnp.maximum(etat * etat * jnp.abs(wi_refr[..., 2]), 1e-20)
    )

    reflect = rand3[..., 2] < f
    wi = jnp.where(reflect[..., None], wi_refl, wi_refr)
    value = spectra.uniform(jnp.where(reflect, eval_refl, eval_refr))
    pdf = jnp.where(reflect, f, 1.0 - f)
    return wi, value, pdf


def _metal_sample(scene, mat, wo, uv, rand3):
    rough = tx.sample_r(scene.atlas, mat["roughness_tex"], uv) * mat["roughness_mul"]
    alpha = mf.to_anisotropic(rough, mat["anisotropy"])
    wh = mf.ggx_sample_wh(wo, rand3[..., :2], alpha)
    wi = -_glsl_reflect(wo, wh)
    wi = wi / jnp.maximum(jnp.linalg.norm(wi, axis=-1, keepdims=True), 1e-20)
    same = wo[..., 2] * wi[..., 2] > 0.0
    f = fr.fresnel_conductor(
        jnp.sum(wi * wh, axis=-1), mat["metal_ior"], mat["metal_fresnel"]
    )
    _, _, term, pdf = _ggx_reflect_common(mat, wo, wi, wh, alpha)
    value = jnp.where(same[..., None], f * _nan_to_zero(term)[..., None], 0.0)
    pdf = jnp.where(same, _nan_to_zero(pdf), 0.0)
    return wi, value, pdf


def _frosted_sample(scene, mat, wo, uv, rand3):
    rough = tx.sample_r(scene.atlas, mat["roughness_tex"], uv) * mat["roughness_mul"]
    alpha = mf.to_anisotropic(rough, mat["anisotropy"])
    wh = mf.ggx_sample_wh(wo, rand3[..., :2], alpha)
    woz = wo[..., 2]
    etai, etat = _dielectric_etas(mat, woz)
    eta = etai / etat
    costwo = jnp.abs(woz)

    # reflect branch (mat_frosted_sample_value.rcall:31-50)
    wi_r = -_glsl_reflect(wo, wh)
    wi_r = wi_r / jnp.maximum(jnp.linalg.norm(wi_r, axis=-1, keepdims=True), 1e-20)
    dotwowh_r = jnp.sum(wo * wh, axis=-1)
    dotwiwh_r = jnp.sum(wi_r * wh, axis=-1)
    costi_r = jnp.sum(wi_r * jnp.sign(wh[..., 2:3]) * wh, axis=-1)
    f_r = fr.fresnel_dielectric(costi_r, etai, etat)
    d_r = (woz >= 0.0).astype(jnp.float32) * mf.ggx_d(wh, alpha)
    g_r = (
        (dotwowh_r >= 0.0).astype(jnp.float32)
        * (dotwiwh_r >= 0.0).astype(jnp.float32)
        * mf.ggx_g(wo, wi_r, alpha)
    )
    pdf_r = _nan_to_zero(0.5 * mf.ggx_pdf(d_r, alpha, wo, wh) / (4.0 * dotwowh_r))
    term_r = d_r * g_r * f_r / (4.0 * costwo * jnp.abs(wi_r[..., 2]))

    # refract branch (:51-70)
    wi_t = _glsl_refract(wo, wh, eta)
    wi_t_norm = jnp.maximum(jnp.linalg.norm(wi_t, axis=-1, keepdims=True), 1e-20)
    wi_t = wi_t / wi_t_norm
    dotwowh_t = jnp.sum(wo * wh, axis=-1)
    dotwiwh_t = jnp.sum(wi_t * wh, axis=-1)
    f_t = fr.fresnel_dielectric(dotwowh_t, etai, etat)
    denom = dotwowh_t + eta * dotwiwh_t
    d_t = mf.ggx_d(wh, alpha)
    g_t = mf.ggx_g(wo, wi_t, alpha)
    pdf_t = _nan_to_zero(
        0.5
        * mf.ggx_pdf(d_t, alpha, wo, wh)
        * jnp.abs(eta * eta * dotwiwh_t)
        / (denom * denom)
    )
    pdf_t = jnp.where(dotwowh_t * dotwiwh_t < 0.0, pdf_t, 0.0)
    term_t = (
        d_t
        * g_t
        * (1.0 - f_t)
        * jnp.abs(dotwiwh_t)
        * jnp.abs(dotwowh_t)
        / (denom * denom * costwo * jnp.abs(wi_t[..., 2]))
    )

    refl = rand3[..., 2] < 0.5
    wi = jnp.where(refl[..., None], wi_r, wi_t)
    value = spectra.uniform(_nan_to_zero(jnp.where(refl, term_r, term_t)))
    pdf = jnp.where(refl, pdf_r, pdf_t)
    return wi, value, pdf


def _uber_sample(scene, mat, wo, uv, rand3):
    rough = tx.sample_r(scene.atlas, mat["roughness_tex"], uv) * mat["roughness_mul"]
    woz = wo[..., 2]

    # specular branch (mat_uber_sample_value.rcall:28-56)
    alpha = mf.to_anisotropic(rough * mat["roughness_mul"], mat["anisotropy"])
    wh = mf.ggx_sample_wh(wo, rand3[..., :2], alpha)
    wi_s = -_glsl_reflect(wo, wh)
    wi_s = wi_s / jnp.maximum(jnp.linalg.norm(wi_s, axis=-1, keepdims=True), 1e-20)
    metalness = (
        tx.sample_r(scene.atlas, mat["metalness_tex"], uv) * mat["metalness_mul"]
    )
    etai, etat = _dielectric_etas(mat, woz)
    dotwowh = jnp.sum(wo * wh, axis=-1)
    dotwiwh = jnp.sum(wi_s * wh, axis=-1)
    costi = jnp.sum(wi_s * jnp.sign(wh[..., 2:3]) * wh, axis=-1)
    fd = spectra.uniform(fr.fresnel_dielectric(costi, etai, etat))
    fc = fr.fresnel_conductor(costi, mat["metal_ior"], mat["metal_fresnel"])
    f = fd + (fc - fd) * metalness[..., None]
    d = (woz >= 0.0).astype(jnp.float32) * mf.ggx_d(wh, alpha)
    g = (
        (dotwowh >= 0.0).astype(jnp.float32)
        * (dotwiwh >= 0.0).astype(jnp.float32)
        * mf.ggx_g(wo, wi_s, alpha)
    )
    pdf_s = _nan_to_zero(0.5 * mf.ggx_pdf(d, alpha, wo, wh) / (4.0 * dotwowh))
    term_s = d * g / (4.0 * jnp.abs(woz) * jnp.abs(wi_s[..., 2]))
    value_s = f * _nan_to_zero(term_s)[..., None]

    # diffuse branch (:57-83)
    wi_d = _cosine_hemisphere(rand3[..., :2], woz)
    texel = tx.sample_rgb(scene.atlas, mat["diffuse_tex"], uv)
    term_on = _oren_nayar_term(wo, wi_d, rough)
    value_d = spectra.from_surface_color(texel * mat["diffuse_mul"] * term_on[..., None])
    pdf_d = 0.5 * jnp.abs(wi_d[..., 2]) * INV_PI

    spec = rand3[..., 2] < 0.5
    wi = jnp.where(spec[..., None], wi_s, wi_d)
    value = jnp.where(spec[..., None], value_s, value_d)
    pdf = jnp.where(spec, pdf_s, pdf_d)
    return wi, value, pdf


def bsdf_sample(scene, mat, wo, uv, rand3):
    """Bounce sampling: (wi (R,3), value (R,16), pdf (R,))."""
    results = [
        _lambert_sample(scene, mat, wo, uv, rand3),
        _mirror_sample(scene, mat, wo, uv, rand3),
        _glass_sample(scene, mat, wo, uv, rand3),
        _metal_sample(scene, mat, wo, uv, rand3),
        _frosted_sample(scene, mat, wo, uv, rand3),
        _uber_sample(scene, mat, wo, uv, rand3),
    ]
    fam = mat["bsdf"]
    wi = results[0][0]
    value = results[0][1]
    pdf = results[0][2]
    for family in range(1, 6):
        w, v, p = results[family]
        sel = fam == family
        wi = jnp.where(sel[..., None], w, wi)
        value = jnp.where(sel[..., None], v, value)
        pdf = jnp.where(sel, p, pdf)
    return wi, value, pdf
