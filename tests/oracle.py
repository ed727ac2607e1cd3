"""Independent scalar radiance oracle: a deliberately naive per-pixel
NumPy port of the reference's path tracer.

Ported 1:1 from the GLSL sources (NOT from glaze_tpu's wavefront code, so
a shared port bug is visible):

* ``path_trace.rgen:135-239`` — the launch state machine (bounce carry,
  miss/sky rule, NEE, russian roulette, importance update)
* ``mat_{lambert,mirror,glass,metal,frosted,uber}_{value,sample_value}.rcall``
  — all 6 BSDF families, including the reference's deliberate quirks the
  wavefront port keeps (ggx_pdf's G1(wh) firefly workaround, uber's
  roughness*roughness_mul^2 anisotropy argument, frosted's literal GLSL
  refract() call)
* ``light_{omni,sun,area}_sample_visible.rcall`` with the two documented
  reference bug fixes the wavefront applies (true triangle area; wiW
  points surface->light — README "Deviations")
* ``microfacets.glsl``, ``fresnel.glsl``, ``spectrum.glsl``,
  ``shading_space.glsl``, ``generate_derivatives.comp``,
  ``raytrace_hit.rchit``

Deliberate independences (valid for statistical comparison — a Monte
Carlo estimator's mean is invariant to the sampling distribution as long
as each implementation divides by ITS OWN true pdf):

* RNG: numpy Generator per (launch seed, pixel), not the PCG hash chain
  (the chain itself is tested separately in test_ops.py)
* Sky light NEE: uniform-sphere directions at pdf 1/(4pi) instead of the
  texel-importance tables (emission as a function of direction is the
  same mapping as ``sky_radiance``)
* Geometry in float64, brute-force intersection over every triangle
  (no BVH, no SoA, no batching)

Not implemented (assert-guarded): normal/opacity maps, instancing with
non-identity normal transforms beyond rotation+uniform scale.
"""

from __future__ import annotations

import numpy as np

from glaze_tpu.core import LightType, MaterialType
from glaze_tpu.core import spectrum as csp

PT_STEPS = 6  # raytrace_structures.rs:87
RUSSIAN_ROULETTE = PT_STEPS // 2  # path_trace.rgen:11
DEFAULT_IOR = 1.000293
PI = np.pi
INV_PI = 1.0 / np.pi
TWO_PI = 2.0 * np.pi
INV_2PI = 1.0 / TWO_PI
INV_4PI = 1.0 / (4.0 * np.pi)

_SURF = np.asarray(csp.SURFACE_BASIS, np.float64)  # (7,16) w,c,m,y,r,g,b
_ILLUM = np.asarray(csp.ILLUMINANT_BASIS, np.float64)
_SURF_SCALE = float(csp.SURFACE_SCALE)
_ILLUM_SCALE = float(csp.ILLUMINANT_SCALE)
_CIE = np.stack([csp.CIE_X, csp.CIE_Y, csp.CIE_Z]).astype(np.float64)
_INVY = float(csp.INVY_SUM)
_XYZ2RGB = np.array([
    [3.240479, -1.537150, -0.498535],
    [-0.969256, 1.875991, 0.041556],
    [0.055648, -0.204043, 1.057311],
], np.float64)


# ---------------------------------------------------------------------------
# spectrum.glsl (scalar)
# ---------------------------------------------------------------------------


def smits(rgb, basis, scale):
    """GENERATE_COLOR_TO_SPECTRUM (spectrum.glsl:150-200)."""
    w, c, m, y, rr, g, b = basis
    r_, g_, b_ = float(rgb[0]), float(rgb[1]), float(rgb[2])
    if r_ <= g_ and r_ <= b_:
        res = w * r_
        if g_ <= b_:
            res = res + c * (g_ - r_) + b * (b_ - g_)
        else:
            res = res + c * (b_ - r_) + g * (g_ - b_)
    elif g_ <= r_ and g_ <= b_:
        res = w * g_
        if r_ <= b_:
            res = res + m * (r_ - g_) + b * (b_ - r_)
        else:
            res = res + m * (b_ - g_) + rr * (r_ - b_)
    else:
        res = w * b_
        if r_ <= g_:
            res = res + y * (r_ - b_) + g * (g_ - r_)
        else:
            res = res + y * (g_ - b_) + rr * (r_ - g_)
    return res * scale


def from_surface_color(rgb):
    return smits(rgb, _SURF, _SURF_SCALE)


def from_illuminant_color(rgb):
    return smits(rgb, _ILLUM, _ILLUM_SCALE)


def spectrum_to_rgb(sp):
    xyz = (_CIE * sp).sum(axis=1) * _INVY
    return _XYZ2RGB @ xyz


def luminance(sp):
    return float((_CIE[1] * sp).sum() * _INVY)


# ---------------------------------------------------------------------------
# fresnel.glsl / microfacets.glsl (scalar)
# ---------------------------------------------------------------------------


def fresnel_conductor(cosin, ior, ior2abs2):
    cosin2 = cosin * cosin
    etacosin2 = ior * (cosin * 2.0)
    rperp = (ior2abs2 - (etacosin2 + cosin2)) / (ior2abs2 + etacosin2 + cosin2)
    tmp = ior2abs2 * cosin2
    rpar = (tmp - (etacosin2 + 1.0)) / (tmp + etacosin2 + 1.0)
    return (rperp + rpar) / 2.0


def fresnel_dielectric(costi, etai, etat):
    sin2ti = max(0.0, 1.0 - costi * costi)
    sin2tt = etai * etai / (etat * etat) * sin2ti
    if sin2tt >= 1.0:
        return 1.0
    costt = np.sqrt(max(0.0, 1.0 - sin2tt))
    rparl = (etat * costi - etai * costt) / (etat * costi + etai * costt)
    rperp = (etai * costi - etat * costt) / (etai * costi + etat * costt)
    return (rparl * rparl + rperp * rperp) / 2.0


def _checknan(x):
    return 0.0 if np.isnan(x) else x


def to_anisotropic(a, anisotropy):
    return np.array([a * (1.0 + anisotropy), a * (1.0 - anisotropy)])


def ggx_d(wh, a):
    cost = wh[2]
    cos2t = cost * cost
    cos4t = cos2t * cos2t
    sin2t = max(0.0, 1.0 - cos2t)
    with np.errstate(divide="ignore", invalid="ignore"):
        tan2t = sin2t / cos2t if cos2t > 0 else np.inf
        if np.isinf(tan2t):
            return 0.0
        cos2p = wh[0] * wh[0] / sin2t if sin2t > 0 else np.inf
        sin2p = wh[1] * wh[1] / sin2t if sin2t > 0 else np.inf
    eplus1 = 1.0 + ((cos2p / (a[0] * a[0]) + sin2p / (a[1] * a[1])) * tan2t)
    return 1.0 / (PI * a[0] * a[1] * cos4t * eplus1 * eplus1)


def ggx_lambda(v, a):
    cost = v[2]
    cos2t = cost * cost
    sin2t = max(0.0, 1.0 - cos2t)
    if cos2t == 0.0:
        return 0.0  # isinf(tan2t) -> 0 (microfacets.glsl:85)
    tan2t = sin2t / cos2t
    if sin2t == 0.0:
        return 0.0
    cos2p = max(0.0, v[0] * v[0] / sin2t)
    sin2p = max(0.0, v[1] * v[1] / sin2t)
    alpha2 = cos2p * a[0] * a[0] + sin2p * a[1] * a[1]
    return (-1.0 + np.sqrt(1.0 + tan2t * alpha2)) * 0.5


def ggx_g(wo, wi, a):
    return 1.0 / (1.0 + ggx_lambda(wo, a) + ggx_lambda(wi, a))


def ggx_g1(v, a):
    return 1.0 / (1.0 + ggx_lambda(v, a))


def ggx_pdf(d, a, wo, wh):
    """Keeps the reference's G1(wh) quirk (microfacets.glsl:96-101)."""
    if abs(wh[2]) == 0.0:
        return 0.0
    return d * ggx_g1(wh, a) * abs(np.dot(wo, wh)) / abs(wh[2])


def ggx_sample_p22(cost, r0, r1):
    if cost > 0.999:
        r = np.sqrt(r0 / (1.0 - r0))
        phi = TWO_PI * r1
        return np.array([r * np.cos(phi), r * np.sin(phi)])
    cos2t = cost * cost
    sin2t = max(0.0, 1.0 - cos2t)
    tan2t = sin2t / cos2t
    if np.isinf(tan2t):
        tan2t = 0.0  # CHECKINF
    tant = np.sqrt(tan2t)
    a2 = 1.0 / tan2t if tan2t > 0 else np.inf
    g1 = 2.0 / (1.0 + np.sqrt(1.0 + 1.0 / a2))
    A = 2.0 * r0 / g1 - 1.0
    B = tant
    invA2m1 = 1.0 / (A * A - 1.0)
    sqrt_term = np.sqrt(max(0.0, B * B * invA2m1 * invA2m1
                            - (A * A - B * B) * invA2m1))
    sx1 = B * invA2m1 - sqrt_term
    sx2 = B * invA2m1 + sqrt_term
    sx = sx1 if (A < 0.0 or sx2 > 1.0 / tant) else sx2
    if r1 >= 0.5:
        s, u = -1.0, 2.0 * (0.5 - r1)
    else:
        s, u = 1.0, 2.0 * (r1 - 0.5)
    z = ((u * (u * (u * -0.3657289 + 0.7902350) - 0.4249658) + 0.0001529)
         / (u * (u * (u * (u * 0.1695078 - 0.3972035) - 0.2325005) + 1.0)
            - 0.5398259))
    sy = s * z * np.sqrt(1.0 + sx * sx)
    return np.array([sx, sy])


def ggx_sample_wh(wo, r0, r1, a):
    """Heitz VNDF sampling, verbatim quirks included (the sqrt-based
    cosp/sinp rotation loses the slope sign, microfacets.glsl:103-125)."""
    flip = np.sign(wo[2]) if wo[2] != 0 else 1.0
    wi = flip * wo
    ws = np.array([wi[0] * a[0], wi[1] * a[1], wi[2]])
    ws = ws / np.linalg.norm(ws)
    cost = ws[2]
    slope = ggx_sample_p22(cost, r0, r1)
    cos2t = cost * cost
    sin2t = max(0.0, 1.0 - cos2t)
    if sin2t > 0:
        cosp = np.sqrt(ws[0] * ws[0] / sin2t)
        sinp = np.sqrt(ws[1] * ws[1] / sin2t)
    else:
        cosp, sinp = np.inf, np.inf
    sx = cosp * slope[0] - sinp * slope[1]
    sy = sinp * slope[0] + cosp * slope[1]
    out = np.array([-a[0] * sx, -a[1] * sy, 1.0])
    return flip * out / np.linalg.norm(out)


# ---------------------------------------------------------------------------
# shading_space.glsl / GLSL built-ins (scalar)
# ---------------------------------------------------------------------------


def new_shading_space(dpdu, n):
    s = dpdu - n * np.dot(n, dpdu)
    s = s / np.linalg.norm(s)
    t = np.cross(n, s)
    return s, t, n


def to_shading(w, sp):
    s, t, n = sp
    v = np.array([np.dot(w, s), np.dot(w, t), np.dot(w, n)])
    return v / np.linalg.norm(v)


def to_world(v, sp):
    s, t, n = sp
    w = s * v[0] + t * v[1] + n * v[2]
    return w / np.linalg.norm(w)


def glsl_reflect(i, n):
    return i - 2.0 * np.dot(n, i) * n


def glsl_refract(i, n, eta):
    d = np.dot(n, i)
    k = 1.0 - eta * eta * (1.0 - d * d)
    if k < 0.0:
        return np.zeros(3)
    return eta * i - (eta * d + np.sqrt(k)) * n


def _normalize(v):
    l = np.linalg.norm(v)
    return v / l if l > 0 else v


# ---------------------------------------------------------------------------
# Scene preparation (host core objects -> flat float64 tables)
# ---------------------------------------------------------------------------


class OracleScene:
    """World-space triangle soup + material/light/texture tables built
    straight from a (duck-typed) ParsedScene, instance by instance in
    declaration order (same triangle ranges as scene/flatten.py uses for
    AREA lights, but none of its device packing)."""

    def __init__(self, parsed):
        verts = parsed.vertices()
        vpos = np.stack([v.vv for v in verts]).astype(np.float64)
        vnrm = np.stack([v.vn for v in verts]).astype(np.float64)
        vuv = np.stack([v.vt for v in verts]).astype(np.float64)
        meshes = {m.id: m for m in parsed.meshes()}
        transforms = parsed.transforms()

        tri_v, tri_n, tri_uv, tri_mat = [], [], [], []
        inst_mat, inst_first, inst_count = [], [], []
        n_tris = 0
        for inst in parsed.instances():
            mesh = meshes.get(inst.mesh_id)
            if mesh is None:
                continue
            t4 = np.asarray(transforms[inst.transform_id].m, np.float64)
            rot = t4[:3, :3]
            nrm_m = np.linalg.inv(rot).T
            idx = np.asarray(mesh.indices, np.int64).reshape(-1, 3)
            p = vpos[idx] @ rot.T + t4[:3, 3]
            n = vnrm[idx] @ nrm_m.T
            inst_mat.append(int(mesh.material))
            inst_first.append(n_tris)
            inst_count.append(len(idx))
            n_tris += len(idx)
            tri_v.append(p)
            tri_n.append(n)
            tri_uv.append(vuv[idx])
            tri_mat.extend([int(mesh.material)] * len(idx))
        self.tv = np.concatenate(tri_v)  # (N, 3, 3)
        self.tn = np.concatenate(tri_n)
        self.tuv = np.concatenate(tri_uv)
        self.tmat = np.asarray(tri_mat, np.int64)
        self.inst = list(zip(inst_mat, inst_first, inst_count))

        # precompute intersection + derivative tables
        self.v0 = self.tv[:, 0]
        self.e1 = self.tv[:, 1] - self.v0
        self.e2 = self.tv[:, 2] - self.v0
        gn = np.cross(self.e1, self.e2)
        self.gn = gn / np.maximum(np.linalg.norm(gn, axis=1, keepdims=True),
                                  1e-300)
        # generate_derivatives.comp
        duv02 = self.tuv[:, 0] - self.tuv[:, 2]
        duv12 = self.tuv[:, 1] - self.tuv[:, 2]
        det = duv02[:, 0] * duv12[:, 1] - duv02[:, 1] * duv12[:, 0]
        dp02 = self.tv[:, 0] - self.tv[:, 2]
        dp12 = self.tv[:, 1] - self.tv[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            invdet = np.where(det != 0.0, 1.0 / np.where(det == 0, 1, det), 0)
        dpdu = (duv12[:, 1:2] * dp02 - duv02[:, 1:2] * dp12) * invdet[:, None]
        # degenerate-UV fallback
        bad = det == 0.0
        nx, ny, nz = self.gn[:, 0], self.gn[:, 1], self.gn[:, 2]
        fb1 = np.stack([-nz, np.zeros_like(nx), nx], 1)
        fb1 /= np.maximum(np.sqrt(nx * nx + nz * nz), 1e-300)[:, None]
        fb2 = np.stack([np.zeros_like(nx), nz, -ny], 1)
        fb2 /= np.maximum(np.sqrt(ny * ny + nz * nz), 1e-300)[:, None]
        fb = np.where((np.abs(nx) > np.abs(ny))[:, None], fb1, fb2)
        self.dpdu = np.where(bad[:, None], fb, dpdu)

        # materials
        self.mats = []
        for mat in parsed.materials():
            ior = np.asarray(mat.metal.index_of_refraction(), np.float64)
            k = np.asarray(mat.metal.absorption(), np.float64)
            assert mat.normal == 0 and mat.opacity == 0, \
                "oracle does not model normal/opacity maps"
            self.mats.append(dict(
                mtype=mat.mtype,
                specular=mat.mtype.is_specular(),
                diffuse=mat.diffuse,
                diffuse_mul=np.asarray(mat.diffuse_mul, np.float64) / 255.0,
                roughness=mat.roughness,
                roughness_mul=float(mat.roughness_mul),
                metalness=mat.metalness,
                metalness_mul=float(mat.metalness_mul),
                anisotropy=float(mat.anisotropy),
                ior=float(mat.ior),
                metal_ior=ior,
                metal_fresnel=ior * ior + k * k,
            ))

        # textures: raw channels + srgb flag (texture 0 = 1x1 white)
        self.textures = []
        for t in parsed.textures():
            img = np.asarray(t.mipmaps[0] if hasattr(t, "mipmaps")
                             else t.data[0], np.float64)
            if img.ndim == 1:
                img = img.reshape(t.info.height, t.info.width, -1)
            srgb = "Srgb" in str(t.info.format)
            self.textures.append((img / 255.0, srgb))

        # lights, sky last (scene.rs:628-635)
        lights = [l for l in parsed.lights() if l.ltype != LightType.SKY]
        lights += [l for l in parsed.lights()
                   if l.ltype == LightType.SKY][:1]
        self.lights = []
        for l in lights:
            d = np.asarray(l.direction, np.float64)
            if not d.any():
                d = np.array([0.0, -1.0, 0.0])
            d = d / np.linalg.norm(d)
            base = dict(ltype=l.ltype,
                        color=np.asarray(l.color.wavelength, np.float64),
                        pos=np.asarray(l.position, np.float64),
                        dir=d, intensity=float(l.intensity))
            if l.ltype == LightType.AREA:
                mat_id = int(l.resource_id)
                rows = [dict(base, first=f, count=c, material=m)
                        for (m, f, c) in self.inst if m == mat_id]
                if not rows:
                    m0, f0, c0 = self.inst[0]
                    rows = [dict(base, first=f0, count=c0, material=mat_id)]
                self.lights.extend(rows)
            elif l.ltype == LightType.SKY:
                rot = np.asarray(l.rotation_matrix(), np.float64)[:3, :3]
                self.lights.append(dict(base, obj2world=rot,
                                        tex=int(l.resource_id)))
                self.sky = self.lights[-1]
            else:
                self.lights.append(base)
        self.sky = getattr(self, "sky", None)
        meta = parsed.meta()
        self.scene_radius = float(meta.scene_radius)

    # -- texture sampling (bilinear, REPEAT wrap, mip 0; ops/texture.py
    #    semantics which match the Vulkan sampler) --
    def sample_tex(self, tex_id, u, v):
        if tex_id <= 0 or tex_id >= len(self.textures):
            return np.ones(4)
        img, srgb = self.textures[tex_id]
        h, w = img.shape[0], img.shape[1]
        u = u - np.floor(u)
        v = v - np.floor(v)
        x = u * w - 0.5
        y = v * h - 0.5
        x0, y0 = int(np.floor(x)), int(np.floor(y))
        fx, fy = x - x0, y - y0
        out = np.zeros(4)
        for (dx, dy, wgt) in ((0, 0, (1 - fx) * (1 - fy)),
                              (1, 0, fx * (1 - fy)),
                              (0, 1, (1 - fx) * fy),
                              (1, 1, fx * fy)):
            texel = img[(y0 + dy) % h, (x0 + dx) % w]
            c = texel.copy()
            if len(c) < 4:
                c = np.concatenate([c, np.ones(4 - len(c))])
            if srgb:
                c[:3] = np.where(c[:3] <= 0.04045, c[:3] / 12.92,
                                 ((c[:3] + 0.055) / 1.055) ** 2.4)
            out += wgt * c
        return out

    # -- brute-force intersection --
    def closest(self, o, d, t_min=1e-4, t_max=np.inf):
        p = np.cross(d, self.e2)
        det = (self.e1 * p).sum(1)
        ok = np.abs(det) >= 1e-12
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = np.where(ok, 1.0 / np.where(det == 0, 1, det), 0.0)
        tv = o - self.v0
        u = (tv * p).sum(1) * inv
        q = np.cross(tv, self.e1)
        v = (d * q).sum(1) * inv
        t = (self.e2 * q).sum(1) * inv
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > t_min) & (t < t_max)
        if not hit.any():
            return None
        t = np.where(hit, t, np.inf)
        i = int(np.argmin(t))
        return i, t[i], u[i], v[i]

    def occluded(self, o, d, t_min, t_max):
        return self.closest(o, d, t_min, t_max) is not None

    def sky_radiance_rgb(self, direction):
        """path_trace.rgen:76-83 (NO intensity scaling on miss)."""
        if self.sky is None:
            return None
        w = self.sky["obj2world"].T @ direction
        w = w / np.linalg.norm(w)
        phi = np.arctan2(w[1], w[0])
        theta = np.arccos(np.clip(w[2], -1.0, 1.0))
        uv = (phi * INV_2PI, theta * INV_PI)
        return self.sample_tex(self.sky["tex"], uv[0], uv[1])[:3]


# ---------------------------------------------------------------------------
# material callables (mat_*.rcall, scalar)
# ---------------------------------------------------------------------------


def _tex_rgb(scene, mat, uv):
    return scene.sample_tex(mat["diffuse"], uv[0], uv[1])[:3] \
        * mat["diffuse_mul"]


def _roughness(scene, mat, uv):
    r = scene.sample_tex(mat["roughness"], uv[0], uv[1])[0]
    return r * mat["roughness_mul"]


def _etas(mat, woz):
    from_outside = woz >= 0.0
    etai = DEFAULT_IOR if from_outside else mat["ior"]
    etat = mat["ior"] if from_outside else DEFAULT_IOR
    return etai, etat


def bsdf_value(scene, mat, wo, wi, uv, rand):
    """(value spectrum, pdf) in shading space; the *_value.rcall set."""
    mt = mat["mtype"]
    same_hemi = wo[2] * wi[2] > 0.0
    if mt in (MaterialType.LAMBERT, MaterialType.FLAT,
              MaterialType.INTERNAL_FLAT_2SIDED):
        value = from_surface_color(_tex_rgb(scene, mat, uv) * INV_PI)
        pdf = (1.0 if same_hemi else 0.0) * abs(wi[2]) * INV_PI
        return value, pdf
    if mt in (MaterialType.MIRROR, MaterialType.GLASS):
        return np.zeros(16), 0.0
    if mt == MaterialType.METAL:
        if not same_hemi:
            return np.zeros(16), 0.0
        wh = _normalize(wo + wi)
        a = to_anisotropic(_roughness(scene, mat, uv), mat["anisotropy"])
        f = fresnel_conductor(np.dot(wi, wh), mat["metal_ior"],
                              mat["metal_fresnel"])
        d = ggx_d(wh, a)
        g = ggx_g(wo, wi, a)
        term = d * g / (4.0 * abs(wo[2]) * abs(wi[2]))
        pdf = _checknan(ggx_pdf(d, a, wo, wh) / (4.0 * np.dot(wo, wh)))
        return f * term, pdf
    if mt == MaterialType.FROSTED:
        a = to_anisotropic(_roughness(scene, mat, uv), mat["anisotropy"])
        etai, etat = _etas(mat, wo[2])
        eta = etai / etat
        if same_hemi:
            wh = _normalize(wo + wi)
            dotwowh = np.dot(wo, wh)
            dotwiwh = np.dot(wi, wh)
            costi = np.dot(wi, np.sign(wh[2]) * wh) if wh[2] != 0 else 0.0
            f = fresnel_dielectric(costi, etai, etat)
            d = (1.0 if wo[2] >= 0 else 0.0) * ggx_d(wh, a)
            g = (1.0 if (dotwowh >= 0 and dotwiwh >= 0) else 0.0) \
                * ggx_g(wo, wi, a)
            pdf = _checknan(ggx_pdf(d, a, wo, wh) / (4.0 * dotwowh))
            term = d * g * f / (4.0 * abs(wo[2]) * abs(wi[2]))
            return np.full(16, term), pdf
        wh = _normalize(wo + eta * wi) * np.sign(wo[2])
        dotwowh = np.dot(wo, wh)
        dotwiwh = np.dot(wi, wh)
        f = fresnel_dielectric(dotwowh, etai, etat)
        denom = dotwowh + eta * dotwiwh
        d = ggx_d(wh, a)
        g = ggx_g(wo, wi, a)
        pdf = _checknan(ggx_pdf(d, a, wo, wh) * abs(eta * eta * dotwiwh)
                        / (denom * denom))
        term = (d * g * (1.0 - f) * abs(dotwiwh) * abs(dotwowh)
                / (denom * denom * abs(wo[2]) * abs(wi[2])))
        return np.full(16, term), pdf
    if mt == MaterialType.UBER:
        roughness = _roughness(scene, mat, uv)
        if rand < 0.5:
            # to_anisotropic(roughness*mul, ...) quirk: roughness already
            # includes mul (mat_uber_value.rcall:31)
            a = to_anisotropic(roughness * mat["roughness_mul"],
                               mat["anisotropy"])
            wh = _normalize(wo + wi)
            metalness = scene.sample_tex(mat["metalness"], uv[0], uv[1])[0] \
                * mat["metalness_mul"]
            etai, etat = _etas(mat, wo[2])
            dotwowh = np.dot(wo, wh)
            dotwiwh = np.dot(wi, wh)
            costi = np.dot(wi, np.sign(wh[2]) * wh) if wh[2] != 0 else 0.0
            fd = np.full(16, fresnel_dielectric(costi, etai, etat))
            fc = fresnel_conductor(costi, mat["metal_ior"],
                                   mat["metal_fresnel"])
            f = fd * (1.0 - metalness) + fc * metalness
            d = (1.0 if wo[2] >= 0 else 0.0) * ggx_d(wh, a)
            g = (1.0 if (dotwowh >= 0 and dotwiwh >= 0) else 0.0) \
                * ggx_g(wo, wi, a)
            pdf = _checknan((1.0 if same_hemi else 0.0) * 0.5
                            * ggx_pdf(d, a, wo, wh) / (4.0 * dotwowh))
            term = d * g / (4.0 * abs(wo[2]) * abs(wi[2]))
            return f * term, pdf
        value = from_surface_color(
            _tex_rgb(scene, mat, uv) * _oren_nayar(wo, wi, roughness))
        pdf = _checknan((1.0 if same_hemi else 0.0) * 0.5 * abs(wi[2])
                        * INV_PI)
        return value, pdf
    raise AssertionError(f"no value callable for {mt}")


def _oren_nayar(wo, wi, roughness):
    """Documented deviation shared with the wavefront port: the
    reference's mix() arms are swapped relative to the standard
    Oren-Nayar alpha/beta assignment (mat_uber_value.rcall:71-73);
    both implementations use the correct orientation (alpha = larger
    incidence angle). See render/bsdf.py:_oren_nayar_term."""
    sigma = roughness * 0.5
    sigma2 = sigma * sigma
    A = 1.0 - sigma2 / (2.0 * (sigma2 + 0.33))
    B = 0.45 * sigma2 / (sigma2 + 0.09)
    sinto = np.sqrt(max(0.0, 1.0 - wo[2] * wo[2]))
    sinti = np.sqrt(max(0.0, 1.0 - wi[2] * wi[2]))
    with np.errstate(divide="ignore", invalid="ignore"):
        sinpi = wi[1] / sinti if sinti > 0 else np.inf
        cospi = wi[0] / sinti if sinti > 0 else np.inf
        sinpo = wo[1] / sinto if sinto > 0 else np.inf
        cospo = wo[0] / sinto if sinto > 0 else np.inf
    maxcos = max(0.0, cospi * cospo + sinpi * sinpo)
    if np.isnan(maxcos):
        maxcos = 0.0
    wi_ge_wo = abs(wi[2]) >= abs(wo[2])
    sinalpha = sinto if wi_ge_wo else sinti
    tanbeta = (sinti / abs(wi[2])) if wi_ge_wo else (sinto / abs(wo[2]))
    t = INV_PI * (A + B * maxcos * sinalpha * tanbeta)
    return 0.0 if np.isnan(t) else t


def bsdf_sample(scene, mat, wo, uv, r3):
    """(wi, value spectrum, pdf); the *_sample_value.rcall set."""
    mt = mat["mtype"]
    if mt in (MaterialType.LAMBERT, MaterialType.FLAT,
              MaterialType.INTERNAL_FLAT_2SIDED):
        t = TWO_PI * r3[0]
        r = np.sqrt(r3[1])
        wi = np.array([r * np.cos(t), r * np.sin(t), 0.0])
        wi[2] = np.sqrt(max(0.0, 1.0 - wi[0] ** 2 - wi[1] ** 2))
        wi[2] *= np.sign(wo[2]) if wo[2] != 0 else 1.0
        pdf = abs(wi[2]) * INV_PI
        value = from_surface_color(_tex_rgb(scene, mat, uv) * INV_PI)
        return wi, value, pdf
    if mt == MaterialType.MIRROR:
        wi = np.array([-wo[0], -wo[1], wo[2]])
        f = fresnel_conductor(wo[2], mat["metal_ior"], mat["metal_fresnel"])
        return wi, f / abs(wo[2]), 1.0
    if mt == MaterialType.GLASS:
        costi = wo[2]
        from_outside = costi >= 0.0
        etai = DEFAULT_IOR if from_outside else mat["ior"]
        etat = mat["ior"] if from_outside else DEFAULT_IOR
        costi = abs(costi)
        f = fresnel_dielectric(costi, etai, etat)
        if r3[2] < f:
            wi = np.array([-wo[0], -wo[1], wo[2]])
            return wi, np.full(16, f / abs(wi[2])), f
        n = np.array([0.0, 0.0, np.sign(wo[2]) if wo[2] != 0 else 1.0])
        wi = glsl_refract(wo, n, etai / etat)
        if abs(wi[2]) < 1e-300:
            return wi, np.zeros(16), 0.0
        val = (1.0 - f) * (etai * etai) / (etat * etat * abs(wi[2]))
        return wi, np.full(16, val), 1.0 - f
    if mt == MaterialType.METAL:
        a = to_anisotropic(_roughness(scene, mat, uv), mat["anisotropy"])
        wh = ggx_sample_wh(wo, r3[0], r3[1], a)
        wi = -_normalize(glsl_reflect(wo, wh))
        if wo[2] * wi[2] <= 0.0:
            return wi, np.zeros(16), 0.0
        d = ggx_d(wh, a)
        g = ggx_g(wo, wi, a)
        f = fresnel_conductor(np.dot(wi, wh), mat["metal_ior"],
                              mat["metal_fresnel"])
        term = d * g / (4.0 * abs(wo[2]) * abs(wi[2]))
        pdf = _checknan(ggx_pdf(d, a, wo, wh) / (4.0 * np.dot(wo, wh)))
        return wi, f * term, pdf
    if mt == MaterialType.FROSTED:
        a = to_anisotropic(_roughness(scene, mat, uv), mat["anisotropy"])
        wh = ggx_sample_wh(wo, r3[0], r3[1], a)
        etai, etat = _etas(mat, wo[2])
        eta = etai / etat
        if r3[2] < 0.5:
            wi = -_normalize(glsl_reflect(wo, wh))
            dotwowh = np.dot(wo, wh)
            dotwiwh = np.dot(wi, wh)
            costi = np.dot(wi, np.sign(wh[2]) * wh) if wh[2] != 0 else 0.0
            f = fresnel_dielectric(costi, etai, etat)
            d = (1.0 if wo[2] >= 0 else 0.0) * ggx_d(wh, a)
            g = (1.0 if (dotwowh >= 0 and dotwiwh >= 0) else 0.0) \
                * ggx_g(wo, wi, a)
            pdf = _checknan(0.5 * ggx_pdf(d, a, wo, wh) / (4.0 * dotwowh))
            term = d * g * f / (4.0 * abs(wo[2]) * abs(wi[2])) \
                if wi[2] != 0 else 0.0
            return wi, np.full(16, term), pdf
        wi = glsl_refract(wo, wh, eta)
        nl = np.linalg.norm(wi)
        if nl == 0.0:
            return wi, np.zeros(16), 0.0
        wi = wi / nl
        dotwowh = np.dot(wo, wh)
        dotwiwh = np.dot(wi, wh)
        f = fresnel_dielectric(dotwowh, etai, etat)
        denom = dotwowh + eta * dotwiwh
        d = ggx_d(wh, a)
        g = ggx_g(wo, wi, a)
        pdf = (_checknan(0.5 * ggx_pdf(d, a, wo, wh)
                         * abs(eta * eta * dotwiwh) / (denom * denom))
               if dotwowh * dotwiwh < 0.0 else 0.0)
        term = (d * g * (1.0 - f) * abs(dotwiwh) * abs(dotwowh)
                / (denom * denom * abs(wo[2]) * abs(wi[2]))) \
            if wi[2] != 0 and wo[2] != 0 else 0.0
        return wi, np.full(16, term), pdf
    if mt == MaterialType.UBER:
        roughness = _roughness(scene, mat, uv)
        if r3[2] < 0.5:
            a = to_anisotropic(roughness * mat["roughness_mul"],
                               mat["anisotropy"])
            wh = ggx_sample_wh(wo, r3[0], r3[1], a)
            wi = -_normalize(glsl_reflect(wo, wh))
            metalness = scene.sample_tex(mat["metalness"], uv[0],
                                         uv[1])[0] * mat["metalness_mul"]
            etai, etat = _etas(mat, wo[2])
            dotwowh = np.dot(wo, wh)
            dotwiwh = np.dot(wi, wh)
            costi = np.dot(wi, np.sign(wh[2]) * wh) if wh[2] != 0 else 0.0
            fd = np.full(16, fresnel_dielectric(costi, etai, etat))
            fc = fresnel_conductor(costi, mat["metal_ior"],
                                   mat["metal_fresnel"])
            f = fd * (1.0 - metalness) + fc * metalness
            d = (1.0 if wo[2] >= 0 else 0.0) * ggx_d(wh, a)
            g = (1.0 if (dotwowh >= 0 and dotwiwh >= 0) else 0.0) \
                * ggx_g(wo, wi, a)
            pdf = _checknan(0.5 * ggx_pdf(d, a, wo, wh) / (4.0 * dotwowh))
            term = d * g / (4.0 * abs(wo[2]) * abs(wi[2])) \
                if wi[2] != 0 else 0.0
            return wi, f * term, pdf
        t = TWO_PI * r3[0]
        r = np.sqrt(r3[1])
        wi = np.array([r * np.cos(t), r * np.sin(t), 0.0])
        wi[2] = np.sqrt(max(0.0, 1.0 - wi[0] ** 2 - wi[1] ** 2))
        wi[2] *= np.sign(wo[2]) if wo[2] != 0 else 1.0
        value = from_surface_color(
            _tex_rgb(scene, mat, uv) * _oren_nayar(wo, wi, roughness))
        pdf = 0.5 * abs(wi[2]) * INV_PI
        return wi, value, pdf
    raise AssertionError(f"no sample callable for {mt}")


# ---------------------------------------------------------------------------
# light callables (light_*_sample_visible.rcall, scalar, with the two
# documented area-light fixes)
# ---------------------------------------------------------------------------


def sample_light(scene, light, position, rng):
    """(wiW, distance, emission spectrum, pdf)."""
    lt = light["ltype"]
    if lt == LightType.OMNI:
        delta = light["pos"] - position
        d2 = float(np.dot(delta, delta))
        dist = np.sqrt(d2)
        return delta / max(dist, 1e-300), dist, \
            light["color"] * (light["intensity"] / max(d2, 1e-300)), 1.0
    if lt == LightType.SUN:
        return -light["dir"], 2.0 * scene.scene_radius + 1.0, \
            light["color"] * light["intensity"], 1.0
    if lt == LightType.AREA:
        r3 = rng.random(3)
        count = max(light["count"], 1)
        tri = light["first"] + min(int(r3[0] * count), count - 1)
        v0, v1, v2 = scene.tv[tri]
        area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0))
        sqr_u = np.sqrt(r3[1])
        bu = 1.0 - sqr_u
        bv = r3[2] * sqr_u
        point = bu * v0 + bv * v1 + (1.0 - bu - bv) * v2
        delta = point - position  # FIXED direction (surface -> light)
        d2 = float(np.dot(delta, delta))
        dist = np.sqrt(d2)
        mat = scene.mats[light["material"]]
        emission = from_surface_color(mat["diffuse_mul"]) \
            * (light["intensity"] / max(d2, 1e-300))
        pdf = 1.0 / (count * max(area, 1e-300))  # FIXED true area
        return delta / max(dist, 1e-300), dist, emission, pdf
    if lt == LightType.SKY:
        # independent strategy: uniform sphere, pdf 1/(4pi) — unbiased
        # against the wavefront's texel-importance tables because each
        # divides by its own true pdf
        z = 1.0 - 2.0 * rng.random()
        phi = TWO_PI * rng.random()
        s = np.sqrt(max(0.0, 1.0 - z * z))
        wiw = np.array([s * np.cos(phi), s * np.sin(phi), z])
        rgb = scene.sky_radiance_rgb(wiw)
        emission = from_illuminant_color(rgb * light["intensity"])
        return wiw, 2.0 * scene.scene_radius + 1.0, emission, INV_4PI
    raise AssertionError(f"no light callable for {lt}")


# ---------------------------------------------------------------------------
# path_trace.rgen main() — per-pixel launch loop
# ---------------------------------------------------------------------------


def _camera_ray(ndc, c2w, s2c, is_persp):
    if is_persp:
        origin = c2w @ np.array([0.0, 0.0, 0.0, 1.0])
        target = s2c @ np.array([ndc[0], ndc[1], 1.0, 1.0])
    else:
        origin = c2w @ np.array([ndc[0], ndc[1], 0.0, 1.0])
        target = s2c @ np.array([0.0, 0.0, 1.0, 1.0])
    t3 = target[:3] / np.linalg.norm(target[:3])
    d = c2w @ np.concatenate([t3, [0.0]])
    d3 = d[:3] / np.linalg.norm(d[:3])
    return origin[:3], d3


def render_pixels(scene, pixels, width, height, c2w, s2c, seeds, offsets,
                  direct_only=False, is_persp=True):
    """Renders the given (x, y) pixels through len(seeds) launches.

    Returns (accum (P, 3) radiance sums, count) — the same estimator as
    update_count/update_result (count increments every launch; radiance
    adds on NEE and sky-miss launches)."""
    c2w = np.asarray(c2w, np.float64)
    s2c = np.asarray(s2c, np.float64)
    accum = np.zeros((len(pixels), 3))
    lights = scene.lights
    lights_no = len(lights)
    assert lights_no > 0
    for pi, (px, py) in enumerate(pixels):
        bounce = 0
        last_specular = 0.0
        origin = direction = None
        importance = np.ones(16)
        for li, seed in enumerate(seeds):
            rng = np.random.default_rng(
                (int(seed), int(px), int(py), 0xC0FFEE))
            if direct_only or bounce == 0:
                pixel = np.array([px, py], np.float64) + offsets[li]
                uv = pixel / np.array([width, height])
                ndc = -1.0 + 2.0 * uv
                origin, direction = _camera_ray(ndc, c2w, s2c, is_persp)
                importance = np.ones(16)
            hit = scene.closest(origin, direction, t_min=1e-4)
            if hit is None:
                if (bounce == 0 or last_specular == 1.0) \
                        and scene.sky is not None:
                    rgb = scene.sky_radiance_rgb(direction)
                    accum[pi] += spectrum_to_rgb(
                        importance * from_illuminant_color(rgb))
                bounce = 0
                continue
            tri, t, bu, bv = hit
            point = scene.v0[tri] + bu * scene.e1[tri] + bv * scene.e2[tri]
            bw = 1.0 - bu - bv
            n = (bw * scene.tn[tri, 0] + bu * scene.tn[tri, 1]
                 + bv * scene.tn[tri, 2])
            shading_n = n / np.linalg.norm(n)
            uv_hit = (bw * scene.tuv[tri, 0] + bu * scene.tuv[tri, 1]
                      + bv * scene.tuv[tri, 2])
            mat = scene.mats[scene.tmat[tri]]
            wo_w = -direction
            sp = new_shading_space(scene.dpdu[tri], shading_n)
            if not mat["specular"]:
                # direct_light (path_trace.rgen:87-117)
                lidx = min(int(rng.random() * lights_no), lights_no - 1)
                wiw, dist, emission, lpdf = sample_light(
                    scene, lights[lidx], point, rng)
                radiance = np.zeros(16)
                if lpdf > 0.0:
                    wo = to_shading(wo_w, sp)
                    wi = to_shading(wiw, sp)
                    value, bpdf = bsdf_value(scene, mat, wo, wi, uv_hit,
                                             rng.random())
                    if bpdf > 0.0:
                        shadowed = scene.occluded(point, wiw, 1e-3,
                                                  dist - 1e-3)
                        w = ((not shadowed)
                             * abs(np.dot(wiw, shading_n)) / lpdf)
                        radiance = value * emission * w
                accum[pi] += spectrum_to_rgb(
                    importance * radiance * lights_no)
                last_specular = 0.0
            else:
                last_specular = 1.0
            if direct_only:
                continue
            if bounce > RUSSIAN_ROULETTE:
                kill = max(0.05, 1.0 - luminance(importance))
                if rng.random() < kill:
                    bounce = 0
                    continue
                importance = importance / (1.0 - kill)
            wo = to_shading(wo_w, sp)
            wi, value, pdf = bsdf_sample(scene, mat, wo, uv_hit,
                                         rng.random(3))
            if pdf == 0.0:
                bounce = 0
                continue
            wi_w = to_world(wi, sp)
            importance = importance * value \
                * (abs(np.dot(wi_w, shading_n)) / pdf)
            origin = point
            direction = wi_w
            bounce = bounce + 1 if bounce < PT_STEPS else 0
    return accum, len(seeds)
