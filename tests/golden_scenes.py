"""Golden-test scene: all six BSDF families side by side.

A row of six spheres (lambert, mirror, glass, metal/GOLD, frosted, uber)
on a checkered lambert floor, lit by an OMNI key light, an emissive AREA
panel, and a gradient SKY — every light type and material family in one
image, so one golden render regression-checks the full shading surface
(BASELINE config #3's per-material-family correctness bar, executable).
"""

from __future__ import annotations

import numpy as np

from glaze_tpu.core import (
    Camera,
    Light,
    LightType,
    Material,
    MaterialType,
    Mesh,
    MeshInstance,
    Metal,
    PerspectiveCam,
    Spectrum,
    Texture,
    TextureFormat,
    TextureInfo,
    Transform,
    Vertex,
)
from glaze_tpu.parser import Meta

GOLDEN_W, GOLDEN_H = 96, 48
GOLDEN_SPP = 8
GOLDEN_SEED = 1234


def _sphere(centre, radius, rings=12, segs=18):
    pos, nrm, uv, idx = [], [], [], []
    for i in range(rings + 1):
        phi = np.pi * i / rings
        for j in range(segs + 1):
            th = 2 * np.pi * j / segs
            n = np.asarray([np.sin(phi) * np.cos(th), np.cos(phi),
                            np.sin(phi) * np.sin(th)], np.float32)
            pos.append(np.asarray(centre, np.float32) + radius * n)
            nrm.append(n)
            uv.append(np.asarray([j / segs, i / rings], np.float32))
    for i in range(rings):
        for j in range(segs):
            a = i * (segs + 1) + j
            b = a + segs + 1
            idx.extend([a, b, b + 1, a, b + 1, a + 1])
    return pos, nrm, uv, idx


class MatRowScene:
    """Duck-typed ParsedScene."""

    FAMILIES = [
        ("lambert", MaterialType.LAMBERT),
        ("mirror", MaterialType.MIRROR),
        ("glass", MaterialType.GLASS),
        ("metal", MaterialType.METAL),
        ("frosted", MaterialType.FROSTED),
        ("uber", MaterialType.UBER),
    ]

    def __init__(self):
        self._pos, self._nrm, self._uv = [], [], []
        self._meshes = []
        n_mat = len(self.FAMILIES)
        for k in range(n_mat):
            x = -5.0 + 2.0 * k
            pos, nrm, uv, idx = _sphere([x, 1.0, 0.0], 0.85)
            base = len(self._pos)
            self._pos.extend(pos)
            self._nrm.extend(nrm)
            self._uv.extend(uv)
            self._meshes.append(
                Mesh(k, [i + base for i in idx], k + 1))
        # floor (material n_mat+1) + emissive panel (n_mat+2)
        base = len(self._pos)
        for p, uvc in (([-8, 0, -4], [0, 0]), ([8, 0, -4], [8, 0]),
                       ([8, 0, 4], [8, 4]), ([-8, 0, 4], [0, 4])):
            self._pos.append(np.asarray(p, np.float32))
            self._nrm.append(np.asarray([0, 1, 0], np.float32))
            self._uv.append(np.asarray(uvc, np.float32))
        self._meshes.append(Mesh(n_mat, [base, base + 1, base + 2,
                                         base, base + 2, base + 3],
                                 n_mat + 1))
        base = len(self._pos)
        for p in ([-1.5, 5.5, -1], [1.5, 5.5, -1], [1.5, 5.5, 1],
                  [-1.5, 5.5, 1]):
            self._pos.append(np.asarray(p, np.float32))
            self._nrm.append(np.asarray([0, -1, 0], np.float32))
            self._uv.append(np.asarray([0, 0], np.float32))
        self._meshes.append(Mesh(n_mat + 1, [base, base + 2, base + 1,
                                             base, base + 3, base + 2],
                                 n_mat + 2))

    def vertices(self):
        return [Vertex(p, n, t) for p, n, t in
                zip(self._pos, self._nrm, self._uv)]

    def meshes(self):
        return self._meshes

    def transforms(self):
        return [Transform.identity()]

    def instances(self):
        return [MeshInstance(m.id, 0) for m in self._meshes]

    def cameras(self):
        return [Camera.Perspective(PerspectiveCam(
            position=[0.0, 2.2, 7.5], target=[0.0, 1.0, 0.0],
            up=[0.0, 1.0, 0.0]))]

    def textures(self):
        i = np.arange(64)
        chk = ((i[:, None] // 8 + i[None, :] // 8) % 2).astype(np.uint8)
        floor = np.zeros((64, 64, 4), np.uint8)
        floor[..., :3] = np.where(chk[..., None] > 0, 70, 200)
        floor[..., 3] = 255
        v = np.linspace(0, 1, 32, np.float32)[:, None]
        sky = np.zeros((32, 64, 4), np.uint8)
        sky[..., 0] = (120 + 100 * v).astype(np.uint8)
        sky[..., 1] = (160 + 60 * v).astype(np.uint8)
        sky[..., 2] = 230
        sky[..., 3] = 255
        return [
            Texture.default(),
            Texture(TextureInfo("floor", 64, 64, TextureFormat.RgbaSrgb),
                    [floor]),
            Texture(TextureInfo("sky", 64, 32, TextureFormat.RgbaSrgb),
                    [sky]),
        ]

    def materials(self):
        mats = [Material(name="default")]
        for name, mtype in self.FAMILIES:
            m = Material(name=name, mtype=mtype, roughness_mul=0.3)
            if mtype == MaterialType.METAL:
                m.metal = Metal.GOLD
            if mtype in (MaterialType.GLASS, MaterialType.FROSTED):
                m.ior = 1.5
            mats.append(m)
        mats.append(Material(name="floor", mtype=MaterialType.LAMBERT,
                             diffuse=1))
        mats.append(Material(name="panel", mtype=MaterialType.LAMBERT,
                             emissive_col=(255, 240, 220)))
        return mats

    def lights(self):
        n_mat = len(self.FAMILIES)
        return [
            Light(ltype=LightType.OMNI, name="key", color=Spectrum.white(),
                  position=np.asarray([3.0, 6.0, 5.0], np.float32),
                  intensity=40.0),
            Light(ltype=LightType.AREA, name="panel",
                  resource_id=n_mat + 2, intensity=4.0),
            Light(ltype=LightType.SKY, name="sky", resource_id=2,
                  intensity=1.0),
        ]

    def meta(self):
        return Meta(scene_centre=[0, 1, 0], scene_radius=10.0, exposure=1.0)


def render_golden(seed=GOLDEN_SEED, spp=GOLDEN_SPP, coherent=0,
                  sampler="pcg"):
    """Renders the golden scene deterministically; returns (accum (P,3),
    count (P,)) raw accumulation plus the display image.

    ``coherent`` is explicit (not the renderer default) so each stored
    golden pins ONE sampling configuration: matrow.npz is mode 0,
    matrow_coh1/2.npz pin the shipped frame/tile modes."""
    import jax
    import numpy as np

    from glaze_tpu.render import integrator as integ
    from glaze_tpu.render.renderer import Integrator, RayTraceRenderer

    r = RayTraceRenderer(MatRowScene(), width=GOLDEN_W, height=GOLDEN_H,
                         integrator=Integrator.PATH_TRACE, seed=seed,
                         coherent=coherent, sampler=sampler)
    img = r.draw(spp)
    accum = np.stack([np.asarray(jax.device_get(c))
                      for c in r._state.accum], -1)
    count = np.asarray(jax.device_get(r._state.count))
    return accum, count, img


def render_preview_golden():
    """Renders the flat-preview frame of the golden scene (per-material
    styled looks, render/preview.py); returns (H, W, 3) uint8."""
    from glaze_tpu.render.preview import FlatPreviewRenderer
    from glaze_tpu.scene import flatten_scene

    scene, camera, host = flatten_scene(MatRowScene())
    r = FlatPreviewRenderer(scene, camera=camera, width=GOLDEN_W,
                            height=GOLDEN_H, host=host)
    return r.get_image()
