"""Flat-shaded instant preview — the raster forward pass, TPU-first.

The reference renders a non-raytraced preview with per-material raster
pipelines + a skydome background (renderer.rs:561-655, flat.vert/.frag,
skydome.vert/.frag). Vulkan rasterization is free fixed-function hardware;
on TPU the natural single-pass primitive is a primary-visibility ray cast:
one closest-hit trace + flat shading (diffuse texture x headlight n.v
term, matching flat.frag's look) + skydome on miss. No NEE, no shadow
rays, no RNG, no accumulation — one kernel launch per frame, several times
cheaper than even the DIRECT integrator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from glaze_tpu import accel
from glaze_tpu.core import Camera
from glaze_tpu.ops import texture as tx
from glaze_tpu.ops import vec
from glaze_tpu.render import integrator as integ
from glaze_tpu.scene import flatten as fl


@functools.partial(jax.jit,
                   static_argnames=("width", "height", "is_persp",
                                    "alpha_rounds"))
def flat_pass(scene, cam2world, screen2cam, exposure, cone_scale, *, width,
              height, is_persp, alpha_rounds=0):
    """One flat-shaded frame: (P', 3) uint8 channels (tile-swizzled).

    Per-material preview looks (the reference keys one raster pipeline
    per material, renderer.rs:587-588 + scene.rs:547-549; its fragment
    set is flat.frag for everything and flat_twosided.frag's
    opacity-discard for INTERNAL_FLAT_2SIDED — here the one launch
    additionally styles each family so they are visually distinct):

    * FLAT / INTERNAL_FLAT_2SIDED — unlit diffuse (flat.frag parity)
    * LAMBERT / UBER / FROSTED — headlight n.v diffuse
    * METAL / MIRROR — normal-incidence conductor-fresnel tint with a
      view-dependent highlight
    * GLASS — fresnel rim (bright silhouette, dark facing)
    * opacity maps discard like flat_twosided.frag via alpha re-trace
      rounds (``alpha_rounds`` > 0 when the scene has opacity textures)
    """
    px, py = integ.pixel_coords(width, height)
    ndc_x = -1.0 + 2.0 * (px + 0.5) / width
    ndc_y = -1.0 + 2.0 * (py + 0.5) / height
    origin, direction = integ.camera_rays(ndc_x, ndc_y, cam2world,
                                          screen2cam, is_persp)
    if alpha_rounds > 0:
        hit = integ.trace_alpha(scene, origin, direction,
                                alpha_rounds=alpha_rounds)
    else:
        hit = accel.closest_hit_soa_auto(scene.bvh, origin, direction)
    missed = hit["tri"] < 0

    surf = integ._interpolate_hit(scene, hit)
    mat_id = surf["material_id"]
    tex = scene.mat_tex[mat_id][:, fl.MT_DIFFUSE]
    # Footprint-based mip selection (the reference's raster preview gets
    # hardware trilinear over the blitted mip chain, texture.rs:96-235):
    # pixel world footprint = hit distance x pixel cone width (constant
    # for ortho), widened at grazing incidence; texel world size comes
    # from the interpolated position derivative |dP/du| vs the texture's
    # u resolution. log2 of their ratio is the classic isotropic LOD.
    ndotv_g = jnp.abs(vec.dot(surf["geom_normal"], direction))
    fw = (hit["t"] * cone_scale if is_persp
          else jnp.broadcast_to(cone_scale, hit["t"].shape))
    fw = fw / jnp.maximum(ndotv_g, 0.25)
    du = jnp.sqrt(jnp.maximum(vec.dot(surf["dpdu"], surf["dpdu"]), 1e-12))
    texel_w = du / scene.atlas.width[tex].astype(jnp.float32)
    lod = jnp.log2(jnp.maximum(fw / jnp.maximum(texel_w, 1e-12), 1e-6))
    r, g, b = tx.sample_rgb_lod_v(scene.atlas, tex, surf["uv"][0],
                                  surf["uv"][1], lod)
    s = scene.mat_scalars[mat_id]
    r = r * s[:, fl.MS_DIFFUSE_R]
    g = g * s[:, fl.MS_DIFFUSE_G]
    b = b * s[:, fl.MS_DIFFUSE_B]

    mtype = s[:, fl.MS_MTYPE].astype(jnp.int32)
    family = s[:, fl.MS_BSDF].astype(jnp.int32)
    ndotv = jnp.abs(vec.dot(surf["shading_normal"], vec.neg(direction)))
    headlight = 0.25 + 0.75 * ndotv

    # metal/mirror: F0 tint (conductor fresnel at normal incidence)
    from glaze_tpu.ops import fresnel as fr
    from glaze_tpu.ops import spectra

    f0 = fr.fresnel_conductor_t(jnp.ones_like(ndotv),
                                scene.mat_metal_ior[mat_id].T,
                                scene.mat_metal_fresnel[mat_id].T)
    f0r, f0g, f0b = spectra.to_rgb_t(f0)
    glint = 0.35 + 0.65 * jnp.exp(8.0 * (ndotv - 1.0))
    rim = 0.08 + 0.92 * (1.0 - ndotv) ** 2

    is_unlit = (mtype == 0) | (mtype == 7)  # FLAT / INTERNAL_FLAT_2SIDED
    is_metal = (family == 1) | (family == 3)  # MIRROR / METAL
    is_glass = family == 2

    def style(c, f0c):
        out = jnp.where(is_unlit, c, c * headlight)
        out = jnp.where(is_metal, jnp.clip(f0c, 0.0, 1.0) * glint, out)
        return jnp.where(is_glass, rim, out)

    r = style(r, f0r)
    g = style(g, f0g)
    b = style(b, f0b)

    # skydome background (skydome.frag), black when the scene has no sky
    sr, sg, sb = integ._sky_radiance(scene, direction)
    has_sky = scene.sky_tex > 0
    sky = tuple(jnp.where(has_sky, c * scene.sky_intensity, 0.0)
                for c in (sr, sg, sb))

    chans = []
    for surf_c, sky_c in zip((r, g, b), sky):
        c = jnp.where(missed, sky_c, surf_c) * exposure
        chans.append(
            jnp.round(tx.linear_to_srgb(jnp.clip(c, 0.0, 1.0)) * 255.0)
            .astype(jnp.uint8)
        )
    return jnp.stack(chans, axis=-1)


class FlatPreviewRenderer:
    """Duck-types the RayTraceRenderer surface RealtimeRenderer drives
    (draw_frame/get_image/update_camera/change_resolution/set_exposure)."""

    def __init__(self, scene, camera=None, width=800, height=600, host=None):
        self.scene = scene
        self.host = host
        self.camera = camera if camera is not None else Camera.default()
        self.width = int(width)
        self.height = int(height)
        self.exposure = None
        self._frame = None
        self._request_new_frame = True

    @property
    def _alpha_rounds(self) -> int:
        # opacity-discard parity with flat_twosided.frag. Derived from
        # scene.tex_slots (static jit aux) at every draw so live
        # material/texture edits that swap self.scene track correctly,
        # with no device->host read (the first transfer through the axon
        # tunnel costs ~60-130 s of connection warm-up)
        return 4 if fl.MT_OPACITY in self.scene.tex_slots else 0

    def update_camera(self, camera):
        self.camera = camera
        self._request_new_frame = True

    def set_exposure(self, exposure: float):
        self.exposure = float(exposure)
        self._request_new_frame = True

    def change_resolution(self, width: int, height: int):
        self.width, self.height = int(width), int(height)
        self._request_new_frame = True

    def _cone_scale(self) -> float:
        """Per-pixel footprint scale for mip selection: world width per
        unit distance (perspective) or per pixel (ortho)."""
        import math

        if self.camera.is_perspective:
            return 2.0 * math.tan(self.camera.inner.fovx * 0.5) / self.width
        # ortho rays span the ndc [-1, 1] box in camera space
        return 2.0 / self.width

    def draw_frame(self, return_image: bool = False):
        c2w, s2c = integ.camera_matrices(self.camera, self.width, self.height)
        exposure = (jnp.float32(self.exposure) if self.exposure is not None
                    else self.scene.exposure)
        self._frame = flat_pass(
            self.scene, jnp.asarray(c2w), jnp.asarray(s2c), exposure,
            jnp.float32(self._cone_scale()),
            width=self.width, height=self.height,
            is_persp=self.camera.is_perspective,
            alpha_rounds=self._alpha_rounds,
        )
        self._request_new_frame = False
        if return_image:
            return self._frame  # (P', 3) u8 device array, swizzled order

    def get_image(self) -> np.ndarray:
        if self._frame is None or self._request_new_frame:
            self.draw_frame()
        img = np.asarray(jax.device_get(self._frame))
        px, py = integ.pixel_coords_np(self.width, self.height)
        pw, ph = integ.padded_dims(self.width, self.height)
        full = np.zeros((ph, pw, 3), np.uint8)
        full[py, px] = img
        return full[:self.height, :self.width]

    # accumulation-free: state mimicry for RealtimeRenderer bookkeeping
    @property
    def _state(self):
        return integ.init_state(self.width, self.height)
