"""RealtimeRenderer: interactive progressive rendering.

Port of the reference's ``RealtimeRenderer`` (renderer.rs:90-545) reshaped
for a headless TPU host: instead of a swapchain present loop it owns a
RayTraceRenderer, advances it by one launch per ``draw_frame`` call, and
hands frames to a pluggable presenter (PNG writer, terminal preview, or a
user callback standing in for the winit window). Live edit methods map to
the reference's update semantics: material/light changes rebuild the
derived device buffers and restart accumulation; camera moves restart
accumulation; ``save``/``save_as`` rewrite the scene file via the
parser's in-place update (scene.rs:477-511).

The reference's raster preview (forward pass + skydome) maps to
:mod:`glaze_tpu.render.preview`: ``use_raytracer=False`` switches
``draw_frame`` to a single flat-shaded primary-visibility pass — no NEE,
no accumulation — the TPU-native equivalent of the per-material raster
pipelines + skydome background (renderer.rs:561-655).
"""

from __future__ import annotations

import time
from collections import deque
from typing import Callable, Optional

import numpy as np

from glaze_tpu.core import Camera
from glaze_tpu.render.renderer import Integrator, RayTraceRenderer

# Launches in flight before a frame is presented (vulkan/mod.rs:38). Depth
# 2 lets the oldest frame's host fetch overlap the newer launches.
FRAMES_IN_FLIGHT = 2


class FrameStats:
    """fps / draws-per-second window (renderer.rs:733-775)."""

    def __init__(self):
        self._window_start = time.perf_counter()
        self._frames = 0
        self.fps = 0.0
        self.draw_calls_per_sec = 0.0

    def tick(self):
        self._frames += 1
        now = time.perf_counter()
        dt = now - self._window_start
        if dt >= 1.0:
            self.fps = self._frames / dt
            self.draw_calls_per_sec = self.fps
            self._frames = 0
            self._window_start = now


class RealtimeRenderer:
    """Interactive progressive renderer with live scene edits."""

    def __init__(self, parsed, width: int = 800, height: int = 600,
                 render_scale: float = 1.0,
                 presenter: Optional[Callable[[np.ndarray], None]] = None,
                 seed=None, coherent=None):
        self._parsed = parsed
        self.render_scale = float(render_scale)
        self.width = int(width)
        self.height = int(height)
        self.use_raytracer = True
        self.presenter = presenter
        self.stats = FrameStats()
        # in-flight launches not yet presented: deque of (u8 device array,
        # w, h). FRAMES_IN_FLIGHT=2 like the reference (vulkan/mod.rs:38):
        # presenting frame N-2 lets the N-1 fetch and launch N overlap
        # (measured 118 -> 99 ms/frame at scale 0.2, tools/probe_frame.py)
        self._inflight = deque()
        self._inflight_src = None  # renderer the in-flight frames came from
        self._rt = RayTraceRenderer(
            parsed,
            width=self._scaled(self.width),
            height=self._scaled(self.height),
            integrator=Integrator.PATH_TRACE,
            seed=seed,
            coherent=coherent,
            interactive=True,  # default coherent mode 'tile'
        )
        # the non-raytraced instant preview (the reference's raster
        # forward pass + skydome, renderer.rs:561-655, reinterpreted as a
        # single flat-shaded primary-visibility pass)
        from glaze_tpu.render.preview import FlatPreviewRenderer

        self._preview = FlatPreviewRenderer(
            self._rt.scene,
            camera=self._rt.camera,
            width=self._scaled(self.width),
            height=self._scaled(self.height),
            host=self._rt.host,
        )

    def _scaled(self, v: int) -> int:
        return max(1, int(v * self.render_scale))

    # -- reference API surface (renderer.rs) --------------------------------
    def camera(self) -> Camera:
        return self._rt.camera

    def set_camera(self, camera: Camera):
        self._rt.update_camera(camera)
        self._preview.update_camera(camera)

    def set_render_scale(self, scale: float):
        """Resize the internal render targets (renderer.rs:283-315)."""
        self.render_scale = float(scale)
        w, h = self._scaled(self.width), self._scaled(self.height)
        self._rt.change_resolution(w, h)
        self._preview.change_resolution(w, h)

    def update_render_size(self, width: int, height: int):
        self.width, self.height = int(width), int(height)
        self.set_render_scale(self.render_scale)

    def change_material(self, mat_id: int, material):
        """Live material edit (renderer.rs:368 -> scene.rs:232-321)."""
        mats = list(self._rt.host.materials)
        mats[mat_id] = material
        self._rt.update_materials_and_lights(mats, self._rt.host.lights)
        self._preview.scene = self._rt.scene
        self._preview._request_new_frame = True

    def update_light(self, light_id: int, light):
        """Live light edit (ui.rs lights editor semantics)."""
        lights = list(self._rt.host.lights)
        if light_id < len(lights):
            lights[light_id] = light
        else:
            lights.append(light)
        self._rt.update_materials_and_lights(self._rt.host.materials, lights)
        self._preview.scene = self._rt.scene
        self._preview._request_new_frame = True

    def remove_light(self, light_id: int):
        lights = list(self._rt.host.lights)
        del lights[light_id]
        self._rt.update_materials_and_lights(self._rt.host.materials, lights)
        self._preview.scene = self._rt.scene
        self._preview._request_new_frame = True

    def materials(self):
        return self._rt.host.materials

    def lights(self):
        return self._rt.host.lights

    # texture editing (the ui.rs textures window: add/remove/format select)
    def textures(self):
        return self._rt.host.textures

    def _texture_users(self, tex_id: int):
        """Materials (by slot) and sky lights referencing ``tex_id``."""
        users = []
        for i, m in enumerate(self._rt.host.materials):
            for slot in ("diffuse", "roughness", "metalness", "opacity",
                         "normal"):
                if getattr(m, slot) == tex_id:
                    users.append(f"material {i} {slot}")
        for i, l in enumerate(self._rt.host.lights):
            from glaze_tpu.core import LightType

            if l.ltype == LightType.SKY and int(l.resource_id) == tex_id:
                users.append(f"light {i} sky")
        return users

    def add_texture(self, texture) -> int:
        """Appends a texture; returns its id."""
        texs = list(self._rt.host.textures)
        texs.append(texture)
        self._rt.update_textures(texs)
        self._preview.scene = self._rt.scene
        self._preview.host = self._rt.host
        self._preview._request_new_frame = True
        return len(texs) - 1

    def remove_texture(self, tex_id: int):
        """Removes a texture. Refuses while referenced (the UI disables
        remove for in-use textures); later texture ids shift down and all
        material/sky references are remapped."""
        if tex_id <= 0:
            raise ValueError("texture 0 is the built-in default")
        users = self._texture_users(tex_id)
        if users:
            raise ValueError(f"texture {tex_id} in use by: {', '.join(users)}")
        texs = list(self._rt.host.textures)
        del texs[tex_id]

        def remap(v):
            return v - 1 if v > tex_id else v

        mats = []
        for m in self._rt.host.materials:
            import copy

            m2 = copy.copy(m)
            for slot in ("diffuse", "roughness", "metalness", "opacity",
                         "normal"):
                setattr(m2, slot, remap(getattr(m, slot)))
            mats.append(m2)
        lights = []
        from glaze_tpu.core import LightType
        import copy

        for l in self._rt.host.lights:
            l2 = copy.copy(l)
            if l2.ltype == LightType.SKY:
                l2.resource_id = remap(int(l2.resource_id))
            lights.append(l2)
        self._rt.update_textures(texs)
        self._rt.update_materials_and_lights(mats, lights)
        self._preview.scene = self._rt.scene
        self._preview.host = self._rt.host
        self._preview._request_new_frame = True

    def set_texture_format(self, tex_id: int, fmt):
        """Reinterprets a texture's pixel format (the UI's format
        dropdown): Gray <-> RGBA conversions re-encode the data."""
        import numpy as np

        from glaze_tpu.core import Texture, TextureFormat, TextureInfo

        texs = list(self._rt.host.textures)
        t = texs[tex_id]
        if fmt == t.info.format:
            return
        data = []
        for mip in t.data:
            if fmt == TextureFormat.Gray and mip.ndim == 3:
                lum = (0.299 * mip[..., 0] + 0.587 * mip[..., 1]
                       + 0.114 * mip[..., 2])
                data.append(lum.astype(np.uint8))
            elif fmt != TextureFormat.Gray and mip.ndim == 2:
                rgba = np.empty(mip.shape + (4,), np.uint8)
                rgba[..., 0] = rgba[..., 1] = rgba[..., 2] = mip
                rgba[..., 3] = 255
                data.append(rgba)
            else:
                data.append(mip)  # Srgb <-> Norm: same bytes, new decode
        info = TextureInfo(t.info.name, t.info.width, t.info.height, fmt)
        texs[tex_id] = Texture(info, data)
        self._rt.update_textures(texs)
        self._preview.scene = self._rt.scene
        self._preview.host = self._rt.host
        self._preview._request_new_frame = True

    # interactive camera controls forward to Camera (camera.rs:182-281)
    def strafe(self, m: float):
        self._rt.camera.strafe(m)
        self.set_camera(self._rt.camera)

    def advance(self, m: float):
        self._rt.camera.advance(m)
        self.set_camera(self._rt.camera)

    def elevate(self, m: float):
        self._rt.camera.elevate(m)
        self.set_camera(self._rt.camera)

    def look_around(self, theta: float, phi: float):
        self._rt.camera.look_around(theta, phi)
        self.set_camera(self._rt.camera)

    def change_scene(self, parsed, camera=None):
        """Full scene swap (the app's background-load completion path —
        ui.rs:1101+; device upload + BVH build happen here, on the
        caller's thread). ``parsed`` is any ParsedScene duck type, e.g.
        a :class:`glaze_tpu.loader.PreloadedScene`."""
        self._parsed = parsed
        self._inflight.clear()
        self._rt.change_scene(parsed, camera=camera)
        from glaze_tpu.render.preview import FlatPreviewRenderer

        self._preview = FlatPreviewRenderer(
            self._rt.scene,
            camera=self._rt.camera,
            width=self._rt.width,
            height=self._rt.height,
            host=self._rt.host,
        )

    # -- frame loop ----------------------------------------------------------
    def draw_frame(self, pipelined: bool = False) -> np.ndarray:
        """One progressive launch + present (renderer.rs:415-545).

        ``pipelined=True`` keeps FRAMES_IN_FLIGHT launches in flight and
        presents the oldest — the reference's FRAMES_IN_FLIGHT=2
        (vulkan/mod.rs:38): two frames of display latency let the
        previous frame's host fetch overlap the current launch (measured
        118 -> 99 ms/frame at render scale 0.2, tools/probe_frame.py).
        The default presents the launch it just issued (simpler
        semantics for tests/scripts)."""
        active = self._rt if self.use_raytracer else self._preview
        if pipelined:
            # one fused launch+display dispatch per frame; present the
            # oldest in-flight frame's u8 array while newer ones execute.
            # Drop in-flight frames from the OTHER renderer on a toggle.
            if self._inflight_src is not active:
                self._inflight.clear()
                self._inflight_src = active
            img = active.draw_frame(return_image=True)
            self._inflight.append((img, active.width, active.height))
            if len(self._inflight) > FRAMES_IN_FLIGHT:
                pres = self._inflight.popleft()
            else:  # warm-up: present the oldest but keep it in flight
                pres = self._inflight[0]
            frame = self._unswizzle(*pres)
        else:
            self._inflight.clear()
            active.draw_frame()
            frame = active.get_image()
        self.stats.tick()
        if self.presenter is not None:
            self.presenter(frame)
        return frame

    @staticmethod
    def _unswizzle(img, width, height):
        from glaze_tpu.render import integrator as integ

        arr = np.asarray(img)
        if arr.ndim == 3:  # denoised frames arrive as (ph, pw, 3)
            return arr[:height, :width]
        px, py = integ.pixel_coords_np(width, height)
        pw, ph = integ.padded_dims(width, height)
        full = np.zeros((ph, pw, 3), np.uint8)
        full[py, px] = arr
        return full[:height, :width]

    @property
    def denoise(self) -> bool:
        """Display-only SVGF-style reconstruction on the raytraced
        preview (render/denoise.py). Accumulation stays unbiased."""
        return self._rt.denoise

    @denoise.setter
    def denoise(self, on: bool):
        self._rt.denoise = bool(on)

    @property
    def coherent(self) -> int:
        """Coherent-sampling mode of the progressive renderer (0 off /
        1 frame / 2 tile; default tile — renderer.default_coherent).
        Switching selects a different compiled executable; in-flight
        frames of the old mode are still presented."""
        return self._rt.coherent

    @coherent.setter
    def coherent(self, mode):
        from glaze_tpu.render import integrator as integ

        self._rt.coherent = integ.resolve_coherent(mode)

    def get_image(self) -> np.ndarray:
        active = self._rt if self.use_raytracer else self._preview
        return active.get_image()

    # -- persistence (scene.rs:477-511) --------------------------------------
    def save(self):
        """In-place scene update (ParsedScene::update)."""
        host = self._rt.host
        self._parsed.update(
            cameras=[self._rt.camera],
            materials=host.materials,
            lights=host.lights,
            meta=host.meta,
        )

    def save_as(self, path: str):
        from glaze_tpu.parser import Serializer

        host = self._rt.host
        (
            Serializer(path)
            .with_vertices(self._parsed.vertices())
            .with_meshes(self._parsed.meshes())
            .with_transforms(self._parsed.transforms())
            .with_instances(self._parsed.instances())
            .with_cameras([self._rt.camera])
            .with_textures(host.textures)
            .with_materials(host.materials)
            .with_lights(host.lights)
            .with_metadata(host.meta)
            .serialize()
        )
