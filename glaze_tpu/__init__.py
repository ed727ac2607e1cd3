"""glaze_tpu: a TPU-native spectral path tracing framework.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of the reference
Vulkan renderer (davidepi/glaze): the ``.glaze`` scene format, a spectral
(16-bin) wavefront path tracer with NEE, the full material/light set, an
offline CLI renderer, an interactive progressive viewer, and a scene
converter — designed TPU-first (megabatched rays, BVH traversal kernels,
`shard_map` across a device mesh) rather than as a Vulkan translation.

Public surface mirrors ``/root/reference/lib/src/lib.rs:10-24``.
"""

from glaze_tpu.core import (
    Camera,
    ColorRGB,
    ColorXYZ,
    Distribution1D,
    Distribution2D,
    Light,
    LightType,
    Material,
    MaterialType,
    Mesh,
    MeshInstance,
    Metal,
    OrthographicCam,
    PerspectiveCam,
    Spectrum,
    Texture,
    TextureFormat,
    TextureInfo,
    Transform,
    Vertex,
)
from glaze_tpu.instance import DeviceInfo, PresentInstance, RayTraceInstance
from glaze_tpu.parser import Meta, NoScene, ParserVersion, Serializer, converted_file, parse

__version__ = "0.1.0"

__all__ = [
    "Camera", "OrthographicCam", "PerspectiveCam", "ColorRGB", "ColorXYZ",
    "Distribution1D", "Distribution2D", "Light", "LightType", "Material",
    "MaterialType", "Mesh", "MeshInstance", "Metal", "Spectrum", "Texture",
    "TextureFormat", "TextureInfo", "Transform", "Vertex",
    "Meta", "NoScene", "ParserVersion", "Serializer", "converted_file", "parse",
    "RayTraceRenderer", "RealtimeRenderer", "Integrator",
    "DeviceInfo", "PresentInstance", "RayTraceInstance",
]


def __getattr__(name):
    # heavyweight renderer classes import JAX; load lazily
    if name in ("RayTraceRenderer", "Integrator"):
        from glaze_tpu.render.renderer import Integrator, RayTraceRenderer

        return {"RayTraceRenderer": RayTraceRenderer, "Integrator": Integrator}[name]
    if name == "RealtimeRenderer":
        from glaze_tpu.render.realtime import RealtimeRenderer

        return RealtimeRenderer
    raise AttributeError(name)
