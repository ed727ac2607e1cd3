"""Device-independent core types (geometry, materials, spectra, parsing)."""

from glaze_tpu.core.camera import Camera, OrthographicCam, PerspectiveCam
from glaze_tpu.core.color import ColorRGB, ColorXYZ
from glaze_tpu.core.distribution import Distribution1D, Distribution2D
from glaze_tpu.core.light import Light, LightType
from glaze_tpu.core.material import Material, MaterialType
from glaze_tpu.core.mesh import Mesh, MeshInstance, Transform, Vertex
from glaze_tpu.core.metal import Metal
from glaze_tpu.core.spectrum import Spectrum
from glaze_tpu.core.texture import Texture, TextureFormat, TextureInfo

__all__ = [
    "Camera", "OrthographicCam", "PerspectiveCam", "ColorRGB", "ColorXYZ",
    "Distribution1D", "Distribution2D", "Light", "LightType", "Material",
    "MaterialType", "Mesh", "MeshInstance", "Transform", "Vertex", "Metal",
    "Spectrum", "Texture", "TextureFormat", "TextureInfo",
]
