"""Scene flattening: parsed ``.glaze`` file -> device-resident pytree."""

from glaze_tpu.scene.flatten import DeviceScene, HostSceneData, flatten_scene

__all__ = ["DeviceScene", "HostSceneData", "flatten_scene"]
