"""Device instances (port of /root/reference/lib/src/vulkan/instance.rs).

The reference's ``RayTraceInstance`` wraps "find a GPU with ray-tracing
support, else None" (instance.rs:339-450) and ``PresentInstance`` adds a
window surface with silent fallback to a non-RT device
(instance.rs:106-310). The TPU equivalents wrap JAX device discovery: an
instance holds the chosen device (TPU if present, else CPU) plus the
``DeviceInfo`` the reference's stats window shows (device.rs:403-448).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional


@dataclass
class DeviceInfo:
    """Name/platform/driver info (device.rs:403-448 equivalent)."""

    name: str
    platform: str
    device_kind: str
    index: int

    def __str__(self):
        return f"{self.name} ({self.platform}, {self.device_kind})"


class RayTraceInstance:
    """Headless compute instance.

    ``RayTraceInstance.new()`` returns None when no accelerator is usable
    (matching instance.rs:376-427's Option); the CPU backend still renders,
    so None only happens when JAX itself can't initialize.
    """

    def __init__(self, device):
        self.device = device
        self.info = DeviceInfo(
            name=str(device),
            platform=device.platform,
            device_kind=device.device_kind,
            index=device.id,
        )

    @staticmethod
    def new() -> Optional["RayTraceInstance"]:
        try:
            import jax

            devices = jax.devices()
        except Exception:
            return None
        if not devices:
            return None
        return RayTraceInstance(devices[0])

    def supports_raytrace(self) -> bool:
        return True

    @property
    def is_accelerated(self) -> bool:
        return self.device.platform not in ("cpu",)


class PresentInstance(RayTraceInstance):
    """Instance for interactive use. The reference silently falls back to a
    raster-only device (instance.rs:218-258); here the fallback is the CPU
    backend, and ``supports_raytrace`` stays True either way because the
    wavefront tracer runs on any JAX backend."""

    @staticmethod
    def new() -> Optional["PresentInstance"]:
        inst = RayTraceInstance.new()
        if inst is None:
            return None
        return PresentInstance(inst.device)
