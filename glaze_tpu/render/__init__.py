"""Renderers: wavefront path-tracing integrator + progressive API."""

from glaze_tpu.render.renderer import Integrator, RayTraceRenderer

__all__ = ["Integrator", "RayTraceRenderer"]
