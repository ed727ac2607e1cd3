"""Device-side (JAX) building blocks of the renderer.

Everything in this package is a pure function over ``jax.Array``s, usable
under ``jit``/``vmap``/``shard_map`` and on the CPU backend for tests. These
modules are the TPU equivalents of the reference's GLSL include files
(``/root/reference/lib/src/shaders/*.glsl``).
"""
