"""Per-instance transform tests: the reference's TLAS instancing feature
is preserved by world-space expansion at flatten time."""

import numpy as np
import jax.numpy as jnp

from glaze_tpu.core import (
    Camera,
    Light,
    LightType,
    Material,
    Mesh,
    MeshInstance,
    PerspectiveCam,
    Texture,
    Transform,
    Vertex,
)
from glaze_tpu.parser import Meta
from glaze_tpu.scene.flatten import flatten_scene
from glaze_tpu.accel import closest_hit


class _Scene:
    """One unit quad mesh, instanced twice with different transforms."""

    def __init__(self):
        self.t_a = np.identity(4, np.float32)
        self.t_a[0, 3] = -2.0  # translate -x
        # translate +x, rotate 90 deg about y, scale 2
        c, s = 0.0, 1.0
        rot = np.asarray([
            [c, 0, s, 2.0],
            [0, 1, 0, 0.0],
            [-s, 0, c, 0.0],
            [0, 0, 0, 1.0],
        ], np.float32)
        rot[:3, :3] *= 2.0
        self.t_b = rot

    def vertices(self):
        return [
            Vertex([0, -0.5, -0.5], [1, 0, 0], [0, 0]),
            Vertex([0, 0.5, -0.5], [1, 0, 0], [1, 0]),
            Vertex([0, 0.5, 0.5], [1, 0, 0], [1, 1]),
            Vertex([0, -0.5, 0.5], [1, 0, 0], [0, 1]),
        ]

    def meshes(self):
        return [Mesh(0, [0, 1, 2, 0, 2, 3], 0)]

    def transforms(self):
        return [Transform(self.t_a), Transform(self.t_b)]

    def instances(self):
        return [MeshInstance(0, 0), MeshInstance(0, 1)]

    def cameras(self):
        return [Camera.Perspective(PerspectiveCam(position=[0, 0, 5],
                                                  target=[0, 0, 0]))]

    def textures(self):
        return [Texture.default()]

    def materials(self):
        return [Material()]

    def lights(self):
        return [Light(ltype=LightType.OMNI, position=[0, 0, 4], intensity=3)]

    def meta(self):
        return Meta(scene_centre=[0, 0, 0], scene_radius=5.0)


def test_instances_expand_with_transforms():
    scene, cam, host = flatten_scene(_Scene())
    # 2 instances x 2 triangles, padded to leaf alignment
    assert scene.bvh.n_tris == 4

    # instance A: the yz quad at x=-2 (identity rotation)
    o = jnp.asarray(np.array([[-5.0, 0.0, 0.0]], np.float32))
    d = jnp.asarray(np.array([[1.0, 0.0, 0.0]], np.float32))
    res = closest_hit(scene.bvh, o, d)
    assert abs(float(res["t"][0]) - 3.0) < 1e-3  # hits plane x=-2

    # instance B: rotated 90deg about y AND scaled 2 -> lies in the xy
    # plane (normal along z), centred at x=+2, extent 1 in x and y
    o2 = jnp.asarray(np.array([[2.0, 0.0, 5.0]], np.float32))
    d2 = jnp.asarray(np.array([[0.0, 0.0, -1.0]], np.float32))
    res2 = closest_hit(scene.bvh, o2, d2)
    assert abs(float(res2["t"][0]) - 5.0) < 1e-3  # hits plane z=0

    # scaled extent: a ray at y=0.9 (inside 2x-scaled quad) still hits
    o3 = jnp.asarray(np.array([[2.0, 0.9, 5.0]], np.float32))
    res3 = closest_hit(scene.bvh, o3, d2)
    assert np.isfinite(float(res3["t"][0]))
    # but y=1.1 misses (just outside the scaled half-extent of 1.0)
    o4 = jnp.asarray(np.array([[2.0, 1.1, 5.0]], np.float32))
    res4 = closest_hit(scene.bvh, o4, d2)
    assert np.isinf(float(res4["t"][0]))


def test_normals_get_inverse_transpose():
    """Normals of the scaled+rotated instance point along +z (rotation
    applied, scale normalized away by shading)."""
    scene, cam, host = flatten_scene(_Scene())
    from glaze_tpu.scene import flatten as fl

    attr = np.asarray(scene.tri_attr)
    gn = attr[:, fl.ATTR_GN:fl.ATTR_GN + 3]
    # non-degenerate triangles only
    live = np.abs(gn).sum(1) > 0
    gn = gn[live] / np.linalg.norm(gn[live], axis=1, keepdims=True)
    # two triangles with |nx|=1 (instance A), two with |nz|=1 (instance B)
    nx = np.abs(gn[:, 0]) > 0.99
    nz = np.abs(gn[:, 2]) > 0.99
    assert nx.sum() == 2 and nz.sum() == 2
