"""X3D importer tests (assimp's X3D path, converter/src/main.rs:86-102)."""

import os

import numpy as np
import pytest

from glaze_tpu.x3d import import_x3d


def _write(tmp_path, body, name="scene.x3d"):
    path = os.path.join(str(tmp_path), name)
    with open(path, "w") as f:
        f.write(body)
    return path


_BASIC = """<?xml version="1.0" encoding="UTF-8"?>
<X3D profile="Interchange" version="3.3">
  <Scene>
    <Viewpoint fieldOfView="0.8" position="0 1 8"/>
    <PointLight DEF="lamp" color="1 0.5 0.25" location="0 4 0"/>
    <Transform translation="2 0 0">
      <Shape>
        <Appearance DEF="red"><Material diffuseColor="1 0 0"/></Appearance>
        <IndexedFaceSet DEF="quad" coordIndex="0 1 2 3 -1">
          <Coordinate point="0 0 0  1 0 0  1 1 0  0 1 0"/>
          <TextureCoordinate point="0 0  1 0  1 1  0 1"/>
        </IndexedFaceSet>
      </Shape>
      <Transform translation="0 3 0">
        <Shape>
          <Appearance><Material diffuseColor="1 1 1" emissiveColor="0.5 0.5 0"/></Appearance>
          <IndexedFaceSet USE="quad"/>
        </Shape>
      </Transform>
    </Transform>
  </Scene>
</X3D>
"""


def test_basic_x3d(tmp_path):
    path = _write(str(tmp_path), _BASIC)
    (vertices, meshes, materials, textures, lights, cameras,
     transforms, instances) = import_x3d(path)

    # quad fan -> 2 triangles, 4 unique vertices (generated normals)
    assert len(vertices) == 4
    # same DEF geometry with two materials -> two meshes, two instances
    assert len(meshes) == 2 and len(instances) == 2
    muls = {materials[meshes[i.mesh_id].material].diffuse_mul
            for i in instances}
    assert muls == {(255, 0, 0), (255, 255, 255)}

    kinds = sorted(l.ltype.name for l in lights)
    assert kinds == ["AREA", "OMNI"]
    omni = next(l for l in lights if l.ltype.name == "OMNI")
    np.testing.assert_allclose(np.asarray(omni.position), [0, 4, 0])

    # nested Transform composes: offsets (2,0,0) and (2,3,0)
    offs = sorted(tuple(np.asarray(transforms[i.transform_id].m)[:3, 3])
                  for i in instances)
    assert offs == [(2.0, 0.0, 0.0), (2.0, 3.0, 0.0)]

    assert len(cameras) == 1
    cam = cameras[0].inner
    assert abs(cam.fovx - 0.8) < 1e-6
    np.testing.assert_allclose(np.asarray(cam.position), [0, 1, 8])


def test_x3d_rotation_and_normals(tmp_path):
    body = """<?xml version="1.0"?>
<X3D><Scene>
  <Transform rotation="0 0 1 1.5707963" scale="2 2 2">
    <Shape>
      <IndexedTriangleSet index="0 1 2">
        <Coordinate point="0 0 0  1 0 0  0 1 0"/>
        <Normal vector="0 0 1  0 0 1  0 0 1"/>
      </IndexedTriangleSet>
    </Shape>
  </Transform>
</Scene></X3D>
"""
    path = _write(str(tmp_path), body, "rot.x3d")
    (vertices, meshes, materials, textures, lights, cameras,
     transforms, instances) = import_x3d(path)
    assert len(meshes) == 1 and len(vertices) == 3
    t = np.asarray(transforms[instances[0].transform_id].m)
    # rotate 90deg about Z then scale 2: (1,0,0) -> (0,2,0)
    world = t[:3, :3] @ np.asarray([1, 0, 0], np.float32)
    np.testing.assert_allclose(world, [0, 2, 0], atol=1e-5)
    np.testing.assert_array_equal(vertices[0].vn, [0, 0, 1])


def test_x3d_texture_and_convert(tmp_path):
    from PIL import Image

    from glaze_tpu.converter import convert
    from glaze_tpu.parser import parse

    Image.fromarray(np.full((4, 4, 3), 128, np.uint8)).save(
        os.path.join(str(tmp_path), "c.png"))
    body = """<?xml version="1.0"?>
<X3D><Scene>
  <Shape>
    <Appearance><ImageTexture url='"c.png"'/></Appearance>
    <IndexedFaceSet coordIndex="0 1 2 -1">
      <Coordinate point="0 0 0  1 0 0  0 1 0"/>
    </IndexedFaceSet>
  </Shape>
</Scene></X3D>
"""
    path = _write(str(tmp_path), body, "tex.x3d")
    out = os.path.join(str(tmp_path), "tex.glaze")
    nverts, nmeshes = convert(path, out)
    assert (nverts, nmeshes) == (3, 1)
    p = parse(out)
    assert len(p.textures()) == 2 and p.textures()[1].info.width == 4
    assert p.materials()[p.meshes()[0].material].diffuse == 1


def test_x3d_unknown_use_rejected(tmp_path):
    body = """<?xml version="1.0"?>
<X3D><Scene><Shape><IndexedFaceSet USE="nope"/></Shape></Scene></X3D>
"""
    path = _write(str(tmp_path), body, "bad.x3d")
    with pytest.raises(ValueError, match="unknown DEF"):
        import_x3d(path)
