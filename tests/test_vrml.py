"""VRML97 importer tests (classic encoding -> the X3D pipeline)."""

import os

import numpy as np
import pytest

from glaze_tpu.vrml import import_wrl, parse_vrml


def _write(tmp_path, body, name="scene.wrl"):
    path = os.path.join(str(tmp_path), name)
    with open(path, "w") as f:
        f.write(body)
    return path


_BASIC = """#VRML V2.0 utf8
# a quad under a transform, instanced twice via DEF/USE
Viewpoint { fieldOfView 0.8 position 0 1 8 }
PointLight { color 1 0.5 0.25 location 0 4 0 }
Transform {
  translation 2 0 0
  children [
    Shape {
      appearance Appearance { material Material { diffuseColor 1 0 0 } }
      geometry DEF QUAD IndexedFaceSet {
        coordIndex [ 0 1 2 3 -1 ]
        coord Coordinate { point [ 0 0 0, 1 0 0, 1 1 0, 0 1 0 ] }
      }
    }
    Transform {
      translation 0 3 0
      children Shape {
        appearance Appearance {
          material Material { diffuseColor 1 1 1 emissiveColor 0.5 0.5 0 }
        }
        geometry USE QUAD
      }
    }
  ]
}
"""


def test_basic_wrl(tmp_path):
    path = _write(str(tmp_path), _BASIC)
    (vertices, meshes, materials, textures, lights, cameras,
     transforms, instances) = import_wrl(path)

    assert len(vertices) == 4
    assert len(meshes) == 2 and len(instances) == 2
    muls = {materials[meshes[i.mesh_id].material].diffuse_mul
            for i in instances}
    assert muls == {(255, 0, 0), (255, 255, 255)}

    kinds = sorted(l.ltype.name for l in lights)
    assert kinds == ["AREA", "OMNI"]
    omni = next(l for l in lights if l.ltype.name == "OMNI")
    np.testing.assert_allclose(np.asarray(omni.position), [0, 4, 0])

    offs = sorted(tuple(np.asarray(transforms[i.transform_id].m)[:3, 3])
                  for i in instances)
    assert offs == [(2.0, 0.0, 0.0), (2.0, 3.0, 0.0)]

    assert len(cameras) == 1
    assert abs(cameras[0].inner.fovx - 0.8) < 1e-6


def test_wrl_parse_shapes(tmp_path):
    scene = parse_vrml(_write(str(tmp_path), _BASIC))
    # element tree mirrors the X3D encoding
    t = scene.find("Transform")
    assert t.get("translation") == "2 0 0"
    shape = t.find("Shape")
    assert shape.find("Appearance").find("Material").get(
        "diffuseColor") == "1 0 0"
    ifs = shape.find("IndexedFaceSet")
    assert ifs.get("DEF") == "QUAD"
    assert ifs.find("Coordinate").get("point").split()[:3] == ["0", "0", "0"]


def test_wrl_errors(tmp_path):
    with pytest.raises(ValueError, match="VRML"):
        import_wrl(_write(str(tmp_path), "not a vrml file", "x.wrl"))
    with pytest.raises(ValueError, match="unknown DEF"):
        import_wrl(_write(str(tmp_path),
                          "#VRML V2.0 utf8\nShape { geometry USE NOPE }",
                          "y.wrl"))
    with pytest.raises(ValueError):
        import_wrl(_write(str(tmp_path),
                          "#VRML V2.0 utf8\nTransform { children [",
                          "z.wrl"))


def test_wrl_converts_end_to_end(tmp_path):
    from glaze_tpu.converter import convert
    from glaze_tpu.parser import parse

    path = _write(str(tmp_path), _BASIC)
    out = os.path.join(str(tmp_path), "s.glaze")
    nverts, nmeshes = convert(path, out)
    assert (nverts, nmeshes) == (4, 2)
    p = parse(out)
    assert len(p.lights()) == 2 and len(p.cameras()) == 1
