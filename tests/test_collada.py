"""COLLADA importer tests (converter parity target: assimp's DAE path,
reference converter/src/main.rs:86-102)."""

import os

import numpy as np
import pytest

from glaze_tpu.collada import import_dae
from glaze_tpu.converter import convert


def _write(tmp_path, body, name="scene.dae"):
    path = os.path.join(tmp_path, name)
    with open(path, "w") as f:
        f.write(body)
    return path


_HEADER = """<?xml version="1.0" encoding="utf-8"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
"""

# one unit quad (two triangles) with normals + uvs, a red material, a
# child node with a translate, a perspective camera, and a point light
_BASIC = _HEADER + """
  <asset><up_axis>Y_UP</up_axis><unit meter="1.0"/></asset>
  <library_effects>
    <effect id="red-fx">
      <profile_COMMON>
        <technique sid="common">
          <phong>
            <diffuse><color>1 0 0 1</color></diffuse>
          </phong>
        </technique>
      </profile_COMMON>
    </effect>
    <effect id="glow-fx">
      <profile_COMMON>
        <technique sid="common">
          <lambert>
            <diffuse><color>1 1 1 1</color></diffuse>
            <emission><color>0.5 0.5 0 1</color></emission>
          </lambert>
        </technique>
      </profile_COMMON>
    </effect>
  </library_effects>
  <library_materials>
    <material id="red" name="Red"><instance_effect url="#red-fx"/></material>
    <material id="glow" name="Glow"><instance_effect url="#glow-fx"/></material>
  </library_materials>
  <library_geometries>
    <geometry id="quad">
      <mesh>
        <source id="quad-pos">
          <float_array id="quad-pos-arr" count="12">0 0 0  1 0 0  1 1 0  0 1 0</float_array>
          <technique_common><accessor source="#quad-pos-arr" count="4" stride="3">
            <param name="X" type="float"/><param name="Y" type="float"/><param name="Z" type="float"/>
          </accessor></technique_common>
        </source>
        <source id="quad-nrm">
          <float_array id="quad-nrm-arr" count="3">0 0 1</float_array>
          <technique_common><accessor source="#quad-nrm-arr" count="1" stride="3"/></technique_common>
        </source>
        <source id="quad-uv">
          <float_array id="quad-uv-arr" count="8">0 0  1 0  1 1  0 1</float_array>
          <technique_common><accessor source="#quad-uv-arr" count="4" stride="2"/></technique_common>
        </source>
        <vertices id="quad-verts"><input semantic="POSITION" source="#quad-pos"/></vertices>
        <triangles material="MAT" count="2">
          <input semantic="VERTEX" source="#quad-verts" offset="0"/>
          <input semantic="NORMAL" source="#quad-nrm" offset="1"/>
          <input semantic="TEXCOORD" source="#quad-uv" offset="2" set="0"/>
          <p>0 0 0  1 0 1  2 0 2  0 0 0  2 0 2  3 0 3</p>
        </triangles>
      </mesh>
    </geometry>
  </library_geometries>
  <library_cameras>
    <camera id="cam"><optics><technique_common>
      <perspective><yfov>45</yfov><aspect_ratio>1.5</aspect_ratio>
        <znear>0.1</znear><zfar>100</zfar></perspective>
    </technique_common></optics></camera>
  </library_cameras>
  <library_lights>
    <light id="lamp"><technique_common>
      <point><color>1 0.5 0.25</color></point>
    </technique_common></light>
  </library_lights>
  <library_visual_scenes>
    <visual_scene id="vs">
      <node id="n1">
        <translate>2 0 0</translate>
        <instance_geometry url="#quad">
          <bind_material><technique_common>
            <instance_material symbol="MAT" target="#red"/>
          </technique_common></bind_material>
        </instance_geometry>
        <node id="n2">
          <translate>0 3 0</translate>
          <instance_geometry url="#quad">
            <bind_material><technique_common>
              <instance_material symbol="MAT" target="#glow"/>
            </technique_common></bind_material>
          </instance_geometry>
        </node>
      </node>
      <node id="camnode">
        <matrix>1 0 0 0  0 1 0 5  0 0 1 10  0 0 0 1</matrix>
        <instance_camera url="#cam"/>
        <instance_light url="#lamp"/>
      </node>
    </visual_scene>
  </library_visual_scenes>
  <scene><instance_visual_scene url="#vs"/></scene>
</COLLADA>
"""


def test_basic_dae(tmp_path):
    path = _write(str(tmp_path), _BASIC)
    (vertices, meshes, materials, textures, lights, cameras,
     transforms, instances) = import_dae(path)

    assert len(vertices) == 4  # dedup across the two triangles
    # geometry bound twice with different materials -> 2 meshes
    assert len(meshes) == 2
    assert len(instances) == 2
    mats_used = {meshes[i.mesh_id].material for i in instances}
    names = {materials[m].name for m in mats_used}
    assert names == {"Red", "Glow"}
    red = next(m for m in materials if m.name == "Red")
    assert red.diffuse_mul == (255, 0, 0)

    # emissive material -> AREA light; point light -> OMNI
    kinds = sorted(l.ltype.name for l in lights)
    assert kinds == ["AREA", "OMNI"]
    omni = next(l for l in lights if l.ltype.name == "OMNI")
    np.testing.assert_allclose(np.asarray(omni.position), [0, 5, 10])

    # two distinct transforms (child composes parent's translate)
    t_used = {i.transform_id for i in instances}
    assert len(t_used) == 2
    mats = [np.asarray(transforms[t].m) for t in sorted(t_used)]
    offsets = sorted(tuple(m[:3, 3]) for m in mats)
    assert offsets == [(2.0, 0.0, 0.0), (2.0, 3.0, 0.0)]

    # camera: yfov 45deg * aspect 1.5 -> fovx
    assert len(cameras) == 1
    cam = cameras[0].inner
    expect = 2 * np.arctan(np.tan(np.deg2rad(45) / 2) * 1.5)
    assert abs(cam.fovx - expect) < 1e-6
    np.testing.assert_allclose(np.asarray(cam.position), [0, 5, 10])


def test_polylist_and_zup(tmp_path):
    body = _HEADER + """
  <asset><up_axis>Z_UP</up_axis><unit meter="2.0"/></asset>
  <library_geometries>
    <geometry id="pent">
      <mesh>
        <source id="p-pos">
          <float_array id="p-pos-arr" count="15">0 0 0  2 0 0  2 2 0  1 3 0  0 2 0</float_array>
          <technique_common><accessor source="#p-pos-arr" count="5" stride="3"/></technique_common>
        </source>
        <vertices id="p-verts"><input semantic="POSITION" source="#p-pos"/></vertices>
        <polylist count="1">
          <input semantic="VERTEX" source="#p-verts" offset="0"/>
          <vcount>5</vcount>
          <p>0 1 2 3 4</p>
        </polylist>
      </mesh>
    </geometry>
  </library_geometries>
  <library_visual_scenes>
    <visual_scene id="vs">
      <node id="n"><instance_geometry url="#pent"/></node>
    </visual_scene>
  </library_visual_scenes>
  <scene><instance_visual_scene url="#vs"/></scene>
</COLLADA>
"""
    path = _write(str(tmp_path), body, "pent.dae")
    (vertices, meshes, materials, textures, lights, cameras,
     transforms, instances) = import_dae(path)
    # pentagon fan -> 3 triangles, 5 unique vertices, generated normals
    assert len(meshes) == 1
    assert len(meshes[0].indices) == 9
    assert len(vertices) == 5
    n = np.stack([v.vn for v in vertices])
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, rtol=1e-5)

    # Z_UP + meter=2: world-space point (2,2,0) -> (2*2, 0*2, -2*2)
    t = np.asarray(transforms[instances[0].transform_id].m)
    p = np.stack([v.vv for v in vertices])
    idx = np.argmax(p[:, 0] + p[:, 1])  # the (2,2,0) corner
    world = (t[:3, :3] @ p[idx] + t[:3, 3])
    np.testing.assert_allclose(world, [4.0, 0.0, -4.0], atol=1e-5)


def test_textured_dae_converts_end_to_end(tmp_path):
    from PIL import Image

    img_path = os.path.join(str(tmp_path), "checker.png")
    arr = np.zeros((8, 8, 3), np.uint8)
    arr[::2, ::2] = 255
    Image.fromarray(arr).save(img_path)

    body = _HEADER + """
  <library_images>
    <image id="checker"><init_from>checker.png</init_from></image>
  </library_images>
  <library_effects>
    <effect id="tex-fx">
      <profile_COMMON>
        <newparam sid="surf"><surface type="2D"><init_from>checker</init_from></surface></newparam>
        <newparam sid="samp"><sampler2D><source>surf</source></sampler2D></newparam>
        <technique sid="common">
          <phong><diffuse><texture texture="samp" texcoord="UV"/></diffuse></phong>
        </technique>
      </profile_COMMON>
    </effect>
  </library_effects>
  <library_materials>
    <material id="texmat"><instance_effect url="#tex-fx"/></material>
  </library_materials>
  <library_geometries>
    <geometry id="tri">
      <mesh>
        <source id="t-pos">
          <float_array id="t-pos-arr" count="9">0 0 0  1 0 0  0 1 0</float_array>
          <technique_common><accessor source="#t-pos-arr" count="3" stride="3"/></technique_common>
        </source>
        <vertices id="t-verts"><input semantic="POSITION" source="#t-pos"/></vertices>
        <triangles material="M" count="1">
          <input semantic="VERTEX" source="#t-verts" offset="0"/>
          <p>0 1 2</p>
        </triangles>
      </mesh>
    </geometry>
  </library_geometries>
  <library_visual_scenes>
    <visual_scene id="vs">
      <node id="n">
        <instance_geometry url="#tri">
          <bind_material><technique_common>
            <instance_material symbol="M" target="#texmat"/>
          </technique_common></bind_material>
        </instance_geometry>
      </node>
    </visual_scene>
  </library_visual_scenes>
  <scene><instance_visual_scene url="#vs"/></scene>
</COLLADA>
"""
    path = _write(str(tmp_path), body, "tex.dae")
    out = os.path.join(str(tmp_path), "tex.glaze")
    nverts, nmeshes = convert(path, out)
    assert (nverts, nmeshes) == (3, 1)

    # round-trip through the parser: texture present, material bound
    from glaze_tpu.parser import parse

    p = parse(out)
    texs = p.textures()
    assert len(texs) == 2  # default + checker
    assert texs[1].info.width == 8
    mats = p.materials()
    mesh = p.meshes()[0]
    assert mats[mesh.material].diffuse == 1


def test_instance_node_library(tmp_path):
    """instance_node into library_nodes composes both transforms."""
    body = _HEADER + """
  <library_geometries>
    <geometry id="tri">
      <mesh>
        <source id="s-pos">
          <float_array id="s-pos-arr" count="9">0 0 0  1 0 0  0 1 0</float_array>
          <technique_common><accessor source="#s-pos-arr" count="3" stride="3"/></technique_common>
        </source>
        <vertices id="s-verts"><input semantic="POSITION" source="#s-pos"/></vertices>
        <triangles count="1">
          <input semantic="VERTEX" source="#s-verts" offset="0"/>
          <p>0 1 2</p>
        </triangles>
      </mesh>
    </geometry>
  </library_geometries>
  <library_nodes>
    <node id="proto">
      <translate>0 0 7</translate>
      <instance_geometry url="#tri"/>
    </node>
  </library_nodes>
  <library_visual_scenes>
    <visual_scene id="vs">
      <node id="a"><translate>1 0 0</translate><instance_node url="#proto"/></node>
      <node id="b"><translate>0 2 0</translate><instance_node url="#proto"/></node>
    </visual_scene>
  </library_visual_scenes>
  <scene><instance_visual_scene url="#vs"/></scene>
</COLLADA>
"""
    path = _write(str(tmp_path), body, "inst.dae")
    (vertices, meshes, materials, textures, lights, cameras,
     transforms, instances) = import_dae(path)
    assert len(meshes) == 1 and len(instances) == 2
    offs = sorted(tuple(np.asarray(transforms[i.transform_id].m)[:3, 3])
                  for i in instances)
    assert offs == [(0.0, 2.0, 7.0), (1.0, 0.0, 7.0)]


def test_orthographic_camera(tmp_path):
    body = _HEADER + """
  <library_cameras>
    <camera id="ocam"><optics><technique_common>
      <orthographic><xmag>2.5</xmag><znear>0.5</znear><zfar>50</zfar></orthographic>
    </technique_common></optics></camera>
  </library_cameras>
  <library_visual_scenes>
    <visual_scene id="vs">
      <node id="n"><translate>0 1 4</translate><instance_camera url="#ocam"/></node>
    </visual_scene>
  </library_visual_scenes>
  <scene><instance_visual_scene url="#vs"/></scene>
</COLLADA>
"""
    path = _write(str(tmp_path), body, "ortho.dae")
    *_, cameras, transforms, instances = import_dae(path)
    assert len(cameras) == 1
    cam = cameras[0].inner
    from glaze_tpu.core import OrthographicCam

    assert isinstance(cam, OrthographicCam)
    assert cam.scale == 2.5 and cam.near == 0.5 and cam.far == 50.0
    np.testing.assert_allclose(np.asarray(cam.position), [0, 1, 4])


def test_collada_15_ref_texture(tmp_path):
    """1.5-style <init_from><ref>...</ref></init_from> image refs load."""
    from PIL import Image

    img = os.path.join(str(tmp_path), "t.png")
    Image.fromarray(np.full((4, 4, 3), 200, np.uint8)).save(img)
    body = _HEADER + """
  <library_images>
    <image id="img"><init_from>
      <ref>t.png</ref>
    </init_from></image>
  </library_images>
  <library_effects>
    <effect id="fx"><profile_COMMON>
      <newparam sid="surf"><surface type="2D"><init_from>img</init_from></surface></newparam>
      <newparam sid="samp"><sampler2D><source>surf</source></sampler2D></newparam>
      <technique sid="t"><lambert><diffuse><texture texture="samp" texcoord="UV"/></diffuse></lambert></technique>
    </profile_COMMON></effect>
  </library_effects>
  <library_materials><material id="m"><instance_effect url="#fx"/></material></library_materials>
  <library_geometries>
    <geometry id="g"><mesh>
      <source id="s"><float_array id="sa" count="9">0 0 0 1 0 0 0 1 0</float_array>
        <technique_common><accessor source="#sa" count="3" stride="3"/></technique_common></source>
      <vertices id="v"><input semantic="POSITION" source="#s"/></vertices>
      <triangles material="M" count="1"><input semantic="VERTEX" source="#v" offset="0"/><p>0 1 2</p></triangles>
    </mesh></geometry>
  </library_geometries>
  <library_visual_scenes><visual_scene id="vs">
    <node id="n"><instance_geometry url="#g">
      <bind_material><technique_common><instance_material symbol="M" target="#m"/></technique_common></bind_material>
    </instance_geometry></node>
  </visual_scene></library_visual_scenes>
  <scene><instance_visual_scene url="#vs"/></scene>
</COLLADA>
"""
    path = _write(str(tmp_path), body, "v15.dae")
    _, meshes, materials, textures, *_ = import_dae(path)
    assert len(textures) == 2 and textures[1].info.width == 4
    assert materials[meshes[0].material].diffuse == 1


def test_clone_dedup_and_missing_source(tmp_path):
    # same geometry instanced 3x with materials A, B, B -> exactly 2
    # meshes (the B clone is reused, not duplicated)
    body = _HEADER + """
  <library_effects>
    <effect id="fa"><profile_COMMON><technique sid="t"><lambert>
      <diffuse><color>1 0 0 1</color></diffuse></lambert></technique></profile_COMMON></effect>
    <effect id="fb"><profile_COMMON><technique sid="t"><lambert>
      <diffuse><color>0 1 0 1</color></diffuse></lambert></technique></profile_COMMON></effect>
  </library_effects>
  <library_materials>
    <material id="A"><instance_effect url="#fa"/></material>
    <material id="B"><instance_effect url="#fb"/></material>
  </library_materials>
  <library_geometries>
    <geometry id="g"><mesh>
      <source id="s"><float_array id="sa" count="9">0 0 0 1 0 0 0 1 0</float_array>
        <technique_common><accessor source="#sa" count="3" stride="3"/></technique_common></source>
      <vertices id="v"><input semantic="POSITION" source="#s"/></vertices>
      <triangles material="M" count="1"><input semantic="VERTEX" source="#v" offset="0"/><p>0 1 2</p></triangles>
    </mesh></geometry>
  </library_geometries>
  <library_visual_scenes><visual_scene id="vs">
    <node id="n1"><instance_geometry url="#g"><bind_material><technique_common>
      <instance_material symbol="M" target="#A"/></technique_common></bind_material></instance_geometry></node>
    <node id="n2"><translate>1 0 0</translate><instance_geometry url="#g"><bind_material><technique_common>
      <instance_material symbol="M" target="#B"/></technique_common></bind_material></instance_geometry></node>
    <node id="n3"><translate>2 0 0</translate><instance_geometry url="#g"><bind_material><technique_common>
      <instance_material symbol="M" target="#B"/></technique_common></bind_material></instance_geometry></node>
  </visual_scene></library_visual_scenes>
  <scene><instance_visual_scene url="#vs"/></scene>
</COLLADA>
"""
    path = _write(str(tmp_path), body, "clones.dae")
    _, meshes, materials, _, _, _, _, instances = import_dae(path)
    assert len(meshes) == 2 and len(instances) == 3
    used = sorted(meshes[i.mesh_id].material for i in instances)
    assert len(set(used)) == 2 and used[1] == used[2]

    # missing source attribute -> clean ValueError, not AttributeError
    bad = _HEADER + """
  <library_geometries><geometry id="g"><mesh>
    <vertices id="v"><input semantic="POSITION" source="#s"/></vertices>
    <triangles count="1"><input semantic="VERTEX"/><p>0 0 0</p></triangles>
  </mesh></geometry></library_geometries>
  <library_visual_scenes><visual_scene id="vs">
    <node id="n"><instance_geometry url="#g"/></node>
  </visual_scene></library_visual_scenes>
  <scene><instance_visual_scene url="#vs"/></scene>
</COLLADA>
"""
    path2 = _write(str(tmp_path), bad, "bad.dae")
    with pytest.raises(ValueError, match="source attribute"):
        import_dae(path2)
