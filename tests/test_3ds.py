"""3DS importer tests, with a minimal chunk writer as the fixture."""

import os
import struct

import numpy as np
import pytest

from glaze_tpu.tds import import_3ds


def _chunk(cid, payload=b"", children=()):
    body = payload + b"".join(children)
    return struct.pack("<HI", cid, 6 + len(body)) + body


def _cstr(s):
    return s.encode() + b"\x00"


def _quad_3ds(mat_groups=True, with_texture=None):
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                       "<f4")  # on the 3DS ground plane (z=0, Z-up)
    faces = np.asarray([[0, 1, 2, 0], [0, 2, 3, 0]], "<u2")
    face_payload = struct.pack("<H", 2) + faces.tobytes()
    subs = []
    if mat_groups:
        subs.append(_chunk(0x4130, _cstr("red") + struct.pack("<HH", 1, 0)))
        subs.append(_chunk(0x4130, _cstr("glow") + struct.pack("<HH", 1, 1)))
    trimesh = _chunk(0x4100, b"", (
        _chunk(0x4110, struct.pack("<H", 4) + verts.tobytes()),
        _chunk(0x4120, face_payload + b"".join(subs)),
        _chunk(0x4140, struct.pack("<H", 4)
               + np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]],
                            "<f4").tobytes()),
    ))
    obj = _chunk(0x4000, _cstr("quad") + trimesh)

    def color24(r, g, b):
        return _chunk(0x0011, bytes([r, g, b]))

    red_children = [_chunk(0xA000, _cstr("red")),
                    _chunk(0xA020, color24(255, 0, 0))]
    if with_texture:
        red_children.append(_chunk(0xA200, _chunk(0xA300,
                                                  _cstr(with_texture))))
    mat_red = _chunk(0xAFFF, b"", red_children)
    mat_glow = _chunk(0xAFFF, b"", (
        _chunk(0xA000, _cstr("glow")),
        _chunk(0xA020, color24(255, 255, 255)),
        _chunk(0xA080, _chunk(0x0030, struct.pack("<h", 50))),
    ))
    light = _chunk(0x4000, _cstr("lamp") + _chunk(
        0x4600, struct.pack("<fff", 1, 2, 3)
        + _chunk(0x0011, bytes([255, 128, 64]))))
    cam = _chunk(0x4000, _cstr("cam") + _chunk(
        0x4700, struct.pack("<8f", 0, -10, 2, 0, 0, 0, 0, 50.0)))
    editor = _chunk(0x3D3D, b"", (mat_red, mat_glow, obj, light, cam))
    return _chunk(0x4D4D, b"", (editor,))


def _write(tmp_path, data, name="scene.3ds"):
    path = os.path.join(str(tmp_path), name)
    with open(path, "wb") as f:
        f.write(data)
    return path


def test_basic_3ds(tmp_path):
    path = _write(tmp_path, _quad_3ds())
    (vertices, meshes, materials, textures, lights, cameras,
     transforms, instances) = import_3ds(path)

    # two material groups -> two meshes, one face each
    assert len(meshes) == 2
    muls = sorted(materials[m.material].diffuse_mul for m in meshes)
    assert muls == [(255, 0, 0), (255, 255, 255)]
    # self-illum 50% -> emissive material + AREA light; plus the OMNI
    kinds = sorted(l.ltype.name for l in lights)
    assert kinds == ["AREA", "OMNI"]
    omni = next(l for l in lights if l.ltype.name == "OMNI")
    # Z-up (1,2,3) -> Y-up (1,3,-2)
    np.testing.assert_allclose(np.asarray(omni.position), [1, 3, -2])

    # ground-plane quad re-bases to the XZ plane in Y-up
    ys = {round(float(v.vv[1]), 5) for v in vertices}
    assert ys == {0.0}

    assert len(cameras) == 1
    cam = cameras[0].inner
    np.testing.assert_allclose(np.asarray(cam.position), [0, 2, 10])
    assert abs(cam.fovx - 2 * np.arctan(18.0 / 50.0)) < 1e-6


def test_3ds_texture_and_convert(tmp_path):
    from PIL import Image

    from glaze_tpu.converter import convert
    from glaze_tpu.parser import parse

    Image.fromarray(np.full((4, 4, 3), 90, np.uint8)).save(
        os.path.join(str(tmp_path), "wood.png"))
    path = _write(tmp_path, _quad_3ds(with_texture="wood.png"))
    out = os.path.join(str(tmp_path), "s.glaze")
    convert(path, out)
    p = parse(out)
    assert len(p.textures()) == 2
    red = next(m for m in p.materials() if m.name == "red")
    assert red.diffuse == 1
    assert len(p.lights()) == 2


def test_3ds_rejects_garbage(tmp_path):
    path = _write(tmp_path, b"\x00\x01nope", "bad.3ds")
    with pytest.raises(ValueError, match="3DS"):
        import_3ds(path)
    # truncated chunk
    path2 = _write(tmp_path, struct.pack("<HI", 0x4D4D, 600) + b"\x00" * 8,
                   "trunc.3ds")
    with pytest.raises(ValueError):
        import_3ds(path2)
