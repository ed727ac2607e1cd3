"""FBX texture/material import (converter/src/main.rs:411-491 parity).

Builds minimal binary FBX files from scratch (v7400 node records) with a
textured quad — one referencing an on-disk PNG via RelativeFilename, one
carrying the image as an embedded Video Content blob — and checks the
importer attaches the diffuse texture and that the texel data survives
into a converted+parsed .glaze scene.
"""

import io
import os
import struct

import numpy as np
import pytest

from glaze_tpu.fbx import MAGIC, import_fbx


# ---------------------------------------------------------------------------
# Minimal binary FBX writer (enough structure for import_fbx)
# ---------------------------------------------------------------------------


def _prop(p):
    if isinstance(p, str):
        b = p.encode()
        return b"S" + struct.pack("<I", len(b)) + b
    if isinstance(p, bytes):
        return b"R" + struct.pack("<I", len(p)) + p
    if isinstance(p, float):
        return b"D" + struct.pack("<d", p)
    if isinstance(p, int):
        return b"L" + struct.pack("<q", p)
    arr = np.asarray(p)
    if arr.dtype.kind == "f":
        raw = arr.astype("<f8").tobytes()
        return b"d" + struct.pack("<III", arr.size, 0, len(raw)) + raw
    raw = arr.astype("<i4").tobytes()
    return b"i" + struct.pack("<III", arr.size, 0, len(raw)) + raw


def _node(name, props=(), children=(), offset=0):
    """Serializes one node record at ``offset``; returns bytes."""
    pb = b"".join(_prop(p) for p in props)
    nb = name.encode()
    header_len = 12 + 1 + len(nb)
    body = bytearray()
    pos = offset + header_len + len(pb)
    for c in children:
        cb = _node(*c, offset=pos)
        body += cb
        pos += len(cb)
    if children:
        body += b"\x00" * 13  # null record terminates the child list
        pos += 13
    end = offset + header_len + len(pb) + len(body)
    return (struct.pack("<III", end, len(props), len(pb))
            + bytes([len(nb)]) + nb + pb + bytes(body))


def write_fbx(path, roots):
    data = bytearray(MAGIC + b"\x1a\x00" + struct.pack("<I", 7400))
    for r in roots:
        data += _node(*r, offset=len(data))
    data += b"\x00" * 13
    with open(path, "wb") as f:
        f.write(bytes(data))


def _checker_png_bytes():
    from PIL import Image

    i = np.arange(16)
    chk = ((i[:, None] // 4 + i[None, :] // 4) % 2).astype(np.uint8)
    img = np.zeros((16, 16, 3), np.uint8)
    img[..., 0] = np.where(chk > 0, 255, 30)
    img[..., 1] = np.where(chk > 0, 40, 200)
    img[..., 2] = 60
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue(), img


def _quad_fbx_roots(tex_children, extra_objects=(), connections=()):
    geometry = ("Geometry", [1, "geo\x00\x01Geometry", "Mesh"], [
        ("Vertices", [np.asarray(
            [0, 0, 0, 1, 0, 0, 1, 1, 0, 0, 1, 0], np.float64)], []),
        ("PolygonVertexIndex", [np.asarray([0, 1, 2, -4], np.int32)], []),
        ("LayerElementNormal", [0], [
            ("MappingInformationType", ["AllSame"], []),
            ("ReferenceInformationType", ["Direct"], []),
            ("Normals", [np.asarray([0.0, 0.0, 1.0])], []),
        ]),
        ("LayerElementUV", [0], [
            ("MappingInformationType", ["ByControlPoint"], []),
            ("ReferenceInformationType", ["Direct"], []),
            ("UV", [np.asarray([0, 0, 1, 0, 1, 1, 0, 1], np.float64)], []),
        ]),
    ])
    model = ("Model", [2, "quad\x00\x01Model", "Mesh"], [])
    material = ("Material", [3, "checkmat\x00\x01Material", ""], [
        ("Properties70", [], [
            ("P", ["DiffuseColor", "Color", "", "A", 0.5, 0.5, 0.5], []),
        ]),
    ])
    texture = ("Texture", [4, "check\x00\x01Texture", ""], list(tex_children))
    conns = [("C", ["OO", 1, 2], []),   # geometry -> model
             ("C", ["OO", 3, 2], []),   # material -> model
             ("C", ["OP", 4, 3, "DiffuseColor"], [])]
    conns += list(connections)
    objs = [geometry, model, material, texture] + list(extra_objects)
    return [("Objects", [], objs), ("Connections", [], conns)]


def test_fbx_diffuse_texture_from_file(tmp_path):
    png, img = _checker_png_bytes()
    (tmp_path / "check.png").write_bytes(png)
    fbx = tmp_path / "quad.fbx"
    write_fbx(fbx, _quad_fbx_roots(
        [("RelativeFilename", ["check.png"], [])]))

    verts, meshes, mats, texs, lights, cams, tfs, insts = import_fbx(fbx)
    assert len(meshes) == 1 and len(insts) == 1
    mat = mats[meshes[0].material]
    assert mat.name == "checkmat"
    assert mat.diffuse != 0, "diffuse texture not attached"
    assert mat.diffuse_mul == (255, 255, 255)
    tex = texs[mat.diffuse]
    assert tex.info.width == 16 and tex.info.height == 16
    np.testing.assert_array_equal(
        np.asarray(tex.data[0])[..., :3], img)
    # uv corners survived
    uvs = np.stack([v.vt for v in verts])
    assert uvs.min() == 0.0 and uvs.max() == 1.0


def test_fbx_diffuse_texture_embedded_video(tmp_path):
    """Embedded Video Content beats a dangling filename."""
    png, img = _checker_png_bytes()
    video = ("Video", [5, "check\x00\x01Video", "Clip"], [
        ("Content", [png], []),
    ])
    fbx = tmp_path / "quad_embedded.fbx"
    write_fbx(fbx, _quad_fbx_roots(
        [("RelativeFilename", ["missing_on_disk.png"], [])],
        extra_objects=[video],
        connections=[("C", ["OO", 5, 4], [])]))  # video -> texture

    _, meshes, mats, texs, *_ = import_fbx(fbx)
    mat = mats[meshes[0].material]
    assert mat.diffuse != 0
    np.testing.assert_array_equal(
        np.asarray(texs[mat.diffuse].data[0])[..., :3], img)


def test_fbx_missing_texture_warns_not_fails(tmp_path):
    fbx = tmp_path / "quad_missing.fbx"
    write_fbx(fbx, _quad_fbx_roots(
        [("RelativeFilename", ["nowhere.png"], [])]))
    _, meshes, mats, texs, *_ = import_fbx(fbx)
    assert mats[meshes[0].material].diffuse == 0
    assert len(texs) == 1


def test_fbx_textured_convert_and_render(tmp_path):
    """End-to-end: convert the textured FBX to .glaze, parse it back, and
    render a flat-preview frame — the checker must show up in the image
    (the reference's assimp conversion + raster preview flow)."""
    import glaze_tpu
    from glaze_tpu import converter
    from glaze_tpu.render.preview import flat_pass
    from glaze_tpu.render.renderer import RayTraceRenderer
    from glaze_tpu.render import integrator as integ

    png, _ = _checker_png_bytes()
    (tmp_path / "check.png").write_bytes(png)
    fbx = tmp_path / "quad.fbx"
    write_fbx(fbx, _quad_fbx_roots(
        [("RelativeFilename", ["check.png"], [])]))
    out = tmp_path / "quad.glaze"
    converter.convert(str(fbx), str(out))
    parsed = glaze_tpu.parse(str(out))
    assert any(m.diffuse != 0 for m in parsed.materials())

    from glaze_tpu.core import Camera, PerspectiveCam

    r = RayTraceRenderer(parsed, width=32, height=32, camera=Camera.Perspective(
        PerspectiveCam(position=[0.5, 0.5, 2.0], target=[0.5, 0.5, 0.0],
                       up=[0.0, 1.0, 0.0])))
    c2w, s2c = integ.camera_matrices(r.camera, 32, 32)
    chans = flat_pass(r.scene, np.asarray(c2w), np.asarray(s2c), 1.0,
                      np.float32(0.05), width=32, height=32, is_persp=True)
    fmap_px, fmap_py = integ.pixel_coords_np(32, 32)
    keep = (fmap_px < 32) & (fmap_py < 32)
    rgb = np.asarray(chans)[keep][:, :3]
    # the quad fills the view; the checker must yield >= 2 distinct colors
    assert np.unique(rgb // 32, axis=0).shape[0] >= 2, \
        "texture variation missing from preview render"
