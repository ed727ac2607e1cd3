"""ASCII FBX front-end: must import identically to the binary encoding
(the reference accepts both via assimp, converter/src/main.rs:86-102)."""

import os

import numpy as np
import pytest

from glaze_tpu.fbx import import_fbx, parse_fbx
from test_fbx_textures import (
    _checker_png_bytes,
    _quad_fbx_roots,
    write_fbx,
)

_ASCII_QUAD = """; FBX 7.4.0 project file
FBXHeaderExtension:  {
\tFBXVersion: 7400
}
Objects:  {
\tGeometry: 1, "Geometry::geo", "Mesh" {
\t\tVertices: *12 {
\t\t\ta: 0,0,0,1,0,0,1,1,0,
0,1,0
\t\t}
\t\tPolygonVertexIndex: *4 {
\t\t\ta: 0,1,2,-4
\t\t}
\t\tLayerElementNormal: 0 {
\t\t\tMappingInformationType: "AllSame"
\t\t\tReferenceInformationType: "Direct"
\t\t\tNormals: *3 {
\t\t\t\ta: 0.0,0.0,1.0
\t\t\t}
\t\t}
\t\tLayerElementUV: 0 {
\t\t\tMappingInformationType: "ByControlPoint"
\t\t\tReferenceInformationType: "Direct"
\t\t\tUV: *8 {
\t\t\t\ta: 0,0,1,0,1,1,0,1
\t\t\t}
\t\t}
\t}
\tModel: 2, "Model::quad", "Mesh" {
\t}
\tMaterial: 3, "Material::checkmat", "" {
\t\tProperties70:  {
\t\t\tP: "DiffuseColor", "Color", "", "A",0.5,0.5,0.5
\t\t}
\t}
\tTexture: 4, "Texture::check", "" {
\t\tRelativeFilename: "checker.png"
\t}
}
Connections:  {
\t; geometry -> model, material -> model, texture -> material slot
\tC: "OO",1,2
\tC: "OO",3,2
\tC: "OP",4,3,"DiffuseColor"
}
"""


def test_ascii_imports_like_binary(tmp_path):
    png, _ = _checker_png_bytes()
    (tmp_path / "checker.png").write_bytes(png)

    a_path = str(tmp_path / "quad_ascii.fbx")
    with open(a_path, "w") as f:
        f.write(_ASCII_QUAD)
    b_path = str(tmp_path / "quad_bin.fbx")
    write_fbx(b_path, _quad_fbx_roots(
        [("RelativeFilename", ["checker.png"], [])]))

    av, am, amat, atex, al, ac, atf, ai = import_fbx(a_path)
    bv, bm, bmat, btex, bl, bc, btf, bi = import_fbx(b_path)

    assert len(av) == len(bv)
    for x, y in zip(av, bv):
        np.testing.assert_array_equal(x.vv, y.vv)
        np.testing.assert_array_equal(x.vn, y.vn)
        np.testing.assert_array_equal(x.vt, y.vt)
    assert [list(m.indices) for m in am] == [list(m.indices) for m in bm]
    assert [m.material for m in am] == [m.material for m in bm]
    assert [(m.name, m.diffuse_mul, m.diffuse) for m in amat] == \
           [(m.name, m.diffuse_mul, m.diffuse) for m in bmat]
    assert len(atex) == len(btex) == 2  # default + checker
    assert atex[1].info.width == btex[1].info.width == 16
    assert len(ai) == len(bi) == 1


def test_ascii_node_tree_shapes(tmp_path):
    path = str(tmp_path / "t.fbx")
    with open(path, "w") as f:
        f.write(_ASCII_QUAD)
    root, version = parse_fbx(path)
    assert version == 7400
    objs = root.first("Objects")
    geo = objs.find("Geometry")[0]
    # "Geometry::geo" normalized to the binary name encoding
    assert geo.props[1].split("\x00")[0] == "geo"
    verts = geo.first("Vertices").props[0]
    assert isinstance(verts, np.ndarray) and verts.dtype.kind in "fi"
    assert len(verts) == 12
    pvi = geo.first("PolygonVertexIndex").props[0]
    assert pvi.dtype.kind == "i" and pvi[-1] == -4


def test_old_ascii_rejected(tmp_path):
    path = str(tmp_path / "old.fbx")
    with open(path, "w") as f:
        f.write("FBXHeaderExtension: {\n FBXVersion: 6100\n}\n")
    with pytest.raises(ValueError, match="pre-7.0"):
        parse_fbx(path)


def test_garbage_rejected(tmp_path):
    path = str(tmp_path / "x.fbx")
    with open(path, "wb") as f:
        f.write(b"\x89PNG not an fbx at all")
    with pytest.raises(ValueError, match="not an FBX"):
        parse_fbx(path)


def test_ascii_embedded_video_texture(tmp_path):
    """ASCII FBX embeds Video Content as base64 text."""
    import base64

    png, img = _checker_png_bytes()
    b64 = base64.b64encode(png).decode()
    body = _ASCII_QUAD.replace(
        '\tTexture: 4, "Texture::check", "" {\n'
        '\t\tRelativeFilename: "checker.png"\n\t}',
        '\tTexture: 4, "Texture::check", "" {\n\t}\n'
        '\tVideo: 5, "Video::check", "Clip" {\n'
        f'\t\tContent: "{b64}"\n\t}}').replace(
        'Connections:  {',
        'Connections:  {\n\tC: "OO",5,4')
    path = str(tmp_path / "emb.fbx")
    with open(path, "w") as f:
        f.write(body)
    # no checker.png on disk: the embedded bytes must carry the image
    _, meshes, mats, texs, *_ = import_fbx(path)
    assert len(texs) == 2 and texs[1].info.width == 16
    assert mats[meshes[0].material].diffuse == 1
