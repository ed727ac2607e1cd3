"""Seeded fuzz: every importer must reject malformed input with a clean
exception (ValueError/IOError/struct.error/ET.ParseError...) — never
hang, crash the interpreter, or silently return garbage. Mirrors the
reference's corruption-test philosophy (v1.rs:1750-1973) applied to the
converter surface."""

import os
import struct

import numpy as np
import pytest

from glaze_tpu.collada import import_dae
from glaze_tpu.converter import convert
from glaze_tpu.fbx import MAGIC, parse_fbx
from glaze_tpu.mesh_formats import import_ply, import_stl

_EXPECTED = (ValueError, IOError, KeyError, IndexError, struct.error,
             EOFError, MemoryError)


def _fuzz_cases(seed, n, size=512):
    rng = np.random.default_rng(seed)
    out = [rng.integers(0, 256, size, dtype=np.uint8).tobytes()
           for _ in range(n)]
    out += [b"", b"\x00" * 64]
    return out


def _try(path, fn):
    try:
        fn(path)
    except _EXPECTED:
        pass
    except Exception as e:  # parse errors from stdlib XML are fine too
        import xml.etree.ElementTree as ET

        if not isinstance(e, ET.ParseError):
            raise


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_binary_fbx(tmp_path, seed):
    for i, data in enumerate(_fuzz_cases(seed, 8)):
        p = os.path.join(str(tmp_path), f"f{i}.fbx")
        with open(p, "wb") as f:
            f.write(MAGIC + b"\x1a\x00" + data)
        _try(p, parse_fbx)


@pytest.mark.parametrize("seed", [3, 4])
def test_fuzz_ascii_fbx(tmp_path, seed):
    rng = np.random.default_rng(seed)
    tokens = ["Objects:", "{", "}", ":", '"x"', "*4", "a:", "1", "-2.5",
              "C:", ";junk\n", "Geometry:", "\n"]
    for i in range(10):
        body = "FBXHeaderExtension: { FBXVersion: 7400 }\n" + "".join(
            rng.choice(tokens) + " "
            for _ in range(int(rng.integers(5, 60))))
        p = os.path.join(str(tmp_path), f"a{i}.fbx")
        with open(p, "w") as f:
            f.write(body)
        _try(p, parse_fbx)


def test_fuzz_dae(tmp_path):
    cases = [
        "<notcollada/>",
        "<COLLADA><library_geometries><geometry id='g'><mesh>"
        "<triangles><p>1 2</p></triangles></mesh></geometry>"
        "</library_geometries></COLLADA>",
        "<COLLADA><scene><instance_visual_scene url='#nope'/></scene>"
        "</COLLADA>",
        "<COLLADA",  # truncated XML
        "",
    ]
    for i, body in enumerate(cases):
        p = os.path.join(str(tmp_path), f"d{i}.dae")
        with open(p, "w") as f:
            f.write(body)
        _try(p, import_dae)


@pytest.mark.parametrize("fn,ext", [(import_ply, "ply"),
                                    (import_stl, "stl")])
def test_fuzz_mesh_formats(tmp_path, fn, ext):
    for i, data in enumerate(_fuzz_cases(11, 6)):
        p = os.path.join(str(tmp_path), f"m{i}.{ext}")
        with open(p, "wb") as f:
            f.write(data)
        _try(p, fn)


def test_convert_rejects_bad_extension(tmp_path):
    p = os.path.join(str(tmp_path), "x.xyz")
    open(p, "w").write("nope")
    with pytest.raises(SystemExit):
        convert(p, os.path.join(str(tmp_path), "x.glaze"))


def test_fuzz_x3d(tmp_path):
    from glaze_tpu.x3d import import_x3d

    cases = [
        "<X3D/>",
        "<X3D><Scene><Shape><IndexedFaceSet coordIndex='0 1 2 -1'/>"
        "</Shape></Scene></X3D>",
        "<X3D><Scene><Shape><IndexedFaceSet coordIndex='5 6 7 -1'>"
        "<Coordinate point='0 0 0'/></IndexedFaceSet></Shape></Scene></X3D>",
        "<X3D><Scene",
        "",
    ]
    for i, body in enumerate(cases):
        p = os.path.join(str(tmp_path), f"x{i}.x3d")
        with open(p, "w") as f:
            f.write(body)
        _try(p, import_x3d)


def test_fuzz_wrl(tmp_path):
    from glaze_tpu.vrml import import_wrl

    cases = [
        "#VRML V2.0 utf8\nShape {",
        "#VRML V2.0 utf8\nShape { geometry IndexedFaceSet { coordIndex [ 0 1 ] } }",
        "#VRML V2.0 utf8\n{ } } ] [",
        "#VRML V2.0 utf8\nTransform { translation }",
        "plain text",
        "",
    ]
    for i, body in enumerate(cases):
        p = os.path.join(str(tmp_path), f"w{i}.wrl")
        with open(p, "w") as f:
            f.write(body)
        _try(p, import_wrl)


@pytest.mark.parametrize("seed", [21, 22])
def test_fuzz_3ds(tmp_path, seed):
    from glaze_tpu.tds import import_3ds

    for i, data in enumerate(_fuzz_cases(seed, 6)):
        p = os.path.join(str(tmp_path), f"t{i}.3ds")
        with open(p, "wb") as f:
            f.write(struct.pack("<HI", 0x4D4D, 6 + len(data)) + data)
        _try(p, import_3ds)
