"""RealtimeRenderer, glaze-app command loop, and converter tests."""

import os

import numpy as np
import pytest

from glaze_tpu.core import Light, LightType, Material, MaterialType
from glaze_tpu.parser import parse
from glaze_tpu.render.realtime import RealtimeRenderer


OBJ = "/root/reference/resources/cube.obj"
MATTEST = "/root/reference/resources/mattest.glaze"


def test_converter_roundtrip(tmp_path):
    """BASELINE config #1: cube.obj -> .glaze -> parse."""
    if not os.path.exists(OBJ):
        pytest.skip("cube.obj missing")
    from glaze_tpu.converter import convert

    out = tmp_path / "cube.glaze"
    nv, nm = convert(OBJ, str(out))
    assert nv > 0 and nm >= 1
    p = parse(str(out))
    assert len(p.vertices()) == nv
    assert len(p.meshes()) == nm
    # default material in slot 0 + MTL material
    assert len(p.materials()) >= 2
    assert p.meta().scene_radius > 0
    cam = p.cameras()[0]
    assert cam.is_perspective
    # indices are in range and triangulated
    for mesh in p.meshes():
        assert len(mesh.indices) % 3 == 0
        assert max(mesh.indices) < nv


def test_converter_benchmark_mode(tmp_path, capsys):
    if not os.path.exists(OBJ):
        pytest.skip("cube.obj missing")
    from glaze_tpu.converter import convert, benchmark

    out = tmp_path / "cube.glaze"
    convert(OBJ, str(out))
    benchmark(str(out))
    text = capsys.readouterr().out
    assert "parse:" in text and "read vertices" in text


def _lit_cube_scene(tmp_path):
    from glaze_tpu.converter import convert

    out = tmp_path / "cube.glaze"
    convert(OBJ, str(out))
    return str(out)


def test_realtime_renderer_flow(tmp_path):
    if not os.path.exists(OBJ):
        pytest.skip("cube.obj missing")
    path = _lit_cube_scene(tmp_path)
    parsed = parse(path)
    frames = []
    rr = RealtimeRenderer(parsed, width=32, height=32,
                          presenter=frames.append, seed=1)
    # give it a light so launches accumulate
    rr.update_light(0, Light(ltype=LightType.OMNI, position=[0, 3, 3],
                             intensity=5.0))
    rr.draw_frame()
    rr.draw_frame()
    assert len(frames) == 2
    assert frames[0].shape == (32, 32, 3)

    # live material edit restarts accumulation
    mat = rr.materials()[1]
    mat.mtype = MaterialType.METAL
    rr.change_material(1, mat)
    img = rr.draw_frame()
    assert img.shape == (32, 32, 3)

    # camera movement flows
    rr.advance(0.5)
    rr.look_around(0.1, 0.0)
    rr.draw_frame()

    # direct-light preview toggle
    rr.use_raytracer = False
    img2 = rr.draw_frame()
    assert img2.shape == (32, 32, 3)

    # render-scale resize (renderer.rs:283-315)
    rr.set_render_scale(0.5)
    img3 = rr.draw_frame()
    assert img3.shape == (16, 16, 3)

    # save_as writes a loadable scene with the edits
    out2 = tmp_path / "edited.glaze"
    rr.save_as(str(out2))
    p2 = parse(str(out2))
    assert p2.materials()[1].mtype == MaterialType.METAL
    assert len(p2.lights()) == 1

    # in-place save (ParsedScene::update path)
    rr.save()
    p3 = parse(path)
    assert p3.materials()[1].mtype == MaterialType.METAL


def test_app_scripted(tmp_path):
    """Drives the glaze-app command loop non-interactively."""
    if not os.path.exists(OBJ):
        pytest.skip("cube.obj missing")
    path = _lit_cube_scene(tmp_path)
    script = tmp_path / "script.txt"
    out_png = tmp_path / "view.png"
    edited = tmp_path / "app_edited.glaze"
    script.write_text(
        "light add omni\n"
        "light 0 intensity 4\n"
        "mat 1 type mirror\n"
        "w 0.5\n"
        "look 10 0\n"
        "drag 0.5 0 3\n"
        "settings\n"
        "set speed 2\n"
        "set sensitivity 0.5\n"
        "set invert_v on\n"
        "w 0.25 fast\n"
        "look 4 2\n"
        "integrator direct\n"
        "frames 1\n"
        "integrator pt\n"
        "frames 2\n"
        "coherent tile\n"
        "frames 1\n"
        "coherent off\n"
        "frames 1\n"
        "stats\n"
        f"saveas {edited}\n"
        f"shot {tmp_path/'shot.png'}\n"
        "quit\n"
    )
    from glaze_tpu.app import main

    rc = main([path, "--out", str(out_png), "--res", "24x24",
               "--script", str(script)])
    assert rc == 0
    assert out_png.exists()
    assert (tmp_path / "shot.png").exists()
    p = parse(str(edited))
    assert p.materials()[1].mtype == MaterialType.MIRROR
    assert any(l.ltype == LightType.OMNI for l in p.lights())


def test_gltf_converter(tmp_path):
    """Minimal glTF with node transforms, PBR material, punctual light."""
    import base64
    import json
    import struct

    # one quad: 4 vertices, 2 triangles
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    nrm = np.tile(np.asarray([[0, 0, 1]], np.float32), (4, 1))
    idx = np.asarray([0, 1, 2, 0, 2, 3], np.uint16)
    buf = pos.tobytes() + nrm.tobytes() + idx.tobytes()
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1, 2]}],
        "nodes": [
            {"mesh": 0},
            {"mesh": 0, "translation": [3, 0, 0], "scale": [2, 2, 2]},
            {"extensions": {"KHR_lights_punctual": {"light": 0}},
             "translation": [0, 5, 0]},
        ],
        "extensions": {"KHR_lights_punctual": {"lights": [
            {"type": "point", "intensity": 7.0, "color": [1, 0.5, 0.25]}
        ]}},
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1},
            "indices": 2, "material": 0,
        }]}],
        "materials": [{
            "name": "quadmat",
            "pbrMetallicRoughness": {"baseColorFactor": [0.8, 0.2, 0.1, 1.0]},
            "emissiveFactor": [0.0, 1.0, 0.0],
        }],
        "buffers": [{
            "byteLength": len(buf),
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(buf).decode(),
        }],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 48},
            {"buffer": 0, "byteOffset": 96, "byteLength": 12},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 2, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
    }
    src = tmp_path / "scene.gltf"
    src.write_text(json.dumps(gltf))
    out = tmp_path / "scene.glaze"
    from glaze_tpu.converter import convert

    nv, nm = convert(str(src), str(out))
    assert nv == 4 and nm == 1
    p = parse(str(out))
    assert len(p.instances()) == 2  # two nodes reference the mesh
    tfs = p.transforms()
    used = {i.transform_id for i in p.instances()}
    assert len(used) == 2  # identity + translated/scaled
    scaled = [tfs[t].m for t in used if tfs[t].m[0, 3] == 3.0]
    assert len(scaled) == 1 and scaled[0][0, 0] == 2.0
    mats = p.materials()
    assert mats[1].name == "quadmat"
    assert mats[1].diffuse_mul == (int(0.8 * 255), int(0.2 * 255), int(0.1 * 255))
    assert mats[1].emissive_col is not None
    ls = p.lights()
    kinds = sorted(l.ltype for l in ls)
    assert LightType.OMNI in kinds and LightType.AREA in kinds
    omni = next(l for l in ls if l.ltype == LightType.OMNI)
    assert abs(omni.intensity - 7.0) < 1e-6
    assert np.allclose(omni.position, [0, 5, 0])

    # renders end-to-end
    from glaze_tpu.render.renderer import RayTraceRenderer

    r = RayTraceRenderer(p, width=16, height=16, seed=0)
    r.draw(1)
    assert np.isfinite(np.asarray(r._state.count)).all()


def test_cli_checkpoint_resume_bit_exact(tmp_path):
    """--checkpoint: a render split across two CLI invocations produces
    the same PNG as one uninterrupted run (bit-exact resume; the
    reference restarts accumulation from scratch on any interruption)."""
    if not os.path.exists(OBJ):
        pytest.skip("cube.obj missing")
    path = _lit_cube_scene(tmp_path)
    from PIL import Image

    from glaze_tpu.cli import main

    ref = tmp_path / "whole.png"
    rc = main([path, str(ref), "--res", "16x16", "--spp", "4", "--seed", "3"])
    assert rc == 0

    ck = tmp_path / "ck.npz"
    part = tmp_path / "part.png"
    rc = main([path, str(part), "--res", "16x16", "--spp", "2",
               "--seed", "3", "--checkpoint", str(ck)])
    assert rc == 0 and ck.exists()
    resumed = tmp_path / "resumed.png"
    rc = main([path, str(resumed), "--res", "16x16", "--spp", "4",
               "--seed", "3", "--checkpoint", str(ck)])
    assert rc == 0
    a = np.asarray(Image.open(ref))
    b = np.asarray(Image.open(resumed))
    assert np.array_equal(a, b)

    # a checkpoint from another scene must be refused, not blended
    rc = main([MATTEST, str(tmp_path / "x.png"), "--res", "16x16",
               "--spp", "4", "--seed", "3", "--checkpoint", str(ck)])
    assert rc == 2


def test_cli_mesh_matches_single_device(tmp_path):
    """glaze-cli --mesh (pixel-sharded over all devices) produces the
    same PNG as the single-device path — the CLI's multi-chip mode."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    if not os.path.exists(OBJ):
        pytest.skip("cube.obj missing")
    from PIL import Image

    from glaze_tpu.cli import main

    path = _lit_cube_scene(tmp_path)
    single = tmp_path / "single.png"
    meshed = tmp_path / "meshed.png"
    # 128x16 = exactly one 2048-lane tile -> divisible by 8 devices
    rc = main([path, str(single), "--res", "128x16", "--spp", "2",
               "--seed", "4"])
    assert rc == 0
    rc = main([path, str(meshed), "--res", "128x16", "--spp", "2",
               "--seed", "4", "--mesh"])
    assert rc == 0
    a = np.asarray(Image.open(single))
    b = np.asarray(Image.open(meshed))
    assert np.array_equal(a, b)


def test_cli_end_to_end(tmp_path):
    """glaze-cli flags and both integrators on a tiny scene."""
    if not os.path.exists(OBJ):
        pytest.skip("cube.obj missing")
    path = _lit_cube_scene(tmp_path)
    from glaze_tpu.cli import main, parse_resolution

    assert parse_resolution("640x480") == (640, 480)
    for integ_name in ("pt", "direct"):
        out = tmp_path / f"cli_{integ_name}.png"
        rc = main([path, str(out), "--res", "16x16", "--spp", "1",
                   "--integrator", integ_name, "--seed", "1"])
        assert rc == 0 and out.exists()
        from PIL import Image

        img = np.asarray(Image.open(out))
        assert img.shape == (16, 16, 3)

    # --coherent tile|off route through the per-renderer static-arg
    # modes (the global integ.COHERENT stays untouched — the CLI no
    # longer owns process-wide state)
    from glaze_tpu.render import integrator as integ

    for mode in ("tile", "off"):
        out = tmp_path / f"cli_coherent_{mode}.png"
        rc = main([path, str(out), "--res", "16x16", "--spp", "1",
                   "--coherent", mode, "--seed", "1"])
        assert rc == 0 and out.exists()
    assert integ.COHERENT == 0


def test_app_texture_editor(tmp_path):
    """The ui.rs textures window equivalents: tex list/add/del/format and
    material texture-slot assignment through the command loop."""
    if not os.path.exists(OBJ):
        pytest.skip("cube.obj missing")
    path = _lit_cube_scene(tmp_path)
    # an image to import
    from PIL import Image

    img = np.zeros((8, 8, 3), np.uint8)
    img[..., 0] = 255
    tex_png = tmp_path / "red.png"
    Image.fromarray(img).save(tex_png)

    script = tmp_path / "script.txt"
    edited = tmp_path / "tex_edited.glaze"
    # the converted cube scene ships 2 textures (default + its MTL map),
    # so the added texture gets id 2
    script.write_text(
        "tex\n"
        f"tex add {tex_png} srgb\n"
        "mat 1 tex diffuse 2\n"
        "tex format 2 gray\n"
        "mat 1 tex diffuse 0\n"
        "tex del 2\n"
        f"tex add {tex_png}\n"
        "mat 1 tex diffuse 2\n"
        f"tex show 2 {tmp_path / 'tex_show.png'}\n"
        f"saveas {edited}\n"
        "quit\n"
    )
    from glaze_tpu.app import main

    rc = main([path, "--out", str(tmp_path / "v.png"), "--res", "24x24",
               "--script", str(script)])
    assert rc == 0
    p = parse(str(edited))
    assert len(p.textures()) == 3  # default + MTL map + re-added red.png
    assert p.textures()[2].info.name == "red.png"
    assert p.materials()[1].diffuse == 2
    # `tex show` wrote the texture pixels (imgui textures-window preview)
    shown = np.asarray(Image.open(tmp_path / "tex_show.png"))
    assert shown.shape[:2] == (8, 8) and shown[..., 0].min() == 255


def test_app_background_load(tmp_path):
    """The `load` command: a worker thread decodes the new scene with
    progress while frames keep flowing, then the renderer swaps
    (ui.rs:88-95 background load + progress channel)."""
    if not os.path.exists(OBJ):
        pytest.skip("cube.obj missing")
    from PIL import Image

    path = _lit_cube_scene(tmp_path)
    script = tmp_path / "load_script.txt"
    script.write_text(
        "frames 1\n"
        "load /root/reference/resources/mattest.glaze\n"
        "frames 1\n"
        f"shot {tmp_path / 'after_load.png'}\n"
        "quit\n"
    )
    from glaze_tpu.app import main

    rc = main([path, "--out", str(tmp_path / "v.png"), "--res", "24x24",
               "--script", str(script)])
    assert rc == 0
    assert (tmp_path / "after_load.png").exists()
    img = np.asarray(Image.open(tmp_path / "after_load.png"))
    assert img.shape == (24, 24, 3)


def test_texture_remove_guard(tmp_path):
    """remove_texture refuses while a material references the texture."""
    if not os.path.exists(OBJ):
        pytest.skip("cube.obj missing")
    path = _lit_cube_scene(tmp_path)
    from glaze_tpu.core import Texture, TextureFormat, TextureInfo
    from glaze_tpu.render.realtime import RealtimeRenderer

    rr = RealtimeRenderer(parse(path), width=16, height=16)
    arr = np.full((4, 4), 128, np.uint8)
    tid = rr.add_texture(
        Texture(TextureInfo("g", 4, 4, TextureFormat.Gray), [arr]))
    mat = rr.materials()[1]
    mat.roughness = tid
    rr.change_material(1, mat)
    with pytest.raises(ValueError, match="in use"):
        rr.remove_texture(tid)
    mat.roughness = 0
    rr.change_material(1, mat)
    rr.remove_texture(tid)
    assert len(rr.textures()) == 2  # back to default + the scene's MTL map


def test_fbx_converter(tmp_path):
    """Converts the reference's shipped test.fbx (binary FBX 7400: one cube
    geometry instanced under five models + a point light + a camera) and
    renders it (converter/src/main.rs:86-102 parity for FBX input)."""
    fbx = "/root/reference/resources/test.fbx"
    if not os.path.exists(fbx):
        pytest.skip("test.fbx missing")
    from glaze_tpu.converter import convert

    out = tmp_path / "test_fbx.glaze"
    convert(fbx, str(out))
    p = parse(str(out))
    assert len(p.meshes()) == 1  # one shared cube geometry
    assert len(p.instances()) == 5  # five instanced models
    # identity (slot 0) + the five model placements, deduplicated
    assert 5 <= len(p.transforms()) <= 6
    assert sum(len(m.indices) for m in p.meshes()) // 3 == 12
    assert any(l.ltype in (LightType.OMNI, LightType.SUN)
               for l in p.lights())
    assert len(p.cameras()) == 1

    # instanced world-space placements must differ
    import numpy as np

    mats = [t.m for t in p.transforms()]
    assert not all(np.allclose(mats[0], m) for m in mats[1:])

    # end-to-end: renders without NaNs
    from glaze_tpu.render.renderer import RayTraceRenderer

    r = RayTraceRenderer(p, width=16, height=16, seed=1)
    r.draw(1)
    accum = np.stack([np.asarray(c) for c in r._state.accum], -1)
    assert np.isfinite(accum).all()


def test_pipelined_draw_matches_blocking(tmp_path):
    """pipelined draw_frame presents FRAMES_IN_FLIGHT frames late but
    accumulates identically: after N launches, get_image equals the
    blocking path."""
    if not os.path.exists(OBJ):
        pytest.skip("cube.obj missing")
    path = _lit_cube_scene(tmp_path)
    from glaze_tpu.render.realtime import FRAMES_IN_FLIGHT, RealtimeRenderer

    n = 3 + FRAMES_IN_FLIGHT
    a = RealtimeRenderer(parse(path), width=16, height=16, seed=9)
    b = RealtimeRenderer(parse(path), width=16, height=16, seed=9)
    last_pipe = None
    for _ in range(n):
        last_pipe = a.draw_frame(pipelined=True)
        b.draw_frame()
    np.testing.assert_array_equal(a.get_image(), b.get_image())
    # the pipelined PRESENTED frame lags by FRAMES_IN_FLIGHT launches
    b2 = RealtimeRenderer(parse(path), width=16, height=16, seed=9)
    for _ in range(n - FRAMES_IN_FLIGHT):
        b2.draw_frame()
    np.testing.assert_array_equal(last_pipe, b2.get_image())


def _write_ply_ascii(path):
    with open(path, "w") as f:
        f.write("""ply
format ascii 1.0
element vertex 4
property float x
property float y
property float z
property float nx
property float ny
property float nz
property float s
property float t
element face 2
property list uchar int vertex_indices
end_header
0 0 0 0 0 1 0 0
1 0 0 0 0 1 1 0
1 1 0 0 0 1 1 1
0 1 0 0 0 1 0 1
3 0 1 2
3 0 2 3
""")


def _write_ply_binary(path):
    import struct
    head = (b"ply\nformat binary_little_endian 1.0\n"
            b"element vertex 3\n"
            b"property float x\nproperty float y\nproperty float z\n"
            b"element face 1\n"
            b"property list uchar int vertex_indices\n"
            b"end_header\n")
    body = b""
    for v in [(0, 0, 0), (2, 0, 0), (0, 2, 0)]:
        body += struct.pack("<3f", *v)
    body += struct.pack("<B3i", 3, 0, 1, 2)
    with open(path, "wb") as f:
        f.write(head + body)


def test_ply_converter(tmp_path):
    """ascii quad (fan-triangulated) and binary tri, through convert()."""
    from glaze_tpu.converter import convert
    from glaze_tpu.parser import parse

    ply = tmp_path / "quad.ply"
    _write_ply_ascii(str(ply))
    out = tmp_path / "quad.glaze"
    convert(str(ply), str(out))
    p = parse(str(out))
    assert len(p.vertices()) == 4
    (mesh,) = p.meshes()
    assert len(mesh.indices) == 6  # two triangles, deduped verts
    assert len(p.materials()) == 1

    ply2 = tmp_path / "tri.ply"
    _write_ply_binary(str(ply2))
    out2 = tmp_path / "tri.glaze"
    convert(str(ply2), str(out2))
    p2 = parse(str(out2))
    assert len(p2.vertices()) == 3
    # generated normals: flat +z triangle
    n = np.asarray([v.vn for v in p2.vertices()])
    np.testing.assert_allclose(n, [[0, 0, 1]] * 3, atol=1e-5)


def test_stl_converter(tmp_path):
    """binary and ascii STL through convert()."""
    import struct
    from glaze_tpu.converter import convert
    from glaze_tpu.parser import parse

    stl = tmp_path / "tri.stl"
    payload = struct.pack("<3f", 0, 0, 1)
    payload += struct.pack("<9f", 0, 0, 0, 1, 0, 0, 0, 1, 0)
    payload += struct.pack("<H", 0)
    with open(stl, "wb") as f:
        f.write(b"\0" * 80 + struct.pack("<I", 1) + payload)
    out = tmp_path / "tri.glaze"
    convert(str(stl), str(out))
    p = parse(str(out))
    assert len(p.vertices()) == 3
    n = np.asarray([v.vn for v in p.vertices()])
    np.testing.assert_allclose(n, [[0, 0, 1]] * 3, atol=1e-6)

    stl2 = tmp_path / "tri2.stl"
    with open(stl2, "w") as f:
        f.write("""solid t
facet normal 0 0 1
  outer loop
    vertex 0 0 0
    vertex 1 0 0
    vertex 0 1 0
  endloop
endfacet
endsolid t
""")
    out2 = tmp_path / "tri2.glaze"
    convert(str(stl2), str(out2))
    assert len(parse(str(out2)).vertices()) == 3

    # the classic ambiguity: a BINARY stl whose 80-byte comment header
    # starts with "solid" and mentions "facet" must still import as
    # binary (size-formula detection wins over the text heuristic)
    stl3 = tmp_path / "tri3.stl"
    header = b"solid exported facet mesh".ljust(80, b" ")
    with open(stl3, "wb") as f:
        f.write(header + struct.pack("<I", 1) + payload)
    out3 = tmp_path / "tri3.glaze"
    convert(str(stl3), str(out3))
    assert len(parse(str(out3)).vertices()) == 3


def test_cli_opens_mesh_formats_directly(tmp_path, capsys):
    """cli/app/viewer accept any importable format via auto-conversion
    (ensure_glaze caches the converted temp by path+mtime)."""
    import os
    import sys

    from glaze_tpu import cli
    from glaze_tpu.converter import ensure_glaze

    out = os.path.join(str(tmp_path), "o.png")
    cli.main(["/root/reference/resources/cube.obj", out,
              "--res", "32x32", "--spp", "1"])
    assert os.path.exists(out)

    # second resolve hits the cached temp file (same path returned)
    a = ensure_glaze("/root/reference/resources/cube.obj")
    b = ensure_glaze("/root/reference/resources/cube.obj")
    assert a == b and a.endswith(".glaze") and os.path.exists(a)
    # .glaze passes through untouched
    assert ensure_glaze("/x/y.glaze") == "/x/y.glaze"


def test_gltf_orthographic_camera(tmp_path):
    import json

    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"camera": 0, "translation": [0, 2, 9]}],
        "cameras": [{"type": "orthographic",
                     "orthographic": {"xmag": 3.5, "ymag": 2.0,
                                      "znear": 0.25, "zfar": 80}}],
    }
    src = tmp_path / "cam.gltf"
    src.write_text(json.dumps(gltf))
    from glaze_tpu.core import OrthographicCam
    from glaze_tpu.gltf import import_gltf

    *_, cameras, tfs, insts = import_gltf(str(src))
    assert len(cameras) == 1
    cam = cameras[0].inner
    assert isinstance(cam, OrthographicCam)
    assert cam.scale == 3.5 and cam.near == 0.25 and cam.far == 80
    np.testing.assert_allclose(np.asarray(cam.position), [0, 2, 9])
