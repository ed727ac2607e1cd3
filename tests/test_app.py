"""RealtimeRenderer, glaze-app command loop, and converter tests."""

import os

import numpy as np
import pytest

from glaze_tpu.core import Light, LightType, Material, MaterialType
from glaze_tpu.parser import parse
from glaze_tpu.render.realtime import RealtimeRenderer


OBJ = "/root/reference/resources/cube.obj"


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
        "frames 2\n"
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
