"""Live MJPEG viewer (glaze_tpu/viewer.py) — the headless equivalent of
the reference's winit redraw loop + camera controls
(app/src/viewport.rs:81-247)."""

import json
import sys
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server():
    import glaze_tpu
    from glaze_tpu.render.realtime import RealtimeRenderer
    from glaze_tpu import viewer

    parsed = glaze_tpu.parse("/root/reference/resources/mattest.glaze")
    rt = RealtimeRenderer(parsed, width=64, height=48, render_scale=1.0)
    srv, state, t = viewer.serve(rt, host="127.0.0.1", port=0)
    import threading

    st = threading.Thread(target=srv.serve_forever, daemon=True)
    st.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    yield url, state, rt
    state.running = False
    with state.cond:
        state.cond.notify_all()
    srv.shutdown()
    # JOIN the render thread: a live thread still dispatching XLA after
    # this module would race every later test's compiles (rare
    # full-suite segfaults pointed here)
    t.join(timeout=300)


def _get(url, timeout=120):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read()


def test_frame_is_jpeg(server):
    url, state, rt = server
    status, ctype, body = _get(url + "/frame")
    assert status == 200 and ctype == "image/jpeg"
    assert body[:2] == b"\xff\xd8"  # JPEG SOI
    from PIL import Image
    import io

    img = np.asarray(Image.open(io.BytesIO(body)))
    assert img.shape == (48, 64, 3)


def test_index_page(server):
    url, state, rt = server
    status, ctype, body = _get(url + "/")
    assert status == 200 and "text/html" in ctype
    assert b"/stream" in body and b"advance" in body


def test_stats_and_progression(server):
    url, state, rt = server
    s0 = json.loads(_get(url + "/stats")[2])
    assert s0["mode"] == "pt"
    # wait for more launches to land
    _, seq = state.wait_frame(-1)
    state.wait_frame(seq, timeout=120)
    s1 = json.loads(_get(url + "/stats")[2])
    assert s1["spp"] >= s0["spp"]


def test_control_moves_camera(server):
    url, state, rt = server
    import glaze_tpu

    before = np.asarray(rt.camera().inner.position, float).copy()
    req = urllib.request.Request(
        url + "/control",
        data=json.dumps({"action": "advance", "value": 1}).encode(),
        method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.status == 204
    # the render thread applies queued commands before the next launch
    _, seq = state.wait_frame(-1)
    state.wait_frame(seq, timeout=120)
    state.wait_frame(state.seq, timeout=120)
    after = np.asarray(rt.camera().inner.position, float)
    assert not np.allclose(before, after)


def test_scene_listing_and_live_edit(server):
    """/scene lists materials+lights; POST /control mat/light edits land
    in the renderer (ui.rs materials/lights windows equivalent)."""
    url, state, rt = server
    from glaze_tpu.core import LightType, MaterialType

    sc = json.loads(_get(url + "/scene")[2])
    assert len(sc["materials"]) == len(rt.materials())
    assert len(sc["lights"]) == len(rt.lights())
    assert all("type" in m and "ior" in m for m in sc["materials"])

    def post(cmd):
        req = urllib.request.Request(
            url + "/control", data=json.dumps(cmd).encode(), method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.status == 204

    def settle():
        _, seq = state.wait_frame(-1)
        state.wait_frame(seq, timeout=120)
        state.wait_frame(state.seq, timeout=120)

    n_lights = len(rt.lights())
    post({"action": "mat",
          "value": {"id": 0, "field": "type", "value": "mirror"}})
    post({"action": "mat", "value": {"id": 0, "field": "ior", "value": 1.9}})
    post({"action": "light", "value": {"op": "add", "value": "omni"}})
    settle()
    assert rt.materials()[0].mtype == MaterialType.MIRROR
    assert rt.materials()[0].ior == pytest.approx(1.9)
    # flatten reorders lights sky-last, so locate the added OMNI by type
    assert len(rt.lights()) == n_lights + 1
    omni = next(i for i, l in enumerate(rt.lights())
                if l.ltype == LightType.OMNI)

    post({"action": "light",
          "value": {"id": omni, "field": "intensity", "value": 3.5}})
    settle()
    assert rt.lights()[omni].intensity == pytest.approx(3.5)

    post({"action": "light", "value": {"op": "del", "id": omni}})
    settle()
    assert len(rt.lights()) == n_lights
    assert all(l.ltype != LightType.OMNI for l in rt.lights())
    sc2 = json.loads(_get(url + "/scene")[2])
    assert sc2["materials"][0]["type"] == "mirror"


def test_texture_panel_and_material_texture_edit(server):
    """/scene lists textures; tex format/mat-diffuse/emission edits land
    (ui.rs textures window + materials editor texture/emission rows)."""
    url, state, rt = server
    from glaze_tpu.core import TextureFormat

    sc = json.loads(_get(url + "/scene")[2])
    assert len(sc["textures"]) == len(rt.textures())
    assert all("format" in t and "size" in t for t in sc["textures"])
    assert len(sc["metals"]) == 29

    def post(cmd):
        req = urllib.request.Request(
            url + "/control", data=json.dumps(cmd).encode(), method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.status == 204

    def settle():
        _, seq = state.wait_frame(-1)
        state.wait_frame(seq, timeout=120)
        state.wait_frame(state.seq, timeout=120)

    post({"action": "mat",
          "value": {"id": 1, "field": "diffuse", "value": 0}})
    post({"action": "mat",
          "value": {"id": 1, "field": "emission", "value": [255, 128, 0]}})
    # format reinterpret on a texture (id 1: first real texture)
    tid = 1
    old_fmt = rt.textures()[tid].info.format
    new_fmt = ("Gray" if old_fmt != TextureFormat.Gray else "RgbaSrgb")
    post({"action": "tex",
          "value": {"id": tid, "field": "format", "value": new_fmt}})
    settle()
    assert rt.materials()[1].diffuse == 0
    assert rt.materials()[1].emissive_col == (255, 128, 0)
    assert rt.textures()[tid].info.format == TextureFormat(new_fmt)
    post({"action": "mat",
          "value": {"id": 1, "field": "emission", "value": None}})
    settle()
    assert rt.materials()[1].emissive_col is None


def test_integrator_switch(server):
    """The integrator control swaps DIRECT/PT and restarts accumulation
    (ui.rs settings window; raytracer.rs:196-231)."""
    url, state, rt = server
    from glaze_tpu.render.renderer import Integrator

    def post(cmd):
        req = urllib.request.Request(
            url + "/control", data=json.dumps(cmd).encode(), method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.status == 204

    def settle():
        _, seq = state.wait_frame(-1)
        state.wait_frame(seq, timeout=120)
        state.wait_frame(state.seq, timeout=120)

    post({"action": "integrator", "value": "direct"})
    settle()
    assert rt._rt.integrator is Integrator.DIRECT
    assert json.loads(_get(url + "/stats")[2])["mode"] == "direct"
    post({"action": "integrator", "value": "pt"})
    settle()
    assert rt._rt.integrator is Integrator.PATH_TRACE

    # coherent-sampling toggle (per-renderer static-arg switch; the
    # interactive default is 2/tile): frames must keep flowing across
    # the mode change
    assert rt.coherent == 2  # shipped interactive default
    post({"action": "coherent", "value": 0})
    settle()
    assert rt.coherent == 0
    post({"action": "coherent", "value": 2})
    settle()
    assert rt.coherent == 2


def test_control_settings(server):
    """The `set` action drives the ui.rs Controls-window settings
    (sensitivity/speed/fast multiplier/inversions, ui.rs:343-358); the
    `fast` flag on a movement command applies the multiplier."""
    url, state, rt = server

    def post(cmd):
        req = urllib.request.Request(
            url + "/control", data=json.dumps(cmd).encode(), method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.status == 204

    def settle():
        _, seq = state.wait_frame(-1)
        state.wait_frame(seq, timeout=120)
        state.wait_frame(state.seq, timeout=120)

    post({"action": "set", "value": ["mov_speed", 2.0]})
    post({"action": "set", "value": ["sensitivity", 0.5]})
    post({"action": "set", "value": ["invert_v", True]})
    post({"action": "set", "value": ["mov_speed_mul", 4.0]})
    settle()
    assert state.mov_speed == 2.0 and state.sensitivity == 0.5
    assert state.invert_v is True and state.mov_speed_mul == 4.0

    # clamped to the slider range (ui.rs Slider::new bounds)
    post({"action": "set", "value": ["sensitivity", 1e6]})
    settle()
    assert state.sensitivity == 10.0

    # fast movement: same key, shift held -> mov_speed_mul x the step
    before = np.asarray(rt.camera().inner.position, float).copy()
    post({"action": "advance", "value": 1, "fast": True})
    settle()
    mid = np.asarray(rt.camera().inner.position, float).copy()
    post({"action": "advance", "value": -1})
    settle()
    after = np.asarray(rt.camera().inner.position, float)
    d_fast = np.linalg.norm(mid - before)
    d_norm = np.linalg.norm(after - mid)
    assert d_fast == pytest.approx(4.0 * d_norm, rel=1e-4)


def test_save_as(server, tmp_path):
    """The save-as control serializes the live scene (ui.rs save buttons,
    scene.rs:477-511)."""
    url, state, rt = server
    out = str(tmp_path / "saved.glaze")
    req = urllib.request.Request(
        url + "/control",
        data=json.dumps({"action": "save", "value": out}).encode(),
        method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.status == 204
    _, seq = state.wait_frame(-1)
    state.wait_frame(seq, timeout=120)
    state.wait_frame(state.seq, timeout=120)
    import glaze_tpu

    p = glaze_tpu.parse(out)
    assert len(p.vertices()) == 70876
    assert len(p.materials()) == len(rt.materials())


def test_stream_yields_parts(server):
    url, state, rt = server
    req = urllib.request.Request(url + "/stream")
    with urllib.request.urlopen(req, timeout=120) as r:
        assert "multipart/x-mixed-replace" in r.headers.get("Content-Type")
        data = b""
        while data.count(b"--glazeframe") < 2:
            chunk = r.read(4096)
            assert chunk, "stream ended early"
            data += chunk
    assert b"Content-Type: image/jpeg" in data


def test_tex_endpoint(server):
    """/tex/<id> serves texture pixels as PNG (the imgui textures-window
    preview, vulkan/imgui.rs:39-628); bad ids 404."""
    url, state, rt = server
    t0 = rt.textures()[1]
    status, ctype, body = _get(url + "/tex/1")
    assert status == 200 and ctype == "image/png"
    import io
    from PIL import Image

    img = np.asarray(Image.open(io.BytesIO(body)))
    assert img.shape[:2] == (t0.info.height, t0.info.width)
    with pytest.raises(Exception):
        _get(url + "/tex/999")
    # the page embeds the thumbnails
    assert b"/tex/" in _get(url + "/")[2]


def test_background_scene_load(server):
    """POST {"action":"load"}: a worker thread decodes the scene while
    frames keep flowing; the render thread swaps on completion
    (ui.rs:88-95 + 1101+). /stats reports progress meanwhile."""
    import time

    url, state, rt = server
    n_before = len(rt.materials())
    req = urllib.request.Request(
        url + "/control",
        data=json.dumps({"action": "load",
                         "value": "/root/reference/resources/cube.obj"}
                        ).encode(),
        method="POST")
    urllib.request.urlopen(req, timeout=30)
    # frames must keep arriving during the load
    _, seq = state.wait_frame(-1)
    jpeg, _ = state.wait_frame(seq, timeout=120)
    assert jpeg is not None
    for _ in range(600):  # wait for the swap to land
        if state.loader is None and len(rt.materials()) != n_before:
            break
        time.sleep(0.2)
    assert len(rt.materials()) == 2  # converted cube.obj
    s = json.loads(_get(url + "/stats")[2])
    assert s["loading"] is None
