"""Parser round-trip / corruption tests.

Mirrors the reference suite in ``lib/src/parser/v1.rs`` (tests at
v1.rs:1082-2140): seeded-RNG random scene generation, per-chunk write/read
round trips, byte-flip corruption detection, and partial updates.
"""

import os

import numpy as np
import pytest

import glaze_tpu as g
from glaze_tpu.core.xxh64 import xxh64, xxh64_py
from glaze_tpu.parser import v1

SEED = 0x2D3A0F4B87D67C13


def rng():
    return np.random.default_rng(SEED)


def gen_vertices(r, n=32):
    return [
        g.Vertex(r.random(3, dtype=np.float32), r.random(3, dtype=np.float32),
                 r.random(2, dtype=np.float32))
        for _ in range(n)
    ]


def gen_meshes(r, n=8):
    return [
        g.Mesh(i, r.integers(0, 1000, size=3 * int(r.integers(1, 30))).tolist(),
               int(r.integers(0, 100)))
        for i in range(n)
    ]


def gen_transforms(r, n=4):
    return [g.Transform(r.random((4, 4), dtype=np.float32)) for _ in range(n)]


def gen_instances(r, n=10):
    return [
        g.MeshInstance(int(r.integers(0, 100)), int(r.integers(0, 100)))
        for _ in range(n)
    ]


def gen_cameras(r, n=4):
    cams = []
    for i in range(n):
        if i % 2 == 0:
            cams.append(g.Camera(g.PerspectiveCam(
                r.random(3, dtype=np.float32), r.random(3, dtype=np.float32),
                np.array([0, 1, 0], np.float32), float(r.random()), 0.01, 100.0)))
        else:
            cams.append(g.Camera(g.OrthographicCam(
                r.random(3, dtype=np.float32), r.random(3, dtype=np.float32),
                np.array([0, 1, 0], np.float32), float(r.random()) + 0.5, 0.01, 100.0)))
    return cams


def gen_textures(r, n=3):
    texs = []
    for i in range(n):
        if i % 2 == 0:
            info = g.TextureInfo(f"tex{i}", 16, 16, g.TextureFormat.RgbaSrgb)
            data = r.integers(0, 255, size=(16, 16, 4), dtype=np.uint8)
            texs.append(g.Texture.new_rgba(info, data))
        else:
            info = g.TextureInfo(f"gray{i}", 8, 8, g.TextureFormat.Gray)
            data = r.integers(0, 255, size=(8, 8), dtype=np.uint8)
            texs.append(g.Texture.new_gray(info, data))
    return texs


def gen_materials(r, n=6):
    mats = []
    for i in range(n):
        mats.append(g.Material(
            name=f"mat{i}",
            mtype=g.MaterialType(int(r.integers(0, 7))),
            metal=g.Metal(int(r.integers(0, 29))),
            ior=float(r.random()) + 1.0,
            diffuse=int(r.integers(0, 100)),
            diffuse_mul=tuple(int(x) for x in r.integers(0, 256, 3)),
            roughness=int(r.integers(0, 100)),
            roughness_mul=float(r.random()),
            metalness=int(r.integers(0, 100)),
            metalness_mul=float(r.random()),
            anisotropy=float(r.random()) * 2 - 1,
            opacity=int(r.integers(0, 100)),
            normal=int(r.integers(0, 100)),
            emissive_col=(tuple(int(x) for x in r.integers(1, 256, 3))
                          if i % 2 == 0 else None),
        ))
    return mats


def gen_lights(r, n=5):
    lights = []
    for i in range(n):
        lights.append(g.Light(
            ltype=g.LightType(i % 4),
            name=f"light{i}",
            color=g.Spectrum(r.random(16, dtype=np.float32)),
            position=r.random(3, dtype=np.float32),
            direction=r.random(3, dtype=np.float32),
            intensity=float(r.random()) * 10,
            resource_id=int(r.integers(0, 100)),
            yaw_deg=float(r.random()) * 360,
            pitch_deg=float(r.random()) * 360,
            roll_deg=float(r.random()) * 360,
        ))
    return lights


def gen_meta(r):
    return g.Meta([float(x) for x in r.random(3)], float(r.random()) * 100,
                  float(r.random()))


# -- xxhash ----------------------------------------------------------------

def test_xxh64_known_vectors():
    # standard xxh64 test vectors
    assert xxh64_py(b"", 0) == 0xEF46DB3751D8E999
    assert xxh64_py(b"a", 0) == 0xD24EC4F1A98C6E5B
    assert xxh64_py(b"abc", 0) == 0x44BC2CF5AD770999


def test_xxh64_native_matches_python():
    data = os.urandom(4096)
    for seed in (0, v1.HASHER_SEED, 12345):
        assert xxh64(data, seed) == xxh64_py(data, seed)


# -- per-type codecs -------------------------------------------------------

def test_vertex_encode_decode():
    for v in gen_vertices(rng()):
        assert v1.bytes_to_vertex(v1.vertex_to_bytes(v)) == v


def test_bulk_vertex_codec_matches_per_item():
    verts = gen_vertices(rng())
    bulk = v1.vertices_to_bytes(verts)
    per_item = b"".join(v1.vertex_to_bytes(v) for v in verts)
    assert bulk == per_item
    assert v1.bytes_to_vertices(bulk) == verts


def test_mesh_encode_decode():
    for m in gen_meshes(rng()):
        assert v1.bytes_to_mesh(v1.mesh_to_bytes(m)) == m


def test_camera_encode_decode():
    for c in gen_cameras(rng()):
        assert len(v1.camera_to_bytes(c)) == 49
        assert v1.bytes_to_camera(v1.camera_to_bytes(c)) == c


def test_texture_encode_decode():
    for t in gen_textures(rng()):
        assert v1.bytes_to_texture(v1.texture_to_bytes(t)) == t


def test_material_encode_decode():
    for m in gen_materials(rng()):
        assert v1.bytes_to_material(v1.material_to_bytes(m)) == m


def test_transform_encode_decode():
    for t in gen_transforms(rng()):
        assert len(t.to_bytes()) == 64
        assert v1.bytes_to_transform(v1.transform_to_bytes(t)) == t


def test_transform_column_major_layout():
    # mesh.rs:104-120: cgmath/vulkan memory layout check
    m = np.arange(16, dtype=np.float32).reshape(4, 4)
    t = g.Transform(m)
    raw = np.frombuffer(t.to_bytes(), dtype="<f4")
    # column-major: first 4 floats are the first column
    assert raw[:4].tolist() == [0.0, 4.0, 8.0, 12.0]
    assert g.Transform.from_bytes(t.to_bytes()) == t


def test_instance_encode_decode():
    for i in gen_instances(rng()):
        assert v1.bytes_to_instance(v1.instance_to_bytes(i)) == i


def test_light_encode_decode():
    for l in gen_lights(rng()):
        assert v1.bytes_to_light(v1.light_to_bytes(l)) == l


def test_meta_encode_decode():
    m = gen_meta(rng())
    data = v1.meta_to_bytes(m)
    assert len(data) == 20
    out = v1.bytes_to_meta(data)
    assert np.allclose(out.scene_centre, m.scene_centre)
    assert out.scene_radius == pytest.approx(m.scene_radius)
    assert out.exposure == pytest.approx(m.exposure)


# -- full file round trips --------------------------------------------------

def _write_all(path):
    r = rng()
    data = dict(
        vertices=gen_vertices(r), meshes=gen_meshes(r),
        transforms=gen_transforms(r), instances=gen_instances(r),
        cameras=gen_cameras(r), textures=gen_textures(r),
        materials=gen_materials(r), lights=gen_lights(r), meta=gen_meta(r),
    )
    (g.Serializer(path)
        .with_vertices(data["vertices"]).with_meshes(data["meshes"])
        .with_transforms(data["transforms"]).with_instances(data["instances"])
        .with_cameras(data["cameras"]).with_textures(data["textures"])
        .with_materials(data["materials"]).with_lights(data["lights"])
        .with_metadata(data["meta"]).serialize())
    return data


def test_write_and_read_everything(tmp_path):
    path = str(tmp_path / "all.glaze")
    data = _write_all(path)
    p = g.parse(path)
    assert p.vertices() == data["vertices"]
    assert p.meshes() == data["meshes"]
    assert p.transforms() == data["transforms"]
    assert p.instances() == data["instances"]
    assert p.cameras() == data["cameras"]
    assert p.textures() == data["textures"]
    assert p.materials() == data["materials"]
    assert p.lights() == data["lights"]
    assert p.meta() == data["meta"]


def test_write_and_read_empty_chunks(tmp_path):
    path = str(tmp_path / "empty.glaze")
    g.Serializer(path).serialize()
    p = g.parse(path)
    assert p.vertices() == []
    assert p.meshes() == []
    assert p.lights() == []
    with pytest.raises(IOError):
        p.meta()


def test_parse_wrong_magic(tmp_path):
    path = str(tmp_path / "bad.bin")
    with open(path, "wb") as f:
        f.write(b"nope" * 8)
    with pytest.raises(IOError):
        g.parse(path)


def test_parse_unsupported_version(tmp_path):
    path = str(tmp_path / "badver.glaze")
    with open(path, "wb") as f:
        f.write(bytes([0x67, 0x6C, 0x61, 0x7A, 0x65, 99]) + bytes(10))
    with pytest.raises(IOError):
        g.parse(path)


# -- corruption -------------------------------------------------------------

def _corrupt(path, offset):
    with open(path, "r+b") as f:
        f.seek(offset)
        orig = f.read(4)
        f.seek(offset)
        f.write(bytes(b ^ 0xFF for b in orig))


@pytest.mark.parametrize("chunk_attr,chunk_id", [
    ("vertices", v1.CHUNK_VERTEX), ("meshes", v1.CHUNK_MESH),
    ("cameras", v1.CHUNK_CAMERA), ("textures", v1.CHUNK_TEXTURE),
    ("materials", v1.CHUNK_MATERIAL), ("transforms", v1.CHUNK_TRANSFORM),
    ("instances", v1.CHUNK_INSTANCE), ("lights", v1.CHUNK_LIGHT),
])
def test_corrupted_chunk_detected(tmp_path, chunk_attr, chunk_id):
    path = str(tmp_path / "corr.glaze")
    _write_all(path)
    p = g.parse(path)
    offset, length = p._offsets.chunks[chunk_id]
    p.close()
    # flip 4 bytes in the middle of the chunk payload
    _corrupt(path, offset + v1.HASH_SIZE + max(1, length // 4))
    p = g.parse(path)
    with pytest.raises(IOError):
        getattr(p, chunk_attr)()


def test_corrupted_offsets_table(tmp_path):
    path = str(tmp_path / "corrtab.glaze")
    _write_all(path)
    _corrupt(path, v1.HEADER_LEN + v1.HASH_SIZE + 2)
    with pytest.raises(IOError):
        g.parse(path)


# -- update ------------------------------------------------------------------

def test_update_partial(tmp_path):
    path = str(tmp_path / "upd.glaze")
    data = _write_all(path)
    p = g.parse(path)
    r = np.random.default_rng(99)
    new_cams = gen_cameras(r)
    new_meta = gen_meta(r)
    p.update(cameras=new_cams, meta=new_meta)
    p2 = g.parse(path)
    assert p2.cameras() == new_cams
    assert p2.meta() == new_meta
    # untouched chunks preserved bit-exactly
    assert p2.vertices() == data["vertices"]
    assert p2.meshes() == data["meshes"]
    assert p2.textures() == data["textures"]
    assert p2.lights() == data["lights"]


def test_update_full(tmp_path):
    path = str(tmp_path / "updf.glaze")
    data = _write_all(path)
    p = g.parse(path)
    r = np.random.default_rng(123)
    new = dict(cameras=gen_cameras(r), materials=gen_materials(r),
               lights=gen_lights(r), textures=gen_textures(r), meta=gen_meta(r))
    p.update(**new)
    p2 = g.parse(path)
    assert p2.cameras() == new["cameras"]
    assert p2.materials() == new["materials"]
    assert p2.lights() == new["lights"]
    assert p2.textures() == new["textures"]
    assert p2.meta() == new["meta"]
    assert p2.vertices() == data["vertices"]


# -- interop with the reference's own binary scene ---------------------------

def test_parse_reference_mattest(mattest_path):
    p = g.parse(mattest_path)
    assert len(p.vertices()) == 70876
    assert len(p.meshes()) == 3
    assert len(p.materials()) == 5
    assert len(p.lights()) == 1
    assert p.lights()[0].ltype == g.LightType.SKY
    meta = p.meta()
    assert meta.scene_radius == pytest.approx(3.27297, abs=1e-4)
    texs = p.textures()
    assert len(texs) == 3
    assert texs[1].info.width == 1024


def test_reference_roundtrip(mattest_path, tmp_path):
    p = g.parse(mattest_path)
    out = str(tmp_path / "rt.glaze")
    (g.Serializer(out)
        .with_vertices(p.vertices()).with_meshes(p.meshes())
        .with_transforms(p.transforms()).with_instances(p.instances())
        .with_cameras(p.cameras()).with_textures(p.textures())
        .with_materials(p.materials()).with_lights(p.lights())
        .with_metadata(p.meta()).serialize())
    p2 = g.parse(out)
    assert p2.vertices() == p.vertices()
    assert p2.materials() == p.materials()
    assert p2.lights() == p.lights()
    assert all(a == b for a, b in zip(p2.textures(), p.textures()))


def test_converted_file(tmp_path, mattest_path):
    assert g.converted_file(mattest_path)
    other = str(tmp_path / "x.txt")
    with open(other, "w") as f:
        f.write("hello world padding padding")
    assert not g.converted_file(other)
    assert not g.converted_file(str(tmp_path / "missing.bin"))


def test_vertices_np_matches_object_path(tmp_path):
    """Bulk vertices_np() must return exactly the arrays the per-object
    vertices() path yields (flatten uses the bulk path when present)."""
    import numpy as np

    from glaze_tpu.core.mesh import Vertex
    from glaze_tpu.parser import v1

    rng = np.random.default_rng(5)
    verts = [Vertex(rng.standard_normal(3), rng.standard_normal(3),
                    rng.standard_normal(2)) for _ in range(57)]
    data = v1.encode_vertices(verts)
    vv, vn, vt = v1.decode_vertices_np(data)
    objs = v1.decode_vertices(data)
    np.testing.assert_array_equal(vv, np.stack([o.vv for o in objs]))
    np.testing.assert_array_equal(vn, np.stack([o.vn for o in objs]))
    np.testing.assert_array_equal(vt, np.stack([o.vt for o in objs]))
    assert vv.dtype == vn.dtype == vt.dtype == np.float32

    # empty chunk
    vv0, vn0, vt0 = v1.decode_vertices_np(b"")
    assert vv0.shape == (0, 3) and vt0.shape == (0, 2)
