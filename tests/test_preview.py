"""Per-material preview looks (render/preview.py styled flat pass).

The reference keys one raster pipeline per material and a two-sided
opacity-discard fragment variant (renderer.rs:587-588, scene.rs:547-549,
flat_twosided.frag); here one launch styles each family. Checks: family
looks are visually distinct on the golden scene, opacity discard skips
transparent texels, and the frame is pinned against a stored golden.
"""

import os

import numpy as np
import pytest

import golden_scenes as gs

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "goldens", "preview.npz")


@pytest.fixture(scope="module")
def frame():
    return gs.render_preview_golden()


def test_preview_families_visually_distinct(frame):
    """Mean colors of the lambert/mirror/glass/metal sphere crops differ
    pairwise — the preview look encodes the material family."""
    # sphere k center in image space: spheres at x=-5..5 step 2 on a
    # GOLDEN_W x GOLDEN_H frame; sample a small crop around each center
    h, w, _ = frame.shape
    crops = {}
    for k, (name, _) in enumerate(gs.MatRowScene.FAMILIES):
        cx = int(round((k + 0.5) * w / 6))
        crops[name] = frame[h // 3:h // 2, cx - 3:cx + 3].reshape(-1, 3)
    means = {n: c.mean(axis=0) for n, c in crops.items()}
    pairs = [("lambert", "mirror"), ("lambert", "glass"),
             ("mirror", "metal"), ("glass", "metal"),
             ("lambert", "metal")]
    for a, b in pairs:
        d = np.abs(means[a] - means[b]).max()
        assert d > 12, f"{a} vs {b} preview looks identical (d={d:.1f})"


def test_preview_golden_pinned(frame):
    if not os.path.exists(GOLDEN):
        pytest.skip("golden not generated (tools/make_goldens.py)")
    ref = np.load(GOLDEN)["frame"]
    np.testing.assert_array_equal(frame, ref)


def test_preview_opacity_discard(tmp_path):
    """A quad with a half-transparent opacity map: discarded texels show
    the background (flat_twosided.frag semantics via alpha re-trace)."""
    import jax.numpy as jnp

    from glaze_tpu.core import (Camera, Material, MaterialType, Mesh,
                                MeshInstance, PerspectiveCam, Spectrum,
                                Texture, TextureFormat, TextureInfo,
                                Transform, Vertex)
    from glaze_tpu.parser import Meta
    from glaze_tpu.render.preview import FlatPreviewRenderer
    from glaze_tpu.scene import flatten_scene

    opa = np.zeros((8, 8), np.uint8)
    opa[:, 4:] = 255  # right half opaque

    class QuadScene:
        def vertices(self):
            return [Vertex([x, y, 0.0], [0, 0, 1], [u, v])
                    for (x, y, u, v) in [(-1, -1, 0, 0), (1, -1, 1, 0),
                                         (1, 1, 1, 1), (-1, 1, 0, 1)]]

        def meshes(self):
            return [Mesh(0, [0, 1, 2, 0, 2, 3], 1)]

        def transforms(self):
            return [Transform.identity()]

        def instances(self):
            return [MeshInstance(0, 0)]

        def cameras(self):
            return [Camera.Perspective(PerspectiveCam(
                position=[0.0, 0.0, 3.0], target=[0.0, 0.0, 0.0],
                up=[0.0, 1.0, 0.0]))]

        def textures(self):
            return [Texture.default(),
                    Texture(TextureInfo("opa", 8, 8, TextureFormat.Gray),
                            [opa])]

        def materials(self):
            return [Material(),
                    Material(name="two", mtype=MaterialType.LAMBERT,
                             diffuse_mul=(255, 0, 0), opacity=1)]

        def lights(self):
            return []

        def meta(self):
            return Meta(scene_centre=[0, 0, 0], scene_radius=4.0,
                        exposure=1.0)

    scene, camera, host = flatten_scene(QuadScene())
    r = FlatPreviewRenderer(scene, camera=camera, width=32, height=32,
                            host=host)
    assert r._alpha_rounds > 0
    img = r.get_image()
    # the quad projects to roughly columns 11..21, rows 12..21; its +x
    # (opaque, red) side lands on columns >= 16, the -x side discards to
    # the black background
    left = img[13:20, 11:15].mean()
    right = img[13:20, 17:21, 0].mean()
    assert right > 80 and left < 5, (left, right)


def test_preview_mip_selection_reduces_minification_aliasing():
    """Footprint-based mip selection in the raster preview (the
    reference's hardware trilinear over the blitted mip chain,
    texture.rs:96-235 + scene.rs:1012+): a checkerboard at a grazing
    view must alias far LESS with the mip chain than with mip 0 only,
    at a similar mean (the chain converges to the checker average)."""
    import numpy as np

    from glaze_tpu.core import (Camera, Light, LightType, Material,
                                MaterialType, Mesh, MeshInstance,
                                PerspectiveCam, Texture, TextureFormat,
                                TextureInfo, Transform, Vertex)
    from glaze_tpu.core.texture import gen_mipmaps_np
    from glaze_tpu.parser import Meta
    from glaze_tpu.render.preview import FlatPreviewRenderer
    from glaze_tpu.scene import flatten_scene

    n = 256
    i = np.arange(n)
    chk = ((i[:, None] // 8 + i[None, :] // 8) % 2).astype(np.uint8)
    img = np.zeros((n, n, 4), np.uint8)
    img[..., :3] = np.where(chk[..., None] > 0, 255, 0)
    img[..., 3] = 255
    mips = gen_mipmaps_np(img)

    def scene(levels):
        class S:
            def vertices(self):
                vs = []
                for p, uv in (([-50, 0, -100], [0, 0]),
                              ([50, 0, -100], [100, 0]),
                              ([50, 0, 2], [100, 100]),
                              ([-50, 0, 2], [0, 100])):
                    vs.append(Vertex(np.asarray(p, np.float32),
                                     np.asarray([0, 1, 0], np.float32),
                                     np.asarray(uv, np.float32)))
                return vs

            def meshes(self):
                return [Mesh(0, [0, 1, 2, 0, 2, 3], 0)]

            def transforms(self):
                return [Transform.identity()]

            def instances(self):
                return [MeshInstance(0, 0)]

            def cameras(self):
                return [Camera.Perspective(PerspectiveCam(
                    position=[0, 1.0, 0], target=[0, 0.5, -20],
                    up=[0, 1, 0]))]

            def textures(self):
                return [Texture.default(),
                        Texture(TextureInfo("chk", n, n,
                                            TextureFormat.RgbaSrgb),
                                levels)]

            def materials(self):
                return [Material(name="floor", mtype=MaterialType.LAMBERT,
                                 diffuse=1)]

            def lights(self):
                return [Light(ltype=LightType.OMNI, position=[0, 5, 0],
                              intensity=5.0)]

            def meta(self):
                return Meta(scene_centre=[0, 0, -10], scene_radius=60.0,
                            exposure=1.0)

        return S()

    def render(levels):
        sc, cam, host = flatten_scene(scene(levels))
        r = FlatPreviewRenderer(sc, camera=cam, width=96, height=64,
                                host=host)
        return r.get_image().astype(float)

    full = render(mips)
    mip0 = render([mips[0]])
    strip = slice(28, 40)  # distant floor rows, just below the horizon
    assert full[strip].std() < 0.6 * mip0[strip].std(), (
        full[strip].std(), mip0[strip].std())
    assert abs(full[strip].mean() - mip0[strip].mean()) < 15.0
