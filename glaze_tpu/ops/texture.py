"""Bindless-equivalent texture sampling on device.

The reference binds every texture in a descriptor array and samples with
hardware linear filtering (``scene.rs`` binding 6). The TPU design packs
level 0 of every texture into ONE flat uint32 array (RGBA8 packed little-
endian: R | G<<8 | B<<16 | A<<24) plus per-texture metadata rows, and
samples with ONE row gather + bilinear weights: every atlas row stores
the texel AND its full 2x2 wrap-around neighborhood, so a single (T, 4)
row gather yields all four bilinear taps (single-element gathers fuse
into multi-ms serial TPU ops; row gathers are the fast form, and their
cost is per-ROW — ~20 ns/row regardless of width — so one 4-wide gather
beats two 2-wide ones). sRGB decode happens per-texel before filtering,
matching Vulkan's behavior for *_SRGB formats.

Atlas pytree fields (all jax.Array):
  texels  (T, 4) uint32 packed RGBA8 [self, right, down, down-right]
          (REPEAT wrap on both axes)
  offset  (N,)  int32 start of each texture's LEVEL 0 in ``texels``
  width   (N,)  int32 level-0 width
  height  (N,)  int32 level-0 height
  srgb    (N,)  float32 1.0 if the RGB channels are sRGB encoded
  mip_base   (N,) int32 first row of the texture's mip table
  mip_count  (N,) int32 levels available (>= 1)
  mip_offset (M,) int32 per-(texture, level) start in ``texels``
  mip_width  (M,) int32
  mip_height (M,) int32

The full mip chains (serialized per-mip in the .glaze format,
texture.rs:96-235) are packed alongside level 0, so the raster preview
can select a level from its screen-space footprint the way the
reference's hardware trilinear sampler does (VK mip chain blit,
scene.rs:1012+). The path-tracing hot path keeps sampling level 0 —
matching the reference, whose callable-stage ``texture()`` has no
derivatives.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class TextureAtlas(NamedTuple):
    texels: jnp.ndarray
    offset: jnp.ndarray
    width: jnp.ndarray
    height: jnp.ndarray
    srgb: jnp.ndarray
    mip_base: jnp.ndarray
    mip_count: jnp.ndarray
    mip_offset: jnp.ndarray
    mip_width: jnp.ndarray
    mip_height: jnp.ndarray


def build_atlas(textures) -> TextureAtlas:
    """Packs level 0 of each :class:`glaze_tpu.core.texture.Texture`.

    Texture ids in materials index this list directly (id 0 = the default
    1x1 white texture the reference also keeps at slot 0).
    """
    from glaze_tpu.core.texture import TextureFormat

    offsets, widths, heights, srgbs = [], [], [], []
    mip_base, mip_count = [], []
    mip_offset, mip_width, mip_height = [], [], []
    levels = [[tex.array(k) for k in range(len(tex.data))]
              for tex in textures]
    total = sum(a.shape[0] * a.shape[1] for ls in levels for a in ls)
    if not levels:
        z1 = lambda v: jnp.asarray(np.asarray([v], np.int32))
        return TextureAtlas(
            texels=jnp.asarray(np.full((1, 4), 0xFFFFFFFF, np.uint32)),
            offset=z1(0), width=z1(1), height=z1(1),
            srgb=jnp.asarray(np.asarray([0.0], np.float32)),
            mip_base=z1(0), mip_count=z1(1),
            mip_offset=z1(0), mip_width=z1(1), mip_height=z1(1),
        )
    # One calloc'd slab filled in ~64k-texel row chunks: fresh >=32 MB numpy
    # temps on this host fault in at ~6 MB/s, so the old per-texture
    # astype/roll/stack/concat temps dominated setup for MB-scale textures.
    out = np.zeros((total, 4), np.uint32)
    pos = 0
    for tex, ls in zip(textures, levels):
        gray = tex.format() == TextureFormat.Gray
        mip_base.append(len(mip_offset))
        mip_count.append(len(ls))
        for lvl, arr in enumerate(ls):
            h, w = arr.shape[0], arr.shape[1]
            dst = out[pos:pos + h * w].reshape(h, w, 4)
            step = max(1, 65536 // max(w, 1))
            for s in range(0, h, step):
                e = min(s + step, h)
                rows = np.arange(s, e + 1)
                rows[-1] %= h  # REPEAT wrap for the 'down' neighborhood row
                blk = arr[rows]
                a = blk.astype(np.uint32)
                if gray:
                    packed = a | (a << 8) | (a << 16) | np.uint32(255 << 24)
                else:
                    packed = a[..., 0] | (a[..., 1] << 8) | (a[..., 2] << 16) | (a[..., 3] << 24)
                right = np.concatenate([packed[:, 1:], packed[:, :1]], axis=1)
                dst[s:e, :, 0] = packed[:-1]
                dst[s:e, :, 1] = right[:-1]
                dst[s:e, :, 2] = packed[1:]
                dst[s:e, :, 3] = right[1:]
            if lvl == 0:
                offsets.append(pos)
                widths.append(w)
                heights.append(h)
                srgbs.append(1.0 if tex.format() == TextureFormat.RgbaSrgb
                             else 0.0)
            mip_offset.append(pos)
            mip_width.append(w)
            mip_height.append(h)
            pos += w * h
    i32 = lambda a: jnp.asarray(np.asarray(a, np.int32))
    return TextureAtlas(
        texels=jnp.asarray(out),
        offset=i32(offsets), width=i32(widths), height=i32(heights),
        srgb=jnp.asarray(np.asarray(srgbs, np.float32)),
        mip_base=i32(mip_base), mip_count=i32(mip_count),
        mip_offset=i32(mip_offset), mip_width=i32(mip_width),
        mip_height=i32(mip_height),
    )


def _unpack(p):
    """uint32 -> (..., 4) float in [0, 1]."""
    p = p.astype(jnp.uint32)
    r = (p & jnp.uint32(0xFF)).astype(jnp.float32)
    g = ((p >> jnp.uint32(8)) & jnp.uint32(0xFF)).astype(jnp.float32)
    b = ((p >> jnp.uint32(16)) & jnp.uint32(0xFF)).astype(jnp.float32)
    a = ((p >> jnp.uint32(24)) & jnp.uint32(0xFF)).astype(jnp.float32)
    return jnp.stack([r, g, b, a], axis=-1) * jnp.float32(1.0 / 255.0)


def srgb_to_linear(c):
    """Per-channel sRGB EOTF (texel decode)."""
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(c):
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1.0 / 2.4) - 0.055)


def sample_rgba(atlas: TextureAtlas, tex_id, uv):
    """Bilinear RGBA fetch at mip 0 with REPEAT wrap.

    ``tex_id``: (...,) int32; ``uv``: (..., 2). Returns (..., 4) linear.
    """
    tex_id = jnp.asarray(tex_id, jnp.int32)
    off = atlas.offset[tex_id]
    w = atlas.width[tex_id]
    h = atlas.height[tex_id]
    srgb = atlas.srgb[tex_id]
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)

    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    x = u * wf - 0.5
    y = v * hf - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def wrap(i, n):
        return jnp.remainder(i.astype(jnp.int32), n)

    x0i = wrap(x0, w)
    y0i = wrap(y0, h)

    # ONE (T, 4) row gather: the 2x2 bilinear neighborhood
    quad = atlas.texels[off + y0i * w + x0i]

    def tap(k):
        texel = _unpack(quad[..., k])
        rgb = texel[..., :3]
        rgb = jnp.where(srgb[..., None] > 0.5, srgb_to_linear(rgb), rgb)
        return jnp.concatenate([rgb, texel[..., 3:]], axis=-1)

    c00, c10, c01, c11 = tap(0), tap(1), tap(2), tap(3)
    top = c00 * (1.0 - fx) + c10 * fx
    bot = c01 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy


def sample_rgb(atlas: TextureAtlas, tex_id, uv):
    return sample_rgba(atlas, tex_id, uv)[..., :3]


def sample_r(atlas: TextureAtlas, tex_id, uv):
    """.r channel fetch (roughness/metalness/opacity maps)."""
    return sample_rgba(atlas, tex_id, uv)[..., 0]


# ---------------------------------------------------------------------------
# SoA layout: uv as (u, v) tuple of (R,); returns per-channel (R,) arrays.
# ---------------------------------------------------------------------------


def sample_rgba_v(atlas: TextureAtlas, tex_id, u, v):
    """Bilinear RGBA fetch at mip 0, REPEAT wrap; returns (r, g, b, a)."""
    tex_id = jnp.asarray(tex_id, jnp.int32)
    off = atlas.offset[tex_id]
    w = atlas.width[tex_id]
    h = atlas.height[tex_id]
    srgb = atlas.srgb[tex_id] > 0.5
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)

    u = u - jnp.floor(u)
    v = v - jnp.floor(v)
    x = u * wf - 0.5
    y = v * hf - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def wrap(i, n):
        return jnp.remainder(i.astype(jnp.int32), n)

    x0i = wrap(x0, w)
    y0i = wrap(y0, h)

    # ONE (T, 4) row gather: the full 2x2 bilinear neighborhood (element
    # gathers fuse into serial multi-ms ops; gather cost is per-row)
    quad = atlas.texels[off + y0i * w + x0i]
    s = jnp.float32(1.0 / 255.0)

    def tap(k):
        p = quad[:, k].astype(jnp.uint32)
        r = (p & jnp.uint32(0xFF)).astype(jnp.float32) * s
        g = ((p >> jnp.uint32(8)) & jnp.uint32(0xFF)).astype(jnp.float32) * s
        b = ((p >> jnp.uint32(16)) & jnp.uint32(0xFF)).astype(jnp.float32) * s
        a = ((p >> jnp.uint32(24)) & jnp.uint32(0xFF)).astype(jnp.float32) * s
        r = jnp.where(srgb, srgb_to_linear(r), r)
        g = jnp.where(srgb, srgb_to_linear(g), g)
        b = jnp.where(srgb, srgb_to_linear(b), b)
        return (r, g, b, a)

    c00, c10, c01, c11 = tap(0), tap(1), tap(2), tap(3)

    def lerp2(k):
        top = c00[k] * (1.0 - fx) + c10[k] * fx
        bot = c01[k] * (1.0 - fx) + c11[k] * fx
        return top * (1.0 - fy) + bot * fy

    return lerp2(0), lerp2(1), lerp2(2), lerp2(3)


def sample_rgb_v(atlas: TextureAtlas, tex_id, u, v):
    r, g, b, _ = sample_rgba_v(atlas, tex_id, u, v)
    return r, g, b


def sample_r_v(atlas: TextureAtlas, tex_id, u, v):
    return sample_rgba_v(atlas, tex_id, u, v)[0]


def sample_rgb_lod_v(atlas: TextureAtlas, tex_id, u, v, lod):
    """Trilinear fetch: bilinear at floor(lod) and ceil(lod), lerped.

    ``lod`` is a per-lane float mip level (0 = full res); clamped to the
    texture's available chain. Two (T, 4) row gathers — used by the
    raster preview's footprint-based mip selection (the reference gets
    this from the hardware sampler over its blitted mip chain,
    texture.rs:96-235 + scene.rs:1012+). Returns (r, g, b).
    """
    tex_id = jnp.asarray(tex_id, jnp.int32)
    base = atlas.mip_base[tex_id]
    count = atlas.mip_count[tex_id]
    lod = jnp.clip(lod, 0.0, (count - 1).astype(jnp.float32))
    l0 = jnp.floor(lod)
    frac = lod - l0
    l0i = l0.astype(jnp.int32)
    l1i = jnp.minimum(l0i + 1, count - 1)
    srgb = atlas.srgb[tex_id] > 0.5

    def level(li):
        row = base + li
        off = atlas.mip_offset[row]
        w = atlas.mip_width[row]
        h = atlas.mip_height[row]
        wf = w.astype(jnp.float32)
        hf = h.astype(jnp.float32)
        uu = u - jnp.floor(u)
        vv = v - jnp.floor(v)
        x = uu * wf - 0.5
        y = vv * hf - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        x0i = jnp.remainder(x0.astype(jnp.int32), w)
        y0i = jnp.remainder(y0.astype(jnp.int32), h)
        quad = atlas.texels[off + y0i * w + x0i]
        s = jnp.float32(1.0 / 255.0)

        def tap(k):
            p = quad[:, k].astype(jnp.uint32)
            r = (p & jnp.uint32(0xFF)).astype(jnp.float32) * s
            g = ((p >> jnp.uint32(8)) & jnp.uint32(0xFF)).astype(jnp.float32) * s
            b = ((p >> jnp.uint32(16)) & jnp.uint32(0xFF)).astype(jnp.float32) * s
            r = jnp.where(srgb, srgb_to_linear(r), r)
            g = jnp.where(srgb, srgb_to_linear(g), g)
            b = jnp.where(srgb, srgb_to_linear(b), b)
            return (r, g, b)

        c00, c10, c01, c11 = tap(0), tap(1), tap(2), tap(3)

        def lerp2(k):
            top = c00[k] * (1.0 - fx) + c10[k] * fx
            bot = c01[k] * (1.0 - fx) + c11[k] * fx
            return top * (1.0 - fy) + bot * fy

        return lerp2(0), lerp2(1), lerp2(2)

    a = level(l0i)
    b = level(l1i)
    return tuple(ca + frac * (cb - ca) for ca, cb in zip(a, b))
