"""The wavefront path-tracing integrator (SoA layout).

TPU port of ``path_trace.rgen``: one ``launch_step`` advances EVERY pixel's
light path by exactly one bounce, carrying the PTLastVertex-equivalent
state between launches (raytrace_structures.rs:91-95). ``draw(spp)`` runs
``spp * PT_STEPS`` launches (Integrator::steps_per_sample,
raytracer.rs:80-86); the DIRECT integrator is the same step compiled with
``direct_only=True`` (the reference's ``-DDIRECT_ONLY`` shader variant,
build.rs:26-29).

Accumulation math matches the reference exactly: every launch increments
every pixel's sample count and adds that launch's NEE/miss radiance
(update_count/update_result, path_trace.rgen:119-133); the displayed image
is ``rgb(sum) * exposure / count``.

Data layout is TPU-native structure-of-arrays: VPU lanes run along the
pixel axis. Positions/directions are (x, y, z) tuples of (R,) arrays,
spectra are (16, R). (An (R, 3) layout measured ~40x slower on
elementwise math: 125 of 128 lanes idle.)

The RNG is the reference's PCG hash chain, seeded per
(frame seed, pixel) — ``srand(vec3(seed, gl_LaunchID.xy))``. Draw ORDER
differs from the GLSL in one way: the reference skips some draws in
branches not taken; we draw unconditionally to keep the lane-parallel
stream aligned. This changes sample positions, not distributions.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from glaze_tpu import accel
from glaze_tpu.ops import rng as rng_mod
from glaze_tpu.ops import shading
from glaze_tpu.ops import spectra
from glaze_tpu.ops import texture as tx
from glaze_tpu.ops import vec
from glaze_tpu.render import bsdf as bsdf_mod
from glaze_tpu.render import lights as lights_mod
from glaze_tpu.scene import flatten as fl

PT_STEPS = 6  # raytrace_structures.rs:87

# When a list is installed here (see tools/capture_rays.py), launch_step
# appends the PRE-SORT inputs of each trace phase as dicts of arrays at
# TRACE time, so a jitted wrapper can return them as outputs. None (the
# default) is free: the checks are Python-level and trace away.
_capture_sink = None
RUSSIAN_ROULETTE = PT_STEPS // 2  # path_trace.rgen:11
INV_2PI = np.float32(0.1591549)
INV_PI = np.float32(0.3183099)


class PathState(NamedTuple):
    """Per-pixel path state + accumulation image. SoA: every leaf's LAST
    axis is the pixel axis (so meshes shard it uniformly)."""

    importance: jnp.ndarray  # (16, P)
    origin: tuple  # 3 x (P,)
    direction: tuple  # 3 x (P,)
    bounce: jnp.ndarray  # (P,) float32 (hit.w in the reference)
    last_specular: jnp.ndarray  # (P,) float32 (wi.w in the reference)
    accum: tuple  # 3 x (P,) radiance sum (RGB)
    count: jnp.ndarray  # (P,) sample count
    # per-lane path (sample) index: increments when the lane REGENERATES
    # a camera ray. The low-discrepancy sampler indexes each pixel's
    # stratified point stream with it; dead weight (zeros) under the
    # default PCG sampler. Appended (with ``sq``) AFTER the reference
    # fields so older checkpoints load with zero shims
    # (renderer.load_checkpoint).
    path_no: jnp.ndarray  # (P,) uint32
    # sum of squared per-launch luminance contributions: with (accum,
    # count) this yields each pixel's estimator variance on device —
    # the adaptive sampler's stopping statistic (tile_error below)
    sq: jnp.ndarray  # (P,) float32


def init_state(width: int, height: int, sif: int = 1) -> PathState:
    """``sif`` samples-in-flight: the wavefront carries sif independent
    path states per pixel (lane layout = sif copies of the swizzled
    pixel grid back to back). A denser wavefront packs more
    spatially-close rays into each Morton-sorted 128-lane row, cutting
    the row-union factor (measured: 2x density = 1.11x closest / 1.43x
    any-hit per-ray, tools/bench_density.py)."""
    p = pixel_count(width, height) * sif
    z = lambda: jnp.zeros((p,), jnp.float32)
    return PathState(
        importance=jnp.zeros((16, p), jnp.float32),
        origin=(z(), z(), z()),
        direction=(z(), z(), z()),
        bounce=z(),
        last_specular=z(),
        accum=(z(), z(), z()),
        count=z(),
        path_no=jnp.zeros((p,), jnp.uint32),
        sq=z(),
    )


def camera_matrices(camera, width: int, height: int):
    """(camera2world, screen2camera) push constants
    (build_push_constants, raytracer.rs:1098-1120)."""
    view_inv = np.linalg.inv(camera.look_at_rh()).astype(np.float32)
    proj = camera.projection(width, height).copy()
    proj[1, 1] *= -1.0  # Vulkan clip-space flip
    proj_inv = np.linalg.inv(proj).astype(np.float32)
    return view_inv, proj_inv


# Ray order is tile-swizzled: each traversal packet (PACKET_ROWS*128 = 2048
# consecutive rays) covers one TILE_W x TILE_H image tile instead of a
# W x 4 scanline sliver — packet traversal visits the union of its rays'
# nodes, so square-ish tiles cut visits substantially. Dimensions that
# don't divide are padded; the padding rays render garbage that
# render_image crops.
TILE_W = 128
TILE_H = 16
if os.environ.get("GLAZE_TILE"):
    # A/B knob: packets visit the union of their rays' nodes, so tile
    # ASPECT trades lane-gather friendliness (wide) against union size
    # (square) — squarer tiles matter most at small render scales where
    # a 128x16 tile spans a third of the frame. Product must stay one
    # packet (2048 rays).
    TILE_W, TILE_H = (int(x) for x in os.environ["GLAZE_TILE"].split("x"))
    if TILE_W * TILE_H != 2048:  # not assert: must survive python -O
        raise ValueError("GLAZE_TILE must multiply to 2048 (one packet)")


# Coherent sampling: lanes share PCG chains so bounce directions from
# locally-flat geometry and NEE shadow rays toward the shared light
# sample become row-coherent after the Morton trace sort, shrinking the
# 128-lane row-union factor that bounds the walk+drain phases (measured
# 2.4x on the 1080p bench headline, docs/PERF_LOG.md).
#   1 = frame-shared: srand(seed, copy, copy) — every pixel of a launch
#       draws the same light pick / light sample / BSDF uvw.
#   2 = tile-shared: srand(seed, tile_id, copy) — one chain per 2048-ray
#       packet tile, so the image gets an independent noise realization
#       per tile (blotches bounded to tile size) at most of mode 1's win.
# Per-pixel estimates stay unbiased with UNCHANGED per-pixel variance
# (samples are still independent ACROSS launches; sharing randoms across
# lanes only correlates pixels spatially — the reference already shares
# the sub-pixel jitter frame-wide the same way, raytracer.rs:1161-1206).
#
# The mode is a PER-CALL static argument of launch_step/render_steps
# (renderers ship different defaults: frame for offline, tile for
# interactive — render/renderer.py default_coherent). The module global
# below is only the fallback for callers that don't pass one; the
# GLAZE_COHERENT env var pins it AND the renderer defaults for A/Bs.
COHERENT = int(os.environ.get("GLAZE_COHERENT", "0") or "0")


def resolve_coherent(mode) -> int:
    """None -> the module default; 'off'/'frame'/'tile' or 0/1/2 -> int."""
    if mode is None:
        return COHERENT
    if isinstance(mode, str):
        try:
            mode = {"off": 0, "frame": 1, "tile": 2}[mode]
        except KeyError:
            raise ValueError(
                f"coherent mode {mode!r}: expected off, frame or tile"
            ) from None
    mode = int(mode)
    if mode not in (0, 1, 2):
        raise ValueError("coherent mode must be 0 (off), 1 (frame) or "
                         "2 (tile)")
    return mode


def set_coherent(mode: int) -> bool:
    """Switches the module-DEFAULT coherent mode at runtime (legacy
    global form — renderers now carry their own ``coherent`` attribute
    and switching that needs no cache work, since the mode is a static
    jit argument).

    The default is baked into executables traced with coherent=None, so
    a change drops the jit caches — the next frame of every live
    renderer still relying on the default recompiles (~20-40 s cold,
    instant from the persistent cache). Returns True when the mode
    actually changed."""
    global COHERENT
    mode = resolve_coherent(int(mode))
    if mode == COHERENT:
        return False
    COHERENT = mode
    import jax

    jax.clear_caches()
    return True


def padded_dims(width: int, height: int):
    pw = -(-width // TILE_W) * TILE_W
    ph = -(-height // TILE_H) * TILE_H
    return pw, ph


def pixel_count(width: int, height: int) -> int:
    pw, ph = padded_dims(width, height)
    return pw * ph


def pixel_coords_np(width: int, height: int):
    """Tile-swizzled (px, py) int32 numpy coords over the padded grid."""
    pw, ph = padded_dims(width, height)
    i = np.arange(pw * ph, dtype=np.int64)
    tiles_x = pw // TILE_W
    tile = i // (TILE_W * TILE_H)
    within = i % (TILE_W * TILE_H)
    px = (tile % tiles_x) * TILE_W + within % TILE_W
    py = (tile // tiles_x) * TILE_H + within // TILE_W
    return px.astype(np.int32), py.astype(np.int32)


def pixel_coords(width: int, height: int):
    """Tile-swizzled (px, py) float32 launch coordinates, each (P',)."""
    px, py = pixel_coords_np(width, height)
    return jnp.asarray(px, jnp.float32), jnp.asarray(py, jnp.float32)


def sif_lanes(width: int, height: int, sif: int):
    """(px, py, rng_py) lane coordinates for a sif-samples-in-flight
    wavefront: sif tiled copies of the swizzled pixel grid back to back,
    with ``rng_py`` offset past the padded grid so no two in-flight
    copies share an srand chain (rng_py is None at sif=1). The single
    source of truth for the sif lane layout — bench.py's capture path
    must match it."""
    px, py = pixel_coords(width, height)
    if sif == 1:
        return px, py, None
    p1 = px.shape[0]
    px = jnp.tile(px, sif)
    py = jnp.tile(py, sif)
    _, ph = padded_dims(width, height)
    rng_py = py + jnp.repeat(jnp.arange(sif, dtype=jnp.float32) * ph, p1)
    return px, py, rng_py


def camera_rays(ndc_x, ndc_y, cam2world, screen2cam, is_persp: bool):
    """Primary ray origins/directions (path_trace.rgen:47-74), SoA."""
    c = cam2world
    s = screen2cam
    one = jnp.ones_like(ndc_x)
    zero = jnp.zeros_like(ndc_x)
    if is_persp:
        # origin = cam2world @ (0,0,0,1); target = screen2cam @ (ndc,1,1)
        origin = (c[0, 3] * one, c[1, 3] * one, c[2, 3] * one)
        tgt = (
            s[0, 0] * ndc_x + s[0, 1] * ndc_y + s[0, 2] + s[0, 3],
            s[1, 0] * ndc_x + s[1, 1] * ndc_y + s[1, 2] + s[1, 3],
            s[2, 0] * ndc_x + s[2, 1] * ndc_y + s[2, 2] + s[2, 3],
        )
    else:
        # origin = cam2world @ (ndc,0,1); target = screen2cam @ (0,0,1,1)
        origin = (
            c[0, 0] * ndc_x + c[0, 1] * ndc_y + c[0, 3],
            c[1, 0] * ndc_x + c[1, 1] * ndc_y + c[1, 3],
            c[2, 0] * ndc_x + c[2, 1] * ndc_y + c[2, 3],
        )
        tgt = ((s[0, 2] + s[0, 3]) * one, (s[1, 2] + s[1, 3]) * one,
               (s[2, 2] + s[2, 3]) * one)
    tgt = vec.normalize(tgt)
    direction = vec.normalize((
        c[0, 0] * tgt[0] + c[0, 1] * tgt[1] + c[0, 2] * tgt[2],
        c[1, 0] * tgt[0] + c[1, 1] * tgt[1] + c[1, 2] * tgt[2],
        c[2, 0] * tgt[0] + c[2, 1] * tgt[1] + c[2, 2] * tgt[2],
    ))
    return origin, direction


def _sky_radiance(scene, direction):
    """Environment lookup on miss (path_trace.rgen:76-84). Returns
    (r, g, b) of (R,)."""
    m = scene.sky_world2obj
    w = vec.normalize((
        m[0, 0] * direction[0] + m[0, 1] * direction[1] + m[0, 2] * direction[2],
        m[1, 0] * direction[0] + m[1, 1] * direction[1] + m[1, 2] * direction[2],
        m[2, 0] * direction[0] + m[2, 1] * direction[1] + m[2, 2] * direction[2],
    ))
    phi = jnp.arctan2(w[1], w[0])
    theta = jnp.arccos(jnp.clip(w[2], -1.0, 1.0))
    u = phi * INV_2PI
    v = theta * INV_PI
    tex = jnp.broadcast_to(scene.sky_tex, phi.shape)
    return tx.sample_rgb_v(scene.atlas, tex, u, v)


def _interpolate_hit(scene, hit):
    """The closest-hit shader: barycentric attribute interpolation + normal
    mapping (raytrace_hit.rchit). One fused gather fetches all attributes;
    geometry is already world-space."""
    tri = jnp.maximum(hit["tri"], 0)
    bu = hit["u"]
    bv = hit["v"]
    bw = 1.0 - bu - bv

    a = scene.tri_attr[tri]  # (R, 33) row gather

    def v3_at(col):
        return (a[:, col], a[:, col + 1], a[:, col + 2])

    v0 = v3_at(fl.ATTR_V0)
    e1 = v3_at(fl.ATTR_E1)
    e2 = v3_at(fl.ATTR_E2)
    point = vec.add(v0, vec.add(vec.scale(e1, bu), vec.scale(e2, bv)))

    n0 = v3_at(fl.ATTR_N0)
    n1 = v3_at(fl.ATTR_N1)
    n2 = v3_at(fl.ATTR_N2)
    shading_n = vec.normalize(vec.add(
        vec.scale(n0, bw), vec.add(vec.scale(n1, bu), vec.scale(n2, bv))
    ))
    u = (bw * a[:, fl.ATTR_UV0] + bu * a[:, fl.ATTR_UV1]
         + bv * a[:, fl.ATTR_UV2])
    v = (bw * a[:, fl.ATTR_UV0 + 1] + bu * a[:, fl.ATTR_UV1 + 1]
         + bv * a[:, fl.ATTR_UV2 + 1])

    geom_n = v3_at(fl.ATTR_GN)
    dpdu = v3_at(fl.ATTR_DPDU)
    mat_id = a[:, fl.ATTR_MAT].astype(jnp.int32)

    # normal mapping (rchit:55-64); skipped entirely when no material in
    # the scene has a normal map (scene.tex_slots static specialization —
    # the atlas row-gather alone costs ~40 ms/launch at 1080p)
    if fl.MT_NORMAL in scene.tex_slots:
        normal_tex = scene.mat_tex[mat_id][:, fl.MT_NORMAL]
        has_nm = normal_tex != 0
        tr, tg, tb = tx.sample_rgb_v(scene.atlas, normal_tex, u, v)
        s_old = vec.normalize(dpdu)
        t_old = vec.normalize(vec.cross(shading_n, s_old))
        nx, ny, nz = tr * 2.0 - 1.0, tg * 2.0 - 1.0, tb * 2.0 - 1.0
        mapped = vec.normalize((
            s_old[0] * nx + t_old[0] * ny + shading_n[0] * nz,
            s_old[1] * nx + t_old[1] * ny + shading_n[1] * nz,
            s_old[2] * nx + t_old[2] * ny + shading_n[2] * nz,
        ))
        mapped = vec.scale(mapped, jnp.sign(vec.dot(geom_n, mapped)))
        shading_n = vec.where(has_nm, mapped, shading_n)

    return {
        "point": point,
        "shading_normal": shading_n,
        "geom_normal": geom_n,
        "dpdu": dpdu,
        "uv": (u, v),
        "material_id": mat_id,
    }


def _hit_alpha(scene, hit):
    """Opacity-map alpha at a hit (raytrace_hit.rahit semantics): 1.0 when
    the material has no opacity texture (slot 0 is the white default)."""
    tri = jnp.maximum(hit["tri"], 0)
    a = scene.tri_attr[tri]
    bu = hit["u"]
    bv = hit["v"]
    bw = 1.0 - bu - bv
    u = (bw * a[:, fl.ATTR_UV0] + bu * a[:, fl.ATTR_UV1]
         + bv * a[:, fl.ATTR_UV2])
    v = (bw * a[:, fl.ATTR_UV0 + 1] + bu * a[:, fl.ATTR_UV1 + 1]
         + bv * a[:, fl.ATTR_UV2 + 1])
    mat_id = a[:, fl.ATTR_MAT].astype(jnp.int32)
    opacity_tex = scene.mat_tex[mat_id][:, fl.MT_OPACITY]
    alpha = tx.sample_r(scene.atlas, opacity_tex, jnp.stack([u, v], -1))
    return jnp.where(opacity_tex != 0, alpha, 1.0)


def _octant_perm(direction):
    """Stable permutation grouping rays by direction octant (see
    _trace_perm for the stronger key used on the trace paths)."""
    key = (
        (direction[0] >= 0).astype(jnp.int32)
        | ((direction[1] >= 0).astype(jnp.int32) << 1)
        | ((direction[2] >= 0).astype(jnp.int32) << 2)
    )
    return jnp.argsort(key, stable=True)


def _spread3(x):
    """Spreads 5-bit ints so bits land 3 apart (Morton interleave)."""
    x = (x | (x << 8)) & 0x100F
    x = (x | (x << 4)) & 0x10C3
    x = (x | (x << 2)) & 0x1249
    return x


# "octant" = direction-octant only (stable, keeps pixel-tile order);
# "morton" = octant + 15-bit origin Morton. Replayed REAL bench-scene ray
# buffers through the exact kernel schedule (tools/sim_fatleaf.py on
# tools/capture_rays.py captures): morton cuts closest-phase walk rounds
# 2.7x and drain pairs 2.8x vs octant on incoherent bounce mixes; the
# round-2 "sorting ceiling 1.25x" memo was a mattest artifact.
SORT_MODE = os.environ.get("GLAZE_SORT", "morton")


def _trace_perm(scene, origin, direction, active=None, first=None):
    """Stable coherence sort for a trace phase: [inactive-last |
    candidates-first | direction octant | origin Morton]. Stability
    preserves pixel-tile order within equal keys. Inactive lanes (shadow
    rays whose NEE sample is unusable) compact to the tail so whole
    128-lane rows retire instead of idling inside mixed rows; ``first``
    lanes (alpha-tree candidates) compact to the HEAD so the alpha leg
    can run on a static prefix slice instead of the whole wavefront."""
    key = (
        (direction[0] >= 0).astype(jnp.int32)
        | ((direction[1] >= 0).astype(jnp.int32) << 1)
        | ((direction[2] >= 0).astype(jnp.int32) << 2)
    )
    if SORT_MODE == "morton":
        lo = scene.scene_centre - scene.scene_radius
        inv = 31.0 / jnp.maximum(2.0 * scene.scene_radius, 1e-20)
        m = jnp.int32(0)
        for i in range(3):
            q = jnp.clip(((origin[i] - lo[i]) * inv).astype(jnp.int32),
                         0, 31)
            m = m | (_spread3(q) << i)
        key = (key << 15) | m
    if first is not None:
        key = key | jnp.where(first, 0, jnp.int32(1) << 18)
    if active is not None:
        key = key | jnp.where(active, 0, jnp.int32(1) << 19)
    return jnp.argsort(key, stable=True)


def _alpha_candidates(scene, origin, direction, cap):
    """Lanes whose segment [T_MIN, cap] can touch alpha-tested geometry:
    elementwise slab tests against the (few) alpha cluster AABBs
    (scene.alpha_boxes). A miss here PROVES the alpha tree is
    irrelevant for the lane."""
    boxes = scene.alpha_boxes
    k = boxes.shape[0]
    inv = []
    for i in range(3):
        tiny = jnp.abs(direction[i]) < 1e-20
        inv.append(jnp.where(tiny, 1e20,
                             1.0 / jnp.where(tiny, 1.0, direction[i])))
    out = jnp.zeros(origin[0].shape, bool)
    for b in range(k):
        tn = jnp.full(origin[0].shape, 1e-4, jnp.float32)
        tf = cap
        for i in range(3):
            t0 = (boxes[b, i] - origin[i]) * inv[i]
            t1 = (boxes[b, i + 3] - origin[i]) * inv[i]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        out = out | (tn <= tf)
    return out


def _perm_rows(perm, arrays):
    """Applies ``perm`` to many (R,) arrays with ONE (R, K) row gather.

    XLA's TPU gather costs ~20 ns per ROW regardless of row width (it is
    op-overhead bound, not bandwidth bound — measured: a 1D f32 gather of
    1M elements 21 ms, a (1M, 34) row gather 11.5 ms), so permuting K
    arrays as one packed row gather is ~K× cheaper than K 1D gathers.
    The carrier dtype is int32: float columns ride as bitcast int bits.
    (The reverse — ints as f32 — corrupts: XLA's f32 data movement
    canonicalizes NaN payloads and flushes denormals, so small ints and
    -1 don't survive a float stack/gather. Integer movement is bitwise.)
    """
    cols = []
    for a in arrays:
        if a.dtype == jnp.bool_:
            a = a.astype(jnp.int32)
        elif a.dtype != jnp.int32:
            a = jax.lax.bitcast_convert_type(a, jnp.int32)
        cols.append(a)
    packed = jnp.stack(cols, axis=1)[perm]
    out = []
    for i, a in enumerate(arrays):
        c = packed[:, i]
        if a.dtype == jnp.bool_:
            c = c != 0
        elif a.dtype != jnp.int32:
            c = jax.lax.bitcast_convert_type(c, a.dtype)
        out.append(c)
    return out


def trace_alpha_sorted(scene, origin, direction, t_max=None,
                       alpha_rounds: int = 0):
    """trace_alpha with octant-partitioned packets (results in input
    order). Unsorting uses inverse-permutation GATHERS — scatters
    (.at[].set) fuse into multi-ms serial ops on TPU, gathers don't —
    and both directions pack all arrays into one row gather each
    (:func:`_perm_rows`)."""
    p_ = origin[0].shape[0]
    full_masked = _full_tree_masked(scene, alpha_rounds)
    split = (not full_masked and alpha_rounds > 0
             and getattr(scene, "bvh_alpha", None) is not None)
    ins = list(origin) + list(direction)
    act = None
    cap0 = None
    if t_max is not None:
        cap0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                                origin[0].shape)
        ins.append(cap0)
        act = cap0 > 0.0  # negative cap = lane culled by the caller
    cand = None
    if split:
        # alpha-leg candidate mask: lanes whose segment misses every
        # alpha cluster AABB carry cap -1 into the alpha leg (their
        # rows retire immediately); the sort stays pure Morton so the
        # OPAQUE walk keeps full coherence
        seg_cap = (cap0 if cap0 is not None
                   else jnp.full((p_,), np.inf, jnp.float32))
        cand = _alpha_candidates(scene, origin, direction, seg_cap)
        if act is not None:
            cand = cand & act
    # candidates-first compaction is only needed while the prefix
    # narrowing is on (GLAZE_ALPHA_PREFIX < 1): it splits the global
    # Morton stream in two, so don't pay it otherwise
    first = cand if (cand is not None and ALPHA_PREFIX < 1.0) else None
    perm = _trace_perm(scene, origin, direction, active=act, first=first)
    inv = jnp.argsort(perm)
    s = _perm_rows(perm, ins + ([cand] if cand is not None else []))
    o, d = tuple(s[0:3]), tuple(s[3:6])
    cap = s[6] if t_max is not None else None
    if not split:
        hit = trace_alpha(scene, o, d, cap, alpha_rounds)
    else:
        cand_s = s[-1]
        # opaque geometry: ONE plain closest-hit pass, full width
        if scene.bvh_opaque is not None:
            hit_o = accel.closest_hit_soa_auto(scene.bvh_opaque, o, d, cap)
            hit_o = _remap_hit(hit_o, scene.bvh_opaque_map)
        else:
            hit_o = _miss_hit(p_)
        cap_full = (cap if cap is not None
                    else jnp.full((p_,), np.inf, jnp.float32))
        cap_a = jnp.minimum(cap_full, hit_o["t"] + 1e-4)
        cap_a = jnp.where(cand_s, cap_a, -1.0)
        # masked walk at full width (candidates sorted to the head,
        # non-candidates culled by cap -1: their rows retire
        # immediately); the exact-texture re-test rounds run on the
        # candidate prefix only (_alpha_walk_refined). A static prefix
        # slice behind lax.cond measured ~6x SLOWER through this stack
        # — Pallas calls inside conditionals fall off the fast path —
        # so both legs stay unconditional.
        hit_a = _remap_hit(
            _alpha_walk_refined(scene, o, d, cap_a, alpha_rounds),
            scene.bvh_alpha_map)
        use_a = hit_a["t"] < hit_o["t"]
        hit = {k: jnp.where(use_a, hit_a[k], hit_o[k])
               for k in ("t", "tri", "u", "v")}
        if cap is not None:
            beyond = hit["t"] > cap
            hit = {
                "t": jnp.where(beyond, jnp.float32(np.inf), hit["t"]),
                "tri": jnp.where(beyond, -1, hit["tri"]),
                "u": hit["u"], "v": hit["v"],
            }
    keys = list(hit)  # keys drive the unsort: new hit fields ride along
    return dict(zip(keys, _perm_rows(inv, [hit[k] for k in keys])))


def _occlusion_sorted(scene, origin, direction, t_max, active,
                      alpha_rounds: int):
    """Alpha-aware shadow occlusion in ONE coherence-sorted pass.

    Full-tree baked opacity cells: a single masked any-hit walk blocks
    on OPAQUE-cell hits (early row exit intact), ignores TRANSPARENT
    cells, and reports MIXED-cell-only lanes as PENDING; only those run
    the alpha-tree accepted-hit resolution. Older scenes: early-exit
    any-hit against the OPAQUE tree + alpha-tree test for unblocked
    candidates. No split at all: whole-scene re-trace fallback."""
    use_masked = (_full_tree_masked(scene, alpha_rounds)
                  and accel.masked_anyhit_ok(scene.bvh))
    if alpha_rounds <= 0 or (getattr(scene, "bvh_alpha", None) is None
                             and not use_masked):
        sh = trace_alpha_sorted(scene, origin, direction,
                                t_max=jnp.where(active, t_max, -1.0),
                                alpha_rounds=alpha_rounds)
        return sh["tri"] >= 0
    p_ = origin[0].shape[0]
    cap = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                           origin[0].shape)
    if use_masked:
        # the pending-resolution below checks only the ALPHA tree, so
        # the 3-state kernel must really run (masked_anyhit_ok) — the
        # unmasked fallback's pending includes opaque blockers
        perm = _trace_perm(scene, origin, direction, active=active)
        inv = jnp.argsort(perm)
        s = _perm_rows(perm, list(origin) + list(direction)
                       + [cap, active])
        o, d, cap_s, act = tuple(s[0:3]), tuple(s[3:6]), s[6], s[7]
        blocked, pending = accel.any_hit_soa_masked_auto(
            scene.bvh, o, d, cap_s, active=act)
        probe = act & pending & ~blocked
        cap_a = jnp.where(probe, cap_s, -1.0)
        if getattr(scene, "bvh_alpha", None) is not None:
            # mixed triangles all live in the small alpha subset tree
            tri_a = _alpha_walk_refined(scene, o, d, cap_a,
                                        alpha_rounds)["tri"]
        else:
            # no subset tree (older scene / split rebuild pending):
            # resolve against the full masked tree instead
            tri_a = _full_masked_closest(scene, o, d, cap_a,
                                         alpha_rounds)["tri"]
        blocked = blocked | (probe & (tri_a >= 0))
        return blocked[inv]
    cand = _alpha_candidates(scene, origin, direction,
                             jnp.where(active, cap, -1.0)) & active
    first = cand if ALPHA_PREFIX < 1.0 else None
    perm = _trace_perm(scene, origin, direction, active=active, first=first)
    inv = jnp.argsort(perm)
    s = _perm_rows(perm, list(origin) + list(direction)
                   + [cap, active, cand])
    o, d, cap_s, act, cand_s = (tuple(s[0:3]), tuple(s[3:6]), s[6], s[7],
                                s[8])
    if scene.bvh_opaque is not None:
        blocked = accel.any_hit_soa_auto(scene.bvh_opaque, o, d, cap_s,
                                         active=act)
    else:
        blocked = jnp.zeros_like(act)
    probe = act & ~blocked & cand_s
    cap_a = jnp.where(probe, cap_s, -1.0)
    # masked walk full width, re-test rounds on the candidate prefix,
    # unconditional (see trace_alpha_sorted note on lax.cond)
    tri_a = _alpha_walk_refined(scene, o, d, cap_a, alpha_rounds)["tri"]
    blocked = blocked | (probe & (tri_a >= 0))
    return blocked[inv]


def _any_hit_sorted(scene, origin, direction, t_max, active):
    """Shadow trace with coherence-sorted packets (sky/light-sampled
    directions are incoherent in pixel order); inactive lanes compact to
    the tail so their rows retire immediately."""
    perm = _trace_perm(scene, origin, direction, active=active)
    inv = jnp.argsort(perm)
    cap = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                           origin[0].shape)
    s = _perm_rows(perm, list(origin) + list(direction) + [cap, active])
    tree = scene.bvh_any if scene.bvh_any is not None else scene.bvh
    hit = accel.any_hit_soa_auto(tree, tuple(s[0:3]), tuple(s[3:6]),
                                 s[6], active=s[7])
    return hit[inv]


def _remap_hit(hit, tri_map):
    """Subset-tree slot ids -> full-tree attribute rows (misses stay -1)."""
    tri = hit["tri"]
    g = tri_map[jnp.maximum(tri, 0)]
    return dict(hit, tri=jnp.where(tri >= 0, g, -1))


def _miss_hit(r):
    z = jnp.zeros((r,), jnp.float32)
    return {"t": jnp.full((r,), np.inf, jnp.float32),
            "tri": jnp.full((r,), -1, jnp.int32), "u": z, "v": z}


def _hit_alpha_attr(scene, attr, hit):
    """Opacity at a masked-walk hit via a fused (rows, 10) attribute
    table (``alpha_attr`` in alpha-tree slot order or
    ``alpha_attr_full`` in full-tree row order): one attribute gather +
    one atlas quad gather — the whole-scene path's three separate table
    gathers (tri_attr 34-col, mat_tex, atlas meta) fold in at flatten
    time. Math identical to _hit_alpha/sample_r (bilinear .r with sRGB
    decode). The table is an int32 carrier: uv columns are f32 bits,
    the atlas offset (col 6) a real int32 (exact beyond 2^24), w/h/srgb
    small ints."""
    slot = jnp.maximum(hit["tri"], 0)
    a = attr[slot]
    fcol = lambda i: jax.lax.bitcast_convert_type(a[:, i], jnp.float32)
    bu = hit["u"]
    bv = hit["v"]
    bw = 1.0 - bu - bv
    u = bw * fcol(0) + bu * fcol(2) + bv * fcol(4)
    v = bw * fcol(1) + bu * fcol(3) + bv * fcol(5)
    # zero rows (alpha_attr_full's never-texture-tested triangles) are
    # only reached by lanes whose alpha value is discarded; clamp the
    # extents so their dead computation stays finite
    wi = jnp.maximum(a[:, 7], 1)
    hi = jnp.maximum(a[:, 8], 1)
    w = wi.astype(jnp.float32)
    h = hi.astype(jnp.float32)
    srgb = a[:, 9] > 0
    u = u - jnp.floor(u)
    v = v - jnp.floor(v)
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = jnp.remainder(x0.astype(jnp.int32), wi)
    y0i = jnp.remainder(y0.astype(jnp.int32), hi)
    quad = scene.atlas.texels[a[:, 6] + y0i * wi + x0i]
    sc = jnp.float32(1.0 / 255.0)

    def tap(k):
        r = (quad[:, k].astype(jnp.uint32) & jnp.uint32(0xFF))             .astype(jnp.float32) * sc
        return jnp.where(srgb, tx.srgb_to_linear(r), r)

    c00, c10, c01, c11 = tap(0), tap(1), tap(2), tap(3)
    top = c00 * (1.0 - fx) + c10 * fx
    bot = c01 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy


def _alpha_retest_rounds(scene, origin, direction, cap, hit,
                         alpha_rounds: int, tree=None, alpha_fn=None):
    """The exact-texture re-test loop over a masked-walk hit dict (slot
    ids of ``tree``, with ``mixed`` flags). Only MIXED-cell hits are
    tested (the baked masks already resolved the rest in-kernel); a
    transparent test re-traces from just past the hit. Defaults to the
    alpha tree + its fused attribute table."""
    if tree is None:
        tree = scene.bvh_alpha
    if alpha_fn is None:
        if getattr(scene, "alpha_attr", None) is not None:
            alpha_fn = lambda h: _hit_alpha_attr(scene, scene.alpha_attr, h)
        else:
            alpha_fn = lambda h: _hit_alpha(
                scene, _remap_hit(h, scene.bvh_alpha_map))
    o = origin
    offset = jnp.zeros(origin[0].shape, jnp.float32)
    for _ in range(alpha_rounds):
        alpha = alpha_fn(hit)
        transparent = (hit["tri"] >= 0) & hit["mixed"] & (alpha < 0.5)
        step = jnp.where(transparent, hit["t"] - offset + 1e-3, 0.0)
        o = vec.where(transparent, vec.add(o, vec.scale(direction, step)), o)
        offset = offset + jnp.where(transparent, step, 0.0)
        re_cap = jnp.where(transparent, cap - offset, -1.0)
        rehit = accel.closest_hit_soa_masked_auto(tree, o, direction,
                                                  re_cap)
        hit = {
            "t": jnp.where(transparent, rehit["t"] + offset, hit["t"]),
            "tri": jnp.where(transparent, rehit["tri"], hit["tri"]),
            "u": jnp.where(transparent, rehit["u"], hit["u"]),
            "v": jnp.where(transparent, rehit["v"], hit["v"]),
            "mixed": jnp.where(transparent, rehit["mixed"], hit["mixed"]),
        }
    return hit


def _full_masked_closest(scene, origin, direction, cap, alpha_rounds: int,
                         uncapped: bool = False):
    """Single-walk closest leg over the full masked tree: one masked
    walk + exact-texture re-test rounds for MIXED-cell hits via
    alpha_attr_full (full-tree row order — no slot remap). Returns the
    usual hit dict (inf/-1 on miss or beyond ``cap``)."""
    hit = accel.closest_hit_soa_masked_auto(
        scene.bvh, origin, direction, None if uncapped else cap)
    hit = _alpha_retest_rounds(
        scene, origin, direction, cap, hit, alpha_rounds,
        tree=scene.bvh,
        alpha_fn=lambda h: _hit_alpha_attr(scene,
                                           scene.alpha_attr_full, h))
    beyond = hit["t"] > cap
    return {
        "t": jnp.where(beyond, jnp.float32(np.inf), hit["t"]),
        "tri": jnp.where(beyond, -1, hit["tri"]),
        "u": hit["u"], "v": hit["v"],
    }


def _full_tree_masked(scene, alpha_rounds: int) -> bool:
    """True when the main BVH carries baked opacity cells (single-walk
    closest leg: alpha tested INLINE like the reference's one-TLAS +
    rahit design)."""
    if alpha_rounds <= 0:
        return False
    tree = scene.bvh
    chunks = getattr(tree, "chunks", None)
    probe = chunks[0] if chunks else tree
    tri = getattr(probe, "tri", None)
    return (tri is not None and tri.ndim == 2 and tri.shape[1] > 9
            and getattr(scene, "alpha_attr_full", None) is not None)


# Width of the re-test rounds when the wavefront is sorted with alpha
# candidates first (trace_alpha_sorted / _occlusion_sorted): the rounds'
# full-width row gathers cost ~20 ns/lane each x 2 gathers x rounds x
# legs, and candidate lanes compact to the sorted HEAD, so running the
# rounds on a static prefix keeps them exact whenever the candidate
# fraction fits (bench scene: 0.24 at 1080p). MEASURED OFF (1.0) by
# default: the candidates-first key SPLITS the global Morton stream in
# two, and the resulting row-union inflation on the dominant opaque
# walk costs far more than the gathers it saves — same-session 1080p
# A/B (r5): bounce phase 1.98 -> 1.13 Mrays/s, launch 981 -> 1070 ms
# with prefix 0.5. Kept (with its exactness test) for scenes where the
# alpha set dominates the frame; see docs/PERF_LOG.md round 5.
ALPHA_PREFIX = float(os.environ.get("GLAZE_ALPHA_PREFIX", "1.0"))


def _alpha_prefix(n: int) -> int:
    if ALPHA_PREFIX >= 1.0:
        return n
    blk = 2048  # packet tile: keep whole tiles
    return int(min(n, max(blk, -(-int(n * ALPHA_PREFIX) // blk) * blk)))


def _alpha_walk_refined(scene, origin, direction, cap, alpha_rounds: int):
    """Masked alpha-tree walk at FULL width + re-test rounds on the
    candidate-first prefix. Returns a slot-space hit dict (inf/-1
    beyond ``cap`` or on miss). Callers must have sorted candidates to
    the head (``_trace_perm(first=cand)``) for the narrowing to be
    exact."""
    p_ = origin[0].shape[0]
    hit = accel.closest_hit_soa_masked_auto(scene.bvh_alpha, origin,
                                            direction, cap)
    if alpha_rounds > 0:
        p_pre = _alpha_prefix(p_)
        if p_pre < p_:
            pre = {k: hit[k][:p_pre] for k in hit}
            pre = _alpha_retest_rounds(
                scene, tuple(c[:p_pre] for c in origin),
                tuple(c[:p_pre] for c in direction), cap[:p_pre], pre,
                alpha_rounds)
            hit = {k: jnp.concatenate([pre[k], hit[k][p_pre:]])
                   for k in hit}
        else:
            hit = _alpha_retest_rounds(scene, origin, direction, cap,
                                       hit, alpha_rounds)
    beyond = hit["t"] > cap
    return {
        "t": jnp.where(beyond, jnp.float32(np.inf), hit["t"]),
        "tri": jnp.where(beyond, -1, hit["tri"]),
        "u": hit["u"], "v": hit["v"],
    }


def _alpha_tree_closest(scene, origin, direction, cap, alpha_rounds: int):
    """Closest ACCEPTED (opacity >= 0.5) hit inside the small alpha tree
    (global tri ids; t=inf / tri=-1 when none within ``cap``). The
    baked 8x8 opacity cell masks do most of the work IN the traversal
    kernel (provably-transparent hits are skipped mid-walk without
    consuming a round — raytrace_hit.rahit parity at kernel speed); the
    re-trace rounds only fire for hits on MIXED boundary cells, whose
    exact texture test costs two row gathers (_hit_alpha_attr).
    Slot->global remapping happens ONCE at exit. Runs the rounds at
    FULL width (no candidate sort assumed here)."""
    hit = accel.closest_hit_soa_masked_auto(scene.bvh_alpha, origin,
                                            direction, cap)
    if alpha_rounds > 0:
        hit = _alpha_retest_rounds(scene, origin, direction, cap, hit,
                                   alpha_rounds)
    beyond = hit["t"] > cap
    hit = {
        "t": jnp.where(beyond, jnp.float32(np.inf), hit["t"]),
        "tri": jnp.where(beyond, -1, hit["tri"]),
        "u": hit["u"], "v": hit["v"],
    }
    return _remap_hit(hit, scene.bvh_alpha_map)


def trace_alpha(scene, origin, direction, t_max=None, alpha_rounds: int = 0):
    """Closest hit with alpha-tested transparency (the reference's any-hit
    shader, raytrace_hit.rahit): hits whose opacity sample is < 0.5 are
    skipped by re-tracing from just past them, up to ``alpha_rounds``
    times. ``alpha_rounds=0`` (scenes without opacity maps) is a plain
    closest-hit trace.

    With full-tree baked opacity cells (scene.bvh payload +
    alpha_attr_full) the whole scene is traced in ONE masked walk —
    alpha is tested INLINE like the reference's single TLAS + rahit
    (classified cells resolve in-kernel; only MIXED boundary-cell hits
    pay the exact-texture re-test rounds). Older scenes fall back to
    the opaque/alpha tree split (acceleration.rs:137-141 OPAQUE-flag
    parity as two trees), then to the whole-scene re-trace loop.
    """
    if _full_tree_masked(scene, alpha_rounds):
        r = origin[0].shape[0]
        cap = jnp.full((r,), np.inf, jnp.float32)
        if t_max is not None:
            cap = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
        return _full_masked_closest(scene, origin, direction, cap,
                                    alpha_rounds,
                                    uncapped=t_max is None)
    if alpha_rounds > 0 and getattr(scene, "bvh_alpha", None) is not None:
        r = origin[0].shape[0]
        cap = jnp.full((r,), np.inf, jnp.float32)
        if t_max is not None:
            cap = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
        if scene.bvh_opaque is not None:
            hit_o = accel.closest_hit_soa_auto(
                scene.bvh_opaque, origin, direction,
                None if t_max is None else cap)
            hit_o = _remap_hit(hit_o, scene.bvh_opaque_map)
        else:
            hit_o = _miss_hit(r)
        # alpha hits beyond the nearest opaque hit are irrelevant; the
        # epsilon keeps an exactly-coincident alpha surface testable
        cap_a = jnp.minimum(cap, hit_o["t"] + 1e-4)
        hit_a = _alpha_tree_closest(scene, origin, direction, cap_a,
                                    alpha_rounds)
        use_a = hit_a["t"] < hit_o["t"]
        hit = {k: jnp.where(use_a, hit_a[k], hit_o[k])
               for k in ("t", "tri", "u", "v")}
        if t_max is not None:
            beyond = hit["t"] > cap
            hit = {
                "t": jnp.where(beyond, jnp.float32(np.inf), hit["t"]),
                "tri": jnp.where(beyond, -1, hit["tri"]),
                "u": hit["u"], "v": hit["v"],
            }
        return hit
    r = origin[0].shape[0]
    cap = jnp.full((r,), np.inf, jnp.float32)
    if t_max is not None:
        cap = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    # the t_max cap applies to the INITIAL trace too (traceRayEXT tMax,
    # path_trace.rgen:108-110) — not only to the alpha re-traces
    hit = accel.closest_hit_soa_auto(scene.bvh, origin, direction,
                                     None if t_max is None else cap)
    if alpha_rounds <= 0:
        return hit
    o = origin
    offset = jnp.zeros((r,), jnp.float32)  # accumulated skip distance
    for _ in range(alpha_rounds):
        alpha = _hit_alpha(scene, hit)
        transparent = (hit["tri"] >= 0) & (alpha < 0.5)
        # advance past the transparent hit and re-trace only those lanes;
        # hit["t"] is a distance from the ORIGINAL origin while ``o`` is
        # already ``offset`` along the ray, so step by the remainder only
        step = jnp.where(transparent, hit["t"] - offset + 1e-3, 0.0)
        o = vec.where(transparent, vec.add(o, vec.scale(direction, step)), o)
        offset = offset + jnp.where(transparent, step, 0.0)
        # inactive lanes: cap -1 culls the packet walk immediately;
        # active lanes keep honoring the remaining t_max budget
        re_cap = jnp.where(transparent, cap - offset, -1.0)
        rehit = accel.closest_hit_soa_auto(scene.bvh, o, direction, re_cap)
        hit = {
            "t": jnp.where(transparent, rehit["t"] + offset, hit["t"]),
            "tri": jnp.where(transparent, rehit["tri"], hit["tri"]),
            "u": jnp.where(transparent, rehit["u"], hit["u"]),
            "v": jnp.where(transparent, rehit["v"], hit["v"]),
        }
    if t_max is not None:
        beyond = hit["t"] > cap
        hit = {
            "t": jnp.where(beyond, jnp.float32(np.inf), hit["t"]),
            "tri": jnp.where(beyond, -1, hit["tri"]),
            "u": hit["u"],
            "v": hit["v"],
        }
    return hit


def _expand_block(a, p: int):
    """Chain width -> lane width: repeat each of the C chain values over
    its contiguous block of p//C lanes (a static reshape-broadcast, NOT a
    gather — lanes are tile-major, integrator.pixel_coords_np). Identity
    when the array is already lane-wide. Handles (C,) and (16, C)."""
    c = a.shape[-1]
    if c == p:
        return a
    blk = p // c
    if a.ndim == 1:
        return jnp.broadcast_to(a[:, None], (c, blk)).reshape(p)
    lead = a.shape[0]
    return jnp.broadcast_to(a[:, :, None], (lead, c, blk)).reshape(lead, p)


def _direct_light(scene, state_rng, wo_w, frame, hit, mat, active,
                  alpha_rounds=0, expand=None, draws=None):
    """NEE (path_trace.rgen direct_light, :87-117). Advances the rng by 5
    draws unconditionally. Returns (rng, radiance (16, R)).

    ``expand`` maps chain-width draws to lane width when coherent
    sampling shares RNG chains across lanes (see sample_light) — the
    light pick and sample draws stay at chain width through every table
    gather and are only block-broadcast where per-lane data mixes in.

    ``draws``: optional 5-tuple of lane-width uniforms (pick, a, b, c,
    bsdf) that REPLACES the chain draws — the low-discrepancy sampler's
    stratified points (launch_step). The chain still advances so the
    pcg/ld draw streams stay aligned."""
    ex = expand if expand is not None else (lambda a: a)
    rng = state_rng
    rng, r_pick = rng_mod.next_f32(rng)
    if draws is not None:
        r_pick = draws[0]
    lights_no_f = scene.lights_no.astype(jnp.float32)
    light_idx = jnp.minimum(
        (r_pick * lights_no_f).astype(jnp.int32), scene.lights_no - 1
    )
    light_idx = jnp.maximum(light_idx, 0)
    rng, ra = rng_mod.next_f32(rng)
    rng, rb = rng_mod.next_f32(rng)
    rng, rc = rng_mod.next_f32(rng)
    if draws is not None:
        ra, rb, rc = draws[1], draws[2], draws[3]
    wiw, dist, emission, light_pdf = lights_mod.sample_light(
        scene, light_idx, hit["point"], (ra, rb, rc), expand=expand
    )
    rng, r_bsdf = rng_mod.next_f32(rng)
    if draws is not None:
        r_bsdf = draws[4]

    wo = shading.to_shading_space_v(wo_w, frame)
    wi = shading.to_shading_space_v(wiw, frame)
    value, bsdf_pdf = bsdf_mod.bsdf_value(scene, mat, wo, wi, hit["uv"],
                                          ex(r_bsdf))

    usable = (light_pdf > 0.0) & (bsdf_pdf > 0.0)
    if _capture_sink is not None:
        _capture_sink.append({
            "phase": "anyhit_nee", "o": hit["point"], "d": wiw,
            "tmax": dist - 1e-3, "active": active & usable,
        })
    if alpha_rounds > 0:
        # alpha-tested occlusion: transparent surfaces don't shadow
        # (occlusion_tester + rahit semantics); opaque geometry still
        # blocks at early-exit any-hit speed via the tree split
        shadow_hit = _occlusion_sorted(
            scene, hit["point"], wiw, dist - 1e-3, active & usable,
            alpha_rounds)
    else:
        shadow_hit = _any_hit_sorted(
            scene, hit["point"], wiw, dist - 1e-3, active & usable
        )
    cos_term = jnp.abs(vec.dot(wiw, hit["shading_normal"]))
    weight = (
        usable.astype(jnp.float32)
        * (~shadow_hit).astype(jnp.float32)
        * cos_term
        / jnp.maximum(light_pdf, 1e-20)
    )
    radiance = value * emission * (weight * lights_no_f)
    return rng, radiance


def launch_step(scene, state: PathState, seed, pixel_offset, cam2world,
                screen2cam, px, py, launch_size, *, is_persp: bool,
                direct_only: bool = False,
                alpha_rounds: int = 0, rng_py=None,
                want_first_hit: bool = False,
                coherent=None, sampler: str = "pcg",
                sampler_seed=None, lane_active=None) -> PathState:
    """One bounce for all pixels (path_trace.rgen main, :135-239).

    ``seed``: uint32 frame seed; ``pixel_offset``: (2,) sub-pixel jitter
    from the WorkScheduler — scalars, or per-lane (P,) arrays when
    several samples are in flight; ``px``/``py``: per-lane pixel
    coordinates (explicit so a device mesh can shard the pixel axis);
    ``launch_size``: (2,) full-image (W, H) floats. ``rng_py``
    decorrelates the RNG streams of samples-in-flight copies that share
    (px, py) — defaults to ``py`` (the reference's srand inputs).

    ``want_first_hit=True`` returns ``(state, fh)`` where ``fh`` carries
    this step's hit attributes (the denoiser builds its G-buffer from
    them on restart frames, where every lane traces a camera ray —
    saving the separate guide trace that otherwise doubles a drag
    frame's cost).

    ``sampler='ld'``: the sub-pixel jitter comes from a PER-PIXEL
    Owen-scrambled Sobol (0,2)-stream indexed by the lane's path count
    (ops/sobol.py) instead of the launch-wide WorkScheduler offset —
    each pixel's successive camera samples are stratified over the
    pixel footprint, a direct MSE lever on primary visibility and
    depth of field that composes with every coherent mode (path-space
    draws keep their chains, so trace coherence is untouched).
    ``sampler_seed``: uint32 scalar decorrelating renders.

    ``lane_active``: optional (P,) bool — the adaptive sampler's tile
    mask. Lanes whose tile has converged PARK at their next path
    boundary (bounce==0): no new camera ray, no count increment, no
    contribution, and their closest trace is culled so Morton-sorted
    rows of parked lanes retire immediately. Mid-flight paths always
    finish first, so every pixel's accumulation holds only whole-path
    contributions counted exactly like the reference's ratio estimator
    (update_count, path_trace.rgen:119-133).
    """
    p = px.shape[0]
    coh = resolve_coherent(coherent)
    enabled = scene.lights_no > 0  # path_trace.rgen:137-141

    seed_f = seed.astype(jnp.float32)  # vec3(uint seed, ...) converts to float
    if coh == 1 and rng_py is None:
        # Frame-shared chain (srand(seed, 0, 0), identical values to the
        # (p,)-wide form) kept at shape (1,): the chain is lane-invariant,
        # so every draw-driven table lookup — NEE light pick, sky alias
        # rows, sky-sample atlas fetch, area-light triangle pick —
        # gathers ONE row instead of one per lane (~20 ns/row on TPU
        # regardless of width), broadcasting against per-lane data only
        # where results are actually consumed.
        one = jnp.zeros((1,), jnp.float32)
        rng = rng_mod.srand_f32x3(seed_f[None], one, one)
    elif coh == 2 and p % (TILE_W * TILE_H) == 0:
        # One chain per 2048-ray packet tile, kept at shape (n_tiles,):
        # lanes are tile-major (pixel_coords_np), so lane k belongs to
        # chain k // 2048 and every draw-driven table gather collapses
        # to one row per TILE instead of one per lane (same trick as
        # mode 1 above, block-broadcast by _expand_block). Chain values
        # are identical to the per-lane form — srand(seed, tile, copy)
        # with tile/copy constant across each block — so output is
        # bit-identical. Tile ids are global (px/py and launch_size are
        # full-image even under shard_map); a lane slice that is a
        # whole number of tiles keeps the block structure, and slices
        # that are not (p % 2048 != 0) fall through to the per-lane
        # chain below.
        blk = TILE_W * TILE_H
        pxb, pyb = px[::blk], py[::blk]
        copy_b = (jnp.zeros_like(pxb) if rng_py is None
                  else (rng_py - py)[::blk])
        tiles_x = jnp.ceil(launch_size[0] / TILE_W)
        chan = jnp.floor(pxb / TILE_W) + jnp.floor(pyb / TILE_H) * tiles_x
        rng = rng_mod.srand_f32x3(
            jnp.broadcast_to(seed_f, pxb.shape), chan, copy_b)
    elif coh:
        # rng_py - py is exactly the per-copy constant offset sif_lanes
        # added, so in-flight copies stay decorrelated while lanes
        # within a copy share draws.
        copy = (jnp.zeros((p,), jnp.float32) if rng_py is None
                else rng_py - py)
        if coh == 2:
            # one chain per packet tile; tile ids are global (px/py and
            # launch_size are full-image even under shard_map)
            tiles_x = jnp.ceil(launch_size[0] / TILE_W)
            chan = jnp.floor(px / TILE_W) + jnp.floor(py / TILE_H) * tiles_x
        else:
            chan = copy
        rng = rng_mod.srand_f32x3(jnp.broadcast_to(seed_f, (p,)), chan, copy)
    else:
        rng = rng_mod.srand_f32x3(jnp.broadcast_to(seed_f, (p,)), px,
                                  py if rng_py is None else rng_py)

    pk = None
    if sampler == "ld":
        # per-pixel stratified jitter: the lane's path count indexes its
        # own Owen-Sobol stream (the WorkScheduler offset is unused)
        from glaze_tpu.ops import sobol as sobol_mod

        pk = (px.astype(jnp.uint32)
              + (py if rng_py is None else rng_py).astype(jnp.uint32)
              * jnp.uint32(65536))
        if sampler_seed is not None:
            pk = pk ^ sampler_seed.astype(jnp.uint32)
        ju, jv = sobol_mod.sobol02(state.path_no, pk, domain=0)
    else:
        ju = jnp.broadcast_to(pixel_offset[0], px.shape)
        jv = jnp.broadcast_to(pixel_offset[1], py.shape)
    ndc_x = -1.0 + 2.0 * (px + ju) / launch_size[0]
    ndc_y = -1.0 + 2.0 * (py + jv) / launch_size[1]
    cam_origin, cam_dir = camera_rays(ndc_x, ndc_y, cam2world, screen2cam,
                                      is_persp)

    if direct_only:
        regen = jnp.ones((p,), bool)
    else:
        regen = state.bounce == 0.0
    if lane_active is not None:
        # adaptive stop: converged tiles park at the path boundary
        parked = regen & ~lane_active
        regen = regen & lane_active
    else:
        parked = jnp.zeros((p,), bool)
    count = state.count + (enabled & ~parked).astype(jnp.float32)
    new_path_no = state.path_no + regen.astype(jnp.uint32)

    # Full path-dimension stratification (incoherent lanes only —
    # coherent modes NEED lane-shared draws, that's where their trace
    # speed comes from): every decision of bounce b of a pixel's path i
    # comes from dimension domain 1 + 9*b + slot of its Owen-Sobol
    # stream at index i. Lanes regenerating this launch are starting
    # path ``path_no`` (pre-increment was consumed by the jitter above);
    # continuing lanes extend path ``path_no - 1``.
    ld_draws = None
    if sampler == "ld" and coh == 0:
        samp_idx = jnp.where(regen, state.path_no, state.path_no - 1)
        b_dom = jnp.uint32(1) + jnp.uint32(9) * state.bounce.astype(jnp.uint32)
        d_pick = sobol_mod.sobol1(samp_idx, pk, b_dom)
        d_la, d_lb = sobol_mod.sobol02(samp_idx, pk, b_dom + 1)
        d_lc = sobol_mod.sobol1(samp_idx, pk, b_dom + 3)
        d_bv = sobol_mod.sobol1(samp_idx, pk, b_dom + 4)
        d_rr = sobol_mod.sobol1(samp_idx, pk, b_dom + 5)
        d_sa, d_sb = sobol_mod.sobol02(samp_idx, pk, b_dom + 6)
        d_sc = sobol_mod.sobol1(samp_idx, pk, b_dom + 8)
        ld_draws = (d_pick, d_la, d_lb, d_lc, d_bv, d_rr, d_sa, d_sb, d_sc)
    origin = vec.where(regen, cam_origin, state.origin)
    direction = vec.where(regen, cam_dir, state.direction)
    importance = jnp.where(regen, spectra.one_t(p), state.importance)

    if _capture_sink is not None:
        _capture_sink.append({
            "phase": "closest", "o": origin, "d": direction,
            "bounce": state.bounce, "regen": regen,
        })
    if lane_active is None:
        hit = trace_alpha_sorted(scene, origin, direction,
                                 alpha_rounds=alpha_rounds)
    else:
        # parked lanes: cap -1 culls their packet walk (they compact to
        # the tail of the trace sort and whole rows retire)
        hit = trace_alpha_sorted(
            scene, origin, direction,
            t_max=jnp.where(parked, -1.0, jnp.float32(np.inf)),
            alpha_rounds=alpha_rounds)
    missed = hit["tri"] < 0

    # ---- miss: sky radiance only on camera rays / after specular bounces
    sky_visible = (state.bounce == 0.0) | (state.last_specular == 1.0)
    add_sky = missed & sky_visible & (scene.sky_tex > 0) & ~parked
    sr, sg, sb = _sky_radiance(scene, direction)
    sky_spec = importance * spectra.from_illuminant_color_t(sr, sg, sb)
    mr, mg, mb = spectra.to_rgb_t(sky_spec)
    zero = jnp.zeros_like(mr)
    miss_contrib = (
        jnp.where(add_sky, mr, zero),
        jnp.where(add_sky, mg, zero),
        jnp.where(add_sky, mb, zero),
    )

    # ---- hit shading
    surf = _interpolate_hit(scene, hit)
    wo_w = vec.neg(direction)
    frame = shading.new_shading_space_v(surf["dpdu"], surf["shading_normal"])
    mat = bsdf_mod.gather_material(scene, surf["material_id"])
    mat_specular = mat["scalars"][fl.MS_IS_SPECULAR] > 0.5

    nee_active = ~missed & ~mat_specular & ~parked
    # chain width -> lane width expander (identity unless a coherent
    # mode keeps the chain narrower than the wavefront, see _expand_block)
    ex = lambda a: _expand_block(a, p)  # noqa: E731
    rng, nee_radiance = _direct_light(scene, rng, wo_w, frame, surf, mat,
                                      nee_active, alpha_rounds=alpha_rounds,
                                      expand=ex,
                                      draws=(None if ld_draws is None
                                             else ld_draws[:5]))
    nee_radiance = nee_radiance * importance
    nr, ng, nb = spectra.to_rgb_t(nee_radiance)
    nee_contrib = (
        jnp.where(nee_active, nr, zero),
        jnp.where(nee_active, ng, zero),
        jnp.where(nee_active, nb, zero),
    )

    new_specular = jnp.where(
        missed, state.last_specular, mat_specular.astype(jnp.float32)
    )

    en = enabled.astype(jnp.float32)
    accum = tuple(
        state.accum[i] + en * (miss_contrib[i] + nee_contrib[i])
        for i in range(3)
    )
    # per-launch luminance contribution, squared (estimator variance for
    # the adaptive stopping statistic; zero-cost fused elementwise math)
    c_lum = en * (0.2126 * (miss_contrib[0] + nee_contrib[0])
                  + 0.7152 * (miss_contrib[1] + nee_contrib[1])
                  + 0.0722 * (miss_contrib[2] + nee_contrib[2]))
    sq = state.sq + c_lum * c_lum

    fh = None
    if want_first_hit:
        fh = {
            "missed": missed, "t": hit["t"], "origin": origin,
            "direction": direction,
            "shading_normal": surf["shading_normal"],
            "material_id": surf["material_id"], "uv": surf["uv"],
        }

    if direct_only:
        st = PathState(
            importance=state.importance,
            origin=state.origin,
            direction=state.direction,
            bounce=jnp.zeros_like(state.bounce),
            last_specular=jnp.where(enabled, new_specular, state.last_specular),
            accum=accum,
            count=count,
            path_no=new_path_no,
            sq=sq,
        )
        return (st, fh) if want_first_hit else st

    # ---- Russian roulette (path_trace.rgen:196-211)
    rng, rr_roll = rng_mod.next_f32(rng)
    if ld_draws is not None:
        rr_roll = ld_draws[5]
    rr_active = state.bounce > RUSSIAN_ROULETTE
    kill_prob = jnp.maximum(0.05, 1.0 - spectra.luminance_t(importance))
    rr_kill = rr_active & (ex(rr_roll) < kill_prob)
    rr_scale = jnp.where(rr_active, 1.0 / (1.0 - kill_prob), 1.0)
    importance = importance * rr_scale

    # ---- BSDF sampling (path_trace.rgen:212-228)
    rng, sa = rng_mod.next_f32(rng)
    rng, sb_ = rng_mod.next_f32(rng)
    rng, sc = rng_mod.next_f32(rng)
    if ld_draws is not None:
        sa, sb_, sc = ld_draws[6], ld_draws[7], ld_draws[8]
    wo = shading.to_shading_space_v(wo_w, frame)
    wi, value, pdf = bsdf_mod.bsdf_sample(scene, mat, wo, surf["uv"],
                                          (ex(sa), ex(sb_), ex(sc)))
    wi_w = shading.to_world_space_v(wi, frame)
    sample_dead = pdf <= 0.0
    weight = jnp.abs(vec.dot(wi_w, surf["shading_normal"])) / jnp.maximum(
        pdf, 1e-20
    )
    next_importance = importance * value * weight

    # path termination / continuation bookkeeping
    path_dead = missed | rr_kill | sample_dead
    at_max = state.bounce >= PT_STEPS  # "if bounce < PT_STEPS inc else reset"
    new_bounce = jnp.where(path_dead | at_max, 0.0, state.bounce + 1.0)

    keep = ~path_dead
    upd = enabled & keep
    st = PathState(
        importance=jnp.where(upd, next_importance, state.importance),
        origin=vec.where(upd, surf["point"], state.origin),
        direction=vec.where(upd, wi_w, state.direction),
        bounce=jnp.where(enabled, new_bounce, state.bounce),
        last_specular=jnp.where(enabled, new_specular, state.last_specular),
        accum=accum,
        count=count,
        path_no=new_path_no,
        sq=sq,
    )
    return (st, fh) if want_first_hit else st


def to_image_np(values, width: int, height: int, fill=0):
    """Unswizzles one (P',) array into a cropped (H, W) numpy image."""
    px, py = pixel_coords_np(width, height)
    pw, ph = padded_dims(width, height)
    arr = np.asarray(jax.device_get(values))
    full = np.full((ph, pw), fill, arr.dtype)
    full[py, px] = arr
    return full[:height, :width]


def _fold_sif(accum, count, sif: int):
    """Sums the sif in-flight copies per pixel (estimate = sum(accum) /
    sum(count), the multi-sample generalization of update_result)."""
    if sif == 1:
        return accum, count
    p = count.shape[0] // sif
    return (tuple(a.reshape(sif, p).sum(0) for a in accum),
            count.reshape(sif, p).sum(0))


@functools.partial(jax.jit, static_argnames=("sif",))
def _fold_display(accum, count, exposure, sif: int = 1):
    """_fold_sif + _display_chans in one executable (one dispatch)."""
    accum, count = _fold_sif(accum, count, sif)
    return _display_chans(accum, count, exposure)


def _display_chans(accum, count, exposure):
    """Device side of render_image, one fused executable (eager ops each
    cost a full ~25ms tunnel dispatch — this was the interactive-fps
    bottleneck, not the render launch)."""
    inv = exposure / jnp.maximum(count, 1.0)
    chans = [
        jnp.round(
            tx.linear_to_srgb(jnp.clip(accum[i] * inv, 0.0, 1.0)) * 255.0
        ).astype(jnp.uint8)
        for i in range(3)
    ]
    return jnp.stack(chans, axis=-1)


def render_image(state: PathState, exposure, width: int, height: int,
                 sif: int = 1):
    """accumulated sum -> display image (update_result + the out8 blit):
    linear rgb * exposure / count, clamped, sRGB-encoded, (H, W, 3) u8.
    Unswizzles the tile order and crops padding."""
    img = np.asarray(jax.device_get(
        _fold_display(state.accum, state.count, jnp.float32(exposure),
                      sif=sif)
    ))
    px, py = pixel_coords_np(width, height)
    pw, ph = padded_dims(width, height)
    full = np.zeros((ph, pw, 3), np.uint8)
    full[py, px] = img
    return full[:height, :width]


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "is_persp", "direct_only", "steps", "sif",
                     "alpha_rounds", "coherent", "sampler"),
)
def render_steps(scene, state, seeds, offsets, cam2world, screen2cam, *,
                 width, height, is_persp, direct_only, steps,
                 alpha_rounds=0, sif=1, coherent=None, sampler="pcg",
                 sampler_seed=None, lane_active=None):
    """`steps` launches fused in one jit via lax.scan — the whole
    spp*PT_STEPS hot loop runs on device with zero host round-trips
    (replaces the fence ring of raytracer.rs:615-654).

    ``sif`` > 1 advances that many independent samples per pixel in one
    wavefront (state from ``init_state(..., sif=sif)``, ``offsets``
    shaped (steps, sif, 2) — one sub-pixel jitter per copy)."""
    px, py, rng_py = sif_lanes(width, height, sif)
    size = jnp.asarray([width, height], jnp.float32)
    p1 = pixel_count(width, height)

    def body(st, inp):
        seed, offset = inp
        if sif > 1:  # (sif, 2) -> per-lane jitter arrays
            offset = (jnp.repeat(offset[:, 0], p1),
                      jnp.repeat(offset[:, 1], p1))
        st = launch_step(
            scene, st, seed, offset, cam2world, screen2cam, px, py, size,
            is_persp=is_persp, direct_only=direct_only,
            alpha_rounds=alpha_rounds, rng_py=rng_py, coherent=coherent,
            sampler=sampler, sampler_seed=sampler_seed,
            lane_active=lane_active,
        )
        return st, None

    state, _ = jax.lax.scan(body, state, (seeds, offsets), length=steps)
    return state


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "is_persp", "direct_only", "steps", "sif",
                     "alpha_rounds", "coherent", "sampler"),
)
def render_steps_with_image(scene, state, seeds, offsets, cam2world,
                            screen2cam, exposure, *, width, height, is_persp,
                            direct_only, steps, alpha_rounds=0, sif=1,
                            coherent=None, sampler="pcg", sampler_seed=None):
    """render_steps + the sRGB display conversion fused into ONE
    executable: the interactive path pays a single dispatch per frame
    (each dispatch costs ~25 ms through the remote-TPU tunnel)."""
    state = render_steps(
        scene, state, seeds, offsets, cam2world, screen2cam,
        width=width, height=height, is_persp=is_persp,
        direct_only=direct_only, steps=steps, alpha_rounds=alpha_rounds,
        sif=sif, coherent=coherent, sampler=sampler,
        sampler_seed=sampler_seed,
    )
    accum, count = _fold_sif(state.accum, state.count, sif)
    return state, _display_chans(accum, count, exposure)


# ---------------------------------------------------------------------------
# Adaptive sample allocation (no reference equivalent — its WorkScheduler
# refines uniformly, raytracer.rs:1161-1206): per-TILE stopping from the
# on-device variance statistic. A tile (one 2048-lane traversal packet =
# one TILE_W x TILE_H image block) whose pixels' estimator standard
# errors are all far below their means carries no visible noise; parking
# it (launch_step lane_active) makes its Morton-sorted rows retire
# immediately, so the remaining wall time concentrates on the tiles that
# still need samples. Per-pixel estimates are untouched: each keeps its
# own count and stops only at path boundaries.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("sif",))
def tile_error(state: PathState, sif: int = 1):
    """Per-tile relative standard error of the luminance estimate.

    Returns (T,) float32 where T = lanes / (TILE_W*TILE_H): the
    tile-mean of  se_p / (mean_p + eps), with  se_p = sqrt(var_p / n)
    from the running (accum, sq, count) moments. sif in-flight copies
    of a pixel fold into one estimate first."""
    accum, count = _fold_sif(state.accum, state.count, sif)
    if sif == 1:
        sq = state.sq
    else:
        pp = state.count.shape[0] // sif
        sq = state.sq.reshape(sif, pp).sum(0)
    n = jnp.maximum(count, 1.0)
    lum = (0.2126 * accum[0] + 0.7152 * accum[1] + 0.0722 * accum[2])
    mean = lum / n
    var = jnp.maximum(sq / n - mean * mean, 0.0) * (n / jnp.maximum(n - 1.0, 1.0))
    se = jnp.sqrt(var / n)
    rel = se / (mean + 1e-3)
    blk = TILE_W * TILE_H
    return rel.reshape(-1, blk).mean(axis=1)


@functools.partial(jax.jit, static_argnames=("sif", "tau", "min_count"))
def adaptive_lane_mask(state: PathState, sif: int = 1, tau: float = 0.01,
                       min_count: float = 64.0):
    """(P,) bool lane mask for launch_step/render_steps ``lane_active``:
    True while the lane's tile still needs samples. A tile stays active
    until every pixel has ``min_count`` launches AND its mean relative
    standard error drops below ``tau`` (display-quality converged)."""
    err = tile_error(state, sif)
    accum, count = _fold_sif(state.accum, state.count, sif)
    blk = TILE_W * TILE_H
    min_n = count.reshape(-1, blk).min(axis=1)
    active_t = (err > tau) | (min_n < min_count)
    per_pixel = jnp.repeat(active_t, blk)
    if sif == 1:
        return per_pixel
    return jnp.tile(per_pixel, sif)
