"""The wavefront path-tracing integrator.

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

The RNG is the reference's PCG hash chain, seeded per
(frame seed, pixel) — ``srand(vec3(seed, gl_LaunchID.xy))`` — so every
launch decorrelates. Draw ORDER differs from the GLSL in one way: the
reference skips some draws in branches not taken (e.g. the BSDF-value draw
when the light pdf is zero); we draw unconditionally to keep the lane-
parallel stream aligned. This changes sample positions, not distributions.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from glaze_tpu import accel
from glaze_tpu.ops import rng as rng_mod
from glaze_tpu.ops import shading
from glaze_tpu.ops import spectra
from glaze_tpu.ops import texture as tx
from glaze_tpu.render import bsdf as bsdf_mod
from glaze_tpu.render import lights as lights_mod

PT_STEPS = 6  # raytrace_structures.rs:87
RUSSIAN_ROULETTE = PT_STEPS // 2  # path_trace.rgen:11
INV_2PI = jnp.float32(0.1591549)
INV_PI = jnp.float32(0.3183099)


class PathState(NamedTuple):
    """Per-pixel path state + accumulation image (flattened to (P, ...))."""

    importance: jnp.ndarray  # (P, 16)
    origin: jnp.ndarray  # (P, 3)
    direction: jnp.ndarray  # (P, 3)
    bounce: jnp.ndarray  # (P,) float32 (hit.w in the reference)
    last_specular: jnp.ndarray  # (P,) float32 (wi.w in the reference)
    accum: jnp.ndarray  # (P, 3) radiance sum (RGB)
    count: jnp.ndarray  # (P,) sample count


def init_state(width: int, height: int) -> PathState:
    p = width * height
    return PathState(
        importance=jnp.zeros((p, 16), jnp.float32),
        origin=jnp.zeros((p, 3), jnp.float32),
        direction=jnp.zeros((p, 3), jnp.float32),
        bounce=jnp.zeros((p,), jnp.float32),
        last_specular=jnp.zeros((p,), jnp.float32),
        accum=jnp.zeros((p, 3), jnp.float32),
        count=jnp.zeros((p,), jnp.float32),
    )


def camera_matrices(camera, width: int, height: int):
    """(camera2world, screen2camera) push constants
    (build_push_constants, raytracer.rs:1098-1120)."""
    view_inv = np.linalg.inv(camera.look_at_rh()).astype(np.float32)
    proj = camera.projection(width, height).copy()
    proj[1, 1] *= -1.0  # Vulkan clip-space flip
    proj_inv = np.linalg.inv(proj).astype(np.float32)
    return view_inv, proj_inv


def camera_rays(ndc, cam2world, screen2cam, is_persp: bool):
    """Primary ray origins/directions (path_trace.rgen:47-74)."""
    zeros = jnp.zeros_like(ndc[..., :1])
    ones = jnp.ones_like(ndc[..., :1])
    if is_persp:
        origin_ss = jnp.concatenate([zeros, zeros, zeros, ones], axis=-1)
        target_ss = jnp.concatenate([ndc, ones, ones], axis=-1)
    else:
        origin_ss = jnp.concatenate([ndc, zeros, ones], axis=-1)
        target_ss = jnp.concatenate([zeros, zeros, ones, ones], axis=-1)
    origin = (origin_ss @ cam2world.T)[..., :3]
    target = (target_ss @ screen2cam.T)[..., :3]
    target = shading.normalize(target)
    direction4 = jnp.concatenate([target, zeros], axis=-1) @ cam2world.T
    direction = shading.normalize(direction4[..., :3])
    return origin, direction


def _sky_radiance(scene, direction):
    """Environment lookup on miss (path_trace.rgen:76-84)."""
    w = jnp.einsum("ij,...j->...i", scene.sky_world2obj, direction)
    w = shading.normalize(w)
    phi = jnp.arctan2(w[..., 1], w[..., 0])
    theta = jnp.arccos(jnp.clip(w[..., 2], -1.0, 1.0))
    uv = jnp.stack([phi * INV_2PI, theta * INV_PI], axis=-1)
    tex = jnp.broadcast_to(scene.sky_tex, phi.shape)
    return tx.sample_rgb(scene.atlas, tex, uv)


def _interpolate_hit(scene, hit):
    """The closest-hit shader: barycentric attribute interpolation + normal
    mapping (raytrace_hit.rchit). Geometry is already world-space."""
    tri = jnp.maximum(hit["tri"], 0)
    bu = hit["u"][..., None]
    bv = hit["v"][..., None]
    bw = 1.0 - bu - bv

    trow = scene.bvh.tri[tri]
    point = trow[..., 0:3] + bu * trow[..., 3:6] + bv * trow[..., 6:9]

    n = scene.tri_normals[tri]  # (R, 3, 3)
    shading_n = bw * n[..., 0, :] + bu * n[..., 1, :] + bv * n[..., 2, :]
    shading_n = shading.normalize(shading_n)
    uvs = scene.tri_uvs[tri]
    uv = bw * uvs[..., 0, :] + bu * uvs[..., 1, :] + bv * uvs[..., 2, :]

    geom_n = scene.geom_normal[tri]
    dpdu = scene.dpdu[tri]
    mat_id = scene.tri_material[tri]

    # normal mapping (rchit:55-64)
    normal_tex = scene.mat_normal_tex[mat_id]
    has_nm = normal_tex != 0
    texel = tx.sample_rgb(scene.atlas, normal_tex, uv)
    s_old = shading.normalize(dpdu)
    t_old = shading.normalize(jnp.cross(shading_n, s_old))
    frame_old = jnp.stack([s_old, t_old, shading_n], axis=-2)
    mapped = shading.to_world_space(texel * 2.0 - 1.0, frame_old)
    mapped = mapped * jnp.sign(jnp.sum(geom_n * mapped, axis=-1, keepdims=True))
    shading_n = jnp.where(has_nm[..., None], mapped, shading_n)

    return {
        "point": point,
        "shading_normal": shading_n,
        "geom_normal": geom_n,
        "dpdu": dpdu,
        "uv": uv,
        "material_id": mat_id,
    }


def _direct_light(scene, state_rng, wo_w, frame, hit, active):
    """NEE (path_trace.rgen direct_light, :87-117). Advances the rng by 5
    draws unconditionally. Returns (rng, radiance spectrum)."""
    rng = state_rng
    rng, r_pick = rng_mod.next_f32(rng)
    lights_no_f = scene.lights_no.astype(jnp.float32)
    light_idx = jnp.minimum(
        (r_pick * lights_no_f).astype(jnp.int32), scene.lights_no - 1
    )
    light_idx = jnp.maximum(light_idx, 0)
    rng, r3 = rng_mod.next_f32x3(rng)
    wiw, dist, emission, light_pdf = lights_mod.sample_light(
        scene, light_idx, hit["point"], r3
    )
    rng, r_bsdf = rng_mod.next_f32(rng)

    mat = bsdf_mod.gather_material(scene, hit["material_id"])
    wo = shading.to_shading_space(wo_w, frame)
    wi = shading.to_shading_space(wiw, frame)
    value, bsdf_pdf = bsdf_mod.bsdf_value(scene, mat, wo, wi, hit["uv"], r_bsdf)

    usable = (light_pdf > 0.0) & (bsdf_pdf > 0.0)
    shadow_hit = accel.any_hit_auto(
        scene.bvh, hit["point"], wiw, dist - 1e-3, active=active & usable
    )
    cos_term = jnp.abs(jnp.sum(wiw * hit["shading_normal"], axis=-1))
    weight = (
        usable.astype(jnp.float32)
        * (~shadow_hit).astype(jnp.float32)
        * cos_term
        / jnp.maximum(light_pdf, 1e-20)
    )
    radiance = value * emission * weight[..., None] * lights_no_f
    return rng, radiance


def pixel_coords(width: int, height: int):
    """Row-major (px, py) launch-grid coordinates, each (W*H,) float32."""
    px = jnp.tile(jnp.arange(width, dtype=jnp.float32), height)
    py = jnp.repeat(jnp.arange(height, dtype=jnp.float32), width)
    return px, py


def launch_step(scene, state: PathState, seed, pixel_offset, cam2world,
                screen2cam, px, py, launch_size, *, is_persp: bool,
                direct_only: bool = False) -> PathState:
    """One bounce for all pixels (path_trace.rgen main, :135-239).

    ``seed``: uint32 frame seed; ``pixel_offset``: (2,) sub-pixel jitter
    from the WorkScheduler; ``px``/``py``: per-lane pixel coordinates
    (explicit so a device mesh can shard the pixel axis);
    ``launch_size``: (2,) full-image (W, H) floats.
    """
    p = px.shape[0]
    enabled = scene.lights_no > 0  # path_trace.rgen:137-141

    count = state.count + enabled.astype(jnp.float32)

    seed_f = seed.astype(jnp.float32)  # vec3(uint seed, ...) converts to float
    rng = rng_mod.srand_f32x3(jnp.broadcast_to(seed_f, (p,)), px, py)

    pixel = jnp.stack([px, py], axis=-1) + pixel_offset
    uv_screen = pixel / launch_size
    ndc = -1.0 + 2.0 * uv_screen
    cam_origin, cam_dir = camera_rays(ndc, cam2world, screen2cam, is_persp)

    if direct_only:
        regen = jnp.ones((p,), bool)
    else:
        regen = state.bounce == 0.0
    origin = jnp.where(regen[..., None], cam_origin, state.origin)
    direction = jnp.where(regen[..., None], cam_dir, state.direction)
    importance = jnp.where(regen[..., None], spectra.one((p,)), state.importance)

    hit = accel.closest_hit_auto(scene.bvh, origin, direction)
    missed = hit["tri"] < 0

    # ---- miss: sky radiance only on camera rays / after specular bounces
    sky_visible = (state.bounce == 0.0) | (state.last_specular == 1.0)
    add_sky = missed & sky_visible & (scene.sky_tex > 0)
    sky_rgb = _sky_radiance(scene, direction)
    sky_radiance = importance * spectra.from_illuminant_color(sky_rgb)
    miss_contrib = jnp.where(add_sky[..., None], spectra.to_rgb(sky_radiance), 0.0)

    # ---- hit shading
    surf = _interpolate_hit(scene, hit)
    wo_w = -direction
    frame = shading.new_shading_space(surf["dpdu"], surf["shading_normal"])
    mat_specular = scene.mat_is_specular[surf["material_id"]]

    nee_active = ~missed & ~mat_specular
    rng, nee_radiance = _direct_light(scene, rng, wo_w, frame, surf, nee_active)
    nee_radiance = nee_radiance * importance
    add_nee = nee_active
    nee_contrib = jnp.where(add_nee[..., None], spectra.to_rgb(nee_radiance), 0.0)

    new_specular = jnp.where(
        missed, state.last_specular, mat_specular.astype(jnp.float32)
    )

    accum = state.accum + jnp.where(
        enabled, miss_contrib + nee_contrib, jnp.zeros_like(miss_contrib)
    )

    if direct_only:
        return PathState(
            importance=state.importance,
            origin=state.origin,
            direction=state.direction,
            bounce=jnp.zeros_like(state.bounce),
            last_specular=jnp.where(enabled, new_specular, state.last_specular),
            accum=accum,
            count=count,
        )

    # ---- Russian roulette (path_trace.rgen:196-211)
    rng, rr_roll = rng_mod.next_f32(rng)
    rr_active = state.bounce > RUSSIAN_ROULETTE
    kill_prob = jnp.maximum(0.05, 1.0 - spectra.luminance(importance))
    rr_kill = rr_active & (rr_roll < kill_prob)
    rr_scale = jnp.where(rr_active, 1.0 / (1.0 - kill_prob), 1.0)
    importance = importance * rr_scale[..., None]

    # ---- BSDF sampling (path_trace.rgen:212-228)
    rng, r3 = rng_mod.next_f32x3(rng)
    mat = bsdf_mod.gather_material(scene, surf["material_id"])
    wo = shading.to_shading_space(wo_w, frame)
    wi, value, pdf = bsdf_mod.bsdf_sample(scene, mat, wo, surf["uv"], r3)
    wi_w = shading.to_world_space(wi, frame)
    sample_dead = pdf <= 0.0
    weight = jnp.abs(jnp.sum(wi_w * surf["shading_normal"], axis=-1)) / jnp.maximum(
        pdf, 1e-20
    )
    next_importance = importance * value * weight[..., None]

    # path termination / continuation bookkeeping
    path_dead = missed | rr_kill | sample_dead
    at_max = state.bounce >= PT_STEPS  # "if bounce < PT_STEPS inc else reset"
    new_bounce = jnp.where(path_dead | at_max, 0.0, state.bounce + 1.0)

    keep = (~path_dead)[..., None]
    return PathState(
        importance=jnp.where(
            enabled, jnp.where(keep, next_importance, state.importance),
            state.importance,
        ),
        origin=jnp.where(enabled, jnp.where(keep, surf["point"], state.origin),
                         state.origin),
        direction=jnp.where(
            enabled, jnp.where(keep, wi_w, state.direction), state.direction
        ),
        bounce=jnp.where(enabled, new_bounce, state.bounce),
        last_specular=jnp.where(enabled, new_specular, state.last_specular),
        accum=accum,
        count=count,
    )


def render_image(state: PathState, exposure, width: int, height: int):
    """accumulated sum -> display image (update_result + the out8 blit):
    linear rgb * exposure / count, clamped, sRGB-encoded, (H, W, 3) u8."""
    rgb = state.accum * (exposure / jnp.maximum(state.count, 1.0))[..., None]
    srgb = tx.linear_to_srgb(jnp.clip(rgb, 0.0, 1.0))
    img = jnp.round(srgb * 255.0).astype(jnp.uint8)
    return img.reshape(height, width, 3)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "is_persp", "direct_only", "steps"),
)
def render_steps(scene, state, seeds, offsets, cam2world, screen2cam, *,
                 width, height, is_persp, direct_only, steps):
    """`steps` launches fused in one jit via lax.scan — the whole
    spp*PT_STEPS hot loop runs on device with zero host round-trips
    (replaces the fence ring of raytracer.rs:615-654)."""
    px, py = pixel_coords(width, height)
    size = jnp.asarray([width, height], jnp.float32)

    def body(st, inp):
        seed, offset = inp
        st = launch_step(
            scene, st, seed, offset, cam2world, screen2cam, px, py, size,
            is_persp=is_persp, direct_only=direct_only,
        )
        return st, None

    state, _ = jax.lax.scan(body, state, (seeds, offsets), length=steps)
    return state
