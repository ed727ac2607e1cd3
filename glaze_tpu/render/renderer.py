"""RayTraceRenderer: the offline/progressive path tracer.

Public surface mirrors the reference renderer
(``RayTraceRenderer::{new, draw, draw_frame, set_integrator, set_exposure,
update_camera, update_materials_and_lights, change_resolution,
change_scene}``, raytracer.rs:153-687), re-shaped for JAX: per-bounce
launches are jitted device calls; ``draw(spp)`` fuses launches into
lax.scan chunks instead of a fence ring.
"""

from __future__ import annotations

import enum
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from glaze_tpu.core import Camera
from glaze_tpu.render import integrator as integ
from glaze_tpu.render.scheduler import WorkScheduler
from glaze_tpu.utils.log import get_logger

log = get_logger("renderer")


class Integrator(enum.Enum):
    """Available integrators (raytracer.rs:36-53)."""

    DIRECT = "direct"
    PATH_TRACE = "pt"

    @property
    def steps_per_sample(self) -> int:
        """Launches per sample (raytracer.rs:80-86)."""
        return 1 if self is Integrator.DIRECT else integ.PT_STEPS

    @property
    def name_str(self) -> str:
        return "Direct light only" if self is Integrator.DIRECT else "Path tracing"


# launches fused per device call in draw(); progress callbacks fire between
# chunks (the reference's 2-deep fence ring fires per launch). Chunk sizes
# are powers of two so at most log2(_CHUNK)+1 scan lengths ever compile.
_CHUNK = 32


def default_coherent(interactive: bool = False) -> int:
    """The SHIPPED coherent-sampling default: frame-shared chains for
    offline renders (the 2.4x headline configuration, docs/PERF_LOG.md),
    tile-shared for interactive renderers (independent noise realization
    per 2048-ray packet tile — bounded blotches while dragging). Both
    are unbiased with unchanged per-pixel variance; the multi-scene
    equal-spp quality gate lives in tests/test_coherent_quality.py.

    GLAZE_COHERENT overrides both defaults (including "0" = off), and a
    ``coherent=`` constructor argument overrides everything."""
    env = os.environ.get("GLAZE_COHERENT")
    if env not in (None, ""):
        return integ.resolve_coherent(env if not env.isdigit() else int(env))
    return 2 if interactive else 1


def _chunk_sizes(total: int):
    """Equal power-of-two chunks: the largest c <= _CHUNK dividing
    ``total``, repeated. ONE scan length per draw() call (each distinct
    length is a separate multi-minute first-run XLA compile; the old
    greedy 16+8-style decomposition compiled one executable per distinct
    size), and progress callbacks land evenly spaced."""
    if total <= 0:
        return []
    c = _CHUNK
    while c > 1 and (c > total or total % c):
        c >>= 1
    return [c] * (total // c)


class RayTraceRenderer:
    """Progressive spectral path tracer over a DeviceScene."""

    def __init__(self, scene, camera=None, width: int = 1920, height: int = 1080,
                 integrator: Integrator = Integrator.PATH_TRACE, seed=None,
                 samples_in_flight: Optional[int] = None, mesh=None,
                 coherent=None, interactive: bool = False, sampler=None,
                 adaptive=None):
        """``scene``: DeviceScene or ParsedScene (flattened on the spot).

        ``samples_in_flight``: independent per-pixel path states advanced
        per launch (default env GLAZE_SIF or 1). More in-flight samples
        make every Morton-sorted trace denser — measured 1.26x closest /
        1.36x any-hit per-ray at 4x on the bench bounce mix
        (tools/bench_density.py) — at the price of sif× launch memory and
        a sif-launch-coarser progress/display granularity.

        ``mesh``: a ``jax.sharding.Mesh`` (or ``"auto"`` for one over all
        visible devices) — ``draw()`` then runs the pixel-sharded
        collective-free launch, scaling offline renders linearly across
        chips. Measured at exact parity with the unsharded path on one
        chip (docs/PERF_LOG.md); incompatible with samples_in_flight>1.

        ``coherent``: 0/'off', 1/'frame' or 2/'tile' shared-RNG sampling
        (see integrator.COHERENT). Default: the shipped configuration —
        'frame' offline, 'tile' when ``interactive`` (the mode is a
        static jit argument, so switching ``self.coherent`` at runtime
        just selects a different compiled executable).

        ``sampler``: 'pcg' (the reference's hash chain) or 'ld'
        (per-pixel Owen-scrambled Sobol sub-pixel jitter, ops/sobol.py
        — stratifies each pixel's camera samples; composes with every
        coherent mode, SHIPPED DEFAULT). Env GLAZE_SAMPLER overrides.

        ``adaptive``: per-tile adaptive stopping in ``draw()`` —
        converged tiles (relative standard error below GLAZE_ADAPTIVE_TAU,
        default 1%, after >= GLAZE_ADAPTIVE_MIN launches, default 64)
        park so wall time concentrates on the tiles still carrying
        noise (integrator.adaptive_lane_mask). Per-pixel estimates are
        unchanged — pixels keep their own counts and stop only at path
        boundaries. Default OFF since r5: the three-scene
        time-to-quality matrix (docs/PERF_LOG.md round 5) shows no
        reliable win and measurable overhead at interactive scales, so
        the feature is opt-in (``--adaptive on`` / GLAZE_ADAPTIVE=1);
        applies under ``mesh`` too (the lane mask shards over the pixel
        axis)."""
        from glaze_tpu.scene import DeviceScene, flatten_scene

        self.host = None
        if not isinstance(scene, DeviceScene):
            scene, parsed_cam, self.host = flatten_scene(scene)
            if camera is None:
                camera = parsed_cam
        self.scene = scene
        self.camera = camera if camera is not None else Camera.default()
        self.width = int(width)
        self.height = int(height)
        self.integrator = integrator
        self.exposure: Optional[float] = None  # None = scene meta exposure
        self.coherent = (default_coherent(interactive) if coherent is None
                         else integ.resolve_coherent(coherent))
        # 'pcg' (the reference's hash chain) is the default again since
        # r5: the corrected multi-seed time-to-MSE A/B (BENCH_r05
        # ttq_pcg/ttq_ld keys — 3 seeds per sampler, medians 8.6 s vs
        # 8.9 s with overlapping spreads) shows NO separation under the
        # shipped coherent mode, where ld only contributes sub-pixel
        # jitter; the r4 ld default rested on a single-seed artifact
        # that compared ld against itself. ld DOES win measured ground
        # with fully independent chains (incoherent legs 11.7 s vs
        # 14.2 s; r4 CPU equal-spp ladders 1.15-1.21x) — use
        # --sampler ld with --coherent off.
        self.sampler = (sampler if sampler is not None
                        else os.environ.get("GLAZE_SAMPLER", "pcg"))
        self.adaptive = bool(int(os.environ.get("GLAZE_ADAPTIVE", "0"))
                             if adaptive is None else adaptive)
        self.adaptive_tau = float(os.environ.get("GLAZE_ADAPTIVE_TAU",
                                                 "0.01"))
        self.adaptive_min = float(os.environ.get("GLAZE_ADAPTIVE_MIN",
                                                 "64"))
        if self.sampler not in ("pcg", "ld"):
            raise ValueError(f"sampler {self.sampler!r}: expected pcg or ld")
        self._rng = np.random.default_rng(seed)
        # LD stream decorrelation key: deterministic per seed, drawn from
        # an INDEPENDENT generator so the launch-seed stream (and with it
        # every stored golden) is untouched
        self._sampler_seed = np.uint32(
            np.random.default_rng(seed).integers(0, 2**32))
        self._scheduler = WorkScheduler()
        self.samples_in_flight = int(
            samples_in_flight if samples_in_flight is not None
            else os.environ.get("GLAZE_SIF", "1"))
        if self.samples_in_flight < 1:
            raise ValueError("samples_in_flight must be >= 1")
        self._mesh = None
        if mesh is not None:
            from glaze_tpu.parallel import mesh as pmesh

            self._mesh = pmesh.make_mesh() if mesh == "auto" else mesh
            if self.samples_in_flight != 1:
                raise ValueError("mesh rendering requires "
                                 "samples_in_flight == 1")
            n = int(self._mesh.devices.size)
            if integ.pixel_count(self.width, self.height) % n:
                raise ValueError(
                    f"pixel count not divisible by mesh size {n}")
        self._scene_placed = None  # replicated scene, placed per mesh once
        self._state = integ.init_state(self.width, self.height,
                                       self.samples_in_flight)
        self._request_new_frame = True
        # display-only SVGF-style reconstruction (render/denoise.py);
        # never touches the accumulation state, so the offline result
        # stays unbiased whether or not it's on. ``temporal`` adds
        # history reprojection to the interactive draw_frame path (kept
        # stable through camera drags); it rides the denoise toggle.
        self.denoise = False
        self.temporal = True
        self._gb_key = None
        self._dn_hist = None
        self._dn_hist_key = None
        self._dn_prev = None
        self._refresh_alpha_rounds()

    # alpha-tested transparency: re-test rounds only run for MIXED
    # boundary-cell hits — the baked opacity cell masks skip
    # provably-transparent layers INSIDE the traversal kernels without
    # consuming rounds (rahit/OPAQUE-flag parity, acceleration.rs:
    # 137-141 + raytrace_hit.rahit). Only enabled when some material
    # actually has an opacity map. One round by default since r5: a
    # second stacked MIXED-transparent layer along one segment is
    # treated opaque, which measured 170x BELOW the independent-seed
    # noise floor on the bench scene (same-seed rounds 1-vs-4 display
    # MSE 0.09 vs noise floor 15.4 at 64 spp; 0.017% of pixels differ
    # >8/255) while each extra round costs two full-width row gathers
    # + a culled re-trace per leg. GLAZE_ALPHA_ROUNDS overrides for
    # strict reference comparisons (docs/MIGRATION.md).
    _ALPHA_ROUNDS = int(os.environ.get("GLAZE_ALPHA_ROUNDS", "1"))

    def _alpha_tri_mask(self):
        """Per-ORIGINAL-tri 'material has an opacity map' mask, from the
        host instance tables (None when host data is unavailable)."""
        h = self.host
        if h is None or not h.inst_tri_count:
            return None
        opac = np.asarray([m.opacity != 0 for m in h.materials])
        n = max(f + c for f, c in zip(h.inst_tri_first, h.inst_tri_count))
        mask = np.zeros(n, bool)
        for m, f, c in zip(h.inst_material, h.inst_tri_first,
                           h.inst_tri_count):
            if 0 <= m < opac.size and opac[m]:
                mask[f:f + c] = True
        return mask

    def _refresh_alpha_rounds(self):
        if self.host is not None:
            has = any(m.opacity != 0 for m in self.host.materials)
        else:
            has = bool(
                np.asarray(
                    jax.device_get(self.scene.mat_tex[:, 3])  # MT_OPACITY
                ).any()
            )
        self._alpha_rounds = self._ALPHA_ROUNDS if has else 0
        # opaque/alpha tree split staleness (material edits can move
        # triangles between the sets): rebuild when the per-tri mask
        # changed since flatten/the last rebuild
        mask = self._alpha_tri_mask()
        if mask is None or self.host.tri_order is None:
            return
        cached = getattr(self, "_alpha_mask_cache", None)
        if cached is not None and cached.shape == mask.shape \
                and (cached == mask).all():
            return
        if cached is None:
            # first call (construction): flatten already built the split
            self._alpha_mask_cache = mask
            return
        from glaze_tpu.accel.bvh import SENTINEL
        from glaze_tpu.scene import flatten as fl

        tri_pos = np.asarray(
            jax.device_get(self.scene.tri_pos_orig)).reshape(-1, 3, 3)
        order = np.asarray(self.host.tri_order)
        sentinel_rows = order == SENTINEL
        order = np.where(sentinel_rows, 0, order).astype(np.int64)
        tri_mat = np.zeros(mask.shape[0], np.int64)
        for m, f, c in zip(self.host.inst_material,
                           self.host.inst_tri_first,
                           self.host.inst_tri_count):
            tri_mat[f:f + c] = m
        mat_tex = fl.flatten_materials(self.host.materials)["mat_tex"]
        # with host uv + textures the rebuild keeps exact classification,
        # baked opacity masks, and the fused alpha_attr table (the same
        # inputs flatten used); atlas layout is deterministic per
        # texture list, so it matches scene.atlas
        tri_uv = getattr(self.host, "tri_uv", None)
        atlas = None
        if tri_uv is not None:
            from glaze_tpu.ops.texture import build_atlas

            atlas = build_atlas(self.host.textures)
        split = fl.build_alpha_split(tri_pos, tri_mat, mat_tex, order,
                                     sentinel_rows, tri_uv=tri_uv,
                                     textures=(self.host.textures
                                               if tri_uv is not None
                                               else None), atlas=atlas)
        full_payload = split.pop("_full_payload", None)
        if full_payload is not None:
            from glaze_tpu.accel import FatBVH
            from glaze_tpu.accel.bvh import attach_tri_payload

            if not isinstance(self.scene.bvh, FatBVH):
                split["bvh"] = attach_tri_payload(self.scene.bvh,
                                                  full_payload)
        self.scene = self.scene._replace(**split)
        self._alpha_mask_cache = mask

    # -- configuration ------------------------------------------------------
    def set_integrator(self, integrator: Integrator):
        """Swaps the integrator; restarts accumulation if changed
        (raytracer.rs:196-231)."""
        if integrator is not self.integrator:
            self.integrator = integrator
            self._request_new_frame = True

    def set_exposure(self, exposure: float):
        self.exposure = float(exposure)

    def update_camera(self, camera: Camera):
        """Restarts progressive accumulation (raytracer.rs update_camera)."""
        self.camera = camera
        self._request_new_frame = True

    def update_materials_and_lights(self, materials, lights):
        """Re-flattens material/light/sky buffers in place
        (RayTraceScene::update_materials_and_lights, scene.rs:1578-1624)
        and restarts accumulation. Requires construction from a parsed
        scene (so host-side instance tables exist)."""
        from glaze_tpu.scene import flatten

        if self.host is None:
            raise ValueError(
                "update_materials_and_lights needs a renderer built from a "
                "parsed scene; use change_scene for DeviceScene-built ones"
            )
        mats = flatten.flatten_materials(materials)
        lights_r = flatten.reorder_lights(lights)
        lts = flatten.flatten_lights(
            lights_r,
            self.host.inst_material,
            self.host.inst_tri_first,
            self.host.inst_tri_count,
        )
        sky = flatten.build_sky_tables(lights_r, self.host.textures)
        updates = {k: jnp.asarray(v) for k, v in {**mats, **lts, **sky}.items()}
        self.scene = self.scene._replace(**updates)
        self.host = self.host._replace(materials=list(materials), lights=lights_r)
        self._refresh_alpha_rounds()
        self._dn_hist = None  # scene content changed: old display history would ghost
        self._request_new_frame = True

    def update_textures(self, textures):
        """Swaps the texture set: rebuilds the packed atlas and — like the
        reference, which rebuilds the sky distribution only when its
        texture changes (scene.rs:1598-1616) — the sky importance tables.
        Restarts accumulation (ui.rs textures window semantics)."""
        from glaze_tpu.ops.texture import build_atlas
        from glaze_tpu.scene import flatten

        if self.host is None:
            raise ValueError(
                "update_textures needs a renderer built from a parsed scene"
            )
        atlas = build_atlas(list(textures))
        sky = flatten.build_sky_tables(self.host.lights, list(textures))
        updates = {"atlas": atlas}
        updates.update({k: jnp.asarray(v) for k, v in sky.items()})
        self.scene = self.scene._replace(**updates)
        self.host = self.host._replace(textures=list(textures))
        self._refresh_alpha_rounds()
        self._dn_hist = None  # scene content changed: old display history would ghost
        self._request_new_frame = True

    def change_resolution(self, width: int, height: int):
        self.width, self.height = int(width), int(height)
        self._state = integ.init_state(self.width, self.height,
                                       self.samples_in_flight)
        self._dn_hist = None  # scene content changed: old display history would ghost
        self._request_new_frame = True

    def change_scene(self, parsed, camera=None):
        """Full scene swap (raytracer.rs change_scene)."""
        from glaze_tpu.scene import flatten_scene

        self.scene, parsed_cam, self.host = flatten_scene(parsed)
        if camera is not None:
            self.camera = camera
        elif parsed_cam is not None:
            self.camera = parsed_cam
        self._refresh_alpha_rounds()
        self._dn_hist = None  # scene content changed: old display history would ghost
        self._request_new_frame = True

    # -- rendering ------------------------------------------------------------
    def _frame_params(self):
        c2w, s2c = integ.camera_matrices(self.camera, self.width, self.height)
        return jnp.asarray(c2w), jnp.asarray(s2c)

    def _take_offsets(self, n: int):
        """Sub-pixel jitters for n steps: (n, 2), or (n, sif, 2) — one
        independent jitter per in-flight sample copy."""
        s = self.samples_in_flight
        if s == 1:
            return jnp.asarray(self._scheduler.take(n))
        return jnp.asarray(self._scheduler.take(n * s)).reshape(n, s, 2)

    def _maybe_restart(self):
        if self._request_new_frame:
            self._request_new_frame = False
            self._scheduler.rewind()
            if self._mesh is not None:
                # the sharded launch DONATES its input state, so the
                # shared zero-state cache below would be consumed on the
                # first launch; build a fresh state per restart instead
                self._state = integ.init_state(
                    self.width, self.height, self.samples_in_flight)
                return
            # cached zero state: JAX arrays are immutable, so every
            # restart can hand out the SAME device buffers — live camera
            # drags restart every frame, and re-dispatching ~25 zeros
            # ops per frame through the tunnel is pure overhead
            key = (self.width, self.height, self.samples_in_flight)
            if getattr(self, "_zero_key", None) != key:
                self._zero_state = integ.init_state(*key)
                self._zero_key = key
            self._state = self._zero_state

    def _gbuffer_key(self):
        c2w, s2c = integ.camera_matrices(self.camera, self.width,
                                         self.height)
        return (id(self.scene), self.width, self.height,
                self.camera.is_perspective, self._alpha_rounds,
                c2w.tobytes(), s2c.tobytes())

    def _gbuffer(self):
        """First-hit guide buffers for the denoiser, cached until the
        camera / scene / resolution changes (exactly the events that
        restart accumulation)."""
        from glaze_tpu.render import denoise as dn

        key = self._gbuffer_key()
        if self._gb_key != key:
            c2w, s2c = self._frame_params()
            self._gb = dn.gbuffer_pass(
                self.scene, c2w, s2c,
                width=self.width, height=self.height,
                is_persp=self.camera.is_perspective,
                alpha_rounds=self._alpha_rounds)
            self._gb_key = key
        return self._gb

    def denoised_image(self) -> np.ndarray:
        """Current progressive result through the edge-aware display
        filter (render/denoise.py), (H, W, 3) uint8 sRGB. The
        accumulation buffer is untouched."""
        from glaze_tpu.render import denoise as dn

        exposure = (jnp.float32(self.exposure)
                    if self.exposure is not None else self.scene.exposure)
        inv_map, pw, ph = dn.lane_to_image(self.width, self.height)
        img = dn.denoised_display(
            self._state.accum, self._state.count, self._gbuffer(),
            inv_map, exposure, pw=pw, ph=ph,
            sif=self.samples_in_flight,
            launches_per_spp=self.integrator.steps_per_sample)
        return np.asarray(jax.device_get(img))[: self.height, : self.width]

    def draw_frame(self, return_image: bool = False):
        """One launch: every pixel advances one bounce
        (raytracer.rs draw_frame, :369-603).

        ``return_image=True`` fuses the sRGB display conversion into the
        same executable and returns the (P', 3) u8 device array (one
        dispatch per frame — the interactive path), or the denoised
        (ph, pw, 3) u8 frame when ``self.denoise`` is on."""
        self._maybe_restart()
        c2w, s2c = self._frame_params()
        seeds = jnp.asarray(
            self._rng.integers(0, 2**32, size=1, dtype=np.uint32)
        )
        offsets = self._take_offsets(1)
        kw = dict(width=self.width, height=self.height,
                  is_persp=self.camera.is_perspective,
                  direct_only=self.integrator is Integrator.DIRECT,
                  steps=1, alpha_rounds=self._alpha_rounds,
                  sif=self.samples_in_flight, coherent=self.coherent,
                  sampler=self.sampler,
                  sampler_seed=jnp.uint32(self._sampler_seed))
        if return_image:
            exposure = (jnp.float32(self.exposure)
                        if self.exposure is not None
                        else self.scene.exposure)
            if self.denoise:
                from glaze_tpu.render import denoise as dn

                inv_map, _, _ = dn.lane_to_image(self.width, self.height)
                if self.temporal:
                    key = (self.width, self.height)
                    if self._dn_hist is None or self._dn_hist_key != key:
                        self._dn_hist = dn.init_history(*key)
                        self._dn_hist_key = key
                        self._dn_prev = dn.world_to_screen(
                            self.camera, self.width, self.height)
                    tkw = dict(
                        launches_per_spp=self.integrator.steps_per_sample,
                        **kw)
                    gb_key = self._gbuffer_key()
                    if self._gb_key == gb_key:
                        # camera still: reuse the cached G-buffer
                        self._state, self._dn_hist, img = (
                            dn.render_steps_denoised_temporal(
                                self.scene, self._state, self._dn_hist,
                                seeds, offsets, c2w, s2c, exposure,
                                self._gb, self._dn_prev, inv_map, **tkw))
                    else:
                        # camera moved (the drag path): compute the
                        # G-buffer INSIDE the same executable — one
                        # dispatch per drag frame, not two
                        self._state, self._dn_hist, img, self._gb = (
                            dn.render_steps_denoised_temporal_gb(
                                self.scene, self._state, self._dn_hist,
                                seeds, offsets, c2w, s2c, exposure,
                                self._dn_prev, inv_map, **tkw))
                        self._gb_key = gb_key
                    # this frame's camera is next frame's reprojection src
                    self._dn_prev = dn.world_to_screen(
                        self.camera, self.width, self.height)
                    return img
                self._state, img = dn.render_steps_denoised(
                    self.scene, self._state, seeds, offsets, c2w, s2c,
                    exposure, self._gbuffer(), inv_map,
                    launches_per_spp=self.integrator.steps_per_sample,
                    **kw,
                )
                return img
            self._state, img = integ.render_steps_with_image(
                self.scene, self._state, seeds, offsets, c2w, s2c,
                exposure, **kw,
            )
            return img
        self._state = integ.render_steps(
            self.scene, self._state, seeds, offsets, c2w, s2c, **kw,
        )

    def draw(self, spp: int, callback: Optional[Callable[[int], None]] = None,
             return_image: bool = True):
        """Blocking render of ``spp`` samples/pixel; returns (H, W, 3) u8
        (or None with ``return_image=False`` — multi-host pod runs gather
        the sharded state themselves, tools/pod_launch.py).

        ``callback(launches_done)`` fires between device chunks
        (raytracer.rs draw, :615-686), pipelined one chunk deep: chunk
        k+1 is dispatched BEFORE blocking on chunk k, so the host-side
        sync + callback overlap device work instead of serializing it
        (the reference keeps FRAMES_IN_FLIGHT=2 launches in flight the
        same way, raytracer.rs:615-654). Measured effect: short frames
        gain (118 -> 99 ms at render scale 0.2, tools/probe_frame.py);
        a full 1080p/256spp run is tunnel-average-bound and does not
        (2798.6 s before / 2814.6 s after — docs/PERF_LOG.md).
        """
        self._maybe_restart()
        c2w, s2c = self._frame_params()
        if self._mesh is not None:
            from glaze_tpu.parallel import mesh as pmesh

            scene = pmesh.place_replicated(self.scene, self._mesh)

            def steps_fn(state, seeds, offsets, n):
                lane_active = None
                if self.adaptive:
                    lane_active = integ.adaptive_lane_mask(
                        state, sif=1, tau=self.adaptive_tau,
                        min_count=self.adaptive_min)
                # donated state: draw's rebind below is the only use
                return pmesh.render_steps_sharded(
                    scene, state, seeds, offsets, c2w, s2c, self._mesh,
                    width=self.width, height=self.height,
                    is_persp=self.camera.is_perspective,
                    direct_only=self.integrator is Integrator.DIRECT,
                    steps=n, alpha_rounds=self._alpha_rounds,
                    coherent=self.coherent, sampler=self.sampler,
                    sampler_seed=jnp.uint32(self._sampler_seed),
                    lane_active=lane_active)
        else:
            def steps_fn(state, seeds, offsets, n):
                lane_active = None
                if self.adaptive:
                    # park tiles whose pixels are all display-converged
                    # (the mask is a tiny fused reduction per chunk)
                    lane_active = integ.adaptive_lane_mask(
                        state, sif=self.samples_in_flight,
                        tau=self.adaptive_tau,
                        min_count=self.adaptive_min)
                return integ.render_steps(
                    self.scene, state, seeds, offsets, c2w, s2c,
                    width=self.width, height=self.height,
                    is_persp=self.camera.is_perspective,
                    direct_only=self.integrator is Integrator.DIRECT,
                    steps=n, alpha_rounds=self._alpha_rounds,
                    sif=self.samples_in_flight, coherent=self.coherent,
                    sampler=self.sampler,
                    sampler_seed=jnp.uint32(self._sampler_seed),
                    lane_active=lane_active)
        # sif in-flight samples advance per step: the same per-pixel
        # sample budget takes 1/sif as many launches (rounded up)
        total = -(-spp * self.integrator.steps_per_sample
                  // self.samples_in_flight)
        done = 0
        pending = None  # (count array, launches) of the in-flight chunk
        for n in _chunk_sizes(total):
            seeds = jnp.asarray(
                self._rng.integers(0, 2**32, size=n, dtype=np.uint32)
            )
            offsets = self._take_offsets(n)
            self._state = steps_fn(self._state, seeds, offsets, n)
            done += n
            if callback is not None:
                if pending is not None:
                    # 1-element fetch = REAL completion (bare
                    # block_until_ready can return early through the
                    # remote-TPU tunnel; bytes on the host cannot lie)
                    jax.device_get(pending[0])
                    callback(pending[1])
                # snapshot ONE element as its own buffer: the sharded
                # path donates the state to the NEXT chunk's call, which
                # would invalidate a raw reference to this chunk's count
                pending = (self._state.count[:1], done)
        if callback is not None and pending is not None:
            jax.device_get(pending[0])
            callback(pending[1])
        if not return_image:
            jax.block_until_ready(self._state.count)
            return None
        return self.get_image()

    def get_image(self) -> np.ndarray:
        """Current progressive result as (H, W, 3) uint8 sRGB (denoised
        when ``self.denoise`` is set)."""
        if self.denoise:
            return self.denoised_image()
        exposure = (
            jnp.float32(self.exposure)
            if self.exposure is not None
            else self.scene.exposure
        )
        return integ.render_image(self._state, exposure, self.width,
                                  self.height, self.samples_in_flight)

    def save(self, path: str):
        from PIL import Image

        Image.fromarray(self.get_image()).save(path)

    # -- checkpoint / resume --------------------------------------------------
    # The reference has no render checkpointing (SURVEY §5) — a restart
    # loses accumulation. Here the progressive state IS the checkpoint:
    @property
    def completed_spp(self) -> int:
        """Samples/pixel accumulated so far (count is per-lane LAUNCHES;
        each launch advances samples_in_flight states per pixel)."""
        # reduce on device: fetching the whole per-lane count array just
        # to max it would pull ~MBs through the TPU tunnel
        count = int(jax.device_get(self._state.count.max()))
        return (count * self.samples_in_flight
                // self.integrator.steps_per_sample)

    # persist (accum, count, path state, host RNG) and resume exactly.
    def save_checkpoint(self, path: str, scene_id: str = ""):
        """Serializes the progressive accumulation state to ``path``.

        ``scene_id``: opaque scene identity (e.g. a content hash);
        ``load_checkpoint`` refuses a checkpoint whose scene_id differs —
        resuming scene A's accumulation on scene B silently blends two
        renders otherwise."""
        leaves, treedef = jax.tree.flatten(self._state)
        np.savez_compressed(
            path,
            scene_id=str(scene_id),
            n_leaves=len(leaves),
            width=self.width,
            height=self.height,
            samples_in_flight=self.samples_in_flight,
            integrator=self.integrator.value,
            sampler=self.sampler,
            sampler_seed=np.uint32(self._sampler_seed),
            # PCG64 state words are 128-bit ints; store as decimal strings
            rng_state=str(self._rng.bit_generator.state["state"]["state"]),
            rng_inc=str(self._rng.bit_generator.state["state"]["inc"]),
            scheduler_current=(
                np.asarray(self._scheduler.current, np.float32)
                if self._scheduler.current else np.zeros((0, 2, 2), np.float32)
            ),
            scheduler_next=(
                np.asarray(self._scheduler.next, np.float32)
                if self._scheduler.next else np.zeros((0, 2, 2), np.float32)
            ),
            **{f"leaf_{i}": np.asarray(jax.device_get(l))
               for i, l in enumerate(leaves)},
        )

    def load_checkpoint(self, path: str, scene_id: str = ""):
        """Restores a checkpoint written by :meth:`save_checkpoint`.

        Raises ``ValueError`` when both sides carry a non-empty
        ``scene_id`` and they differ (checkpoint from another scene)."""
        from glaze_tpu.render.scheduler import WorkScheduler

        data = np.load(path, allow_pickle=False)
        ck_scene = str(data["scene_id"]) if "scene_id" in data else ""
        if scene_id and ck_scene and ck_scene != str(scene_id):
            raise ValueError(
                f"checkpoint {path!r} was written for a different scene "
                f"(scene_id {ck_scene!r} != {str(scene_id)!r})")
        ck_sif = int(data["samples_in_flight"]) if "samples_in_flight" \
            in data else 1
        if (int(data["width"]) != self.width
                or int(data["height"]) != self.height
                or ck_sif != self.samples_in_flight):
            self.samples_in_flight = ck_sif
            self.change_resolution(int(data["width"]), int(data["height"]))
        self.integrator = Integrator(str(data["integrator"]))
        if "sampler" in data:
            self.sampler = str(data["sampler"])
            self._sampler_seed = np.uint32(data["sampler_seed"])
        leaves = [jnp.asarray(data[f"leaf_{i}"])
                  for i in range(int(data["n_leaves"]))]
        cur_leaves, treedef = jax.tree.flatten(self._state)
        shimmed = len(leaves) < len(cur_leaves)
        while len(leaves) < len(cur_leaves):
            # older checkpoint: the trailing leaves (path_no, sq) are
            # newer additions — resume with zeros (the LD stratification
            # restarts; the estimator itself is unaffected)
            leaves.append(jnp.zeros_like(cur_leaves[len(leaves)]))
        self._state = jax.tree.unflatten(treedef, leaves)
        if shimmed and self.adaptive:
            # a zero-shimmed ``sq`` next to a large ``count`` makes
            # tile_error read var = 0, so every tile would park
            # PERMANENTLY on the first adaptive mask (parked lanes never
            # accumulate sq, so the statistic cannot re-warm). Disable
            # adaptive for this resumed render; the estimator is exact
            # either way.
            log.warning(
                "checkpoint predates the adaptive variance statistic; "
                "disabling adaptive sampling for this resumed render")
            self.adaptive = False
        state = self._rng.bit_generator.state
        state["state"]["state"] = int(str(data["rng_state"]))
        state["state"]["inc"] = int(str(data["rng_inc"]))
        self._rng.bit_generator.state = state
        sched = WorkScheduler()
        sched.current = [tuple(map(tuple, a)) for a in data["scheduler_current"]]
        sched.next = [tuple(map(tuple, a)) for a in data["scheduler_next"]]
        self._scheduler = sched
        self._request_new_frame = False
