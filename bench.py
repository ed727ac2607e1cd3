"""Benchmark: path-tracing throughput in Mrays/s on the default device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline target (BASELINE.md): 200 Mrays/s/chip on Sponza-class scenes.

Workload = BASELINE config #4: a Sponza-class scene (262k-triangle
procedural atrium, tools/make_sponza.py — Sponza itself needs a network
download this image doesn't have) at 1920x1080, full path tracing with
NEE. Secondary keys report per-launch wall time and the extrapolated
time-to-256spp that BASELINE tracks.

Methodology: one warm-up render_steps call (compile), then timed calls of
a fused multi-launch scan with fresh per-launch seeds (distinct inputs;
the TPU tunnel dedupes identical executions, so repeat-same-args timing
lies). A launch = one path-tracing bounce for every pixel (camera ray or
bounce ray + NEE shadow ray); the Mrays metric counts primary/bounce rays
like the reference's traceRayEXT launches.

Every timed interval ends with a 1-element host transfer of the result,
NOT bare block_until_ready: after the 2026-08-18 tunnel restart,
block_until_ready was observed returning in ~0.2 ms for 1080p launches
that take ~1.6 s (the fps path, which fetches pixels, still showed the
real rate). Bytes on the host cannot lie; the measured transfer-only
round trip is subtracted from phase timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MRAYS = 200.0  # BASELINE.json target, Mrays/s/chip
WIDTH, HEIGHT = 1920, 1080
SPP_TARGET = 256
STEPS = 2  # per timed call; single executions beyond ~30s can
           # crash the remote TPU worker, so keep scans short
REPEATS = 3  # best-of over repeats; the tunnel carries ~20% timing noise,
             # so round-over-round deltas under ~1.2x need the extra sample


def main():
    # The axon TPU plugin can hang indefinitely inside `import jax` /
    # backend init when the tunnel is unreachable (observed outage
    # 2026-08-18). Arm a watchdog for the init phase only, so a dead
    # tunnel yields a parseable error line instead of an eternal hang;
    # it is disarmed the moment the backend answers.
    import threading

    init_done = threading.Event()

    def _watchdog():
        limit = float(os.environ.get("GLAZE_BENCH_INIT_TIMEOUT", "900"))
        if not init_done.wait(timeout=limit):
            print(json.dumps({
                "metric": "mrays_per_sec", "value": None, "unit": "Mrays/s",
                "vs_baseline": None,
                "error": f"jax backend init exceeded {limit:.0f} s "
                         "(TPU tunnel unreachable?)",
            }), flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.devices()
    init_done.set()

    from glaze_tpu.render import integrator as integ
    from glaze_tpu.render.renderer import RayTraceRenderer
    from glaze_tpu.utils import enable_compilation_cache
    from tools.make_sponza import build_scene

    enable_compilation_cache()

    t_setup = time.perf_counter()
    parsed = build_scene()
    # the renderer's SHIPPED defaults (coherent='frame' offline unless
    # GLAZE_COHERENT overrides) — the headline must measure the config a
    # user actually gets (VERDICT r3 #1)
    r = RayTraceRenderer(parsed, width=WIDTH, height=HEIGHT, seed=3)
    p = integ.pixel_count(WIDTH, HEIGHT)
    c2w, s2c = integ.camera_matrices(r.camera, WIDTH, HEIGHT)
    c2w, s2c = jnp.asarray(c2w), jnp.asarray(s2c)
    # samples-in-flight (GLAZE_SIF): sif independent path states per
    # pixel advance per launch — a denser Morton-sorted wavefront cuts
    # the row-union factor (tools/bench_density.py measurements)
    sif = int(os.environ.get("GLAZE_SIF", "1"))
    kw = dict(width=WIDTH, height=HEIGHT, is_persp=True, direct_only=False,
              steps=STEPS, alpha_rounds=r._alpha_rounds, sif=sif,
              coherent=r.coherent, sampler=r.sampler,
              sampler_seed=jnp.uint32(r._sampler_seed))
    # fresh entropy per run: the TPU tunnel dedupes identical
    # (executable, inputs) pairs ACROSS PROCESSES, so a fixed seed makes
    # repeat runs of an unchanged build return cached results at ~0 ms
    rng = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))
    setup_s = time.perf_counter() - t_setup

    def run(state):
        seeds = jnp.asarray(rng.integers(0, 2**32, STEPS, dtype=np.uint32))
        oshape = (STEPS, 2) if sif == 1 else (STEPS, sif, 2)
        offs = jnp.asarray(rng.random(oshape, np.float32))
        return integ.render_steps(r.scene, state, seeds, offs, c2w, s2c, **kw)

    def sync(x):
        """Force REAL completion: fetch one element to the host.
        (bare block_until_ready can return without waiting — see module
        docstring.)"""
        return np.asarray(jax.device_get(x[:1] if getattr(x, "ndim", 0)
                                         else x))

    state = integ.init_state(WIDTH, HEIGHT, sif)
    state = run(state)  # compile + warm
    sync(state.count)

    # transfer-only round trip (subtracted from short phase timings)
    t0 = time.perf_counter()
    sync(state.count)
    rtt = time.perf_counter() - t0

    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        state = run(state)
        sync(state.count)
        best = min(best, time.perf_counter() - t0)

    # per-phase counters (VERDICT: one aggregate number hides where the
    # next regression lands): primary-ray closest hit and incoherent
    # any-hit, timed standalone on the same scene
    phases = {}
    if os.environ.get("GLAZE_BENCH_PHASES", "1") == "1":
        from glaze_tpu import accel

        px, py = integ.pixel_coords(WIDTH, HEIGHT)
        ndc_x = -1.0 + 2.0 * (px + 0.5) / WIDTH
        ndc_y = -1.0 + 2.0 * (py + 0.5) / HEIGHT
        o, d = integ.camera_rays(ndc_x, ndc_y, c2w, s2c, True)

        def timed_phase(fn):
            # random per-call perturbation: a DETERMINISTIC eps (the old
            # 1e-5*k) repeats across bench invocations, so the tunnel's
            # cross-process dedup returns cached results at ~0 ms
            sync(fn(1e-5 * float(rng.random())))
            t = float("inf")
            for _ in range(3):
                eps = 1e-5 * float(rng.random())
                t0 = time.perf_counter()
                sync(fn(eps))
                t = min(t, time.perf_counter() - t0)
            return max(t - rtt, 1e-9)

        any_tree = (r.scene.bvh_any if r.scene.bvh_any is not None
                    else r.scene.bvh)
        t_closest = timed_phase(lambda eps: accel.closest_hit_soa_auto(
            r.scene.bvh, tuple(c + eps for c in o), d)["t"])
        t_any = timed_phase(lambda eps: accel.any_hit_soa_auto(
            any_tree, tuple(c + eps for c in o), d, 100.0))
        phases = {
            "closest_primary_mrays": round(p / t_closest / 1e6, 2),
            "anyhit_primary_mrays": round(p / t_any / 1e6, 2),
        }

        # The DOMINANT phases (round-2 cost model: bounce drains ~60% of
        # a launch): re-trace the REAL trace-phase buffers of a
        # steady-state launch, captured via integrator._capture_sink
        # (tools/capture_rays.py mechanism), through the production
        # sorted trace paths. These are the numbers round-over-round
        # kernel work must move (VERDICT r2 weak #4).
        # the production sif lane layout, so the capture runs on the
        # same (sif-sized) steady state the timed loop produced
        size = jnp.asarray([WIDTH, HEIGHT], jnp.float32)
        px_, py_, rng_py = integ.sif_lanes(WIDTH, HEIGHT, sif)
        ckw = dict(is_persp=True, direct_only=False,
                   alpha_rounds=r._alpha_rounds, rng_py=rng_py,
                   coherent=r.coherent, sampler=r.sampler,
                   sampler_seed=jnp.uint32(r._sampler_seed))

        names = []  # filled at trace time (strings can't ride jit outputs)

        def step_capture(scene, st, seed, offset):
            sink = []
            integ._capture_sink = sink
            try:
                integ.launch_step(scene, st, seed, offset, c2w, s2c,
                                  px_, py_, size, **ckw)
            finally:
                integ._capture_sink = None
            del names[:]
            names.extend(rec.pop("phase") for rec in sink)
            return sink

        sink = jax.jit(step_capture)(
            r.scene, state, jnp.uint32(rng.integers(0, 2**32)),
            jnp.asarray(rng.random(2, np.float32)))
        jax.block_until_ready(sink)
        bufs = dict(zip(names, sink))
        bo = bufs["closest"]
        t_bounce = timed_phase(lambda eps: integ.trace_alpha_sorted(
            r.scene, tuple(c + eps for c in bo["o"]), bo["d"],
            alpha_rounds=r._alpha_rounds)["t"])
        phases["closest_bounce_mrays"] = round(p * sif / t_bounce / 1e6, 2)
        if "anyhit_nee" in bufs:
            bs = bufs["anyhit_nee"]
            t_shadow = timed_phase(
                lambda eps: integ._occlusion_sorted(
                    r.scene, tuple(c + eps for c in bs["o"]), bs["d"],
                    bs["tmax"], bs["active"],
                    r._alpha_rounds).astype(jnp.float32))
            phases["anyhit_shadow_mrays"] = round(
                p * sif / t_shadow / 1e6, 2)
            phases["shadow_active_frac"] = round(
                float(jnp.mean(bs["active"].astype(jnp.float32))), 3)

    # Sharded paths on the real device set (n=1 on a single chip — still
    # proves the GSPMD executables compile AND run on TPU hardware,
    # which the CPU multichip dryrun cannot; VERDICT r2 next #8). ALL
    # THREE modes are timed every round (VERDICT r4 next #6: spp/2d
    # carried the pod extrapolation without ever being timed on chip):
    # pix = pixel-axis shard (the headline's mode, key sharded_mrays),
    # spp = sample-axis (full image per slot), 2d = samples x pixels.
    sharded = {}
    if os.environ.get("GLAZE_BENCH_SHARDED", "1") == "1":
        from glaze_tpu.parallel import mesh as pmesh

        # the sharded wrappers run sif=1 (samples-in-flight is an
        # unsharded-path knob); don't forward it
        kw_sh = {k: v for k, v in kw.items() if k != "sif"}

        def time_sharded(mode):
            m = pmesh.make_mesh()
            n_dev = int(m.devices.size)
            if mode == "spp":
                st = pmesh.init_state_spp(WIDTH, HEIGHT, n_dev)
                fn = pmesh.render_steps_spp_sharded
            elif mode == "2d":
                # n=1 chip: a (1, 1) mesh; on a pod this would be
                # (n_samples, n/n_samples)
                m = pmesh.make_mesh_2d(1)
                st = pmesh.init_state_spp(WIDTH, HEIGHT, 1)
                fn = pmesh.render_steps_2d_sharded
            else:
                st = integ.init_state(WIDTH, HEIGHT)
                fn = pmesh.render_steps_sharded
            n_grp = (n_dev if mode == "spp" else
                     (1 if mode == "2d" else None))
            # place the replicated scene ONCE (an unconditional per-call
            # device_put measured ~250 ms/call, tools/bench_sharded_gap)
            scene_sh = pmesh.place_replicated(r.scene, m)

            def run_sh(st):
                shape = (STEPS,) if n_grp is None else (STEPS, n_grp)
                seeds = jnp.asarray(
                    rng.integers(0, 2**32, shape, dtype=np.uint32))
                offs = jnp.asarray(rng.random((STEPS, 2), np.float32))
                return fn(scene_sh, st, seeds, offs, c2w, s2c, m, **kw_sh)

            st = run_sh(st)  # compile + warm
            sync(st.count)
            dt = float("inf")
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                st = run_sh(st)
                sync(st.count)
                dt = min(dt, time.perf_counter() - t0)
            rays_sh = p * STEPS * (n_grp or 1)
            return n_dev, round(rays_sh / dt / 1e6, 3)

        for mode, key in (("pix", "sharded_mrays"),
                          ("spp", "sharded_spp_mrays"),
                          ("2d", "sharded_2d_mrays")):
            try:
                n_dev, mr = time_sharded(mode)
                sharded[key] = mr
                sharded["sharded_ok"] = True
                sharded["sharded_devices"] = n_dev
            except Exception as e:  # never fail the headline number
                sharded[key] = None
                sharded[f"sharded_{mode}_error"] = str(e)[:200]
        sharded.setdefault("sharded_ok", False)
        sharded["sharded_mode"] = "pix+spp+2d"

    # Interactive fps (BASELINE's >10 fps progressive bar) measured on the
    # same scene so the claim lives in the driver-recorded artifact, not
    # just in docs. Progressive PT at render scale 0.2 + the flat raster
    # preview at 0.25, pipelined frames (realtime.py draw path).
    fps = {}

    def timed_fps(rr, n=12):
        rr.draw_frame(pipelined=True)  # compile
        rr.draw_frame(pipelined=True)
        t0 = time.perf_counter()
        for _ in range(n):
            rr.draw_frame(pipelined=True)
        return n / (time.perf_counter() - t0)

    if os.environ.get("GLAZE_BENCH_FPS", "1") == "1":
        from glaze_tpu.render.realtime import RealtimeRenderer

        try:
            rr = RealtimeRenderer(parsed, width=WIDTH, height=HEIGHT,
                                  render_scale=0.2, seed=11)
            fps["progressive_fps_scale02"] = round(timed_fps(rr), 2)
            rr.use_raytracer = False
            fps["flat_preview_fps_scale02"] = round(timed_fps(rr), 2)

            # the viewport mouse-look workload: every frame rotates the
            # camera, restarting accumulation (all-primary launches)
            rr25 = RealtimeRenderer(parsed, width=WIDTH, height=HEIGHT,
                                    render_scale=0.25, seed=11)

            def timed_drag(rr, n=24, windows=2):
                rr.look_around(1e-4, 0.0)
                rr.draw_frame(pipelined=True)  # compile restart path
                rr.draw_frame(pipelined=True)
                best = 0.0
                for _ in range(windows):  # best-of: ~20% tunnel noise
                    t0 = time.perf_counter()
                    for _ in range(n):
                        rr.look_around(1e-4, 0.0)
                        rr.draw_frame(pipelined=True)
                    best = max(best, n / (time.perf_counter() - t0))
                return best

            fps["drag_fps_scale025"] = round(timed_drag(rr25), 2)
            rr.use_raytracer = True
            fps["drag_fps_scale02"] = round(timed_drag(rr), 2)
            # denoised+temporal drag (render/denoise.py): the SVGF-style
            # display path the app/viewer toggle, measured at the same
            # scale so its cost is visible round-over-round
            rr25.denoise = True
            fps["drag_fps_denoised_scale025"] = round(timed_drag(rr25), 2)
        except Exception as e:  # never fail the headline number
            fps = {"fps_error": str(e)[:200]}

    # Incoherent (mode 0) A/B leg: the headline above runs the SHIPPED
    # coherent default; this segment re-times the launch with fully
    # independent per-pixel chains so the coherent win stays measured
    # round-over-round (r1-r3 headlines were mode 0). Skipped when the
    # whole bench is already pinned to a mode via GLAZE_COHERENT.
    coh = {}
    if (os.environ.get("GLAZE_BENCH_INCOHERENT", "1") == "1"
            and os.environ.get("GLAZE_COHERENT") in (None, "")):
        try:
            kw0 = dict(kw, coherent=0)

            def run0(state):
                seeds = jnp.asarray(
                    rng.integers(0, 2**32, STEPS, dtype=np.uint32))
                oshape = (STEPS, 2) if sif == 1 else (STEPS, sif, 2)
                offs = jnp.asarray(rng.random(oshape, np.float32))
                return integ.render_steps(r.scene, state, seeds, offs,
                                          c2w, s2c, **kw0)

            st = integ.init_state(WIDTH, HEIGHT, sif)
            st = run0(st)
            sync(st.count)
            dt = float("inf")
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                st = run0(st)
                sync(st.count)
                dt = min(dt, time.perf_counter() - t0)
            coh["incoherent_mrays"] = round(p * STEPS * sif / dt / 1e6, 3)
            coh["incoherent_launch_ms"] = round(dt / STEPS * 1e3, 1)
        except Exception as e:  # never fail the headline number
            coh["incoherent_error"] = str(e)[:200]

    # Time-to-quality segment (VERDICT r3 #2, REBUILT per VERDICT r4
    # weak #1: the r4 artifact compared ld against itself after the ld
    # default landed, and single-seed TTQ spread exceeded the claimed
    # effect). Both samplers now run EXPLICITLY, each over ≥3 seeds;
    # the artifact records medians AND the per-seed values so the
    # separation can be judged against the spread. A coherent-off
    # ladder (1 seed per sampler — it is ~2x slower per spp) keeps the
    # incoherent sampler comparison measured too.
    ttq = {}
    if os.environ.get("GLAZE_BENCH_TTQ", "1") == "1":
        try:
            tw, th = 384, 216  # scale 0.2 of the 1080p frame
            # target sits between the 8-spp MSE (~35-50 here) and the
            # 192-spp truth floor; r4 first-run ladders hit 60 on the
            # first rung, so 30 with 4-spp rungs gives real resolution
            target = float(os.environ.get("GLAZE_TTMSE_TARGET", "30"))
            seeds_n = int(os.environ.get("GLAZE_TTQ_SEEDS", "3"))
            tr = RayTraceRenderer(parsed, width=tw, height=th, seed=777)
            truth = np.asarray(tr.draw(192), float)
            del tr

            def time_to_mse(seed, **kwargs):
                rr = RayTraceRenderer(parsed, width=tw, height=th,
                                      seed=seed, **kwargs)
                wall = 0.0
                ladder = []
                for _ in range(24):  # ≤96 spp in 4-spp rungs
                    t0 = time.perf_counter()
                    img = rr.draw(4)
                    wall += time.perf_counter() - t0
                    mse = float(((np.asarray(img, float) - truth) ** 2)
                                .mean())
                    ladder.append(round(mse, 1))
                    if mse <= target:
                        return round(wall, 1), ladder
                return None, ladder  # did not reach target within 96 spp

            def ttq_leg(key, n_seeds, **kwargs):
                # warm the executables first (fresh configs would bill
                # their XLA compile to the first rung's wall time)
                rw = RayTraceRenderer(parsed, width=tw, height=th,
                                      seed=1, **kwargs)
                rw.draw(4)
                del rw
                walls, ladders = [], []
                for _ in range(n_seeds):
                    t, lad = time_to_mse(int(rng.integers(1, 2**31)),
                                         **kwargs)
                    walls.append(t)
                    ladders.append(lad)
                ok = [w for w in walls if w is not None]
                ttq[f"ttq_{key}_s_all"] = walls
                ttq[f"ttq_{key}_s_median"] = (
                    round(float(np.median(ok)), 1) if ok else None)
                ttq[f"ttq_{key}_ladder0"] = ladders[0]

            ttq["ttq_target_mse"] = target
            ttq_leg("pcg", seeds_n, sampler="pcg")
            ttq_leg("ld", seeds_n, sampler="ld")
            ttq_leg("pcg_incoh", 1, sampler="pcg", coherent=0)
            ttq_leg("ld_incoh", 1, sampler="ld", coherent=0)
            # cross-round continuity: time_to_mse_s = SHIPPED default
            ttq["time_to_mse_s"] = ttq.get(
                f"ttq_{r.sampler}_s_median")
        except Exception as e:  # never fail the headline number
            ttq = {"ttq_error": str(e)[:200]}

    rays = p * STEPS * sif
    mrays = rays / best / 1e6
    launch_ms = best / STEPS * 1e3
    # BASELINE's convergence metric, extrapolated from the launch rate
    # (256 spp x PT_STEPS launches; each launch advances sif samples)
    tt256 = SPP_TARGET * integ.PT_STEPS * launch_ms / sif / 1e3
    print(json.dumps({
        "metric": "mrays_per_sec",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
        "scene": "sponza_class_262k_tris",
        "resolution": f"{WIDTH}x{HEIGHT}",
        "launch_ms": round(launch_ms, 1),
        "time_to_256spp_s": round(tt256, 1),
        "setup_s": round(setup_s, 1),
        # active perf knobs, so cross-round JSONs are self-describing
        "tile": f"{integ.TILE_W}x{integ.TILE_H}",
        "sif": sif,
        "sort": integ.SORT_MODE,
        "tree": os.environ.get("GLAZE_TREE", "classic"),
        "coherent": r.coherent,
        "sampler": r.sampler,
        "alpha_rounds": r._alpha_rounds,
        **phases,
        **sharded,
        **fps,
        **coh,
        **ttq,
    }))


if __name__ == "__main__":
    main()
