"""On-hardware validation of the Pallas traversal kernels.

The CPU test suite exercises the XLA reference walker, NOT the Mosaic
compilation of the Pallas kernels — so TPU-only miscompiles are invisible
to CI. This tool traces primary and incoherent random rays through both
the Pallas kernels and the XLA walker ON THE SAME DEVICE and compares.

Run on a TPU host: python tools/check_tpu.py  (exits nonzero on mismatch)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from glaze_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def main():
    from glaze_tpu.parser import parse
    from glaze_tpu.render.renderer import RayTraceRenderer
    from glaze_tpu.render import integrator as integ
    from glaze_tpu.accel import FatBVH

    parsed = parse("/root/reference/resources/mattest.glaze")
    r = RayTraceRenderer(parsed, width=64, height=64, seed=3)
    scene = r.scene
    if isinstance(scene.bvh, FatBVH):
        from glaze_tpu.accel.traverse_fat import (
            closest_hit_fat_soa as closest_hit_soa,
            any_hit_fat_soa as any_hit_soa)
        from glaze_tpu.accel import (closest_hit_fat as _ch,
                                     any_hit_fat as _ah)
        closest_hit, any_hit = _ch, _ah
        print("checking FAT kernels (leaf_size",
              scene.bvh.leaf_size, ")")
    else:
        from glaze_tpu.accel.traverse_pallas import (closest_hit_soa,
                                                     any_hit_soa)
        from glaze_tpu.accel.bvh import closest_hit, any_hit
    # in hybrid mode the classic any-hit tree serves the NEE shadow
    # phase — check its Pallas kernel against the XLA walker too
    if scene.bvh_any is not None:
        from glaze_tpu.accel.traverse_pallas import (
            any_hit_soa as any_hit_soa_classic)
        from glaze_tpu.accel.bvh import any_hit as any_hit_classic
        print("hybrid: classic any-hit tree present")
    c2w, s2c = integ.camera_matrices(r.camera, 64, 64)
    px, py = integ.pixel_coords(64, 64)
    ndc_x = -1.0 + 2.0 * (px + 0.5) / 64
    ndc_y = -1.0 + 2.0 * (py + 0.5) / 64
    o, d = integ.camera_rays(ndc_x, ndc_y, jnp.asarray(c2w),
                             jnp.asarray(s2c), True)
    om = np.stack([np.asarray(c) for c in o], -1)
    dm = np.stack([np.asarray(c) for c in d], -1)
    ph = closest_hit_soa(scene.bvh, o, d)
    t = np.asarray(ph["t"])
    tri0 = np.asarray(ph["tri"])
    rng = np.random.default_rng(3)
    bo = om + dm * np.where(tri0 >= 0, t, 1.0)[:, None]
    bd = rng.normal(size=dm.shape).astype(np.float32)
    bd /= np.linalg.norm(bd, axis=-1, keepdims=True)

    failed = False
    for name, (O, D) in {"primary": (om, dm), "random": (bo, bd)}.items():
        o3 = tuple(jnp.asarray(O[:, i]) for i in range(3))
        d3 = tuple(jnp.asarray(D[:, i]) for i in range(3))
        pk = closest_hit_soa(scene.bvh, o3, d3)
        ref = closest_hit(scene.bvh, jnp.asarray(O), jnp.asarray(D))
        tp, tr = np.asarray(pk["t"]), np.asarray(ref["t"])
        ip, ir = np.asarray(pk["tri"]), np.asarray(ref["tri"])
        # t must agree; tri may differ only where two triangles tie on t
        bad_t = ~np.isclose(np.nan_to_num(tp, posinf=1e30),
                            np.nan_to_num(tr, posinf=1e30),
                            rtol=1e-4, atol=1e-5)
        tri_diff = (ip != ir) & ~bad_t
        print(f"{name} closest: t mismatch {bad_t.mean():.5f}  "
              f"tri-only diff {tri_diff.mean():.5f}")
        if bad_t.mean() > 0.001:
            failed = True
        ap = np.asarray(any_hit_soa(scene.bvh, o3, d3, 2.0))
        ar = np.asarray(any_hit(scene.bvh, jnp.asarray(O), jnp.asarray(D),
                                2.0))
        print(f"{name} anyhit : mismatch {(ap != ar).mean():.5f}  "
              f"(pallas {ap.mean():.3f} ref {ar.mean():.3f})")
        if (ap != ar).mean() > 0.001:
            failed = True
        if scene.bvh_any is not None:
            ap2 = np.asarray(any_hit_soa_classic(scene.bvh_any, o3, d3, 2.0))
            ar2 = np.asarray(any_hit_classic(
                scene.bvh_any, jnp.asarray(O), jnp.asarray(D), 2.0))
            print(f"{name} anyhit(hybrid classic): mismatch "
                  f"{(ap2 != ar2).mean():.5f}")
            if (ap2 != ar2).mean() > 0.001:
                failed = True
    # streamed-mode check (classic kernels only): force tri_resident=False
    # via the budget env override in a SUBPROCESS and diff against the
    # resident results above. Real Mosaic DMA/semaphore scheduling in the
    # double-buffered drain is exercised only here — interpret-mode CPU
    # tests compile none of it. In hybrid mode the classic tree is
    # scene.bvh_any; only a fat-everything run has no classic tree.
    classic_tree = (scene.bvh_any if scene.bvh_any is not None
                    else (None if isinstance(scene.bvh, FatBVH)
                          else scene.bvh))
    if classic_tree is not None:
        import subprocess
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            rays = os.path.join(td, "rays.npz")
            outp = os.path.join(td, "streamed.npz")
            np.savez(rays, om=om, dm=dm, bo=bo, bd=bd)
            code = (
                "import sys, numpy as np, jax.numpy as jnp;"
                f"sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))});"
                "from glaze_tpu.parser import parse;"
                "from glaze_tpu.render.renderer import RayTraceRenderer;"
                "from glaze_tpu.accel.traverse_pallas import closest_hit_soa, any_hit_soa;"
                "r = RayTraceRenderer(parse('/root/reference/resources/mattest.glaze'), width=64, height=64, seed=3);"
                f"z = np.load({repr(rays)}); out = {{}};\n"
                "for name in ('primary', 'random'):\n"
                "    O, D = (z['om'], z['dm']) if name == 'primary' else (z['bo'], z['bd'])\n"
                "    o3 = tuple(jnp.asarray(O[:, i]) for i in range(3))\n"
                "    d3 = tuple(jnp.asarray(D[:, i]) for i in range(3))\n"
                "    h = closest_hit_soa(r.scene.bvh, o3, d3)\n"
                "    out[name + '_t'] = np.asarray(h['t'])\n"
                "    out[name + '_tri'] = np.asarray(h['tri'])\n"
                "    out[name + '_any'] = np.asarray(any_hit_soa(r.scene.bvh, o3, d3, 2.0))\n"
                f"np.savez({repr(outp)}, **out)\n"
            )
            env = dict(os.environ, GLAZE_COMBINED_VMEM_BUDGET="1",
                       GLAZE_TREE="classic")
            res = subprocess.run([sys.executable, "-c", code], env=env,
                                 capture_output=True, text=True, timeout=900)
            if res.returncode != 0:
                print("streamed subprocess FAILED:\n" + res.stderr[-2000:])
                failed = True
            else:
                s = np.load(outp)
                for name, (O, D) in {"primary": (om, dm),
                                     "random": (bo, bd)}.items():
                    o3 = tuple(jnp.asarray(O[:, i]) for i in range(3))
                    d3 = tuple(jnp.asarray(D[:, i]) for i in range(3))
                    from glaze_tpu.accel.traverse_pallas import (
                        closest_hit_soa as _cls_closest,
                        any_hit_soa as _cls_any)
                    h = _cls_closest(classic_tree, o3, d3)
                    bad_t = ~np.isclose(
                        np.nan_to_num(s[name + "_t"], posinf=1e30),
                        np.nan_to_num(np.asarray(h["t"]), posinf=1e30),
                        rtol=1e-4, atol=1e-5)
                    any_m = (s[name + "_any"]
                             != np.asarray(_cls_any(classic_tree, o3, d3,
                                                    2.0)))
                    print(f"{name} streamed-vs-resident: t mismatch "
                          f"{bad_t.mean():.5f}  anyhit {any_m.mean():.5f}")
                    if bad_t.mean() > 0.001 or any_m.mean() > 0.001:
                        failed = True

    # masked-kernel check (baked opacity cell masks): the alpha_mask
    # variant of the windowed closest kernel is Mosaic code the CPU
    # suite only runs in interpret mode. Synthetic payload over the
    # mattest geometry: odd triangles' cells all TRANSPARENT (skipped),
    # even triangles 8x8 checkerboard of OPAQUE/MIXED. Compare the
    # Pallas kernel against the XLA masked walker ON DEVICE.
    if not isinstance(scene.bvh, FatBVH) and not hasattr(scene.bvh,
                                                         "chunks"):
        from glaze_tpu.accel.bvh import (attach_tri_payload,
                                         pack_alpha_masks,
                                         closest_hit_masked)
        from glaze_tpu.accel.traverse_pallas import closest_hit_soa_masked

        n_slots = scene.bvh.tri.shape[0]
        codes = np.zeros((n_slots, 64), np.int8)
        codes[1::2, :] = 2
        cell = np.arange(64)
        checker = ((cell % 8 + cell // 8) % 2).astype(np.int8)  # 0/1
        codes[0::2, :] = checker[None, :]
        masked_tree = attach_tri_payload(scene.bvh, pack_alpha_masks(codes))
        for name, (O, D) in {"primary": (om, dm), "random": (bo, bd)}.items():
            o3 = tuple(jnp.asarray(O[:, i]) for i in range(3))
            d3 = tuple(jnp.asarray(D[:, i]) for i in range(3))
            hp = closest_hit_soa_masked(masked_tree, o3, d3)
            hr = closest_hit_masked(masked_tree, jnp.asarray(O),
                                    jnp.asarray(D))
            bad_t = ~np.isclose(
                np.nan_to_num(np.asarray(hp["t"]), posinf=1e30),
                np.nan_to_num(np.asarray(hr["t"]), posinf=1e30),
                rtol=1e-4, atol=1e-5)
            mix_m = (np.asarray(hp["mixed"]) != np.asarray(hr["mixed"])) \
                & ~bad_t
            print(f"{name} masked: t mismatch {bad_t.mean():.5f}  "
                  f"mixed mismatch {mix_m.mean():.5f}  "
                  f"(hit rate {np.asarray(hp['tri'] >= 0).mean():.3f})")
            if bad_t.mean() > 0.001 or mix_m.mean() > 0.001:
                failed = True
            # 3-state masked any-hit vs the XLA masked walker
            from glaze_tpu.accel.bvh import any_hit_masked
            from glaze_tpu.accel.traverse_pallas import any_hit_soa_masked

            bp, pp = any_hit_soa_masked(masked_tree, o3, d3, 2.0)
            br, pr = any_hit_masked(masked_tree, jnp.asarray(O),
                                    jnp.asarray(D), 2.0)
            b_m = (np.asarray(bp) != np.asarray(br)).mean()
            p_m = (np.asarray(pp) != np.asarray(pr)).mean()
            print(f"{name} masked-anyhit: blocked mismatch {b_m:.5f}  "
                  f"pending mismatch {p_m:.5f} (blocked "
                  f"{np.asarray(bp).mean():.3f} pending "
                  f"{np.asarray(pp).mean():.3f})")
            if b_m > 0.001 or p_m > 0.001:
                failed = True

    # full-pipeline render check: brightness + spatial structure (the
    # carrier-corruption failure mode renders uniform speckle that no
    # kernel-level check catches)
    state = integ.init_state(64, 64)
    seeds = jnp.asarray(np.arange(4, dtype=np.uint32) + 5)
    offs = jnp.asarray(np.full((4, 2), 0.5, np.float32))
    # DIRECT: structure-dominant at low spp (PT at 1spp is firefly-noisy
    # enough to blur the cluster metric)
    kw = dict(width=64, height=64, is_persp=True, direct_only=True,
              steps=4, alpha_rounds=r._alpha_rounds)
    st = integ.render_steps(r.scene, state, seeds, offs, jnp.asarray(c2w),
                            jnp.asarray(s2c), **kw)
    acc = np.stack([integ.to_image_np(st.accum[i], 64, 64)
                    for i in range(3)], -1)
    cnt = integ.to_image_np(st.count, 64, 64)[..., None]
    lum = (acc / np.maximum(cnt, 1)).mean(-1)
    bright = lum > np.percentile(lum, 80)
    clustered = (bright[1:, :] & bright[:-1, :]).mean() / max(
        bright.mean(), 1e-9)
    print(f"render: per-launch mean {lum.mean():.5f}  cluster {clustered:.2f}")
    if lum.mean() < 8e-4 or clustered < 0.35:
        print("render check FAILED (black or structureless)")
        failed = True

    print("FAIL" if failed else "OK")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
