"""Equal-spp convergence probe for coherent sampling (the default since
round 4 — render/renderer.py default_coherent).

The claim behind the default (render/integrator.py COHERENT): sharing
RNG chains across lanes correlates pixels SPATIALLY but leaves each
pixel's estimator unbiased with unchanged per-pixel variance, because
samples stay independent ACROSS launches. If that holds, error vs a
converged truth at equal spp must match mode 0 for every spp — the
noise merely looks blotchy instead of high-frequency while it lasts.

Probes THREE scenes (VERDICT r3 #1):
  * matrow — the all-families golden row (six BSDF families,
    OMNI+AREA+SKY lights);
  * mattest — the reference's own shipped test scene, via the parser;
  * mini-atrium — the sponza-class gate scene (textured surfaces,
    SKY+SUN+OMNI+AREA; tools/make_sponza.build_mini_scene).

Metrics per (scene, mode, spp), all on the DISPLAYED image (sRGB u8,
the same render_image path every frontend shows):
  * display MSE vs a 512-spp mode-0 truth;
  * SSIM vs the same truth (mean structural similarity, 8x8 windows —
    a perceptual check that the blotchy low-spp structure converges to
    the same image, not just the same mean);
  * linear-space median per-pixel squared error (robust to the glass
    caustic fireflies that dominate raw linear MSE — see the r3 note
    below).

Also prints the launch-decorrelation diagnostic: lag-1 autocorrelation
of per-launch frame-mean radiance increments per mode (must be ~0 —
chains are shared within a launch, never across launches).

Linear-radiance MSE is useless on these scenes: glass hit by point
lights makes caustic paths with unbounded variance (NEE cannot sample
through specular), so raw MSE is dominated by fireflies that converge
slower than any practical truth — a round-3 probe measured ~42000 raw
MSE flat from 4 to 2048 spp. Display space clips and compresses exactly
the way the user's screen does, which is also the claim that matters.

Runs fine on CPU:
    PYTHONPATH= JAX_PLATFORMS=cpu python tools/bench_coherent_quality.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPPS = (4, 16, 64)
SEEDS = (11, 22, 33)
TRUTH_SPP = 512
MATTEST = "/root/reference/resources/mattest.glaze"


def ssim(a, b, win=8, data_range=255.0):
    """Mean SSIM over non-overlapping win x win blocks (grayscale)."""
    import numpy as np

    def gray(x):
        return (0.2126 * x[..., 0] + 0.7152 * x[..., 1]
                + 0.0722 * x[..., 2]).astype(np.float64)

    x, y = gray(a), gray(b)
    h, w = x.shape
    h, w = h // win * win, w // win * win
    x = x[:h, :w].reshape(h // win, win, w // win, win)
    y = y[:h, :w].reshape(h // win, win, w // win, win)
    ax = (1, 3)
    mx, my = x.mean(ax), y.mean(ax)
    vx, vy = x.var(ax), y.var(ax)
    cov = (x * y).mean(ax) - mx * my
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * mx * my + c1) * (2 * cov + c2)
         / ((mx * mx + my * my + c1) * (vx + vy + c2)))
    return float(s.mean())


def scene_factories():
    out = []

    def matrow():
        from tests.golden_scenes import MatRowScene

        return MatRowScene()

    out.append(("matrow", matrow, (96, 48)))
    if os.path.exists(MATTEST):
        def mattest():
            from glaze_tpu.parser import parse

            return parse(MATTEST)

        out.append(("mattest", mattest, (96, 48)))

    def mini():
        from tools.make_sponza import build_mini_scene

        return build_mini_scene()

    out.append(("mini-atrium", mini, (96, 48)))
    return out


def render(factory, wh, seed, spp, mode):
    """(display image float (H,W,3) in [0,255], linear mean (P,3))."""
    import numpy as np
    import jax

    from glaze_tpu.render.renderer import Integrator, RayTraceRenderer

    r = RayTraceRenderer(factory(), width=wh[0], height=wh[1],
                         integrator=Integrator.PATH_TRACE, seed=seed,
                         coherent=mode)
    img = r.draw(spp)
    accum = np.stack([np.asarray(jax.device_get(c))
                      for c in r._state.accum], -1)
    count = np.asarray(jax.device_get(r._state.count))
    lin = accum / np.maximum(count, 1.0)[:, None]
    return np.asarray(img, dtype=float), lin


def decorrelation(factory, wh, mode, k=48):
    import numpy as np
    import jax

    from glaze_tpu.render.renderer import Integrator, RayTraceRenderer

    r = RayTraceRenderer(factory(), width=wh[0], height=wh[1],
                         integrator=Integrator.PATH_TRACE, seed=7,
                         coherent=mode)
    prev, inc = 0.0, []
    for _ in range(k):
        r.draw_frame()
        tot = float(sum(np.asarray(jax.device_get(c)).mean()
                        for c in r._state.accum))
        inc.append(tot - prev)
        prev = tot
    d = np.asarray(inc[1:])
    d = d - d.mean()
    var = float((d * d).mean())
    return float((d[:-1] * d[1:]).mean() / max(var, 1e-30))


def main():
    import numpy as np

    for name, factory, wh in scene_factories():
        truth_img, truth_lin = render(factory, wh, seed=7, spp=TRUTH_SPP,
                                      mode=0)
        print(f"== {name}: truth mode 0, {TRUTH_SPP} spp "
              f"(display u8 sRGB) ==", flush=True)
        for mode in (0, 1, 2):
            for spp in SPPS:
                dmse, dssim, lmed = [], [], []
                for seed in SEEDS:
                    img, lin = render(factory, wh, seed=seed, spp=spp,
                                      mode=mode)
                    dmse.append(float(((img - truth_img) ** 2).mean()))
                    dssim.append(ssim(img, truth_img))
                    lmed.append(float(np.median((lin - truth_lin) ** 2)))
                print(f"{name} mode {mode} spp {spp:3d}: display MSE "
                      f"{np.mean(dmse):9.3f} "
                      f"(per-seed {', '.join(f'{m:.0f}' for m in dmse)})  "
                      f"SSIM {np.mean(dssim):.4f}  "
                      f"linear medSE {np.mean(lmed):.3e}", flush=True)
        for mode in (0, 1, 2):
            rho = decorrelation(factory, wh, mode)
            print(f"{name} mode {mode}: launch lag-1 autocorr "
                  f"{rho:+.3f}", flush=True)


if __name__ == "__main__":
    main()
