"""Equal-spp convergence check for coherent sampling (GLAZE_COHERENT).

The claim behind --coherent (render/integrator.py COHERENT): sharing
RNG chains across lanes correlates pixels SPATIALLY but leaves each
pixel's estimator unbiased with unchanged per-pixel variance, because
samples stay independent ACROSS launches. If that holds, error vs a
converged truth at equal spp must match the default mode for every spp
— the noise merely looks blotchy instead of high-frequency while it
lasts.

Metrics are computed on the DISPLAYED image (sRGB u8, the same
render_image path every frontend shows). Linear-radiance MSE is useless
on this scene: the all-families golden row has glass hit by point
lights, whose caustic paths have unbounded variance (NEE cannot sample
through specular), so raw MSE is dominated by fireflies that converge
slower than any practical truth — a first probe run measured ~42000
raw MSE flat from 4 to 2048 spp. Display space clips and compresses
exactly the way the user's screen does, which is also the claim that
matters: equal VISIBLE noise at equal spp. A robust linear-space
number (median per-pixel squared error) is printed alongside.

This probe renders the all-families golden scene (six BSDF families,
OMNI+AREA+SKY lights) at a ladder of spp for modes 0/1/2 x several
seeds and prints the error-vs-truth table. Runs fine on CPU:
    PYTHONPATH= JAX_PLATFORMS=cpu python tools/bench_coherent_quality.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPPS = (4, 16, 64)
SEEDS = (11, 22, 33)
TRUTH_SPP = 512


def render(seed, spp):
    """(display image float (H,W,3) in [0,255], linear mean (P,3))."""
    import numpy as np

    from tests.golden_scenes import render_golden

    accum, count, img = render_golden(seed=seed, spp=spp)
    lin = accum / np.maximum(count, 1.0)[:, None]
    return np.asarray(img, dtype=float), lin


def main():
    import numpy as np
    import jax

    from glaze_tpu.render import integrator as integ

    truth_img, truth_lin = render(seed=7, spp=TRUTH_SPP)
    print(f"truth: mode 0, {TRUTH_SPP} spp (display u8 sRGB)", flush=True)

    for mode in (0, 1, 2):
        integ.COHERENT = mode
        jax.clear_caches()  # COHERENT changes the traced graph in place
        for spp in SPPS:
            dmse, lmed = [], []
            for seed in SEEDS:
                img, lin = render(seed=seed, spp=spp)
                dmse.append(float(((img - truth_img) ** 2).mean()))
                lmed.append(float(np.median((lin - truth_lin) ** 2)))
            print(f"mode {mode}  spp {spp:3d}: display MSE "
                  f"{sum(dmse)/len(dmse):9.3f}  "
                  f"(per-seed {', '.join(f'{m:.3f}' for m in dmse)})  "
                  f"linear medSE {sum(lmed)/len(lmed):.3e}", flush=True)
    integ.COHERENT = 0


if __name__ == "__main__":
    main()
