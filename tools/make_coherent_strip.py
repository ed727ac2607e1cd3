"""Renders the coherent-sampling noise-texture comparison strip
(docs/coherent_noise.png): the all-families golden scene at equal spp
under mode 0 (independent), mode 2 (tile-shared), mode 1 (frame-shared),
plus a converged reference — same estimator error (pinned by
tools/bench_coherent_quality.py), different noise TEXTURE while
converging (high-frequency speckle vs blotches).

    PYTHONPATH= JAX_PLATFORMS=cpu python tools/make_coherent_strip.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPP = 4
TRUTH_SPP = 256
SCALE = 3  # nearest-neighbor upscale so 96x48 blotches read in docs


def main():
    import numpy as np
    import jax
    from PIL import Image

    from glaze_tpu.render import integrator as integ
    from tests.golden_scenes import render_golden

    panels = []
    for label, mode, spp in (("independent", 0, SPP),
                             ("tile-coherent", 2, SPP),
                             ("frame-coherent", 1, SPP),
                             ("converged", 0, TRUTH_SPP)):
        integ.COHERENT = mode
        jax.clear_caches()
        _, _, img = render_golden(seed=11, spp=spp)
        panels.append(np.asarray(img))
        print(f"{label}: mode {mode}, {spp} spp", flush=True)
    integ.COHERENT = 0

    h, w, _ = panels[0].shape
    gap = np.full((h, 2, 3), 64, np.uint8)
    strip = np.concatenate(sum(([p, gap] for p in panels[:-1]), []) +
                           [panels[-1]], axis=1)
    strip = strip.repeat(SCALE, 0).repeat(SCALE, 1)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "coherent_noise.png")
    Image.fromarray(strip).save(out)
    print("wrote", out, strip.shape)


if __name__ == "__main__":
    main()
