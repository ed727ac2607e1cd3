"""Multi-scene quality gate for coherent-BY-DEFAULT sampling.

Round 4 ships coherent sampling as the default (frame-shared chains
offline, tile-shared interactive — render/renderer.py default_coherent).
The claim that makes that safe: sharing RNG chains across lanes leaves
every pixel's estimator unbiased with UNCHANGED per-pixel variance,
because samples stay independent ACROSS launches; only the SPATIAL
correlation of the noise changes (blotchy instead of high-frequency
while converging). This file is the gate (VERDICT r3 #1):

* equal-spp MSE-vs-truth parity + unbiasedness on the reference's own
  ``mattest.glaze`` and on a sponza-class mini atrium (textured
  lambert/uber/metal/glass under SKY+SUN+OMNI+AREA lights) — the
  all-families golden row is gated the same way in test_goldens.py
  (test_golden_coherent_within_noise_of_mode0);
* launch decorrelation: per-launch radiance increments must be serially
  UNCORRELATED in every mode (each launch reseeds from the host RNG —
  shared chains correlate lanes within a launch, never across launches).

Statistic choice: MSE against a converged truth, not across-seed
variance — a frame-coherent render's per-pixel errors share the same
per-launch realizations, so averaging over pixels buys ~n_launches
effective dof (measured per-seed scatter ~10% at these sizes,
tools/bench_coherent_quality.py), while an across-seed variance
estimate has only n_seeds dof however many pixels are averaged.

The hardware-side A/B (throughput + display-MSE ladder vs a 512-spp
truth on the 1080p bench scene) lives in tools/bench_coherent_quality.py
and docs/PERF_LOG.md.
"""

import numpy as np
import pytest

from glaze_tpu.render.renderer import Integrator, RayTraceRenderer

W, H = 48, 24
SPP = 6
TRUTH_SPP = 48
SEEDS = (3, 17, 29)
MODES = (0, 1, 2)


def _clipped_mean(renderer):
    import jax

    accum = np.stack([np.asarray(jax.device_get(c))
                      for c in renderer._state.accum], -1)
    count = np.asarray(jax.device_get(renderer._state.count))
    return np.clip(accum / np.maximum(count, 1.0)[:, None], 0.0, 1.0)


def _render(scene_factory, seed, spp, mode):
    r = RayTraceRenderer(scene_factory(), width=W, height=H,
                         integrator=Integrator.PATH_TRACE,
                         seed=seed, coherent=mode)
    r.draw(spp)
    return _clipped_mean(r)


def _gate(scene_factory):
    """Equal-spp MSE-vs-truth parity + unbiasedness across modes."""
    truth = _render(scene_factory, seed=999, spp=TRUTH_SPP, mode=0)
    mse = {}
    mean = {}
    for mode in MODES:
        imgs = [_render(scene_factory, s, SPP, mode) for s in SEEDS]
        mse[mode] = float(np.mean([((im - truth) ** 2).mean()
                                   for im in imgs]))
        mean[mode] = float(np.mean([im.mean() for im in imgs]))
    assert mse[0] > 0
    for mode in (1, 2):
        ratio = mse[mode] / mse[0]
        # per-seed scatter of this statistic is ~10-20% at 6 spp over
        # n_launches=36 effective dof; a REAL variance regression (e.g.
        # a chain reused across launches) shows up as 5-50x
        assert 0.5 < ratio < 2.0, (
            f"mode {mode}: equal-spp MSE ratio {ratio:.2f} vs mode 0 "
            f"(mse {mse[mode]:.5f} vs {mse[0]:.5f})"
        )
        # unbiasedness: image means agree within the MC noise of the
        # estimate (clipped display-space means, like the r3 probe)
        dm = abs(mean[mode] - mean[0])
        noise = np.sqrt(mse[0] / len(SEEDS))
        assert dm < 1.5 * noise, (
            f"mode {mode}: mean shifted by {dm:.4f} (noise {noise:.4f})"
        )


def test_mattest_equal_spp_parity(mattest_path):
    """The reference's own test scene: every material family it ships,
    through the real parser."""
    from glaze_tpu.parser import parse

    _gate(lambda: parse(mattest_path))


def _MiniAtrium():
    from tools.make_sponza import build_mini_scene

    return build_mini_scene()


def test_sponza_class_equal_spp_parity():
    _gate(_MiniAtrium)


@pytest.mark.parametrize("mode", MODES)
def test_launch_decorrelation(mode):
    """Per-launch radiance increments must be serially uncorrelated:
    coherent chains share draws WITHIN a launch only — every launch
    reseeds from the host RNG stream (renderer.draw_frame), so the
    sequence of launch-wide realizations is iid. A chain accidentally
    carried across launches would show lag-1 autocorrelation ~1."""
    r = RayTraceRenderer(_MiniAtrium(), width=32, height=16,
                         integrator=Integrator.PATH_TRACE, seed=9,
                         coherent=mode)
    k = 64
    prev = 0.0
    inc = []
    import jax

    for _ in range(k):
        r.draw_frame()
        tot = float(sum(np.asarray(jax.device_get(c)).mean()
                        for c in r._state.accum))
        inc.append(tot - prev)
        prev = tot
    d = np.asarray(inc[1:])  # drop the primary-only first launch
    d = d - d.mean()
    var = float((d * d).mean())
    assert var > 0, "launch increments must carry MC noise"
    for lag in (1, 2):
        rho = float((d[:-lag] * d[lag:]).mean() / var)
        assert abs(rho) < 0.45, (
            f"mode {mode}: lag-{lag} autocorrelation {rho:.2f}"
        )
