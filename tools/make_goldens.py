"""Generates the stored golden render for tests/test_goldens.py.

Run on the CPU backend (deterministic across hosts):
  JAX_PLATFORMS=cpu python tools/make_goldens.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    import golden_scenes as gs

    from PIL import Image

    gdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "goldens")
    os.makedirs(gdir, exist_ok=True)
    # one golden per sampling configuration: mode 0 (independent chains)
    # plus the SHIPPED coherent modes (1=frame offline default, 2=tile
    # interactive default) — each pins its exact accumulation bits
    for mode, name, sampler in (
            (0, "matrow.npz", "pcg"), (1, "matrow_coh1.npz", "pcg"),
            (2, "matrow_coh2.npz", "pcg"),
            # the SHIPPED configuration: coherent frame + Owen-Sobol
            (1, "matrow_ld.npz", "ld")):
        accum, count, img = gs.render_golden(coherent=mode,
                                             sampler=sampler)
        out = os.path.join(gdir, name)
        np.savez_compressed(out, accum=accum.astype(np.float32),
                            count=count.astype(np.float32),
                            spp=gs.GOLDEN_SPP, seed=gs.GOLDEN_SEED)
        print(f"wrote {out}: accum {accum.shape}, mean {accum.mean():.4f}, "
              f"count {count.mean():.1f}")
        Image.fromarray(img).save(out.replace(".npz", ".png"))
    out = os.path.join(gdir, "matrow.npz")

    frame = gs.render_preview_golden()
    pout = os.path.join(os.path.dirname(out), "preview.npz")
    np.savez_compressed(pout, frame=frame)
    Image.fromarray(frame).save(pout.replace(".npz", ".png"))
    print(f"wrote {pout}: frame {frame.shape}, mean {frame.mean():.1f}")


if __name__ == "__main__":
    main()
