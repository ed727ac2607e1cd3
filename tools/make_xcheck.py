"""Vulkan cross-validation kit (docs/VULKAN_XCHECK.md).

No RT-capable GPU exists in this environment, so zero pixels from the
reference Rust/Vulkan renderer have ever been compared against this
build (VERDICT missing #1). This kit packages everything someone WITH
such a GPU needs to close that loop in under an hour:

    python tools/make_xcheck.py build  [--dir OUT] [--spp 256] [--res 512]
        writes the .glaze scenes (mattest + the all-material-families
        matrow scene serialized through our byte-exact writer), renders
        OUR side twice (independent seeds, for the Monte-Carlo noise
        bound), and emits configs.json + README with the exact
        reference commands:
            glaze-cli <scene>.glaze ref_<case>.png --res WxH --spp N \
                [--integrator pt|direct]

    python tools/make_xcheck.py diff [--dir OUT]
        compares every ref_<case>.png found in the kit dir against our
        render using the two-seed noise bound (below).

    python tools/make_xcheck.py dryrun [--dir OUT] [--spp 16]
        end-to-end self-test on this machine: builds the kit at reduced
        spp, then diffs our seed-B renders AS IF they were the
        reference output — every case must PASS (two independent MC
        estimates of the same image).

Acceptance bound: for two INDEPENDENT n-spp estimates A, B of the same
image, E[MSE(A, B)] = var_A + var_B (+ bias^2 if the renderers differ).
We estimate the per-case noise floor as MSE(ours_a, ours_b) (our two
seeds) and accept the reference when
    MSE(ref, ours_a) <= XCHECK_FACTOR * noise_floor + XCHECK_EPS
with FACTOR=3.0 (reference variance may differ from ours; sampling is
uncorrelated) and EPS=4.0 display-space units^2 (8-bit quantization +
tone-pipeline rounding). A real shading discrepancy (wrong BSDF,
material mix-up, light scaling) shows up ORDERS of magnitude above
this; run dryrun to see typical passing numbers.
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

XCHECK_FACTOR = 3.0
XCHECK_EPS = 4.0
REF_MATTEST = "/root/reference/resources/mattest.glaze"


def _cases(res, spp):
    return [
        {"name": "mattest_pt", "scene": "mattest.glaze",
         "res": f"{res}x{res}", "spp": spp, "integrator": "pt"},
        {"name": "mattest_direct", "scene": "mattest.glaze",
         "res": f"{res}x{res}", "spp": spp, "integrator": "direct"},
        {"name": "matrow_pt", "scene": "matrow.glaze",
         "res": f"{res}x{res // 2}", "spp": spp, "integrator": "pt"},
        {"name": "matrow_direct", "scene": "matrow.glaze",
         "res": f"{res}x{res // 2}", "spp": spp, "integrator": "direct"},
    ]


def _write_matrow(path):
    """Serialize the all-families golden scene (6 BSDF spheres + floor +
    emissive AREA panel + OMNI + SKY) through the byte-exact writer so
    the reference binary loads it unmodified."""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    from golden_scenes import MatRowScene
    from glaze_tpu.parser import Serializer

    sc = MatRowScene()
    (Serializer(path)
        .with_vertices(sc.vertices()).with_meshes(sc.meshes())
        .with_transforms(sc.transforms()).with_instances(sc.instances())
        .with_cameras(sc.cameras()).with_textures(sc.textures())
        .with_materials(sc.materials()).with_lights(sc.lights())
        .with_metadata(sc.meta()).serialize())


def _render_ours(kit, case, seed, out_name):
    cmd = [sys.executable, "-m", "glaze_tpu.cli",
           os.path.join(kit, case["scene"]), os.path.join(kit, out_name),
           "--res", case["res"], "--spp", str(case["spp"]),
           "--integrator", case["integrator"], "--seed", str(seed)]
    print("  " + " ".join(cmd[3:]), flush=True)
    subprocess.run(cmd, check=True)


def build(kit, res, spp):
    os.makedirs(kit, exist_ok=True)
    import shutil

    shutil.copy(REF_MATTEST, os.path.join(kit, "mattest.glaze"))
    _write_matrow(os.path.join(kit, "matrow.glaze"))
    cases = _cases(res, spp)
    with open(os.path.join(kit, "configs.json"), "w") as f:
        json.dump({"factor": XCHECK_FACTOR, "eps": XCHECK_EPS,
                   "cases": cases}, f, indent=2)
    lines = [
        "# Vulkan cross-check kit — reference-side commands",
        "",
        "On a machine with an RT-capable GPU and the reference repo",
        "(github.com/davidepi/glaze) built (`cargo build --release`):",
        "",
    ]
    for c in cases:
        lines.append(
            f"    glaze-cli {c['scene']} ref_{c['name']}.png "
            f"--res {c['res']} --spp {c['spp']}"
            + ("" if c["integrator"] == "pt"
               else f" --integrator {c['integrator']}"))
    lines += ["",
              "Copy the ref_*.png files back into this directory, then:",
              "", "    python tools/make_xcheck.py diff --dir " + kit, ""]
    with open(os.path.join(kit, "README.md"), "w") as f:
        f.write("\n".join(lines))
    for c in cases:
        print(f"rendering ours: {c['name']}")
        _render_ours(kit, c, 1001, f"tpu_{c['name']}.png")
        _render_ours(kit, c, 2717, f"tpu_{c['name']}_b.png")
    return cases


def dryrun(kit, res, spp):
    """End-to-end self-test: a THIRD independent seed stands in for the
    reference renderer, so the diff exercises the real acceptance bound
    on genuinely distinct Monte-Carlo estimates."""
    cases = build(kit, res, spp)
    for c in cases:
        _render_ours(kit, c, 424243, f"pseudo_ref_{c['name']}.png")
    return diff(kit, ref_prefix="pseudo_ref_")


def diff(kit, ref_prefix="ref_"):
    import numpy as np
    from PIL import Image

    with open(os.path.join(kit, "configs.json")) as f:
        cfg = json.load(f)
    failed = ran = 0
    for c in cfg["cases"]:
        ref_p = os.path.join(kit, f"{ref_prefix}{c['name']}.png")
        a_p = os.path.join(kit, f"tpu_{c['name']}.png")
        b_p = os.path.join(kit, f"tpu_{c['name']}_b.png")
        if not os.path.exists(ref_p):
            print(f"{c['name']}: SKIP (no {os.path.basename(ref_p)})")
            continue
        ran += 1
        ref = np.asarray(Image.open(ref_p).convert("RGB"), float)
        a = np.asarray(Image.open(a_p).convert("RGB"), float)
        b = np.asarray(Image.open(b_p).convert("RGB"), float)
        if ref.shape != a.shape:
            print(f"{c['name']}: FAIL (shape {ref.shape} != {a.shape})")
            failed += 1
            continue
        floor = ((a - b) ** 2).mean()
        mse = ((ref - a) ** 2).mean()
        bound = cfg["factor"] * floor + cfg["eps"]
        ok = mse <= bound
        print(f"{c['name']}: {'PASS' if ok else 'FAIL'}  "
              f"mse {mse:.2f}  noise-floor {floor:.2f}  bound {bound:.2f}")
        failed += 0 if ok else 1
    if ran == 0:
        print("no reference images found — run the commands in README.md")
        return 2
    return 1 if failed else 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=("build", "diff", "dryrun"))
    ap.add_argument("--dir", default="/tmp/glaze_xcheck")
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--spp", type=int, default=256)
    args = ap.parse_args()
    if args.cmd == "build":
        build(args.dir, args.res, args.spp)
        print(f"kit ready: {args.dir} (see README.md inside)")
    elif args.cmd == "diff":
        raise SystemExit(diff(args.dir))
    else:
        raise SystemExit(dryrun(args.dir, min(args.res, 256),
                                min(args.spp, 16)))


if __name__ == "__main__":
    main()
