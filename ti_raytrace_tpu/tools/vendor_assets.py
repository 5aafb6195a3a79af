"""Materialize the public scene-data assets into <repo>/assets.

The framework resolves assets through io/assets.py: $TIRAY_ASSETS,
then <repo>/assets, then the read-only reference mount.  This script
copies the small public DATA files (OBJ geometry, MTL materials,
spectral/sky CSV tables, the environment map, and the golden render
images the fidelity gates compare against) out of the mount so the
framework is self-contained once the mount disappears.  Code files
(*.py) are never copied.

Run once:  python -m ti_raytrace_tpu.tools.vendor_assets
Verify:    TIRAY_NO_REFERENCE=1 python -m pytest tests/ -q
"""

import os
import shutil
import sys

REFERENCE = "/root/reference"
ASSETS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "assets",
)

# data files the framework reads at runtime (io/assets.py call sites)
MANIFEST = [
    # geometry + materials (examples/scenes.py, tools)
    "model/cornell_box.obj", "model/cornell_box.mtl",
    "model/sphere.obj",
    "model/bdpt.obj", "model/bdpt.mtl",
    "model/prism1.obj", "model/prism1.obj.mtl",
    "model/Teapot.obj",
    "model/box.obj", "model/cylinder.obj", "model/test.obj",
    # spectral tables (spectral/cie.py, integrators/pt_spec.py, tools/plots.py)
    "spectrum/ciexyz31_1.csv", "spectrum/Illuminantd65.csv",
    "spectrum/IlluminantA.csv", "spectrum/IlluminantF2.csv",
    "spectrum/d55.csv",
    "spectrum/white-spec.csv", "spectrum/red-spec.csv",
    "spectrum/green-spec.csv",
    "spectrum/xbar.csv", "spectrum/ybar.csv", "spectrum/zbar.csv",
    "spectrum/canon_eos-5d-mkiv.csv",
    # Hosek-Wilkie sky coefficient tables (sky/hosek.py)
    "sky/data.csv", "sky/data_rad.csv", "sky/data_solar.csv",
    "sky/data_dark.csv",
    # environment map (examples/scenes.py)
    "image/env.png",
    # golden render targets (tools/golden.py fidelity gates)
    "out.png",
    "image/skydome.png", "image/spectral-cornellbox.png",
    "image/veach-bdpt512.png", "image/veach-pt512.png",
    "image/rainbow-far.png", "image/rainbow.png",
    "image/veach-bdpt-TungstenRender.png", "image/rainbow-reference.png",
    "image/metal.png", "image/non-metal.png", "image/glass.png",
]


def main() -> int:
    copied, missing = [], []
    for rel in MANIFEST:
        src = os.path.join(REFERENCE, rel)
        dst = os.path.join(ASSETS, rel)
        if not os.path.exists(src):
            if os.path.exists(dst):
                continue  # already vendored; mount gone or file pruned
            missing.append(rel)
            continue
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        if not os.path.exists(dst) or (
            os.path.getsize(dst) != os.path.getsize(src)
        ):
            shutil.copyfile(src, dst)
            copied.append(rel)
    print(f"vendored {len(copied)} files into {ASSETS}"
          + (f"; missing upstream: {missing}" if missing else ""))
    return 1 if missing else 0


if __name__ == "__main__":
    sys.exit(main())
