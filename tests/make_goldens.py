"""Generate golden fixtures by RUNNING the reference implementation (/root/reference).

Run once (offline, CPU torch) and commit the resulting .npz files under
tests/golden/. Tests then compare esrganplus_tpu against these fixtures without
needing the reference mounted.

Usage: python tests/make_goldens.py
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REF = os.environ.get("REFERENCE_PATH", "/root/reference")
HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "golden")


def _import_reference_modules():
    # The reference imports lmdb and torchvision which are absent in this image;
    # stub them (fixture generation only touches numerics code paths).
    if "lmdb" not in sys.modules:
        sys.modules["lmdb"] = types.ModuleType("lmdb")
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvu = types.ModuleType("torchvision.utils")
        tvu.make_grid = None
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu
    sys.path.insert(0, os.path.join(REF, "codes"))
    import data.util as ref_data_util
    import utils.util as ref_utils_util

    return ref_data_util, ref_utils_util


def main():
    os.makedirs(GOLDEN, exist_ok=True)
    ref_data, ref_utils = _import_reference_modules()
    rng = np.random.RandomState(0)

    # --- bicubic resize goldens over assorted sizes / scales ---
    cases = []
    for h, w, scale in [
        (37, 53, 0.25),
        (64, 48, 0.25),
        (40, 40, 0.5),
        (33, 29, 1 / 3),
        (24, 31, 2.0),
        (17, 23, 4.0),
        (128, 128, 0.25),
        (12, 15, 0.3),
    ]:
        img = rng.rand(h, w, 3).astype(np.float32)
        out = ref_data.imresize_np(img.copy(), scale, antialiasing=True)
        cases.append((img, np.float64(scale), out))
    np.savez_compressed(
        os.path.join(GOLDEN, "bicubic.npz"),
        **{f"in_{i}": c[0] for i, c in enumerate(cases)},
        **{f"scale_{i}": c[1] for i, c in enumerate(cases)},
        **{f"out_{i}": c[2] for i, c in enumerate(cases)},
        n=np.int64(len(cases)),
    )

    # no-antialias variant (upscale path uses plain kernel anyway; check downscale)
    img = rng.rand(41, 47, 3).astype(np.float32)
    out = ref_data.imresize_np(img.copy(), 0.25, antialiasing=False)
    np.savez_compressed(os.path.join(GOLDEN, "bicubic_noaa.npz"), inp=img, out=out)

    # --- colour conversion goldens ---
    imgf = rng.rand(31, 27, 3).astype(np.float32)
    imgu = (rng.rand(31, 27, 3) * 255).astype(np.uint8)
    np.savez_compressed(
        os.path.join(GOLDEN, "color.npz"),
        imgf=imgf,
        imgu=imgu,
        rgb2y_f=ref_data.rgb2ycbcr(imgf.copy(), only_y=True),
        rgb2ycc_f=ref_data.rgb2ycbcr(imgf.copy(), only_y=False),
        rgb2y_u=ref_data.rgb2ycbcr(imgu.copy(), only_y=True),
        bgr2y_f=ref_data.bgr2ycbcr(imgf.copy(), only_y=True),
        bgr2ycc_u=ref_data.bgr2ycbcr(imgu.copy(), only_y=False),
        ycbcr2rgb_f=ref_data.ycbcr2rgb(imgf.copy()),
        ycbcr2rgb_u=ref_data.ycbcr2rgb(imgu.copy()),
    )

    # --- PSNR / SSIM goldens ---
    a = (rng.rand(96, 80, 3) * 255).astype(np.float64)
    noise = rng.randn(96, 80, 3) * 8.0
    b = np.clip(a + noise, 0, 255)
    a_gray = a[:, :, 0]
    b_gray = b[:, :, 0]
    np.savez_compressed(
        os.path.join(GOLDEN, "metrics.npz"),
        a=a,
        b=b,
        psnr=np.float64(ref_utils.calculate_psnr(a, b)),
        ssim_rgb=np.float64(ref_utils.calculate_ssim(a, b)),
        psnr_gray=np.float64(ref_utils.calculate_psnr(a_gray, b_gray)),
        ssim_gray=np.float64(ref_utils.calculate_ssim(a_gray, b_gray)),
    )

    print("goldens written to", GOLDEN)


if __name__ == "__main__":
    main()
