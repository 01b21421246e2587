"""Dump per-stage activation stats from the REFERENCE torch RRDB_Net.

Torch-side twin of ``python -m esrganplus_tpu.cli.test_image --dump-activations``:
registers forward hooks on the reference's inference net
(``test_image/architecture.py:7-38``) and writes the same JSON schema with the
same stage names, so a quality-parity failure against real pretrained weights
(ESRGANplus.pth / nESRGANplus.pth) localises to one stage in one command pair:

    python tools/dump_torch_activations.py MODEL.pth --input LR --out ref_acts.json \
        --reference /path/to/ESRGANplus-checkout
    python -m esrganplus_tpu.cli.test_image MODEL.pth --input LR \
        --dump-activations our_acts.json --compare-activations ref_acts.json

Stage → module map (flattened-Sequential indices, SURVEY §2.10): fea_conv=
model.0, rrdb_XX=model.1.sub.XX, trunk=model.1 (shortcut sum), upconv_0/1=
model.4/model.7 (post-lrelu), hr_conv0=model.9 (post-lrelu), hr_conv1=model.10.
Requires torch + the reference checkout (its ``test_image`` package) on disk.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def activation_stats(a) -> dict:
    import numpy as np

    a = np.asarray(a.detach().cpu(), dtype=np.float64)
    return {"shape": list(a.shape), "mean": float(a.mean()),
            "rms": float(np.sqrt((a * a).mean())), "maxabs": float(np.abs(a).max())}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("model", help="RRDBNet .pth checkpoint")
    ap.add_argument("--input", default="LR", help="input image dir")
    ap.add_argument("--out", default="ref_acts.json")
    ap.add_argument("--reference", default="/root/reference",
                    help="path to the ESRGANplus reference checkout")
    args = ap.parse_args(argv)

    import cv2
    import numpy as np
    import torch

    sys.path.insert(0, os.path.join(args.reference, "test_image"))
    import block as ref_block  # noqa: E402 (reference checkout import)

    if not torch.cuda.is_available():
        # The reference pins its (inert-in-eval) noise seed tensor to CUDA
        # (test_image/block.py:148); patch so the dump also runs CPU-only.
        def _cpu_init(self, sigma=0.1, is_relative_detach=False):
            torch.nn.Module.__init__(self)
            self.sigma = sigma
            self.is_relative_detach = is_relative_detach
            self.noise = torch.tensor(0, dtype=torch.float)

        ref_block.GaussianNoise.__init__ = _cpu_init
    import architecture as ref_arch  # noqa: E402

    net = ref_arch.RRDB_Net(
        3, 3, 64, 23, gc=32, upscale=4, norm_type=None, act_type="leakyrelu",
        mode="CNA", res_scale=1, upsample_mode="upconv")
    net.load_state_dict(torch.load(args.model, map_location="cpu"), strict=False)
    net.eval()

    model = net.model  # the flattened nn.Sequential
    taps = {"fea_conv": model[0], "trunk": model[1],
            "upconv_0": model[4], "upconv_1": model[7],
            "hr_conv0": model[9], "hr_conv1": model[10]}
    for k, sub in enumerate(model[1].sub[:-1]):  # last entry is LR_conv
        taps[f"rrdb_{k:02d}"] = sub

    dumps = {}
    current = {}

    def hook(name):
        def fn(_mod, _inp, out):
            current[name] = activation_stats(out)
        return fn

    handles = [mod.register_forward_hook(hook(name)) for name, mod in taps.items()]
    try:
        names = sorted(f for f in os.listdir(args.input)
                       if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")))
        for fname in names:
            base = os.path.splitext(fname)[0]
            img = cv2.imread(os.path.join(args.input, fname), cv2.IMREAD_COLOR)
            img = img.astype(np.float32) / 255.0
            t = torch.from_numpy(np.ascontiguousarray(
                np.transpose(img[:, :, ::-1], (2, 0, 1))))[None]
            current = {}
            with torch.no_grad():
                net(t)
            # emit in graph order to match the jax dump
            order = (["fea_conv"] + [f"rrdb_{k:02d}" for k in range(23)]
                     + ["trunk", "upconv_0", "upconv_1", "hr_conv0", "hr_conv1"])
            dumps[base] = {n: current[n] for n in order}
            print(f"{base}: {len(current)} stages")
    finally:
        for h in handles:
            h.remove()

    with open(args.out, "w") as f:
        json.dump({"model": args.model, "dtype": "fp32", "layout": "NCHW",
                   "images": dumps}, f, indent=1)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
