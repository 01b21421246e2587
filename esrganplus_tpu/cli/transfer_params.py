"""Cross-depth / cross-scale checkpoint surgery.

Reference surface: ``codes/scripts/transfer_params.py`` (seed a new-scale
SRResNet from an ×4 model by copying matching keys and remapping the tail
indices) and ``transfer_params_sft.py`` (seed SFT-GAN from SRGAN weights).

    python -m esrganplus_tpu.cli.transfer_params SRC.pth DST_TEMPLATE.pth OUT.pth

Every key of the destination template keeps its template value unless the source
has a key with the same name AND shape, which is copied over. A summary of
copied / kept keys is printed so depth/scale mismatches are visible.
"""

from __future__ import annotations

import argparse

import numpy as np


def transfer(src: dict, dst: dict):
    out = {}
    copied, kept = [], []
    for k, v in dst.items():
        s = src.get(k)
        if s is not None and tuple(np.shape(s)) == tuple(np.shape(v)):
            out[k] = np.asarray(s)
            copied.append(k)
        else:
            out[k] = np.asarray(v)
            kept.append(k)
    return out, copied, kept


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("src", help="source checkpoint (.pth) to transfer from")
    ap.add_argument("template", help="template checkpoint (.pth) defining the target layout")
    ap.add_argument("out", help="output .pth")
    args = ap.parse_args(argv)

    import torch

    from esrganplus_tpu.convert import load_state_dict

    src = load_state_dict(args.src)
    dst = load_state_dict(args.template)
    out, copied, kept = transfer(src, dst)
    torch.save({k: torch.from_numpy(np.array(v, copy=True)) for k, v in out.items()}, args.out)
    print(f"copied {len(copied)} keys from source; kept {len(kept)} template keys")
    for k in kept[:20]:
        print(f"  kept (no match): {k}")
    if len(kept) > 20:
        print(f"  ... and {len(kept) - 20} more")


if __name__ == "__main__":
    main()
