"""Smoke test for cli/parity_check.py (VERDICT r4 item 7): the PARITY.md
recipe — converter → inference → metrics → activation compare — runs end to
end against a self-made checkpoint, with the reference outputs simulated by
our own (delta must be 0)."""

import json
import os

import jax
import numpy as np
import pytest

from esrganplus_tpu.models.rrdb import RRDBNetConfig, init_rrdbnet
from esrganplus_tpu.ops.image_io import save_img

CFG = RRDBNetConfig(nf=8, nb=1, gc=4, upscale=4)


@pytest.fixture(scope="module")
def parity_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("parity")
    import torch

    from esrganplus_tpu.convert.pth import generator_to_state_dict

    params = init_rrdbnet(jax.random.PRNGKey(0), CFG)
    sd = generator_to_state_dict(params, CFG)
    pth = os.path.join(root, "tiny.pth")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, pth)

    lr_dir, hr_dir = os.path.join(root, "LR"), os.path.join(root, "HR")
    rng = np.random.RandomState(3)
    for i in range(2):
        save_img((rng.rand(12, 12, 3) * 255).astype(np.uint8),
                 os.path.join(lr_dir, f"img{i}.png"))
        # HR ground truth: any 4x-sized image (metric values don't matter,
        # only the ours-vs-"reference" delta, which is 0 by construction)
        save_img((rng.rand(48, 48, 3) * 255).astype(np.uint8),
                 os.path.join(hr_dir, f"img{i}.png"))
    return str(root), pth, lr_dir, hr_dir


def test_parity_check_passes_self_consistent(parity_env):
    from esrganplus_tpu.cli.parity_check import main

    root, pth, lr_dir, hr_dir = parity_env
    out1 = os.path.join(root, "ref_run")
    # first run produces the "reference" outputs (our own, renamed suffix)
    assert main([pth, "--lr", lr_dir, "--hr", hr_dir, "--out", out1]) == 0
    ref_dir = os.path.join(root, "ref_results")
    os.makedirs(ref_dir)
    for f in os.listdir(os.path.join(out1, "sr")):
        os.rename(os.path.join(out1, "sr", f),
                  os.path.join(ref_dir, f.replace("_rlt", "_nESRGANplus")))

    out2 = os.path.join(root, "check_run")
    rc = main([pth, "--lr", lr_dir, "--hr", hr_dir,
               "--ref-results", ref_dir, "--out", out2])
    assert rc == 0
    summary = json.load(open(os.path.join(out2, "summary.json")))
    assert summary["failures"] == []


def test_parity_check_fails_on_wrong_reference(parity_env):
    from esrganplus_tpu.cli.parity_check import main

    root, pth, lr_dir, hr_dir = parity_env
    # "reference" outputs that are just noise -> PSNR delta blows the 0.01 dB
    bad_ref = os.path.join(root, "bad_ref")
    rng = np.random.RandomState(9)
    for i in range(2):
        save_img((rng.rand(48, 48, 3) * 255).astype(np.uint8),
                 os.path.join(bad_ref, f"img{i}_nESRGANplus.png"))
    out = os.path.join(root, "fail_run")
    rc = main([pth, "--lr", lr_dir, "--hr", hr_dir,
               "--ref-results", bad_ref, "--out", out])
    assert rc == 1
    summary = json.load(open(os.path.join(out, "summary.json")))
    assert any("PSNR delta" in f for f in summary["failures"])


def test_parity_check_fails_on_disjoint_basenames(parity_env):
    """Non-empty ours and ref sets that share NO basenames must fail, not
    pass vacuously with worst-delta 0.0."""
    from esrganplus_tpu.cli.parity_check import main

    root, pth, lr_dir, hr_dir = parity_env
    # reference outputs named after images that are NOT in the LR dir, with
    # matching HR files so _metrics_over finds (HR, ref SR) pairs; the HR dir
    # is a copy so the module fixture stays pristine
    import shutil

    alien_ref = os.path.join(root, "alien_ref")
    hr_plus = os.path.join(root, "hr_plus")
    shutil.copytree(hr_dir, hr_plus)
    rng = np.random.RandomState(7)
    for i in range(2):
        save_img((rng.rand(48, 48, 3) * 255).astype(np.uint8),
                 os.path.join(alien_ref, f"other{i}_nESRGANplus.png"))
        save_img((rng.rand(48, 48, 3) * 255).astype(np.uint8),
                 os.path.join(hr_plus, f"other{i}.png"))
    out = os.path.join(root, "disjoint_run")
    rc = main([pth, "--lr", lr_dir, "--hr", hr_plus,
               "--ref-results", alien_ref, "--out", out])
    assert rc == 1
    summary = json.load(open(os.path.join(out, "summary.json")))
    assert any("share no basenames" in f for f in summary["failures"])


def test_parity_check_ref_results_requires_hr(parity_env):
    """Arg combination is validated BEFORE the expensive inference run."""
    from esrganplus_tpu.cli.parity_check import main

    root, pth, lr_dir, _hr_dir = parity_env
    with pytest.raises(SystemExit):
        main([pth, "--lr", lr_dir, "--ref-results", os.path.join(root, "x"),
              "--out", os.path.join(root, "noop_run")])


def test_parity_check_activation_compare(parity_env):
    from esrganplus_tpu.cli.parity_check import main
    from esrganplus_tpu.cli.test_image import main as ti_main

    root, pth, lr_dir, hr_dir = parity_env
    # make a "torch" activation dump with OUR dumper (format-compatible) —
    # self-compare must pass through the parity CLI
    ref_acts = os.path.join(root, "ref_acts.json")
    ti_main([pth, "--input", lr_dir, "--output", os.path.join(root, "tmp_sr"),
             "--dump-activations", ref_acts])
    out = os.path.join(root, "acts_run")
    rc = main([pth, "--lr", lr_dir, "--torch-acts", ref_acts, "--out", out])
    assert rc == 0
