"""Reference-side interop (our exports load upstream strict=True) and
inference extras (x8 ensemble, tiled SR, back-projection, net interpolation)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import make_goldens
from esrganplus_tpu.cli.net_interp import interpolate_state_dicts
from esrganplus_tpu.convert.pth import load_state_dict
from esrganplus_tpu.infer import SRInferencer, load_generator
from esrganplus_tpu.models import RRDBNetConfig, init_rrdbnet
from esrganplus_tpu.ops.back_projection import back_projection
from esrganplus_tpu.ops.resize import imresize_np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def small_inferencer():
    params, cfg, _ = load_generator(os.path.join(GOLDEN, "rrdb_small_x4.pth"))
    return SRInferencer(params, cfg)


def test_reference_loads_our_exported_checkpoint():
    """Round-trip through the UPSTREAM code: export → reference RRDB_Net
    load_state_dict(strict=True) must accept every key."""
    if not os.path.isdir(make_goldens.REF):
        pytest.skip("reference unavailable")
    import torch

    from esrganplus_tpu.convert.pth import generator_to_state_dict, rrdbnet_from_state_dict
    from esrganplus_tpu.train.checkpoint import _save_pth

    sd = load_state_dict(os.path.join(GOLDEN, "rrdb_small_x4.pth"))
    params, cfg, _ = rrdbnet_from_state_dict(sd)
    out_path = os.path.join(make_goldens.CACHE, "export_interop.pth")
    os.makedirs(make_goldens.CACHE, exist_ok=True)
    _save_pth(out_path, generator_to_state_dict(params, cfg))

    ref_arch = make_goldens._import_test_image_arch()
    net = ref_arch.RRDB_Net(3, 3, cfg.nf, cfg.nb, gc=cfg.gc, upscale=cfg.upscale)
    missing_unexpected = net.load_state_dict(
        torch.load(out_path, weights_only=True), strict=True)
    assert not missing_unexpected.missing_keys
    assert not missing_unexpected.unexpected_keys


def test_x8_ensemble_matches_independent_enumeration(small_inferencer):
    """upscale_x8 must equal the mean over the dihedral group of
    T⁻¹(G(T(x))), enumerated independently via rot90/fliplr (not the
    flip/flip/transpose bit-walk the implementation uses)."""
    img = np.random.RandomState(0).rand(9, 7, 3).astype(np.float32)
    outs = []
    for r in range(4):
        for f in (False, True):
            t = np.rot90(img, r, axes=(0, 1))
            if f:
                t = t[:, ::-1, :]
            y = small_inferencer.upscale(np.ascontiguousarray(t))
            if f:
                y = y[:, ::-1, :]
            y = np.rot90(y, -r, axes=(0, 1))
            outs.append(y)
    want = np.mean(outs, axis=0)
    got = small_inferencer.upscale_x8(img)
    assert got.shape == want.shape
    assert np.abs(got - want).max() < 1e-5
    # the 2-batched-forwards grouping must equal per-variant dispatch
    got_seq = small_inferencer.upscale_x8(img, batched=False)
    assert np.abs(got - got_seq).max() < 1e-6


def test_x8_ensemble_shape_nonsquare(small_inferencer):
    img = np.random.RandomState(1).rand(12, 8, 3).astype(np.float32)
    out = small_inferencer.upscale_x8(img)
    assert out.shape == (48, 32, 3)


def test_tiled_matches_whole_image(small_inferencer):
    img = np.random.RandomState(2).rand(40, 40, 3).astype(np.float32)
    whole = small_inferencer.upscale(img)
    tiled = small_inferencer.upscale_tiled(img, tile=24, halo=8)
    # interior parity; seams limited by halo truncation
    assert np.abs(whole - tiled).mean() < 2e-3


def test_derived_halo_bounds_seam_error(small_inferencer):
    # halo=None derives the receptive-field-safe halo from the weights; the
    # resulting seam error must sit at the eps scale — far tighter than a
    # deliberately-too-small halo.
    halo = small_inferencer.derive_halo(eps=1e-3, probe=32)
    assert 4 <= halo <= 15
    img = np.random.RandomState(5).rand(48, 48, 3).astype(np.float32)
    whole = small_inferencer.upscale(img)
    tiled_auto = small_inferencer.upscale_tiled(img, tile=32, halo_eps=1e-3)
    tiled_bad = small_inferencer.upscale_tiled(img, tile=32, halo=2)
    err_auto = np.abs(whole - tiled_auto).max()
    err_bad = np.abs(whole - tiled_bad).max()
    assert err_auto < 4e-3, err_auto          # eps-scale, sub-uint8-LSB
    assert err_auto <= err_bad


def test_back_projection_reduces_consistency_error():
    rng = np.random.RandomState(3)
    hr = rng.rand(32, 32, 3).astype(np.float32)
    lr = imresize_np(hr, 0.25)
    sr0 = np.clip(hr + rng.randn(32, 32, 3).astype(np.float32) * 0.05, 0, 1)
    err0 = np.abs(imresize_np(sr0, 0.25) - lr).mean()
    sr1 = back_projection(sr0, lr, 4, iters=10)
    err1 = np.abs(imresize_np(sr1, 0.25) - lr).mean()
    assert err1 < err0 * 0.35  # Gaussian-filtered residual converges slower


def test_back_projection_gaussian_matches_fspecial():
    # fspecial('gaussian',5,1) squared + renormalised (backprojection.m:6-8);
    # the separable 1-D factor must reproduce the 2-D kernel exactly.
    from esrganplus_tpu.ops.back_projection import _fspecial_gaussian_sq

    r = np.arange(5.0) - 2.0
    g2d = np.exp(-(r[:, None] ** 2 + r[None, :] ** 2) / 2.0)
    g2d /= g2d.sum()
    g2d = g2d ** 2
    g2d /= g2d.sum()
    k = _fspecial_gaussian_sq()
    np.testing.assert_allclose(np.outer(k, k), g2d, atol=1e-12)


def test_reverse_filter_reduces_consistency_error():
    # main_reverse_filter.m:18-23 — double-resize residual loop
    from esrganplus_tpu.ops.back_projection import reverse_filter

    rng = np.random.RandomState(4)
    hr = rng.rand(32, 32, 3).astype(np.float32)
    lr = imresize_np(hr, 0.25)
    sr0 = np.clip(hr + rng.randn(32, 32, 3).astype(np.float32) * 0.05, 0, 1)
    j = imresize_np(lr, 4.0)
    err0 = np.abs(j - imresize_np(imresize_np(sr0, 0.25), 4.0)).mean()
    sr1 = reverse_filter(sr0, lr, 4, iters=20)
    err1 = np.abs(j - imresize_np(imresize_np(sr1, 0.25), 4.0)).mean()
    assert err1 < err0 * 0.2


def test_sharded_evaluator_matches_sequential(small_inferencer):
    from esrganplus_tpu.infer import ShardedEvaluator
    from esrganplus_tpu.parallel import make_mesh

    mesh = make_mesh(data=8, devices=jax.devices()[:8])
    ev = ShardedEvaluator(small_inferencer.cfg, mesh)
    rng = np.random.RandomState(7)

    # same-size images, dims multiples of pad_multiple → NO padding → exact,
    # and n=10 images over 8 devices = exactly 2 compiled batched calls
    imgs = [rng.rand(16, 24, 3).astype(np.float32) for _ in range(10)]
    outs = ev.upscale_batch(small_inferencer.params, imgs)
    assert ev.calls == 2
    for img, out in zip(imgs, outs):
        want = small_inferencer.upscale(img)
        np.testing.assert_allclose(out, want, atol=1e-5)

    # mixed sizes: padded eval is interior-exact; borders within the
    # receptive radius of the pad edge may differ (documented trade-off)
    imgs = [rng.rand(16, 24, 3).astype(np.float32),
            rng.rand(12, 17, 3).astype(np.float32)]
    outs = ev.upscale_batch(small_inferencer.params, imgs)
    halo = small_inferencer.derive_halo(eps=1e-3, probe=32)
    s = small_inferencer.cfg.upscale
    for img, out in zip(imgs, outs):
        want = small_inferencer.upscale(img)
        assert out.shape == want.shape
        m = halo * s
        np.testing.assert_allclose(out[:-m, :-m], want[:-m, :-m], atol=2e-3)


def test_net_interp_blend():
    sd_a = {"k": np.zeros((2, 2), np.float32)}
    sd_b = {"k": np.ones((2, 2), np.float32), "only_b": np.full((3,), 2.0, np.float32)}
    out = interpolate_state_dicts(sd_a, sd_b, 0.25)
    np.testing.assert_allclose(out["k"], 0.25)
    np.testing.assert_allclose(out["only_b"], 0.5)  # blended against zeros


def test_transfer_params_sft_mapping_matches_reference_golden():
    """The SRGAN→SFT seed mapping must equal, key for key, what the actual
    reference script produces (tests/golden/transfer_sft_map.json is generated
    by EXECUTING codes/scripts/transfer_params_sft.py on a tagged tiny
    checkpoint — see make_goldens.make_transfer_sft_golden). Catches any
    index drift in srgan_to_sft_map (e.g. the off-by-one sft_branch.17 ←
    model.1.sub.16 row)."""
    import json

    from esrganplus_tpu.cli.transfer_params import srgan_to_sft_map

    with open(os.path.join(GOLDEN, "transfer_sft_map.json")) as f:
        golden = json.load(f)
    ours = {dst + suf: src + suf
            for dst, src in srgan_to_sft_map(16).items()
            for suf in (".weight", ".bias")}
    assert ours == golden


def test_transfer_params_sft_cli_e2e(tmp_path):
    """--sft end to end: every mapped template key receives the source tensor,
    unmapped template keys keep their template values."""
    import torch

    from esrganplus_tpu.cli.transfer_params import main as tp_main
    from esrganplus_tpu.cli.transfer_params import srgan_to_sft_map
    from esrganplus_tpu.convert import load_state_dict

    mapping = {d + s: k + s for d, k in srgan_to_sft_map(16).items()
               for s in (".weight", ".bias")}
    src = {k: torch.tensor([100.0 + i])
           for i, k in enumerate(sorted(set(mapping.values())))}
    template = {k: torch.tensor([0.5]) for k in mapping}
    template["CondNet.0.weight"] = torch.tensor([0.25])  # no SRGAN source
    src_p, tpl_p, out_p = (str(tmp_path / n) for n in ("s.pth", "t.pth", "o.pth"))
    torch.save(src, src_p)
    torch.save(template, tpl_p)
    tp_main([src_p, tpl_p, out_p, "--sft"])
    out = load_state_dict(out_p)
    for dst, srck in mapping.items():
        np.testing.assert_array_equal(out[dst], src[srck].numpy())
    np.testing.assert_array_equal(out["CondNet.0.weight"], [0.25])


def test_sharded_evaluator_sft_side_input():
    """SFT-GAN generators carry an HR-scale seg side input; the evaluator
    shards both over the data axis (cli/train.py's sftgan val path)."""
    import functools

    from esrganplus_tpu.infer import ShardedEvaluator
    from esrganplus_tpu.models.sft import SFTNetConfig, init_sftnet, sftnet_forward
    from esrganplus_tpu.parallel import make_mesh

    cfg = SFTNetConfig(nf=8, nb=1, cond_nf=4)
    params = init_sftnet(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(data=8, devices=jax.devices()[:8])
    ev = ShardedEvaluator(cfg, mesh,
                          fwd_fn=functools.partial(sftnet_forward, cfg=cfg),
                          side_scale=cfg.upscale)
    rng = np.random.RandomState(3)
    imgs = [rng.rand(16, 8, 3).astype(np.float32) for _ in range(5)]
    segs = [rng.rand(64, 32, 8).astype(np.float32) for _ in range(5)]
    outs = ev.upscale_batch(params, imgs, sides=segs)
    assert ev.calls == 1
    for img, seg, out in zip(imgs, segs, outs):
        want = np.clip(np.asarray(
            sftnet_forward(params, jnp.asarray(img[None]),
                           jnp.asarray(seg[None]), cfg))[0], 0.0, 1.0)
        assert out.shape == want.shape
        np.testing.assert_allclose(out, want, atol=1e-5)


def test_activation_dump_localises_against_torch(tmp_path):
    """End-to-end activation-dump debug mode (PARITY.md's localisation recipe):
    tools/dump_torch_activations.py hooks the reference net, the CLI dumps the
    same 29 stage names here, and --compare-activations agrees stage-by-stage
    on a flagship checkpoint — then flags a corrupted stage as FIRST bad."""
    import json
    import subprocess

    from esrganplus_tpu.cli.test_image import main as test_image_main

    if not make_goldens.ensure_flagship_golden():
        pytest.skip("reference unavailable")
    ckpt = os.path.join(make_goldens.CACHE, "rrdb_flagship.pth")
    lr_dir = tmp_path / "lr"
    lr_dir.mkdir()
    import cv2

    rng = np.random.RandomState(5)
    cv2.imwrite(str(lr_dir / "img.png"),
                (rng.rand(40, 40, 3) * 255).astype(np.uint8))

    ref_json = tmp_path / "ref_acts.json"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "dump_torch_activations.py"),
         ckpt, "--input", str(lr_dir), "--out", str(ref_json)],
        check=True, capture_output=True)

    our_json = tmp_path / "our_acts.json"
    with pytest.raises(SystemExit) as ei:
        test_image_main([ckpt, "--input", str(lr_dir), "--output",
                         str(tmp_path / "sr"),
                         "--dump-activations", str(our_json),
                         "--compare-activations", str(ref_json)])
    assert ei.value.code == 0

    ours = json.load(open(our_json))
    ref = json.load(open(ref_json))
    assert set(ours["images"]["img"]) == set(ref["images"]["img"]) and \
        len(ours["images"]["img"]) == 29

    # Corrupt one mid-trunk stage in the reference dump: compare must fail and
    # name exactly that stage as the first divergence.
    ref["images"]["img"]["rrdb_07"]["rms"] *= 1.5
    json.dump(ref, open(ref_json, "w"))
    with pytest.raises(SystemExit) as ei:
        test_image_main([ckpt, "--input", str(lr_dir), "--output",
                         str(tmp_path / "sr"),
                         "--dump-activations", str(our_json),
                         "--compare-activations", str(ref_json)])
    assert ei.value.code == 1
