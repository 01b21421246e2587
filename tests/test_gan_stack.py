import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esrganplus_tpu.convert.pth import (
    discriminator_from_state_dict,
    discriminator_to_state_dict,
    load_state_dict,
)
from esrganplus_tpu.losses import gan_loss, gradient_penalty, ragan_d_loss, ragan_g_loss
from esrganplus_tpu.models.discriminator import (
    DiscriminatorVGGConfig,
    apply_state_updates,
    discriminator_forward,
    init_discriminator,
)
from esrganplus_tpu.models.vgg import VGGFeatConfig, vgg_feat_forward, vgg_feat_from_state_dict

import make_goldens

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
CACHE = make_goldens.CACHE

D_CFG = DiscriminatorVGGConfig(input_size=128, base_nf=64)


def _nchw(x):
    return np.transpose(x, (0, 2, 3, 1))


@pytest.fixture(scope="module")
def d_fixture():
    if not make_goldens.ensure_cached_goldens():
        pytest.skip("reference checkout unavailable; cached goldens missing")
    sd = load_state_dict(os.path.join(CACHE, "d_vgg128.pth"))
    io = np.load(os.path.join(CACHE, "d_vgg128_io.npz"))
    return sd, io


def test_discriminator_eval_parity(d_fixture):
    sd, io = d_fixture
    params = discriminator_from_state_dict(sd, D_CFG)
    logits, _ = discriminator_forward(params, jnp.asarray(_nchw(io["x0"])), D_CFG, train=False)
    np.testing.assert_allclose(np.asarray(logits), io["logits_eval"], atol=2e-4)


def test_discriminator_train_mode_parity_and_running_stats(d_fixture):
    sd, io = d_fixture
    params = discriminator_from_state_dict(sd, D_CFG)
    # Reset running stats to init (the golden sd has them post-3-forwards).
    for entry in params["bn"]:
        for side in ("a", "b"):
            if entry[side] is not None:
                entry[side]["mean"] = jnp.zeros_like(entry[side]["mean"])
                entry[side]["var"] = jnp.ones_like(entry[side]["var"])
    # Train-mode logits use batch stats only.
    logits, st = discriminator_forward(params, jnp.asarray(_nchw(io["x0"])), D_CFG, train=True)
    np.testing.assert_allclose(np.asarray(logits), io["logits_train0"], atol=2e-4)
    # Replay the reference's 3 train forwards; running stats must match torch's.
    params = apply_state_updates(params, st, D_CFG)
    for name in ("x1", "x2"):
        _, st = discriminator_forward(params, jnp.asarray(_nchw(io[name])), D_CFG, train=True)
        params = apply_state_updates(params, st, D_CFG)
    sd2 = discriminator_to_state_dict(params, D_CFG)
    for k in sd:
        if "running_mean" in k or "running_var" in k:
            np.testing.assert_allclose(sd2[k], sd[k], atol=1e-4, err_msg=k)


def test_discriminator_roundtrip(d_fixture):
    sd, _ = d_fixture
    params = discriminator_from_state_dict(sd, D_CFG)
    sd2 = discriminator_to_state_dict(params, D_CFG)
    assert set(sd2) == set(sd)
    for k in sd:
        if k.endswith("num_batches_tracked"):
            continue  # torch's forward counter; unused by momentum-form BN
        np.testing.assert_allclose(sd2[k], sd[k], atol=1e-7, err_msg=k)


@pytest.mark.parametrize("size", [96, 192])
def test_discriminator_96_192_golden_parity(size):
    """Full-shape (base_nf=64, BN on) torch goldens for the 96/192 variants —
    same protocol as the 128 fixture: eval logits, train-mode (batch-stat)
    logits, and the running-stat trajectory over 3 train forwards. The 192
    variant has an extra stage (n_stages=6), so this catches any stage-count /
    BN-indexing drift the shape-only test missed."""
    if not make_goldens.ensure_discriminator_goldens(size):
        pytest.skip("reference checkout unavailable; cached goldens missing")
    sd = load_state_dict(os.path.join(CACHE, f"d_vgg{size}.pth"))
    io = np.load(os.path.join(CACHE, f"d_vgg{size}_io.npz"))
    cfg = DiscriminatorVGGConfig(input_size=size, base_nf=64)

    params = discriminator_from_state_dict(sd, cfg)
    logits, _ = discriminator_forward(params, jnp.asarray(_nchw(io["x0"])), cfg, train=False)
    np.testing.assert_allclose(np.asarray(logits), io["logits_eval"], atol=2e-4)

    # Reset running stats to init and replay the reference's 3 train forwards.
    for entry in params["bn"]:
        for side in ("a", "b"):
            if entry[side] is not None:
                entry[side]["mean"] = jnp.zeros_like(entry[side]["mean"])
                entry[side]["var"] = jnp.ones_like(entry[side]["var"])
    logits, st = discriminator_forward(params, jnp.asarray(_nchw(io["x0"])), cfg, train=True)
    np.testing.assert_allclose(np.asarray(logits), io["logits_train0"], atol=2e-4)
    params = apply_state_updates(params, st, cfg)
    for name in ("x1", "x2"):
        _, st = discriminator_forward(params, jnp.asarray(_nchw(io[name])), cfg, train=True)
        params = apply_state_updates(params, st, cfg)
    sd2 = discriminator_to_state_dict(params, cfg)
    assert set(sd2) == set(sd)
    for k in sd:
        if "running_mean" in k or "running_var" in k:
            np.testing.assert_allclose(sd2[k], sd[k], atol=1e-4, err_msg=k)


def test_discriminator_spectral_norm_runs():
    cfg = DiscriminatorVGGConfig(input_size=128, base_nf=16, norm_type=None, spectral_norm=True)
    params = init_discriminator(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 128, 128, 3))
    logits, st = discriminator_forward(params, x, cfg, train=True)
    assert np.isfinite(np.asarray(logits)).all()
    p2 = apply_state_updates(params, st, cfg)
    # u vectors should move after a power-iteration step
    assert not np.allclose(np.asarray(p2["convs"][0]["a"]["u"]),
                           np.asarray(params["convs"][0]["a"]["u"]))


def test_vgg19_structure_matches_torchvision_table():
    """Structure-hash the expanded plan against torchvision's published VGG19
    `features` layer table (torchvision.models.vgg cfg 'E'; torchvision itself
    is not installed here). Catches any index/pool/truncation drift relative to
    the reference's `[:feature_layer + 1]` slice semantics
    (``architecture.py:297``, ``networks.py:144-148``) without needing weights."""
    from esrganplus_tpu.models.vgg import VGGFeatConfig, _torchvision_plan

    # torchvision vgg19.features: (index, kind, out_channels-or-None)
    def expected_table(use_bn):
        table = []
        cin = 3
        for c in (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
                  512, 512, 512, 512, "M", 512, 512, 512, 512, "M"):
            if c == "M":
                table.append(("pool", None))
            else:
                table.append(("conv", c))
                if use_bn:
                    table.append(("bn", c))
                table.append(("relu", None))
                cin = c
        return table

    for use_bn, feature_layer, n_features in ((False, 34, 37), (True, 49, 53)):
        cfg = VGGFeatConfig(feature_layer=feature_layer, use_bn=use_bn)
        plan = _torchvision_plan(cfg)
        exp = expected_table(use_bn)
        assert len(plan) == n_features  # torchvision len(vgg19(_bn).features)
        for i, (entry, (kind, c)) in enumerate(zip(plan, exp)):
            assert entry[0] == kind, f"index {i}: {entry[0]} != {kind}"
            if kind == "conv":
                assert entry[2] == c, f"index {i}: cout {entry[2]} != {c}"
            if kind == "bn":
                assert entry[1] == c
        # Truncation: [:feature_layer+1] must END at conv5_4 pre-activation.
        trunc = plan[: cfg.feature_layer + 1]
        assert trunc[-1][0] == "conv" and trunc[-1][2] == 512
        assert sum(1 for e in trunc if e[0] == "conv") == 16  # conv1_1..conv5_4
        assert sum(1 for e in trunc if e[0] == "pool") == 4   # pools 1-4 only
        # First dropped layer: bn5_4 for the BN variant, relu5_4 otherwise.
        assert plan[cfg.feature_layer + 1][0] == ("bn" if use_bn else "relu")


def test_vgg_feature_extractor_parity():
    sd = load_state_dict(os.path.join(GOLDEN, "vgg19_random.pth"))
    io = np.load(os.path.join(GOLDEN, "vgg19_io.npz"))
    layout = (8, 8, "M", 16, 16, "M", 32, 32, 32, 32, "M",
              64, 64, 64, 64, "M", 64, 64, 64, 64, "M")
    cfg = VGGFeatConfig(feature_layer=34, layout=layout)
    params = vgg_feat_from_state_dict(sd, cfg)
    assert params["pretrained"]
    feat = vgg_feat_forward(params, jnp.asarray(_nchw(io["x"])), cfg)
    np.testing.assert_allclose(np.asarray(feat), _nchw(io["feat"]), atol=2e-5)


def test_gan_loss_values():
    logits = jnp.asarray([0.0, 2.0, -2.0])
    # vanilla BCE-with-logits against ones: -log sigmoid(x)
    want = -np.mean(np.log(1 / (1 + np.exp(-np.asarray([0.0, 2.0, -2.0])))))
    assert abs(float(gan_loss(logits, True, "vanilla")) - want) < 1e-6
    assert abs(float(gan_loss(logits, False, "lsgan")) - np.mean(np.asarray([0, 4.0, 4.0]))) < 1e-6
    assert abs(float(gan_loss(logits, True, "wgan-gp")) + float(np.mean([0.0, 2.0, -2.0]))) < 1e-6


def test_ragan_pair_symmetry():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    d_real = jax.random.normal(k1, (8, 1))
    d_fake = jax.random.normal(k2, (8, 1))
    g = float(ragan_g_loss(d_real, d_fake))
    d = float(ragan_d_loss(d_real, d_fake))
    # swapping roles swaps the two losses
    assert abs(float(ragan_g_loss(d_fake, d_real)) - d) < 1e-6
    assert abs(float(ragan_d_loss(d_fake, d_real)) - g) < 1e-6


def test_gradient_penalty_zero_for_linear_critic():
    # critic(x) = sum of x * 1 → per-sample grad-norm = sqrt(numel); GP is
    # deterministic: (sqrt(numel) - 1)^2
    def d_apply(params, x):
        return jnp.sum(x, axis=(1, 2, 3), keepdims=False)[:, None]

    real = jnp.ones((2, 4, 4, 3))
    fake = jnp.zeros((2, 4, 4, 3))
    gp = float(gradient_penalty(d_apply, {}, real, fake, jax.random.PRNGKey(0)))
    want = (np.sqrt(4 * 4 * 3) - 1.0) ** 2
    assert abs(gp - want) < 1e-4


def test_discriminator_sn_export_roundtrip():
    """save_networks_pth-style SN export: reference key layout (conv{i}.weight_orig/
    weight/weight_u + linear{0,1}.*) and an exact import round-trip."""
    from esrganplus_tpu.convert.pth import (
        discriminator_sn_from_state_dict,
        discriminator_sn_to_state_dict,
    )

    cfg = DiscriminatorVGGConfig(input_size=128, base_nf=8, norm_type=None,
                                 spectral_norm=True)
    params = init_discriminator(jax.random.PRNGKey(3), cfg)
    sd = discriminator_sn_to_state_dict(params, cfg)
    want_keys = set()
    for i in range(2 * cfg.n_stages):
        want_keys |= {f"conv{i}.{s}" for s in ("weight_orig", "weight", "weight_u", "bias")}
    for lin in ("linear0", "linear1"):
        want_keys |= {f"{lin}.{s}" for s in ("weight_orig", "weight", "weight_u", "bias")}
    assert set(sd) == want_keys
    # the `weight` buffer is weight_orig / sigma for a positive scalar sigma
    # (unit spectral norm only once the power iteration has converged)
    ratio = sd["conv0.weight_orig"] / sd["conv0.weight"]
    assert ratio.std() / abs(ratio.mean()) < 1e-5 and ratio.mean() > 0
    back = discriminator_sn_from_state_dict(sd, cfg)
    x = jax.random.uniform(jax.random.PRNGKey(4), (2, 128, 128, 3))
    y1, _ = discriminator_forward(params, x, cfg, train=True)
    y2, _ = discriminator_forward(back, x, cfg, train=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_discriminator_sn_parity():
    """Exact parity with the reference SN discriminator: import weight_orig +
    weight_u, run one power iteration like the vendored forward-pre-hook."""
    if not make_goldens.ensure_sn_goldens():
        pytest.skip("reference unavailable")
    from esrganplus_tpu.convert.pth import discriminator_sn_from_state_dict

    cfg = DiscriminatorVGGConfig(input_size=128, base_nf=64, norm_type=None,
                                 spectral_norm=True)
    sd = load_state_dict(os.path.join(CACHE, "d_sn.pth"))
    params = discriminator_sn_from_state_dict(sd, cfg)
    io = np.load(os.path.join(CACHE, "d_sn_io.npz"))
    logits, _ = discriminator_forward(params, jnp.asarray(_nchw(io["x"])), cfg, train=True)
    np.testing.assert_allclose(np.asarray(logits), io["y"], atol=1e-6)


def test_minibatch_std_concat_modes():
    """PGGAN minibatch-std concat (reference block.py:158-191, dead code
    upstream): 'all' matches a direct recomputation; the other working modes
    produce the documented shapes; broken upstream modes raise."""
    from esrganplus_tpu.models.layers import minibatch_std_concat

    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 6, 5, 8), jnp.float32)
    out = minibatch_std_concat(x, "all")
    assert out.shape == (4, 6, 5, 9)
    np.testing.assert_allclose(np.asarray(out[..., :8]), np.asarray(x))
    xn = np.asarray(x)
    std = np.sqrt(((xn - xn.mean(0, keepdims=True)) ** 2).mean(0) + 1e-8)
    np.testing.assert_allclose(np.asarray(out[0, ..., 8]), std.mean(-1),
                               rtol=1e-6)
    assert minibatch_std_concat(x, "spatial").shape == (4, 6, 5, 16)
    assert minibatch_std_concat(x, "none").shape == (4, 6, 5, 16)
    assert minibatch_std_concat(x, "gpool").shape == (4, 6, 5, 16)
    with pytest.raises(NotImplementedError):
        minibatch_std_concat(x, "flat")
