"""Prepared-trunk master format (models/rrdb.py prep_trunk_ct and friends).

Trainers on the Pallas fast path keep the RRDB-trunk f32 masters in the
kernel's column-merged layout, skipping the per-step canonical→kernel weight
relayout (~0.7-1 ms/step at flagship shape, round-4 trace). These tests pin:

  * prep → unprep is the exact identity (bit-level),
  * forwards (train and eval) agree between representations,
  * gradients map exactly (incl. the stage-2 structural-zero mask),
  * trainer trajectories match step-for-step with prep on vs off,
  * oversized-input eval falls back through unprep inside the jit.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esrganplus_tpu.models.rrdb import (
    RRDBNetConfig,
    init_rrdbnet,
    mask_trunk_ct_grads,
    prep_trunk_ct,
    prep_trunk_static,
    rrdbnet_forward,
    unprep_trunk_ct,
)

CFG = RRDBNetConfig(nf=16, nb=2, gc=8, trunk_kernel="pallas", noise_sigma=0.1)


def _params(cfg=CFG, seed=0):
    return init_rrdbnet(jax.random.PRNGKey(seed), cfg)


@pytest.mark.parametrize("conv1x1", [True, False])
def test_prep_unprep_roundtrip_exact(conv1x1):
    cfg = dataclasses.replace(CFG, conv1x1=conv1x1)
    params = _params(cfg)
    back = unprep_trunk_ct(prep_trunk_ct(params, cfg), cfg)
    la, lb = jax.tree.leaves(params), jax.tree.leaves(back)
    assert jax.tree.structure(params) == jax.tree.structure(back)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_forward_matches_canonical():
    params = _params()
    prepped = prep_trunk_ct(params, CFG)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3), jnp.float32)
    rng = jax.random.PRNGKey(2)
    for train in (False, True):
        a = rrdbnet_forward(params, x, CFG, train=train, rng=rng)
        b = rrdbnet_forward(prepped, x, CFG, train=train, rng=rng)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_grads_map_exactly_through_prep():
    params = _params()
    prepped = prep_trunk_ct(params, CFG)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3), jnp.float32)
    rng = jax.random.PRNGKey(2)

    def loss(p):
        out = rrdbnet_forward(p, x, CFG, train=True, rng=rng)
        return jnp.mean(jnp.abs(out - 0.5))

    g_canon = jax.grad(loss)(params)
    g_prep = mask_trunk_ct_grads(jax.grad(loss)(prepped), CFG)
    # the masked prepared grads, mapped back through the (linear) unprep,
    # must equal the canonical grads entry for entry
    g_mapped = unprep_trunk_ct(g_prep, CFG)
    for a, b in zip(jax.tree.leaves(g_canon), jax.tree.leaves(g_mapped)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6, rtol=1e-5)


def test_mask_zeroes_only_dead_support():
    params = _params()
    prepped = prep_trunk_ct(params, CFG)
    ones = jax.tree.map(jnp.ones_like, prepped)
    masked = mask_trunk_ct_grads(ones, CFG)
    w2 = np.asarray(masked["trunk_ct"]["rdb1"][1])[0]  # [3gc+gc, 3(nf+gc)]
    gc, nf = CFG.gc, CFG.nf
    assert w2[: 3 * gc].all()                      # dense rows untouched
    assert w2[3 * gc:, nf:2 * nf].all()            # live 1x1 block kept
    dead = np.ones_like(w2[3 * gc:], bool)
    dead[:, nf:2 * nf] = False
    assert (w2[3 * gc:][dead] == 0).all()          # structural zeros masked


@pytest.mark.slow
def test_sr_trainer_prep_matches_unprepped():
    from esrganplus_tpu.parallel import make_mesh, shard_batch
    from esrganplus_tpu.train import SRTrainConfig, SRTrainer

    mesh = make_mesh()
    lr = jax.random.uniform(jax.random.PRNGKey(0), (8, 8, 8, 3), jnp.float32)
    hr = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3), jnp.float32)
    batch = shard_batch(mesh, (np.asarray(lr), np.asarray(hr)))

    losses = {}
    for prep in (False, True):
        tcfg = SRTrainConfig(lr=1e-3, milestones=(100,), prep_trunk=prep)
        tr = SRTrainer(CFG, tcfg, mesh=mesh)
        assert tr._prep_trunk is prep
        state = tr.init_state(jax.random.PRNGKey(3))
        ls = []
        for i in range(3):
            state, logs = tr.train_step(state, batch, jax.random.PRNGKey(7))
            ls.append(float(logs["l_pix"]))
        losses[prep] = ls
        if prep:
            final_prepped = tr.canonical_params(state["params"])
        else:
            final_canon = state["params"]
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-6)
    for a, b in zip(jax.tree.leaves(final_canon), jax.tree.leaves(final_prepped)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_eval_fallback_unpreps_for_oversized_inputs():
    # trunk_kernel='auto' on CPU fails the pallas gate -> the prepared params
    # must transparently unprep inside the forward and take the XLA path
    cfg = dataclasses.replace(CFG, trunk_kernel="auto")
    params = _params(cfg)
    prepped = prep_trunk_ct(params, cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 12, 12, 3), jnp.float32)
    a = rrdbnet_forward(params, x, cfg, train=False)
    b = jax.jit(lambda p: rrdbnet_forward(p, x, cfg, train=False))(prepped)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_prep_static_gate():
    from esrganplus_tpu.models.srresnet import SRResNetConfig

    assert prep_trunk_static(CFG, None)                    # explicit pallas
    assert not prep_trunk_static(
        dataclasses.replace(CFG, trunk_kernel="xla"), jnp.bfloat16)
    assert not prep_trunk_static(
        dataclasses.replace(CFG, tail_kernel="xla"), None)  # needs the tail
    assert not prep_trunk_static(SRResNetConfig(), jnp.bfloat16)
    # 'auto' keys on dtype + backend (CPU suite: off)
    auto = dataclasses.replace(CFG, trunk_kernel="auto")
    assert not prep_trunk_static(auto, None)


@pytest.mark.parametrize("save_prep", [True, False])
@pytest.mark.slow
def test_resume_across_representations(tmp_path, save_prep):
    """A state saved under one prep_trunk gate resumes under the other
    (cli/train.py uses load_state_auto: e.g. TPU-trained prepared masters
    restored by a CPU trainer). Params AND Adam moments convert exactly —
    the continued trajectory matches a same-representation run."""
    from esrganplus_tpu.parallel import make_mesh, shard_batch
    from esrganplus_tpu.train import SRTrainConfig, SRTrainer
    from esrganplus_tpu.train.checkpoint import load_state_auto, save_state

    mesh = make_mesh()
    lr = jax.random.uniform(jax.random.PRNGKey(0), (8, 8, 8, 3), jnp.float32)
    hr = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3), jnp.float32)
    batch = shard_batch(mesh, (np.asarray(lr), np.asarray(hr)))

    def trainer(prep):
        return SRTrainer(CFG, SRTrainConfig(lr=1e-3, milestones=(100,),
                                            prep_trunk=prep), mesh=mesh)

    # run A: 2 steps in the save representation, save, resume in the other
    tr_a = trainer(save_prep)
    state = tr_a.init_state(jax.random.PRNGKey(3))
    for _ in range(2):
        state, _ = tr_a.train_step(state, batch, jax.random.PRNGKey(7))
    p = str(tmp_path / "2.state.npz")
    save_state(p, state)

    tr_b = trainer(not save_prep)
    template = tr_b.init_state(jax.random.PRNGKey(9))
    resumed = load_state_auto(p, template, CFG)
    key = "trunk_ct" if not save_prep else "trunk"
    assert key in resumed["params"]
    losses_b = []
    for _ in range(2):
        resumed, logs = tr_b.train_step(resumed, batch, jax.random.PRNGKey(7))
        losses_b.append(float(logs["l_pix"]))

    # run C: 4 straight steps in the resume representation (reuse tr_b —
    # same config, so its jitted step serves; a third trainer instance
    # would recompile the identical program: suite-runtime guard, VERDICT
    # r4 #8)
    tr_c = tr_b
    ref = tr_c.init_state(jax.random.PRNGKey(3))
    losses_c = []
    for i in range(4):
        ref, logs = tr_c.train_step(ref, batch, jax.random.PRNGKey(7))
        losses_c.append(float(logs["l_pix"]))
    np.testing.assert_allclose(losses_b, losses_c[2:], rtol=1e-5)
    canon = lambda t, s: t.canonical_params(s["params"])
    for a, b in zip(jax.tree.leaves(canon(tr_b, resumed)),
                    jax.tree.leaves(canon(tr_c, ref))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.slow
def test_gan_resume_across_representations(tmp_path):
    """The flagship (GAN) state — g_params + D + both Adam trees + f-less —
    also resumes across prep representations via load_state_auto."""
    from esrganplus_tpu.models.discriminator import DiscriminatorVGGConfig
    from esrganplus_tpu.parallel import make_mesh, shard_batch
    from esrganplus_tpu.train.checkpoint import load_state_auto, save_state
    from esrganplus_tpu.train.gan_model import GANTrainConfig, GANTrainer

    mesh = make_mesh()
    lr = jax.random.uniform(jax.random.PRNGKey(0), (8, 32, 32, 3), jnp.float32)
    hr = jax.random.uniform(jax.random.PRNGKey(1), (8, 128, 128, 3), jnp.float32)
    batch = shard_batch(mesh, (np.asarray(lr), np.asarray(hr)))
    net_d = DiscriminatorVGGConfig(input_size=128, base_nf=8)

    def trainer(prep):
        return GANTrainer(CFG, net_d,
                          GANTrainConfig(variant="srragan", milestones=(100,),
                                         feature_weight=0.0, prep_trunk=prep),
                          mesh=mesh)

    tr_a = trainer(True)
    state = tr_a.init_state(jax.random.PRNGKey(3))
    assert "trunk_ct" in state["g_params"]
    state, _ = tr_a.train_step(state, batch, jax.random.PRNGKey(7))
    p = str(tmp_path / "1.state.npz")
    save_state(p, state)

    tr_b = trainer(False)
    template = tr_b.init_state(jax.random.PRNGKey(9))
    resumed = load_state_auto(p, template, CFG)
    assert "trunk" in resumed["g_params"]
    resumed, logs = tr_b.train_step(resumed, batch, jax.random.PRNGKey(7))
    assert int(resumed["step"]) == 2
    for k, v in logs.items():
        assert np.isfinite(float(v)), (k, v)


def test_resume_auto_rejects_genuine_config_mismatch(tmp_path):
    """A real config mismatch (different depth) must surface load_state's
    shape error, not a confusing failure from the representation toggle."""
    import dataclasses as dc

    from esrganplus_tpu.parallel import make_mesh
    from esrganplus_tpu.train import SRTrainConfig, SRTrainer
    from esrganplus_tpu.train.checkpoint import load_state_auto, save_state

    mesh = make_mesh()
    tr = SRTrainer(CFG, SRTrainConfig(prep_trunk=False), mesh=mesh)
    p = str(tmp_path / "1.state.npz")
    save_state(p, tr.init_state(jax.random.PRNGKey(0)))

    other_cfg = dc.replace(CFG, nb=3)
    tr2 = SRTrainer(other_cfg, SRTrainConfig(prep_trunk=False), mesh=mesh)
    template = tr2.init_state(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="template"):
        load_state_auto(p, template, other_cfg)


def test_checkpoint_roundtrip_and_pth_export_with_prep(tmp_path):
    from esrganplus_tpu.parallel import make_mesh
    from esrganplus_tpu.train import SRTrainConfig, SRTrainer
    from esrganplus_tpu.train.checkpoint import (load_state, save_networks_pth,
                                                 save_state)

    mesh = make_mesh()
    tr = SRTrainer(CFG, SRTrainConfig(prep_trunk=True), mesh=mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    assert "trunk_ct" in state["params"]

    # state.npz round-trips in the prepared representation (template-based)
    p = str(tmp_path / f"7.state.npz")
    save_state(p, state)
    template = tr.init_state(jax.random.PRNGKey(9))
    restored = load_state(p, template)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # .pth export goes through the canonical layout and loads back losslessly
    save_networks_pth(str(tmp_path), "t", tr.canonical_params(state["params"]), CFG)
    from esrganplus_tpu.infer import load_generator

    params2, cfg2, _ = load_generator(str(tmp_path / "t_G.pth"))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 12, 12, 3), jnp.float32)
    a = rrdbnet_forward(state["params"], x, CFG, train=False)
    b = rrdbnet_forward(params2, x, cfg2, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
