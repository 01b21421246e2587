import jax
import jax.numpy as jnp
import numpy as np

from esrganplus_tpu.models import RRDBNetConfig
from esrganplus_tpu.models.discriminator import DiscriminatorVGGConfig
from esrganplus_tpu.models.vgg import VGGFeatConfig
from esrganplus_tpu.parallel import make_mesh, shard_batch
from esrganplus_tpu.train import SRTrainConfig, SRTrainer
from esrganplus_tpu.train.gan_model import GANTrainConfig, GANTrainer
from esrganplus_tpu.train.schedule import multistep_lr

NET = RRDBNetConfig(nf=16, nb=2, gc=8, upscale=4)


def _batch(mesh, n=8, size=8):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    lr_img = jax.random.uniform(k1, (n, size, size, 3))
    hr_img = jax.random.uniform(k2, (n, size * 4, size * 4, 3))
    return shard_batch(mesh, (lr_img, hr_img))


def test_multistep_schedule():
    s = multistep_lr(1e-4, [10, 20], 0.5)
    np.testing.assert_allclose(float(s(0)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(10)), 5e-5, rtol=1e-6)
    np.testing.assert_allclose(float(s(25)), 2.5e-5, rtol=1e-6)


def test_sr_trainer_loss_decreases():
    mesh = make_mesh()
    trainer = SRTrainer(NET, SRTrainConfig(lr=2e-4, milestones=(1000,)), mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = _batch(mesh)
    losses = []
    for i in range(12):
        state, logs = trainer.train_step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(logs["l_pix"]))
    assert int(state["step"]) == 12
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_sr_trainer_data_parallel_matches_single_device():
    # Same global batch on a 1-device and an 8-device mesh → same loss trajectory.
    devs = jax.devices()
    mesh8 = make_mesh(data=8, devices=devs[:8])
    mesh1 = make_mesh(data=1, devices=devs[:1])
    cfg = SRTrainConfig(lr=1e-3, milestones=(1000,))
    out = {}
    for name, mesh in (("m8", mesh8), ("m1", mesh1)):
        trainer = SRTrainer(NET, cfg, mesh=mesh)
        state = trainer.init_state(jax.random.PRNGKey(0))
        batch = _batch(mesh)
        logs_all = []
        for i in range(3):
            state, logs = trainer.train_step(state, batch, jax.random.PRNGKey(i))
            logs_all.append(float(logs["l_pix"]))
        out[name] = logs_all
    np.testing.assert_allclose(out["m8"], out["m1"], rtol=2e-4)


def test_gan_trainer_step_and_gating():
    mesh = make_mesh()
    vgg_layout = (4, 4, "M", 8, 8, "M")
    cfg = GANTrainConfig(variant="srragan", d_update_ratio=2, d_init_iters=0,
                         milestones=(1000,))
    trainer = GANTrainer(NET, DiscriminatorVGGConfig(input_size=128, base_nf=8),
                         cfg, mesh=mesh,
                         vgg_cfg=VGGFeatConfig(feature_layer=5, layout=vgg_layout))
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = _batch(mesh, n=8, size=32)  # HR 128 matches D input size
    logs_seq = []
    for i in range(4):
        state, logs = trainer.train_step(state, batch, jax.random.PRNGKey(i))
        logs_seq.append({k: float(v) for k, v in logs.items()})
    # reference gating on the 1-based counter (`current_step % ratio == 0`,
    # SRRaGAN_model.py:119): iterations 2 and 4 update G, 1 and 3 skip.
    assert logs_seq[0]["l_g_total"] == 0.0
    assert logs_seq[1]["l_g_total"] != 0.0
    assert logs_seq[2]["l_g_total"] == 0.0
    assert logs_seq[3]["l_g_total"] != 0.0
    for logs in logs_seq:
        for k, v in logs.items():
            assert np.isfinite(v), (k, v)
    assert int(state["step"]) == 4


def test_gan_lr_milestones_follow_global_step_under_gating():
    # With d_update_ratio=2 the G optimizer applies only every other step; the
    # MultiStepLR milestones must still fire on the GLOBAL iteration (the
    # reference steps every scheduler each iteration, base_model.py:35-40).
    mesh = make_mesh()
    cfg = GANTrainConfig(variant="srragan", feature_weight=0.0,
                         d_update_ratio=2, d_init_iters=0,
                         lr_g=1e-4, milestones=(3,), lr_gamma=0.5)
    trainer = GANTrainer(NET, DiscriminatorVGGConfig(input_size=96, base_nf=8),
                         cfg, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = _batch(mesh, n=8, size=24)
    lrs = []
    for i in range(4):
        state, logs = trainer.train_step(state, batch, jax.random.PRNGKey(i))
        lrs.append(float(logs["lr"]))
    # iterations 1..4: milestone at 3 halves the lr there, NOT at the 3rd
    # *applied* G update (which would be iteration 6 under ratio=2)
    np.testing.assert_allclose(lrs, [1e-4, 1e-4, 5e-5, 5e-5], rtol=1e-6)


def test_gan_trainer_wgan_gp_runs():
    mesh = make_mesh()
    cfg = GANTrainConfig(variant="srgan", gan_type="wgan-gp", feature_weight=0.0,
                         milestones=(1000,))
    trainer = GANTrainer(NET, DiscriminatorVGGConfig(input_size=128, base_nf=8,
                                                     norm_type=None),
                         cfg, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = _batch(mesh, n=8, size=32)
    state, logs = trainer.train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(logs["l_d_total"]))


def test_sr_trainer_bf16_compute():
    # regression: bf16 compute path must be differentiable (the conv transpose
    # rule rejects mixed bf16/f32 when preferred_element_type is forced)
    mesh = make_mesh()
    trainer = SRTrainer(NET, SRTrainConfig(lr=1e-3, milestones=(100,),
                                           compute_dtype="bfloat16"), mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = _batch(mesh)
    losses = []
    for i in range(6):
        state, logs = trainer.train_step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(logs["l_pix"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_gan_trainer_data_parallel_matches_single_device():
    # BatchNorm in D uses global-batch statistics under SPMD: the same global
    # batch on 1 vs 8 devices must produce the same loss trajectory.
    devs = jax.devices()
    cfg = GANTrainConfig(variant="srragan", feature_weight=0.0, milestones=(1000,))
    out = {}
    for name, mesh in (("m8", make_mesh(data=8, devices=devs[:8])),
                       ("m1", make_mesh(data=1, devices=devs[:1]))):
        trainer = GANTrainer(NET, DiscriminatorVGGConfig(input_size=96, base_nf=8),
                             cfg, mesh=mesh)
        state = trainer.init_state(jax.random.PRNGKey(0))
        k1, k2 = jax.random.split(jax.random.PRNGKey(5))
        batch = shard_batch(mesh, (jax.random.uniform(k1, (8, 24, 24, 3)),
                                   jax.random.uniform(k2, (8, 96, 96, 3))))
        logs_all = []
        for i in range(2):
            state, logs = trainer.train_step(state, batch, jax.random.PRNGKey(i))
            logs_all.append([float(logs["l_g_total"]), float(logs["l_d_total"]),
                             float(logs["D_real"])])
        out[name] = logs_all
    # cross-device reduction order perturbs f32 sums at ~1e-7; the GAN losses
    # amplify that over steps — semantic equivalence shows as <1% drift
    np.testing.assert_allclose(out["m8"], out["m1"], rtol=1e-2, atol=1e-4)


def test_noise_prng_rbg_trainer_runs():
    """noise_prng='rbg' routes the noise sites through XLA's hardware
    RngBitGenerator (train/rng.py): steps run, losses stay finite, and the
    noise realisation genuinely differs from the threefry default."""
    from esrganplus_tpu.train.rng import noise_key

    k = jax.random.fold_in(jax.random.PRNGKey(7), 3)
    rk = noise_key(k, "rbg")
    sub = jax.random.split(rk, 4)  # splitting rbg keys must work (trunk scan)
    a = jax.random.normal(sub[0], (128,))
    assert np.isfinite(np.asarray(a)).all()
    b = jax.random.normal(noise_key(k, "threefry"), (128,))
    assert float(jnp.abs(jax.random.normal(rk, (128,)) - b).max()) > 1e-3

    mesh = make_mesh()
    trainer = SRTrainer(NET, SRTrainConfig(lr=2e-4, milestones=(1000,),
                                           noise_prng="rbg"), mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = _batch(mesh)
    for i in range(3):
        state, logs = trainer.train_step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(logs["l_pix"]))


def test_gan_trainer_with_feature_loss_runs():
    # drives the VGG perceptual term through a full G+D step — the G gradient
    # flows back through conv/relu/maxpool_2x2 (custom-VJP pool, layers.py)
    mesh = make_mesh()
    cfg = GANTrainConfig(variant="srragan", feature_weight=1.0,
                         milestones=(1000,))
    trainer = GANTrainer(NET, DiscriminatorVGGConfig(input_size=96, base_nf=8),
                         cfg, mesh=mesh,
                         vgg_cfg=VGGFeatConfig(feature_layer=5,
                                               layout=(4, 4, "M", 8, 8, "M")))
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = _batch(mesh, n=8, size=24)
    g0 = np.asarray(jax.tree.leaves(state["g_params"])[0])  # copy: step donates
    state, logs = trainer.train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(logs["l_g_fea"])) and float(logs["l_g_fea"]) > 0
    assert np.isfinite(float(logs["l_g_total"]))
    # the feature term actually moved G (grads flowed through the pool)
    assert np.abs(np.asarray(jax.tree.leaves(state["g_params"])[0]) - g0).max() > 0
