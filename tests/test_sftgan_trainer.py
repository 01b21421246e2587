import jax
import jax.numpy as jnp
import numpy as np

from esrganplus_tpu.models.sft import SFTNetConfig
from esrganplus_tpu.models.vgg import VGGFeatConfig
from esrganplus_tpu.parallel import data_sharding, make_mesh, replicated, shard_batch
from esrganplus_tpu.train.sftgan_model import SFTGANTrainConfig, SFTGANTrainer, masked_cross_entropy


def test_masked_cross_entropy_ignore_index():
    logits = jnp.asarray([[2.0, 0.0, 0.0], [0.0, 2.0, 0.0], [0.0, 0.0, 2.0]])
    labels = jnp.asarray([0, 1, 2])  # first is background → ignored
    got = float(masked_cross_entropy(logits, labels))
    # mean of CE over samples 1 and 2 only
    p = np.exp([2.0, 0, 0]) / np.exp([2.0, 0, 0]).sum()
    want = -np.log(p[0])
    assert abs(got - want) < 1e-6


def test_sftgan_trainer_step():
    mesh = make_mesh()
    cfg = SFTGANTrainConfig(d_init_iters=0, other_start_iter=0, milestones=(1000,),
                            feature_weight=1.0)
    trainer = SFTGANTrainer(SFTNetConfig(nb=1), cfg, mesh=mesh,
                            vgg_cfg=VGGFeatConfig(feature_layer=5, layout=(4, 4, "M", 8, 8, "M")))
    state = trainer.init_state(jax.random.PRNGKey(0))
    n = 8
    lr_img = jax.random.uniform(jax.random.PRNGKey(1), (n, 24, 24, 3))
    hr_img = jax.random.uniform(jax.random.PRNGKey(2), (n, 96, 96, 3))
    seg = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(3), (n, 96, 96, 8)), axis=-1)
    cat = jnp.asarray(np.arange(n) % 8, jnp.int32)
    batch = shard_batch(mesh, (lr_img, seg, hr_img, cat))
    # snapshot before stepping: the jitted step donates the state buffers
    g0 = np.asarray(state["g_params"]["hr"]["conv1"]["w"]).copy()
    sft0 = np.asarray(state["g_params"]["final_sft"]["scale1"]["w"]).copy()
    logs_seq = []
    for i in range(2):
        state, logs = trainer.train_step(state, batch, jax.random.PRNGKey(i))
        logs_seq.append({k: float(v) for k, v in logs.items()})
    for logs in logs_seq:
        for k, v in logs.items():
            assert np.isfinite(v), (k, v)
    # both groups move once their gates are open (gated-early covered below)
    assert not np.allclose(np.asarray(state["g_params"]["final_sft"]["scale1"]["w"]), sft0)
    assert not np.allclose(np.asarray(state["g_params"]["hr"]["conv1"]["w"]), g0)
    assert int(state["step"]) == 2


def test_sftgan_other_params_gated_early():
    mesh = make_mesh()
    cfg = SFTGANTrainConfig(other_start_iter=100, d_init_iters=0, milestones=(1000,),
                            feature_weight=0.0)
    trainer = SFTGANTrainer(SFTNetConfig(nb=1), cfg, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    g0 = np.asarray(state["g_params"]["hr"]["conv1"]["w"]).copy()
    n = 8
    batch = shard_batch(mesh, (
        jax.random.uniform(jax.random.PRNGKey(1), (n, 24, 24, 3)),
        jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(3), (n, 96, 96, 8)), -1),
        jax.random.uniform(jax.random.PRNGKey(2), (n, 96, 96, 3)),
        jnp.ones((n,), jnp.int32),
    ))
    state, _ = trainer.train_step(state, batch, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(state["g_params"]["hr"]["conv1"]["w"]), g0)
