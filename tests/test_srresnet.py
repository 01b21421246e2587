import os

import jax
import jax.numpy as jnp
import numpy as np

from esrganplus_tpu.convert.pth import (
    generator_from_state_dict,
    generator_to_state_dict,
    load_state_dict,
)
from esrganplus_tpu.models.srresnet import SRResNetConfig, init_srresnet, srresnet_forward

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _nchw(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_srresnet_parity_and_dispatch():
    sd = load_state_dict(os.path.join(GOLDEN, "srresnet_small_x4.pth"))
    params, cfg, info = generator_from_state_dict(sd)
    assert isinstance(cfg, SRResNetConfig)
    assert cfg.nb == 2 and cfg.nf == 16 and cfg.upscale == 4
    io = np.load(os.path.join(GOLDEN, "srresnet_small_x4_io.npz"))
    y = srresnet_forward(params, jnp.asarray(_nchw(io["x"])), cfg)
    want = _nchw(io["y"])
    assert y.shape == want.shape
    assert float(np.abs(np.asarray(y) - want).max()) < 1e-5


def test_srresnet_roundtrip():
    sd = load_state_dict(os.path.join(GOLDEN, "srresnet_small_x4.pth"))
    params, cfg, _ = generator_from_state_dict(sd)
    sd2 = generator_to_state_dict(params, cfg)
    assert set(sd2) == set(sd)
    for k in sd:
        np.testing.assert_allclose(sd2[k], sd[k], atol=1e-7, err_msg=k)


def test_srresnet_trainer_smoke():
    from esrganplus_tpu.parallel import make_mesh, shard_batch
    from esrganplus_tpu.train import SRTrainConfig, SRTrainer

    mesh = make_mesh()
    cfg = SRResNetConfig(nf=8, nb=2, upscale=4)
    trainer = SRTrainer(cfg, SRTrainConfig(lr=1e-3, milestones=(100,), pixel_criterion="l2"),
                        mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    lr_img = jax.random.uniform(jax.random.PRNGKey(1), (8, 8, 8, 3))
    hr_img = jax.random.uniform(jax.random.PRNGKey(2), (8, 32, 32, 3))
    batch = shard_batch(mesh, (lr_img, hr_img))
    losses = []
    for i in range(6):
        state, logs = trainer.train_step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(logs["l_pix"]))
    assert losses[-1] < losses[0]
