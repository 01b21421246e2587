"""Multi-host data loading: disjoint per-host streams, global coverage,
determinism (VERDICT r1 item 4 — §2.9 multi-host validation).

jax can't simulate multiple processes in one test, so these tests inject
``host_index``/``host_count`` into TrainLoader directly (the loader reads
``jax.process_index()``/``process_count()`` only as defaults) and verify the
stream algebra a real multi-host run relies on.
"""

import itertools

import jax
import numpy as np

from esrganplus_tpu.data import TrainLoader


class _IdxDataset:
    """Samples are their own indices — makes batch composition observable."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"LR": np.full((2, 2, 3), i, np.float32),
                "HR": np.full((8, 8, 3), i, np.float32)}


def _stream(host_index, host_count, n=32, batch=4, steps=8, seed=7):
    loader = TrainLoader(_IdxDataset(n), batch_size=batch, num_workers=1,
                         seed=seed, host_index=host_index, host_count=host_count)
    return list(itertools.islice(loader._index_stream(), steps))


def test_hosts_draw_disjoint_interleaved_batches():
    g = _stream(0, 1, steps=8)            # global stream (single host)
    h0 = _stream(0, 2, steps=4)
    h1 = _stream(1, 2, steps=4)
    # round-robin: host0 gets global batches 0,2,4.., host1 gets 1,3,5..
    assert h0 == g[0::2]
    assert h1 == g[1::2]
    # a global step consumes host_count x batch_size DISTINCT samples
    for b0, b1 in zip(h0, h1):
        assert not set(b0) & set(b1)
        assert len(set(b0) | set(b1)) == len(b0) + len(b1)


def test_hosts_cover_every_sample_per_epoch():
    n, batch = 32, 4
    per_host = n // batch // 2  # steps per host in one epoch
    seen = set()
    for hi in (0, 1):
        for b in _stream(hi, 2, n=n, batch=batch, steps=per_host):
            seen.update(b)
    assert seen == set(range(n))


def test_host_streams_deterministic():
    assert _stream(1, 4, steps=6) == _stream(1, 4, steps=6)


def test_multihost_global_batch_on_8_device_mesh():
    """Dryrun variant with host_count=2 simulated: two hosts' local batches
    (4 samples each, loader-composed) form the 8-sample global batch of an
    8-device data-parallel step; the step runs, is finite, and is
    deterministic across identically composed runs."""
    from esrganplus_tpu.data import collate
    from esrganplus_tpu.models import RRDBNetConfig
    from esrganplus_tpu.parallel import make_mesh, shard_batch
    from esrganplus_tpu.train import SRTrainConfig, SRTrainer

    n, local_batch = 16, 4
    ds = _IdxDataset(n)
    h0 = _stream(0, 2, n=n, batch=local_batch, steps=2)
    h1 = _stream(1, 2, n=n, batch=local_batch, steps=2)

    mesh = make_mesh(data=8, devices=jax.devices()[:8])
    trainer = SRTrainer(RRDBNetConfig(nf=8, nb=1, gc=4, upscale=4),
                        SRTrainConfig(lr=1e-3, milestones=(100,)), mesh=mesh)

    losses = []
    for _ in range(2):  # identical composition → identical trajectory
        state = trainer.init_state(jax.random.PRNGKey(0))
        run = []
        for step in range(2):
            idxs = h0[step] + h1[step]  # global batch, host-major order
            assert len(set(idxs)) == 2 * local_batch
            b = collate([ds[i] for i in idxs])
            sharded = shard_batch(mesh, (b["LR"], b["HR"]))
            state, logs = trainer.train_step(state, sharded, jax.random.PRNGKey(step))
            run.append(float(logs["l_pix"]))
        assert np.isfinite(run).all()
        losses.append(run)
    assert losses[0] == losses[1]