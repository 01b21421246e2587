"""LMDB path: pure-python format reader/writer, key cache, dataset e2e."""

import os
import pickle

import numpy as np
import pytest

from esrganplus_tpu.data import TrainLoader, collate, create_dataset
from esrganplus_tpu.data.lmdb_io import (
    MAGIC,
    PAGE_SIZE,
    LmdbReader,
    write_lmdb,
)
from esrganplus_tpu.ops.image_io import save_img
from esrganplus_tpu.ops.resize import imresize_np


def test_lmdb_roundtrip_many_pages(tmp_path):
    # enough small entries for multiple leaf pages + a branch level, plus
    # values large enough for (multi-page) overflow runs
    rng = np.random.RandomState(0)
    items = {}
    for i in range(300):
        items[f"k{i:04d}".encode()] = rng.bytes(40)
    items[b"big_one"] = rng.bytes(5000)      # 2 overflow pages
    items[b"big_two"] = rng.bytes(4080)      # exactly 1 overflow page
    items[b"big_three"] = rng.bytes(12345)   # 4 overflow pages
    root = str(tmp_path / "env.lmdb")
    write_lmdb(root, items)

    r = LmdbReader(root)
    got = dict(r.items())
    assert got == items
    assert r.entries == len(items)
    # cursor order is memcmp-sorted key order (what the reference's key cache
    # records)
    assert r.keys() == sorted(items)
    # random access
    assert r.get(b"big_three") == items[b"big_three"]
    assert r.get(b"missing") is None
    # structural sanity: valid metas on pages 0 and 1
    raw = open(os.path.join(root, "data.mdb"), "rb").read()
    for pg in (0, 1):
        assert int.from_bytes(raw[pg * PAGE_SIZE + 16: pg * PAGE_SIZE + 20],
                              "little") == MAGIC


def test_lmdb_keys_cache_honoured_and_created(tmp_path):
    from esrganplus_tpu.data.datasets import _LmdbReader

    root = str(tmp_path / "env.lmdb")
    img = (np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
    write_lmdb(root, {
        b"a": img.tobytes(), b"a.meta": b"4, 4, 3",
        b"b": img.tobytes(), b"b.meta": b"4, 4, 3",
    })
    # first open creates the cache like the reference reader does
    r1 = _LmdbReader(root)
    cache = os.path.join(root, "_keys_cache.p")
    assert os.path.isfile(cache)
    assert r1.paths() == ["a", "b"]
    # a reference-produced cache takes priority over a cursor scan
    with open(cache, "wb") as f:
        pickle.dump(["b", "b.meta"], f)
    r2 = _LmdbReader(root)
    assert r2.paths() == ["b"]
    got = r2.read("b")
    assert got.shape == (4, 4, 3) and got.dtype == np.float32
    np.testing.assert_allclose(got, img.astype(np.float32) / 255.0)


def test_lmdb_dataset_end_to_end(tmp_path):
    # prepare_data lmdb over a PNG folder → LRHR dataset in lmdb mode →
    # train batches
    from esrganplus_tpu.cli.prepare_data import main as prep_main

    rng = np.random.RandomState(1)
    hr_dir = tmp_path / "HR"
    lr_dir = tmp_path / "LR"
    for i in range(3):
        hr = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
        save_img(hr, str(hr_dir / f"img{i}.png"))
        lr = np.clip(imresize_np(hr.astype(np.float32) / 255.0, 0.25), 0, 1)
        save_img((lr * 255).round().astype(np.uint8), str(lr_dir / f"img{i}.png"))
    hr_lmdb = str(tmp_path / "HR.lmdb")
    lr_lmdb = str(tmp_path / "LR.lmdb")
    prep_main(["lmdb", str(hr_dir), hr_lmdb])
    prep_main(["lmdb", str(lr_dir), lr_lmdb])
    assert os.path.isfile(os.path.join(hr_lmdb, "_keys_cache.p"))

    ds = create_dataset({
        "mode": "LRHR", "phase": "train", "scale": 4, "HR_size": 32,
        "dataroot_HR": hr_lmdb, "dataroot_LR": lr_lmdb, "data_type": "lmdb",
        "use_flip": False, "use_rot": False, "seed": 0,
    })
    assert len(ds) == 3
    s = ds[0]
    assert s["LR"].shape == (8, 8, 3) and s["HR"].shape == (32, 32, 3)
    loader = TrainLoader(ds, batch_size=2, num_workers=1, seed=0)
    it = iter(loader)
    batch = next(it)
    loader.stop()
    assert batch["HR"].shape == (2, 32, 32, 3)
    assert np.isfinite(batch["HR"]).all() and batch["HR"].max() <= 1.0