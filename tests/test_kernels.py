"""Interpret-mode correctness tests for the experimental Pallas kernels."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import esrganplus_tpu.kernels.conv as conv_mod
import esrganplus_tpu.kernels.rdb as rdb_mod
from esrganplus_tpu.models.layers import kaiming_conv_init
from esrganplus_tpu.models.rrdb import RRDBNetConfig, _rdb_forward


@pytest.fixture()
def interpret_mode(monkeypatch):
    patched = functools.partial(pl.pallas_call, interpret=True)
    monkeypatch.setattr(conv_mod.pl, "pallas_call", patched)
    monkeypatch.setattr(rdb_mod.pl, "pallas_call", patched)


def test_conv3x3_kernel_interpret(interpret_mode):
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 8), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 24)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (24,)) * 0.1
    got = conv_mod.conv3x3(x, w, b, act_slope=0.2, tile=8)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    want = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=dn) + b
    want = jnp.where(want >= 0, want, want * 0.2)
    assert float(jnp.abs(got - want).max()) < 1e-5


def test_rdb_fused_kernel_interpret(interpret_mode):
    nf, gc = 16, 8
    cfg = RRDBNetConfig(nf=nf, gc=gc)
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    p = {
        "conv1": kaiming_conv_init(ks[0], 3, 3, nf, gc, 1.0),
        "conv2": kaiming_conv_init(ks[1], 3, 3, nf + gc, gc, 1.0),
        "conv3": kaiming_conv_init(ks[2], 3, 3, nf + 2 * gc, gc, 1.0),
        "conv4": kaiming_conv_init(ks[3], 3, 3, nf + 3 * gc, gc, 1.0),
        "conv5": kaiming_conv_init(ks[4], 3, 3, nf + 4 * gc, nf, 1.0),
        "conv1x1": kaiming_conv_init(ks[5], 1, 1, nf, gc, 1.0, bias=False),
    }
    for c in ("conv1", "conv2", "conv3", "conv4", "conv5"):
        p[c]["b"] = jax.random.normal(jax.random.fold_in(ks[0], hash(c) % 97),
                                      p[c]["b"].shape) * 0.1
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, nf), jnp.float32)
    ref = _rdb_forward(x, p, cfg, jax.random.PRNGKey(0), False, None)
    wts = rdb_mod.prepare_rdb_weights(p, nf, gc, True, dtype=jnp.float32)
    got = rdb_mod.rdb_fused(x, *wts, nf=nf, gc=gc, conv1x1=True, tile=32)
    # f32 kernel vs f32 reference: tight tolerance; exercises border masks too
    assert float(jnp.abs(got - ref).max()) < 1e-4
