"""Inference HTTP service (cli/serve.py): endpoints, image round-trip,
error paths — server run in a thread against a tiny self-made checkpoint."""

import http.client
import json
import os
import threading

import jax
import numpy as np
import pytest

from esrganplus_tpu.models.rrdb import RRDBNetConfig, init_rrdbnet

CFG = RRDBNetConfig(nf=8, nb=1, gc=4, upscale=4)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    import torch

    from esrganplus_tpu.cli.serve import make_server
    from esrganplus_tpu.convert.pth import generator_to_state_dict

    root = tmp_path_factory.mktemp("serve")
    params = init_rrdbnet(jax.random.PRNGKey(0), CFG)
    sd = generator_to_state_dict(params, CFG)
    pth = os.path.join(root, "tiny.pth")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, pth)

    import argparse

    args = argparse.Namespace(model=pth, host="127.0.0.1", port=0,
                              dtype="fp32", pad_multiple=16, tile=0,
                              x8=False, noise_seed=None)
    srv, _ = make_server(args)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address
    srv.shutdown()


def _conn(addr):
    return http.client.HTTPConnection(addr[0], addr[1], timeout=60)


def test_healthz_and_stats(server):
    c = _conn(server)
    c.request("GET", "/healthz")
    r = c.getresponse()
    assert r.status == 200
    body = json.loads(r.read())
    assert body["status"] == "ok" and body["model"]["upscale"] == 4
    c.request("GET", "/stats")
    assert json.loads(c.getresponse().read())["requests"] >= 0


def test_upscale_roundtrip(server):
    from esrganplus_tpu.ops.image_io import decode_img, encode_png

    img = (np.random.RandomState(0).rand(20, 24, 3) * 255).astype(np.uint8)
    payload = encode_png(img)
    c = _conn(server)
    c.request("POST", "/upscale", body=payload,
              headers={"Content-Type": "image/png"})
    r = c.getresponse()
    assert r.status == 200 and r.getheader("Content-Type") == "image/png"
    out = decode_img(r.read())
    assert out.shape == (80, 96, 3)  # x4, cropped back from the pad

    c.request("GET", "/stats")
    stats = json.loads(c.getresponse().read())
    assert stats["requests"] >= 1 and stats["out_mpix"] > 0


def test_upscale_bad_payload(server):
    c = _conn(server)
    c.request("POST", "/upscale", body=b"not an image")
    r = c.getresponse()
    assert r.status == 400
    assert "bad image payload" in json.loads(r.read())["error"]


def test_unknown_path(server):
    c = _conn(server)
    c.request("GET", "/nope")
    assert c.getresponse().status == 404


def test_x8_mode_warms_and_serves(tmp_path):
    """--x8 must not recurse (upscale_x8 calls self.upscale internally; the
    old instance-patch made them mutually recursive and crashed warmup)."""
    import argparse

    import torch

    from esrganplus_tpu.cli.serve import make_server
    from esrganplus_tpu.convert.pth import generator_to_state_dict
    from esrganplus_tpu.ops.image_io import decode_img, encode_png

    params = init_rrdbnet(jax.random.PRNGKey(0), CFG)
    pth = os.path.join(tmp_path, "tiny.pth")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in
                generator_to_state_dict(params, CFG).items()}, pth)
    args = argparse.Namespace(model=pth, host="127.0.0.1", port=0,
                              dtype="fp32", pad_multiple=8, tile=0,
                              x8=True, noise_seed=None)
    srv, _ = make_server(args)  # warmup runs the x8 path
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        img = (np.random.RandomState(1).rand(8, 8, 3) * 255).astype(np.uint8)
        c = _conn(srv.server_address)
        c.request("POST", "/upscale", body=encode_png(img))
        r = c.getresponse()
        assert r.status == 200
        assert decode_img(r.read()).shape == (32, 32, 3)
    finally:
        srv.shutdown()


def test_tile_x8_mutually_exclusive(tmp_path):
    import argparse

    import torch

    from esrganplus_tpu.cli.serve import make_server
    from esrganplus_tpu.convert.pth import generator_to_state_dict

    params = init_rrdbnet(jax.random.PRNGKey(0), CFG)
    pth = os.path.join(tmp_path, "tiny.pth")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in
                generator_to_state_dict(params, CFG).items()}, pth)
    args = argparse.Namespace(model=pth, host="127.0.0.1", port=0,
                              dtype="fp32", pad_multiple=8, tile=64,
                              x8=True, noise_seed=None)
    with pytest.raises(SystemExit):
        make_server(args)


def test_concurrent_requests_count_exactly(server):
    """N parallel POSTs must all succeed and be counted exactly N times —
    the stats read-modify-writes run under the lock (ThreadingHTTPServer
    spawns one handler thread per request)."""
    from esrganplus_tpu.ops.image_io import encode_png

    c0 = _conn(server)
    c0.request("GET", "/stats")
    before = json.loads(c0.getresponse().read())["requests"]

    img = (np.random.RandomState(5).rand(16, 16, 3) * 255).astype(np.uint8)
    png = encode_png(img)
    results = []

    def post():
        c = _conn(server)
        c.request("POST", "/upscale", body=png)
        results.append(c.getresponse().status)

    threads = [threading.Thread(target=post) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == [200] * 6

    c0.request("GET", "/stats")
    after = json.loads(c0.getresponse().read())
    assert after["requests"] == before + 6
    assert after["latency_ewma_s"] > 0
