"""Serving stack: microbatcher policy + the HTTP server end-to-end (CPU,
tiny pixel-path model -- no checkpoints needed via loader's random init)."""

import io
import threading
import time
import urllib.request

import numpy as np
import pytest

from wavedm_tpu.config import load_config
from wavedm_tpu.inference.loader import build_restorer
from wavedm_tpu.inference.server import Microbatcher, RestorationServer, _Request


def _req(shape=(8, 8, 3)):
    return _Request(np.zeros(shape, np.float32))


def test_microbatcher_groups_same_shape():
    mb = Microbatcher(batch=4, window_ms=50)
    for _ in range(3):
        mb.submit(_req())
    out = mb.collect(timeout=0.1)
    assert len(out) == 3


def test_microbatcher_caps_at_batch_and_keeps_rest():
    mb = Microbatcher(batch=2, window_ms=50)
    for _ in range(5):
        mb.submit(_req())
    assert len(mb.collect(timeout=0.1)) == 2
    assert len(mb.collect(timeout=0.1)) == 2
    assert len(mb.collect(timeout=0.1)) == 1
    assert mb.collect(timeout=0.05) == []


def test_microbatcher_mixed_shapes_oldest_first_no_starvation():
    mb = Microbatcher(batch=8, window_ms=50)
    mb.submit(_req((8, 8, 3)))
    mb.submit(_req((16, 16, 3)))
    mb.submit(_req((8, 8, 3)))
    first = mb.collect(timeout=0.1)
    assert {tuple(r.arr.shape) for r in first} == {(8, 8, 3)}
    assert len(first) == 2
    second = mb.collect(timeout=0.1)
    assert [tuple(r.arr.shape) for r in second] == [(16, 16, 3)]


@pytest.fixture(scope="module")
def tiny_server():
    cfg = load_config("wavedm_tpu/configs/raindrop.yaml")
    cfg.data.image_size = 16          # tiled path at toy scale
    cfg.model.ch = 32
    cfg.model.ch_mult = [1, 2]
    cfg.model.attn_resolutions = [8]
    cfg.model.num_res_blocks = 1
    cfg.sampling.sampling_timesteps = 2
    cfg.sampling.grid_r = 8
    cfg.sampling.x0_pred_index = -1
    cfg.validate()
    restorer = build_restorer(cfg, resume="")   # random init
    server = RestorationServer(restorer, batch=4, window_ms=200,
                               no_resize=True)
    httpd = server.serve("127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield server, port
    server.stop()
    httpd.shutdown()


def _png_bytes(h=16, w=16):
    from PIL import Image
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "PNG")
    return buf.getvalue()


def test_http_restore_and_health(tiny_server):
    server, port = tiny_server
    png = _png_bytes()

    results = []

    def post():
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/restore", data=png, method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            results.append((r.status, r.read()))

    # two concurrent requests of the same geometry -> one device batch
    threads = [threading.Thread(target=post) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert len(results) == 2
    from PIL import Image
    for status, body in results:
        assert status == 200
        out = Image.open(io.BytesIO(body))
        assert out.size == (16, 16)
        a = np.asarray(out)
        assert a.dtype == np.uint8 and a.shape == (16, 16, 3)

    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
        import json
        health = json.loads(r.read())
    assert health["served"] == 2
    assert health["errors"] == 0
    # the 200 ms window should have coalesced the concurrent posts
    assert health["batches"] <= 2

    # the device-owner thread must survive a bad request
    bad = urllib.request.Request(
        f"http://127.0.0.1:{port}/restore", data=b"not an image",
        method="POST")
    try:
        urllib.request.urlopen(bad, timeout=60)
        raise AssertionError("expected HTTP 500")
    except urllib.error.HTTPError as e:
        assert e.code == 500
    post()
    assert results[-1][0] == 200


def test_prune_checkpoints(tmp_path):
    import os
    import time as _time
    from wavedm_tpu.utils.checkpoint import prune_checkpoints
    for i, name in enumerate(["e1", "e2", "best", "e3", "e4"]):
        d = tmp_path / name
        d.mkdir()
        if name != "best":
            (d / "wavedm_meta.json").write_text("{}")
        os.utime(d, (1000 + i, 1000 + i))
    removed = prune_checkpoints(str(tmp_path), keep=2)
    left = sorted(p.name for p in tmp_path.iterdir())
    assert removed == 2
    assert left == ["best", "e3", "e4"]   # oldest snapshots gone, best kept
    assert prune_checkpoints(str(tmp_path), keep=0) == 0   # 0 = keep all


def test_device_loop_pads_to_fixed_batch():
    """One compiled program per geometry: short batches must be padded to
    the fixed batch size before touching the restorer."""
    shapes_seen = []

    class FakeRestorer:
        def restore_image(self, batch, rng=None):
            shapes_seen.append(batch.shape)
            return batch, None

    server = RestorationServer(FakeRestorer(), batch=4, window_ms=20)
    server.start()
    req = _Request(np.full((8, 8, 3), 0.25, np.float32))
    server.batcher.submit(req)
    assert req.done.wait(10)
    server.stop()
    assert req.error is None
    assert shapes_seen == [(4, 8, 8, 3)]     # padded 1 -> 4
    np.testing.assert_allclose(req.out, req.arr)
    assert server.stats["served"] == 1       # padding rows not counted
    assert server.stats["last_batch_size"] == 1
