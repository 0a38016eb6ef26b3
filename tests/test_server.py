"""HTTP serving layer tests (tiny config, ephemeral port)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import sdtpu
from sdtpu.engine.server import serve


@pytest.fixture(scope="module")
def server():
    ctx = sdtpu.Context(config="tiny", steps=2)
    ready = threading.Event()
    t = threading.Thread(
        target=serve, args=(ctx,), kwargs={"port": 0, "ready_event": ready},
        daemon=True,
    )
    t.start()
    assert ready.wait(30)
    httpd = serve.last_server
    yield ctx, f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _post(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, r.headers.get("Content-Type"), r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read()


def test_healthz(server):
    ctx, base = server
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        info = json.loads(r.read())
    assert info["status"] == "ok"
    assert info["image_size"] == ctx.cfg.image_size


def test_generate_png(server):
    ctx, base = server
    status, ctype, body = _post(base + "/generate",
                                {"prompt": "the horse", "seed": 1})
    assert status == 200 and ctype == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"


def test_generate_raw_matches_direct(server):
    ctx, base = server
    status, ctype, body = _post(
        base + "/generate",
        {"prompt": "the horse", "seed": 7, "format": "raw"})
    assert status == 200 and ctype == "application/octet-stream"
    size = ctx.cfg.image_size
    img = np.frombuffer(body, np.uint8).reshape(size, size, 3)
    direct = ctx.generate("the horse", seed=7)
    assert np.array_equal(img, direct)


def test_generate_missing_prompt(server):
    _, base = server
    status, _, body = _post(base + "/generate", {"guidance": 7.5})
    assert status == 400
    assert b"prompt" in body


def test_unknown_route(server):
    _, base = server
    status, _, _ = _post(base + "/nope", {})
    assert status == 404
