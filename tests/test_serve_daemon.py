"""Serving daemon: end-to-end HTTP round trip + dynamic batching."""

import io
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest
from PIL import Image

pytestmark = [pytest.mark.slow, pytest.mark.e2e]


@pytest.fixture(scope="module")
def server():
    from ifseg_tpu.cli.serve import _make_handler, build_service

    args, svc = build_service(
        [
            "--category-list=cat, dog, grass",
            "--arch=segofa_tiny",
            "--patch-image-size=32",
            "--max-batch=4",
            "--batch-timeout-ms=200",
            "--port=0",
        ]
    )
    svc.warmup()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(svc))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", svc
    httpd.shutdown()


def _png_bytes(w=40, h=30, seed=0):
    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _post(url, data):
    req = urllib.request.Request(url, data=data, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, r.headers.get("Content-Type"), r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read()


def test_healthz_and_png_mask(server):
    base, svc = server
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        assert json.loads(r.read())["ready"] is True

    status, ctype, body = _post(base + "/segment", _png_bytes())
    assert status == 200 and ctype == "image/png"
    mask = np.asarray(Image.open(io.BytesIO(body)))
    assert mask.shape == (30, 40)  # upsampled back to the input size
    assert mask.max() < 3


def test_json_areas_and_bad_input(server):
    base, svc = server
    status, _, body = _post(base + "/segment?format=json", _png_bytes(seed=1))
    out = json.loads(body)
    assert status == 200 and sum(out["areas"].values()) == out["grid"] ** 2

    status, _, body = _post(base + "/segment", b"not an image")
    assert status == 400


def test_concurrent_requests_are_batched(server):
    base, svc = server
    before = dict(svc.stats)
    results = []

    def hit(i):
        results.append(_post(base + "/segment?format=json", _png_bytes(seed=i))[0])

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == [200] * 4
    assert svc.stats["requests"] >= before["requests"] + 4
    # with a 200 ms window at least one multi-request batch must have formed
    assert svc.stats["batched_requests"] > before["batched_requests"]
