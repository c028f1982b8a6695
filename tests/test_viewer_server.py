"""Interactive HTTP viewer (src/visualizer.py role): serve, render, widgets.

Drives the real server over a socket: page loads, POST /render returns a
valid PNG, camera/seed/channel widgets actually change the output, and the
cached jit means the second render of the same signature recompiles
nothing (timed sanity)."""

import io
import json
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from panic3d_tpu.eval.viewer_server import build_backend, make_handler


@pytest.fixture(scope="module")
def server():
    import jax  # noqa: F401  (backend selected by conftest)

    backend = build_backend(tiny=True)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(backend))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _render(base, **req):
    r = urllib.request.urlopen(
        urllib.request.Request(base + "/render",
                               data=json.dumps(req).encode()), timeout=600)
    assert r.status == 200
    return r.read()


def _decode(png):
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(png)))


def test_viewer_server_end_to_end(server):
    # page
    page = urllib.request.urlopen(server + "/", timeout=60).read().decode()
    for widget in ("azimuth", "elevation", "truncation", "seed", "channel"):
        assert widget in page

    png = _render(server, seed=0, azimuth=0, elevation=0)
    img0 = _decode(png)
    assert img0.ndim == 3 and img0.shape[2] in (3, 4)

    # pose widget: a different azimuth renders a different image, and the
    # warm path is jit-cached (no recompile: much faster than the first)
    t0 = time.time()
    img_az = _decode(_render(server, seed=0, azimuth=60, elevation=10))
    warm = time.time() - t0
    assert not np.array_equal(img0, img_az)
    assert warm < 30, warm  # first render paid the compile; this one must not

    # latent widget: new seed changes the image; psi=0 collapses to w_avg
    img_seed = _decode(_render(server, seed=5, azimuth=0, elevation=0))
    assert not np.array_equal(img0, img_seed)
    a = _decode(_render(server, seed=0, azimuth=0, elevation=0, psi=0.0))
    b = _decode(_render(server, seed=5, azimuth=0, elevation=0, psi=0.0))
    np.testing.assert_array_equal(a, b)

    # layer viewer widget: every channel renders
    for ch in ("image_raw", "image_depth", "image_weights"):
        _decode(_render(server, seed=0, channel=ch))
