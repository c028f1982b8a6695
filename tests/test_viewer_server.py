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
    try:
        r = urllib.request.urlopen(
            urllib.request.Request(base + "/render",
                                   data=json.dumps(req).encode()), timeout=600)
    except urllib.error.HTTPError as e:  # surface the server-side error text
        raise AssertionError(f"{req} -> {e.code}: {e.read().decode()}") from e
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


def test_viewer_meta_and_widgets(server):
    # /meta drives the browser widgets: num_ws bound for stylemix, layer list
    meta = json.loads(urllib.request.urlopen(server + "/meta",
                                             timeout=60).read())
    assert meta["num_ws"] > 0
    names = [l["name"] for l in meta["layers"]]
    assert "b4_x" in names and any(n.endswith("_img") for n in names)

    base = _decode(_render(server, seed=0))

    # stylemix widget (viz/renderer.py:300-331): empty index set is identity
    # regardless of mix seed; enabling ws slots changes the image
    same = _decode(_render(server, seed=0, stylemix_seed=7, stylemix_idx=[]))
    np.testing.assert_array_equal(base, same)
    mixed = _decode(_render(server, seed=0, stylemix_seed=7,
                            stylemix_idx=list(range(meta["num_ws"] // 2,
                                                    meta["num_ws"]))))
    assert not np.array_equal(base, mixed)
    # out-of-range indices are dropped (renderer.py:329)
    same2 = _decode(_render(server, seed=0, stylemix_seed=7,
                            stylemix_idx=[meta["num_ws"] + 3, -1]))
    np.testing.assert_array_equal(base, same2)

    # render_depth_sample_widget: a different sample count still renders
    # (shape-determining -> separate cached jit) and changes the image
    halved = _decode(_render(server, seed=0, depth_mult=0.5,
                             depth_imp_mult=0.5))
    assert halved.shape == base.shape
    assert not np.array_equal(base, halved)

    # layer widget: a backbone intermediate renders as a 3-channel slice
    feat = _decode(_render(server, seed=0, layer=names[0], base_channel=1))
    assert feat.ndim == 3
    # a different base channel selects different features
    feat2 = _decode(_render(server, seed=0, layer=names[0], base_channel=5))
    assert not np.array_equal(feat, feat2)

    # conditioning upload: a new portrait changes the conditioned render
    from PIL import Image

    buf = io.BytesIO()
    rng = np.random.RandomState(3)
    Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
        buf, format="PNG")
    r = urllib.request.urlopen(
        urllib.request.Request(server + "/cond", data=buf.getvalue()),
        timeout=60)
    assert json.loads(r.read())["ok"]
    reconditioned = _decode(_render(server, seed=0))
    assert not np.array_equal(base, reconditioned)

    # performance widget: the render-time header rides every PNG response
    r = urllib.request.urlopen(
        urllib.request.Request(server + "/render",
                               data=json.dumps({"seed": 0}).encode()),
        timeout=600)
    assert float(r.headers["X-Render-Seconds"]) > 0
