"""Interactive model viewer — HTTP server + browser widgets.

Role of the reference's imgui/OpenGL visualizer (`src/visualizer.py` +
`src/viz/*`, ~2.5k LoC): live orbiting, latent/seed surfing, truncation,
and layer/channel inspection of a generator. A GL window cannot exist on a
headless TPU pod, so the interactive analog splits the widgets from the
renderer: the browser holds the UI (sliders/inputs, plain HTML+JS, no
frontend deps), the host holds ONE cached jitted render function (camera
angles and latents are traced arguments — a slider move never recompiles),
and every interaction is a `POST /render` returning a PNG.

Run:  python -m panic3d_tpu.eval.viewer_server [--ckpt DIR | --tiny]
      [--port 8642]
then open http://localhost:8642/ .

Widget parity map (visualizer widget -> control here): pose -> az/el/fov
sliders; latent -> seed box + psi slider; layer viewer -> channel selector
(image / image_raw / image_depth / image_weights); renderer opts ->
triplane_crop / cull_clouds toggles are fixed eval defaults.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!doctype html><html><head><title>panic3d viewer</title><style>
body{font-family:sans-serif;background:#16161a;color:#eee;margin:2em}
input,select{margin:0 .6em .6em 0}
#v{image-rendering:auto;border:1px solid #444;min-width:256px;min-height:256px}
label{display:inline-block;min-width:7em}
</style></head><body>
<h3>panic3d_tpu viewer</h3>
<div><label>azimuth</label><input id=az type=range min=-180 max=180 value=0 step=1>
<span id=azv>0</span></div>
<div><label>elevation</label><input id=el type=range min=-89 max=89 value=0 step=1>
<span id=elv>0</span></div>
<div><label>fov</label><input id=fov type=range min=-1 max=45 value=30 step=1>
<span id=fovv>30</span> (-1 = ortho)</div>
<div><label>truncation</label><input id=psi type=range min=0 max=1.5 value=1 step=0.05>
<span id=psiv>1</span></div>
<div><label>seed</label><input id=seed type=number value=0 style="width:6em">
<label>channel</label><select id=ch><option>image</option><option>image_raw</option>
<option>image_depth</option><option>image_weights</option></select>
<label>renderer</label><input id=crop type=checkbox checked> triplane_crop
<input id=cull type=checkbox checked> cull_clouds</div>
<img id=v><p id=stat></p>
<script>
const els = ['az','el','fov','psi','seed','ch','crop','cull'];
let inflight = false, dirty = false;
async function render(){
  if (inflight){ dirty = true; return; }
  inflight = true;
  const t0 = performance.now();
  const body = JSON.stringify({azimuth:+az.value, elevation:+el.value,
    fov:+fov.value, psi:+psi.value, seed:+seed.value, channel:ch.value,
    crop:crop.checked ? 0.1 : null, cull:cull.checked ? 0.5 : null});
  const r = await fetch('/render', {method:'POST', body});
  const blob = await r.blob();
  v.src = URL.createObjectURL(blob);
  stat.textContent = (performance.now()-t0).toFixed(0)+' ms';
  inflight = false;
  if (dirty){ dirty = false; render(); }
}
for (const id of els){
  const e = document.getElementById(id);
  e.addEventListener('input', ()=>{
    for (const s of ['az','el','fov','psi'])
      document.getElementById(s+'v').textContent =
        document.getElementById(s).value;
    render();
  });
}
render();
</script></body></html>"""


class ViewerBackend:
    """Cached jitted renderer behind the HTTP handlers (testable without
    sockets)."""

    def __init__(self, g, variables, cond):
        import jax

        self.g = g
        self.variables = variables
        self.cond = cond
        # crop/cull are shape-determining (static): the renderer-options
        # widget; camera/latent/psi are traced so sliders never recompile
        self._render = jax.jit(self._render_impl,
                               static_argnames=("crop", "cull"))
        self._lock = threading.Lock()  # one chip; serialize renders

    def _render_impl(self, variables, z, elevation, azimuth, fov, psi,
                     crop=None, cull=None):
        import jax.numpy as jnp

        from ..models.triplane import TriPlaneGenerator

        xin = {
            "z": z,
            "elevations": elevation[None],
            "azimuths": azimuth[None],
            "distances": jnp.ones((1,)),
            "fovs": fov[None],
            "cond": self.cond,
            "triplane_crop": crop,
            "cull_clouds": cull,
        }
        out = self.g.apply(variables, xin, method=TriPlaneGenerator.f,
                           truncation_psi=psi, noise_mode="const")
        return {k: out[k] for k in
                ("image", "image_raw", "image_depth", "image_weights")}

    def render_png(self, seed=0, elevation=0.0, azimuth=0.0, fov=30.0,
                   psi=1.0, channel="image", crop=None, cull=None) -> bytes:
        import jax.numpy as jnp
        from PIL import Image

        from ..models.triplane import seeds_to_z

        z = jnp.asarray(seeds_to_z([int(seed)], self.g.z_dim))
        with self._lock:
            out = self._render(
                self.variables, z, jnp.float32(elevation),
                jnp.float32(azimuth), jnp.float32(fov), jnp.float32(psi),
                crop=crop, cull=cull,
            )
        img = np.asarray(out[channel][0], np.float32)
        if img.shape[0] == 1:  # depth / weights -> normalized grayscale
            img = np.repeat(img / max(float(img.max()), 1e-6), 3, axis=0)
        arr = (np.clip(img, 0, 1).transpose(1, 2, 0) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return buf.getvalue()


def make_handler(backend: ViewerBackend):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            body = _PAGE.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n) or b"{}")
            try:
                png = backend.render_png(
                    seed=req.get("seed", 0),
                    elevation=req.get("elevation", 0.0),
                    azimuth=req.get("azimuth", 0.0),
                    fov=req.get("fov", 30.0),
                    psi=req.get("psi", 1.0),
                    channel=req.get("channel", "image"),
                    crop=req.get("crop"),
                    cull=req.get("cull"),
                )
            except Exception as e:  # surface render errors to the UI
                msg = str(e).encode()
                self.send_response(500)
                self.send_header("Content-Length", str(len(msg)))
                self.end_headers()
                self.wfile.write(msg)
                return
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(png)))
            self.end_headers()
            self.wfile.write(png)

    return Handler


def build_backend(ckpt=None, tiny=False):
    import jax
    import jax.numpy as jnp

    from .. import configs
    from ..models.triplane import TriPlaneGenerator

    if ckpt:
        from ..runtime.checkpoint import (extract_generator_variables,
                                          load_checkpoint)

        state, config = load_checkpoint(ckpt)
        variables = extract_generator_variables(state)  # trainer snapshots
        g = configs.from_snapshot_config(config, eval_mode=True)
        cfg = dict(config or {})
        tiny = (cfg.get("tiny")
                or (cfg.get("model_kwargs") or {}).get("family") == "tiny")
        rng = np.random.RandomState(0)
        res = g.img_resolution
        chonk = 16 if tiny else 512
        cond = {
            "image_ortho_front": jnp.asarray(
                rng.rand(1, 3, res, res).astype(np.float32)),
            "resnet_chonk": jnp.asarray(
                rng.randn(1, chonk, 8, 8).astype(np.float32)),
        }
    else:
        g = configs.tiny() if tiny else configs.flagship(eval_mode=True)
        rng = np.random.RandomState(0)
        res = 64 if tiny else 512
        cond = {
            "image_ortho_front": jnp.asarray(
                rng.rand(1, 3, res, res).astype(np.float32)),
            "resnet_chonk": jnp.asarray(
                rng.randn(1, 16 if tiny else 512, 8, 8).astype(np.float32)),
        }
        xin0 = {"z": jnp.zeros((1, g.z_dim)), "elevations": jnp.zeros(1),
                "azimuths": jnp.zeros(1), "cond": cond}
        variables = g.init({"params": jax.random.PRNGKey(0)}, xin0,
                           method=TriPlaneGenerator.f, noise_mode="const")
    return ViewerBackend(g, variables, cond)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8642)
    args = ap.parse_args(argv)

    backend = build_backend(ckpt=args.ckpt, tiny=args.tiny)
    srv = ThreadingHTTPServer((args.host, args.port), make_handler(backend))
    print(f"viewer at http://{args.host}:{args.port}/ (first render compiles)")
    srv.serve_forever()


if __name__ == "__main__":
    main()
