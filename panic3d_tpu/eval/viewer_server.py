"""Interactive model viewer — HTTP server + browser widgets.

Role of the reference's imgui/OpenGL visualizer (`src/visualizer.py` +
`src/viz/*`, ~2.5k LoC): live orbiting, latent/seed surfing, truncation,
style mixing, and layer/channel inspection of a generator. A GL window
cannot exist on a headless TPU pod, so the interactive analog splits the
widgets from the renderer: the browser holds the UI (sliders/inputs, plain
HTML+JS, no frontend deps), the host holds cached jitted render functions
(camera angles, latents, psi, and the stylemix mask are traced arguments —
a slider move never recompiles), and every interaction is a `POST /render`
returning a PNG.

Run:  python -m panic3d_tpu.eval.viewer_server [--ckpt DIR | --tiny]
      [--port 8642]
then open http://localhost:8642/ .

Widget parity map (reference widget -> control here):
- pose_widget            -> azimuth/elevation/fov sliders (fov -1 = ortho)
- latent_widget          -> seed box + truncation slider
- stylemix_widget        -> mix seed + ws-index list (viz/renderer.py:300-331:
                            w[:, stylemix_idx] = ws[stylemix_seed]); the mask
                            is a traced boolean vector, so toggling indices
                            never recompiles
- render_depth_sample_widget -> 0.5x/1x/2x/4x multipliers on
                            depth_resolution(+importance)
                            (viz/renderer.py:286-287); shape-determining, so
                            each combo compiles once and is cached
- layer_widget           -> backbone layer dropdown + base-channel +
                            normalize (viz/renderer.py:349-391: capture one
                            intermediate, slice sel_channels at base_channel)
- render_type_widget     -> output channel selector (image / image_raw /
                            image_depth / image_weights)
- conditioning widgets   -> portrait upload (POST /cond replaces
                            image_ortho_front — the panic3d conditioning)
- performance_widget     -> X-Render-Seconds response header + client ms
- capture_widget         -> the <img> is a PNG; right-click-save
- pickle_widget          -> --ckpt flag (trainer snapshots)
"""

from __future__ import annotations

import argparse
import functools
import io
import json
import threading
import time
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
<div><label>stylemix</label>seed <input id=mixseed type=number value=1000 style="width:6em">
ws idx <input id=mixidx type=text placeholder="e.g. 4,5,6 or 7-13" style="width:10em"></div>
<div><label>depth samples</label>coarse <select id=dmult>
<option>0.5</option><option selected>1</option><option>2</option><option>4</option></select>
importance <select id=dimult>
<option>0.5</option><option selected>1</option><option>2</option><option>4</option></select></div>
<div><label>layer</label><select id=layer><option value="">output</option></select>
base ch <input id=basech type=number value=0 min=0 style="width:5em">
<input id=lnorm type=checkbox checked> normalize</div>
<div><label>portrait</label><input id=portrait type=file accept="image/*"></div>
<img id=v><p id=stat></p>
<script>
const els = ['az','el','fov','psi','seed','ch','crop','cull',
             'mixseed','mixidx','dmult','dimult','layer','basech','lnorm'];
let inflight = false, dirty = false;
function mixIdx(){
  const out = [];
  for (const part of mixidx.value.split(',')){
    const m = part.trim().match(/^(\\d+)\\s*-\\s*(\\d+)$/);
    if (m){ for (let i=+m[1]; i<=+m[2]; i++) out.push(i); }
    else if (part.trim() !== '') out.push(+part.trim());
  }
  return out.filter(Number.isInteger);
}
async function render(){
  if (inflight){ dirty = true; return; }
  inflight = true;
  const t0 = performance.now();
  const body = JSON.stringify({azimuth:+az.value, elevation:+el.value,
    fov:+fov.value, psi:+psi.value, seed:+seed.value, channel:ch.value,
    crop:crop.checked ? 0.1 : null, cull:cull.checked ? 0.5 : null,
    stylemix_seed:+mixseed.value, stylemix_idx:mixIdx(),
    depth_mult:+dmult.value, depth_imp_mult:+dimult.value,
    layer:layer.value || null, base_channel:+basech.value,
    normalize:lnorm.checked});
  const r = await fetch('/render', {method:'POST', body});
  const blob = await r.blob();
  v.src = URL.createObjectURL(blob);
  const dev = r.headers.get('X-Render-Seconds');
  stat.textContent = (performance.now()-t0).toFixed(0)+' ms total, '
    + (dev ? (1e3*+dev).toFixed(0) : '?') + ' ms render';
  inflight = false;
  if (dirty){ dirty = false; render(); }
}
for (const id of els){
  const e = document.getElementById(id);
  e.addEventListener(e.type === 'text' || e.type === 'number' ? 'change' : 'input', ()=>{
    for (const s of ['az','el','fov','psi'])
      document.getElementById(s+'v').textContent =
        document.getElementById(s).value;
    render();
  });
}
portrait.addEventListener('change', async ()=>{
  if (!portrait.files.length) return;
  await fetch('/cond', {method:'POST', body: await portrait.files[0].arrayBuffer()});
  render();
});
fetch('/meta').then(r=>r.json()).then(m=>{
  for (const l of m.layers){
    const o = document.createElement('option');
    o.value = l.name; o.textContent = `${l.name} (${l.channels}ch)`;
    layer.appendChild(o);
  }
  mixidx.placeholder = `0-${m.num_ws-1}`;
});
render();
</script></body></html>"""


def _mixed_ws(m, z, z_mix, mix_mask, psi, cond):
    """Mapping + stylemix: replace the enabled ws slots with the mix seed's
    ws (viz/renderer.py:300-331). Shared by the render and layer-capture
    paths so stylemix semantics cannot drift between them."""
    import jax.numpy as jnp

    c0 = jnp.zeros((z.shape[0], m.c_dim), jnp.float32)
    ws0 = m.mapping(z, c0, cond, truncation_psi=psi)
    ws1 = m.mapping(z_mix, c0, cond, truncation_psi=psi)
    return jnp.where(mix_mask[None, :, None], ws1, ws0)


class ViewerBackend:
    """Cached jitted renderers behind the HTTP handlers (testable without
    sockets).

    resnet: optional ResnetFeatureExtractorPCA — when present, portrait
    uploads recompute `resnet_chonk` from the new image (the generate.py:242
    conditioning path); without it the chonk is zeroed so renders never mix
    a new portrait with stale features."""

    def __init__(self, g, variables, cond, resnet=None):
        self.g = g
        self.variables = variables
        self.cond = cond
        self.resnet = resnet
        self._fns = {}        # (depth_mult, imp_mult) -> jitted render
        self._layer_fns = {}  # (lvl, which) -> jitted capture
        self._lock = threading.Lock()  # one chip; serialize renders

    # -- meta ---------------------------------------------------------------

    @property
    def num_ws(self) -> int:
        return self.g.num_ws

    def layers(self):
        """Backbone intermediates offered to the layer widget: per synthesis
        block the feature trunk `b{res}_x` and the torgb skip accumulation
        `b{res}_img` (the reference enumerates the same modules,
        viz/renderer.py:349-354)."""
        sk = dict(self.g.synthesis_kwargs or {})
        cb = sk.get("channel_base", 32768)
        cm = sk.get("channel_max", 512)
        img_ch = self.g.triplane_width * 3 * self.g.triplane_depth
        out = []
        res = 4
        while res <= self.g.backbone_resolution:
            out.append({"name": f"b{res}_x", "channels": min(cb // res, cm)})
            out.append({"name": f"b{res}_img", "channels": img_ch})
            res *= 2
        return out

    def meta(self) -> dict:
        return {
            "num_ws": self.num_ws,
            "layers": self.layers(),
            "depth_opts": [0.5, 1, 2, 4],
            "resolution": self.g.img_resolution,
        }

    # -- module variants ------------------------------------------------------

    def _module_for(self, depth_mult: float, imp_mult: float):
        """render_depth_sample_widget: scale depth_resolution(+importance)
        (viz/renderer.py:286-287). Config-only clone; the param tree is
        unchanged, so the same `variables` apply."""
        if (depth_mult, imp_mult) == (1.0, 1.0):
            return self.g
        base = self.g.rk
        rk = dict(self.g.rendering_kwargs or {})
        rk["depth_resolution"] = max(int(base["depth_resolution"] * depth_mult), 2)
        rk["depth_resolution_importance"] = max(
            int(base["depth_resolution_importance"] * imp_mult), 2)
        return self.g.clone(rendering_kwargs=rk)

    # -- render ----------------------------------------------------------------

    @staticmethod
    def _render_impl(mod, variables, z, z_mix, mix_mask, elevation, azimuth,
                     fov, psi, cond, crop=None, cull=None):
        import jax.numpy as jnp

        def run(m, z, z_mix, mix_mask, elevation, azimuth, fov, psi, cond):
            ws = _mixed_ws(m, z, z_mix, mix_mask, psi, cond)
            xin = {
                "ws": ws,
                "elevations": elevation[None],
                "azimuths": azimuth[None],
                "distances": jnp.ones((1,)),
                "fovs": fov[None],
                "cond": cond,
                "triplane_crop": crop,
                "cull_clouds": cull,
            }
            out = m.f(xin, noise_mode="const")
            return {k: out[k] for k in
                    ("image", "image_raw", "image_depth", "image_weights")}

        return mod.apply(variables, z, z_mix, mix_mask, elevation, azimuth,
                         fov, psi, cond, method=run)

    def _render_fn(self, depth_mult: float, imp_mult: float):
        import jax

        key = (depth_mult, imp_mult)
        if key not in self._fns:
            mod = self._module_for(depth_mult, imp_mult)
            self._fns[key] = jax.jit(
                functools.partial(self._render_impl, mod),
                static_argnames=("crop", "cull"))
        return self._fns[key]

    # -- layer capture -----------------------------------------------------------

    @staticmethod
    def _capture_impl(mod, lvl, which, variables, z, z_mix, mix_mask, psi,
                      cond, base_channel):
        import jax
        import jax.numpy as jnp

        def run(m, z, z_mix, mix_mask, psi, cond, base_channel):
            ws = _mixed_ws(m, z, z_mix, mix_mask, psi, cond)
            _, ximgs = m.backbone.synthesis(
                ws, cond, return_more=True, noise_mode="const")
            feat = ximgs[lvl][0 if which == "x" else 1].astype(jnp.float32)
            # viz/renderer.py:371-374: clamp the channel window, slice 3
            base = jnp.clip(base_channel, 0, feat.shape[1] - 3)
            return jax.lax.dynamic_slice_in_dim(feat, base, 3, axis=1)

        return mod.apply(variables, z, z_mix, mix_mask, psi, cond,
                         base_channel, method=run)

    def _capture_fn(self, layer: str):
        import jax

        res, which = layer.rsplit("_", 1)
        lvl = int(np.log2(int(res[1:]))) - 2
        key = (lvl, which)
        if key not in self._layer_fns:
            self._layer_fns[key] = jax.jit(
                functools.partial(self._capture_impl, self.g, lvl, which))
        return self._layer_fns[key]

    # -- png entry ----------------------------------------------------------------

    def render_png(self, seed=0, elevation=0.0, azimuth=0.0, fov=30.0,
                   psi=1.0, channel="image", crop=None, cull=None,
                   stylemix_seed=None, stylemix_idx=(),
                   depth_mult=1.0, depth_imp_mult=1.0,
                   layer=None, base_channel=0, normalize=True):
        """Returns (png_bytes, render_seconds) — timing per request, so
        concurrent requests cannot report each other's device time."""
        import jax.numpy as jnp
        from PIL import Image

        from ..models.triplane import seeds_to_z

        z = jnp.asarray(seeds_to_z([int(seed)], self.g.z_dim))
        z_mix = jnp.asarray(seeds_to_z(
            [int(stylemix_seed if stylemix_seed is not None else seed)],
            self.g.z_dim))
        mask = np.zeros(self.num_ws, bool)
        idx = [i for i in (stylemix_idx or ()) if 0 <= int(i) < self.num_ws]
        mask[idx] = True  # out-of-range indices dropped (viz/renderer.py:329)
        mask = jnp.asarray(mask)

        with self._lock:
            t0 = time.perf_counter()
            if layer:
                out = self._capture_fn(layer)(
                    self.variables, z, z_mix, mask, jnp.float32(psi),
                    self.cond, jnp.int32(base_channel))
                img = np.asarray(out[0], np.float32)
            else:
                out = self._render_fn(float(depth_mult), float(depth_imp_mult))(
                    self.variables, z, z_mix, mask, jnp.float32(elevation),
                    jnp.float32(azimuth), jnp.float32(fov), jnp.float32(psi),
                    self.cond, crop=crop, cull=cull)
                img = np.asarray(out[channel][0], np.float32)
            render_s = time.perf_counter() - t0

        if img.shape[0] == 1:  # depth / weights -> normalized grayscale
            img = np.repeat(img / max(float(img.max()), 1e-6), 3, axis=0)
        elif layer and normalize:  # viz/renderer.py:391 img_normalize role
            lo, hi = float(img.min()), float(img.max())
            img = (img - lo) / max(hi - lo, 1e-6)
        arr = (np.clip(img, 0, 1).transpose(1, 2, 0) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return buf.getvalue(), render_s

    # -- conditioning ---------------------------------------------------------------

    def set_portrait(self, image_bytes: bytes) -> dict:
        """POST /cond: replace the conditioning front portrait. Alpha is
        composited over white and the image resized to the backend's cond
        shape (the shapes the jitted renderers were traced with) — the
        ecrutileE conditioning contract is white-bg [0,1] RGB
        (ecrutileE.py:350-356 / generate.py:90-96). `resnet_chonk` is
        recomputed from the new portrait when an extractor is attached
        (black-bg composite, katepca contract — generate.py:242) and zeroed
        otherwise, so renders never pair the new portrait with the previous
        one's features."""
        import jax.numpy as jnp
        from PIL import Image

        res = int(self.cond["image_ortho_front"].shape[-1])
        im = Image.open(io.BytesIO(image_bytes)).convert("RGBA")

        def composite(rgb):
            bg = Image.new("RGBA", im.size, rgb + (255,))
            flat = Image.alpha_composite(bg, im).convert("RGB")
            flat = flat.resize((res, res), Image.LANCZOS)
            return np.asarray(flat, np.float32).transpose(2, 0, 1) / 255.0

        front = composite((255, 255, 255))
        ch = int(self.cond["resnet_chonk"].shape[1])
        if self.resnet is not None:
            chonk = self.resnet(jnp.asarray(composite((0, 0, 0))))[None, 0, :ch]
        else:
            chonk = jnp.zeros_like(self.cond["resnet_chonk"])
        with self._lock:
            self.cond = dict(self.cond)
            self.cond["image_ortho_front"] = jnp.asarray(front[None])
            self.cond["resnet_chonk"] = chonk
        return {"ok": True, "resolution": res,
                "resnet_features": self.resnet is not None}


def make_handler(backend: ViewerBackend):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype, render_s=None):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            if render_s is not None:  # performance_widget role
                self.send_header("X-Render-Seconds", f"{render_s:.4f}")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/meta"):
                self._send(200, json.dumps(backend.meta()).encode(),
                           "application/json")
            else:
                self._send(200, _PAGE.encode(), "text/html")

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n)
            try:
                if self.path.startswith("/cond"):
                    body = json.dumps(backend.set_portrait(raw)).encode()
                    self._send(200, body, "application/json")
                    return
                req = json.loads(raw or b"{}")
                png, render_s = backend.render_png(
                    seed=req.get("seed", 0),
                    elevation=req.get("elevation", 0.0),
                    azimuth=req.get("azimuth", 0.0),
                    fov=req.get("fov", 30.0),
                    psi=req.get("psi", 1.0),
                    channel=req.get("channel", "image"),
                    crop=req.get("crop"),
                    cull=req.get("cull"),
                    stylemix_seed=req.get("stylemix_seed"),
                    stylemix_idx=req.get("stylemix_idx", ()),
                    depth_mult=req.get("depth_mult", 1.0),
                    depth_imp_mult=req.get("depth_imp_mult", 1.0),
                    layer=req.get("layer"),
                    base_channel=req.get("base_channel", 0),
                    normalize=req.get("normalize", True),
                )
            except Exception as e:  # surface render errors to the UI
                self._send(500, str(e).encode(), "text/plain")
                return
            self._send(200, png, "image/png", render_s=render_s)

    return Handler


def build_backend(ckpt=None, tiny=False, resnet=None):
    import jax
    import jax.numpy as jnp

    from .. import configs
    from ..models.triplane import TriPlaneGenerator

    if resnet:
        from ..models.resnet import load_pca_extractor

        resnet_fn = load_pca_extractor(resnet)
    else:
        resnet_fn = None

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
    return ViewerBackend(g, variables, cond, resnet=resnet_fn)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--resnet", default=None,
                    help="converted resnet+PCA dir: portrait uploads then "
                         "recompute resnet_chonk features")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8642)
    args = ap.parse_args(argv)

    backend = build_backend(ckpt=args.ckpt, tiny=args.tiny,
                            resnet=args.resnet)
    srv = ThreadingHTTPServer((args.host, args.port), make_handler(backend))
    print(f"viewer at http://{args.host}:{args.port}/ (first render compiles)")
    srv.serve_forever()


if __name__ == "__main__":
    main()
