"""High-level inference API: portrait -> mesh / rendered views.

Library-level equivalent of the `eval.generate` CLI (reference
`_scripts/eval/generate.py`), for users embedding the framework instead of
shelling out: one object owns the generator + aux models and the compiled
render/decode pipelines (view-batched jit, packed-plane volume decode), so
repeated calls pay no retracing.

    rec = Reconstructor(ckpt="/ckpts/flagship")       # or tiny=True
    cond = rec.preprocess(portrait_rgb)                # rmline + resnet PCA
    mesh = rec.mesh(cond)                              # verts/faces/colors
    spin = rec.turntable(cond, n=12)                   # [12,3,512,512]
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .utils.config import Dict

DEFAULT_OPTS = dict(triplane_crop=0.1, cull_clouds=0.5)


class Reconstructor:
    def __init__(
        self,
        ckpt: Optional[str] = None,
        model=None,
        variables=None,
        tiny: bool = False,
        view_batch: int = 2,
        opts: Optional[dict] = None,
        seed: int = 0,
        rmline=None,
        resnet=None,
        mesh=None,
    ):
        import jax

        from . import configs
        from .models.triplane import TriPlaneGenerator

        self.opts = dict(DEFAULT_OPTS if opts is None else opts)
        self.view_batch = view_batch
        self.seed = seed
        self.rmline = rmline
        self.resnet = resnet
        # mesh: optional jax.sharding.Mesh with ('data','rays') axes —
        # turntables shard views over 'data' (parallel/inference) and the
        # 256³ mesh decode shards its point axis over 'rays'
        self.device_mesh = mesh
        self._TG = TriPlaneGenerator

        if model is not None:
            self.g, self.variables = model, variables
        elif tiny:
            self.g = configs.tiny(force_sigmoid=True)
            self.variables = None  # lazy init on first cond (shape-dependent)
        else:
            assert ckpt, "pass ckpt=, model=, or tiny=True"
            from .runtime.checkpoint import (extract_generator_variables,
                                             load_checkpoint)

            state, config = load_checkpoint(ckpt)
            self.variables = extract_generator_variables(state)
            self.g = configs.from_snapshot_config(config, eval_mode=True)
        self._key = jax.random.PRNGKey(seed)

    # -- conditioning --------------------------------------------------------

    def preprocess(self, image_rgb: np.ndarray, keypoints=None) -> dict:
        """[3,512,512] RGB in [0,1] -> the G.f `cond` dict.

        Applies the line filler (if constructed with `rmline`) and the
        ResNet-PCA chonk extractor (if `resnet`); otherwise uses the raw
        image + zero features so the pipeline still runs (tiny/smoke)."""
        import jax.numpy as jnp

        img = jnp.asarray(image_rgb, jnp.float32)[None]
        filled = img
        if self.rmline is not None:
            filled, _, _ = self.rmline(img, keypoints)
        if self.resnet is not None:
            chonk = self.resnet(img * 2 - 1)[0]
        else:
            ch = 16 if self.g.cond_mode and "reschonk_add_16" in self.g.cond_mode \
                else 512
            chonk = jnp.zeros((ch, 8, 8), jnp.float32)
        return {
            "image_ortho_front": filled,
            "resnet_chonk": chonk[None],
        }

    def _ensure_init(self, cond):
        if self.variables is None:
            import jax
            import jax.numpy as jnp

            self.variables = self.g.init(
                {"params": jax.random.PRNGKey(self.seed)},
                {"seeds": [self.seed], "elevations": jnp.zeros(1),
                 "azimuths": jnp.zeros(1), "cond": cond},
                method=self._TG.f, noise_mode="const",
            )

    # -- rendering -----------------------------------------------------------

    def views(
        self,
        cond: dict,
        elevations: Sequence[float],
        azimuths: Sequence[float],
        fovs: Optional[Sequence[float]] = None,
    ) -> Dict:
        """Render arbitrary views (fov<0 = orthographic). Views run in
        jitted batches of `view_batch`; returns stacked [N,...] arrays
        (image, image_xyz, image_weights)."""
        import jax.numpy as jnp

        from .eval.generate import (_get_planes_jit, _get_render_jit,
                                    plane_cache_ok)

        self._ensure_init(cond)
        n = len(elevations)
        fovs = list(fovs) if fovs is not None else [30.0] * n
        vb = min(self.view_batch, n)
        cache_planes = plane_cache_ok(self.g)
        render = _get_render_jit(self.g, self.opts, self.seed, vb,
                                 from_planes=cache_planes)
        ws_pl = (
            _get_planes_jit(self.g, self.seed, self.opts)(self.variables, cond)
            if cache_planes else ()
        )
        outs = []
        for i in range(0, n, vb):
            sl = slice(i, min(i + vb, n))
            k = sl.stop - sl.start
            pad = vb - k

            def arr(xs):
                v = list(xs[sl]) + [xs[sl.stop - 1]] * pad
                return jnp.asarray(v, jnp.float32)

            out = render(
                self.variables, arr(list(elevations)), arr(list(azimuths)),
                arr(fovs), cond, *ws_pl,
            )
            outs.append({kk: np.asarray(v)[:k] for kk, v in out.items()})
        return Dict({
            kk: np.concatenate([o[kk] for o in outs]) for kk in outs[0]
        })

    def turntable(self, cond: dict, n: int = 12, elevation: float = 0.0,
                  fov: float = 30.0) -> np.ndarray:
        """n-view spin ([-1,1] RGB images [n,3,H,W]).

        With a mesh, the n views shard over the 'data' axis (one compiled
        call renders all views, each chip taking its slice)."""
        azims = list(np.linspace(0.0, 360.0, n, endpoint=False))
        if self.device_mesh is not None and n % self.device_mesh.shape["data"] == 0:
            import jax.numpy as jnp

            from .models.triplane import seeds_to_z
            from .parallel.inference import render_views_sharded

            self._ensure_init(cond)
            return render_views_sharded(
                self.g, self.variables, cond,
                elevations=[elevation] * n, azimuths=azims, mesh=self.device_mesh,
                fovs=[fov] * n,
                z=jnp.asarray(seeds_to_z([self.seed], self.g.z_dim)),
                triplane_crop=self.opts.get("triplane_crop"),
                cull_clouds=self.opts.get("cull_clouds"),
            )
        return self.views(cond, [elevation] * n, azims, [fov] * n).image

    # -- geometry ------------------------------------------------------------

    def mesh(self, cond: dict, resolution: int = 256, level: float = 0.5,
             **kw) -> Dict:
        """Colored iso-surface mesh (verts in box_warp world units)."""
        from .eval.volume import extract_mesh

        self._ensure_init(cond)
        xin = {"cond": cond, "seeds": [self.seed], **self.opts}
        return extract_mesh(self.g, self.variables, xin,
                            resolution=resolution, level=level,
                            mesh=self.device_mesh, **kw)
