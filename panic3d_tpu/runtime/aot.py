"""AOT-compiled serving artifacts via jax.export (StableHLO).

The reference ships trained models as source-embedding pickles
(`src/torch_utils/persistence.py:37-134`) that re-exec arbitrary Python at
load time — its only "serving format".  The TPU-native artifact here is the
opposite: a **code-free StableHLO module** exported with `jax.export`.

A serving bundle is a directory:

    bundle/
      render.jaxexport   serialized jax.export.Exported of the view forward
                         (graph only — weights are a call argument)
      state.msgpack      generator variables, the existing checkpoint format
      config.json        model/config metadata (runtime/checkpoint.py layout)

Properties the pickle format cannot offer:
  - loading executes NO model code: `deserialize` rebuilds the compiled
    graph from StableHLO bytes; a serving host needs jax + the bundle, not
    panic3d_tpu's model sources (a C++ PJRT host can run the same module).
  - multi-platform: one artifact can carry lowerings for several backends
    (``platforms=("tpu", "cpu")``), so the artifact built on a TPU build
    host also runs on a CPU canary.
  - versioned + shape-checked: jax.export embeds the calling convention and
    input shapes/dtypes and validates them at call time.
"""

from __future__ import annotations

import os
import re
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

from .checkpoint import load_checkpoint, save_checkpoint

RENDER_FILE = "render.jaxexport"


def export_view_renderer(
    g,
    variables,
    example_xin: dict,
    *,
    platforms: Optional[Sequence[str]] = None,
    outputs: Tuple[str, ...] = ("image", "image_raw", "image_depth"),
) -> jax_export.Exported:
    """Export ``G.f``'s view forward as a jax.export.Exported.

    The exported callable has signature ``(variables, xin) -> dict`` with
    the same pytree layout as ``example_xin`` (shapes/dtypes are frozen into
    the artifact; export per served batch shape). ``noise_mode='const'``
    matches eval semantics (`_scripts/eval/generate.py` renders are
    deterministic, SURVEY §3.1).
    """
    from ..models.triplane import TriPlaneGenerator

    def forward(variables, xin):
        out = g.apply(
            variables, xin, method=TriPlaneGenerator.f, noise_mode="const"
        )
        return {k: out[k] for k in outputs if k in out}

    fn = jax.jit(forward)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    specs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        (variables, example_xin),
    )
    return jax_export.export(fn, **kwargs)(*specs)


def save_serving_bundle(
    path: str,
    g,
    variables,
    example_xin: dict,
    *,
    config: Optional[dict] = None,
    platforms: Optional[Sequence[str]] = None,
    volume_resolution: Optional[int] = None,
    volume_kwargs: Optional[dict] = None,
) -> None:
    """Write a self-contained serving bundle directory (see module doc).

    volume_resolution: additionally export the mesh-path volume decode at
    this lattice resolution (``volume.jaxexport``); volume_kwargs forwards
    chunk/crop/cull to `export_volume_decoder`.
    """
    os.makedirs(path, exist_ok=True)

    def write(fname: str, exported: jax_export.Exported):
        tmp = os.path.join(path, fname + ".tmp")
        with open(tmp, "wb") as f:
            f.write(exported.serialize())
        os.replace(tmp, os.path.join(path, fname))

    write(RENDER_FILE,
          export_view_renderer(g, variables, example_xin,
                               platforms=platforms))
    if volume_resolution:
        write(VOLUME_FILE,
              export_volume_decoder(g, variables, example_xin,
                                    resolution=volume_resolution,
                                    platforms=platforms,
                                    **(volume_kwargs or {})))
    save_checkpoint(path, variables, config=config)


VOLUME_FILE = "volume.jaxexport"


def export_volume_decoder(
    g,
    variables,
    example_xin: dict,
    *,
    resolution: int = 256,
    chunk: int = 2 ** 17,
    triplane_crop: Optional[float] = None,
    cull_clouds: Optional[float] = None,
    platforms: Optional[Sequence[str]] = None,
) -> jax_export.Exported:
    """Export the 256³ volume decode (the mesh path) as one jax.export graph.

    Signature: ``(variables, {z, cond}) -> {sigmas, rgbs, densities}``, each
    ``[1, C, N, N, N]`` in `eval/volume.get_volume`'s output orientation
    (`_util/eg3d_metrics3d.py:94-183` role), so a serving host only needs
    marching cubes/tetrahedra on the densities — no model code. The
    coordinate lattice is generated inside the graph (device-side, like
    get_volume); resolution/chunk/filters are frozen into the artifact.
    """
    from ..cameras.conventions import camera_label
    from ..eval import volume as V
    from ..models.triplane import TriPlaneGenerator

    if example_xin["z"].shape[0] != 1:
        # The decode body processes batch-1 chunks and fmt() emits the
        # documented [1, C, N, N, N] contract; larger served batches would
        # silently mix planes across the batch.
        raise ValueError(
            "export_volume_decoder is batch-1 only (got batch="
            f"{example_xin['z'].shape[0]}); export one bundle per portrait")

    bw = g.rk["box_warp"]

    def decode(variables, xin):
        bs = xin["z"].shape[0]
        ones = jnp.ones(bs)
        cam = camera_label(jnp.zeros(bs), jnp.zeros(bs), ones, 30 * ones)
        ws = g.apply(variables, xin["z"], cam, xin.get("cond"),
                     method=TriPlaneGenerator.mapping)
        planes = g.apply(variables, ws, xin.get("cond"), noise_mode="const",
                         method=TriPlaneGenerator._planes_from_ws)
        if g.triplane_depth == 1:
            from ..models.volumetric.renderer import pack_planes

            planes = pack_planes(planes)

        chunks = V.create_samples_device(resolution, bw, chunk)

        def body(coords):
            out = g.apply(variables, planes, coords[None],
                          method=TriPlaneGenerator.sample_mixed_planes)
            return out["sigma"][0], out["rgb"][0]

        sig, rgb = jax.lax.map(body, chunks)
        n = resolution ** 3
        sigmas = sig.reshape(-1, 1)[:n][None]
        rgbs = rgb.reshape(-1, rgb.shape[-1])[:n][None]
        densities = V.sigma2density(sigmas)
        samples = V.create_samples_device(resolution, bw, n).reshape(1, n, 3)
        if triplane_crop:
            densities = jnp.where(
                V.triplane_crop_mask(samples, triplane_crop, bw),
                -1e3, densities)
        if cull_clouds:
            densities = jnp.where(
                V.cull_clouds_mask(densities, cull_clouds), -1e3, densities)

        N = resolution

        def fmt(x):
            x = x.reshape(1, N, N, N, -1)
            x = jnp.flip(x, axis=1)
            return jnp.transpose(x, (0, 4, 1, 2, 3))

        return {"sigmas": fmt(sigmas), "rgbs": fmt(rgbs),
                "densities": fmt(densities)}

    xin = {"z": example_xin["z"]}
    if example_xin.get("cond") is not None:
        xin["cond"] = example_xin["cond"]
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    specs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), (variables, xin))
    return jax_export.export(jax.jit(decode), **kwargs)(*specs)


def example_xin_for(g, batch: int = 1) -> dict:
    """A serving-shaped ``G.f`` input for generator config ``g``.

    Conditioning shapes follow the cond_mode feature flags the same way the
    backbone parses them (`networks_stylegan2.py:221,543` split('.') flags):
    ``reschonk_add_N`` -> (N,8,8) spatial features, ``resnetcond_N`` -> (N,)
    mapping features. The ortho-front image uses img_resolution (injections
    resize to each block's resolution, so any size works; this matches the
    dataset's 512² ortho renders on the flagship).
    """
    import jax.numpy as jnp

    r = g.img_resolution
    cond = {
        "image_ortho_front": jnp.zeros((batch, 3, r, r), jnp.float32),
    }
    mode = g.cond_mode or ""
    m = re.search(r"reschonk_add_(\d+)", mode)
    if m:
        cond["resnet_chonk"] = jnp.zeros(
            (batch, int(m.group(1)), 8, 8), jnp.float32)
    m = re.search(r"resnetcond_(\d+)", mode)
    if m:
        cond["resnet_feats"] = jnp.zeros((batch, int(m.group(1))), jnp.float32)
    return {
        "z": jnp.zeros((batch, g.z_dim), jnp.float32),
        "elevations": jnp.zeros(batch),
        "azimuths": jnp.zeros(batch),
        "cond": cond,
    }


def main(argv=None):
    """Export a trainer snapshot as a serving bundle.

    python -m panic3d_tpu.runtime.aot --ckpt <snapshot-dir> --out <bundle> \
        [--batch 1] [--platforms tpu,cpu]
    """
    import argparse

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--ckpt", required=True, help="trainer snapshot dir")
    ap.add_argument("--out", required=True, help="bundle output dir")
    ap.add_argument("--batch", type=int, default=1,
                    help="served batch size (frozen into the artifact)")
    ap.add_argument("--platforms", default=None,
                    help="comma list, e.g. 'tpu,cpu' (default: current)")
    ap.add_argument("--volume-resolution", type=int, default=None,
                    help="also export the mesh-path volume decode at this "
                         "lattice resolution (e.g. 256)")
    args = ap.parse_args(argv)
    if args.volume_resolution and args.batch != 1:
        ap.error("--volume-resolution requires --batch 1 "
                 "(the volume decode contract is [1, C, N, N, N])")

    from .. import configs
    from .checkpoint import extract_generator_variables

    state, config = load_checkpoint(args.ckpt)
    variables = extract_generator_variables(state)
    g = configs.from_snapshot_config(config, eval_mode=True)
    xin = example_xin_for(g, batch=args.batch)
    platforms = args.platforms.split(",") if args.platforms else None
    save_serving_bundle(args.out, g, variables, xin,
                        config=config, platforms=platforms,
                        volume_resolution=args.volume_resolution)
    print(f"wrote serving bundle: {args.out} "
          f"(batch={args.batch}, platforms={platforms or 'default'}, "
          f"volume={args.volume_resolution})")


class ServingBundle:
    """Load + call a serving bundle without importing model code.

    >>> b = ServingBundle("bundle/")
    >>> out = b(xin)           # xin matches the exported example shapes
    >>> out["image"].shape
    """

    def __init__(self, path: str):
        with open(os.path.join(path, RENDER_FILE), "rb") as f:
            self.exported = jax_export.deserialize(f.read())
        self.volume_exported = None
        vpath = os.path.join(path, VOLUME_FILE)
        if os.path.exists(vpath):
            with open(vpath, "rb") as f:
                self.volume_exported = jax_export.deserialize(f.read())
        self.variables, self.config = load_checkpoint(path)
        self._call = jax.jit(self.exported.call)
        self._vcall = (jax.jit(self.volume_exported.call)
                       if self.volume_exported is not None else None)

    @property
    def platforms(self) -> Tuple[str, ...]:
        return tuple(self.exported.platforms)

    def __call__(self, xin: dict) -> dict:
        return self._call(self.variables, xin)

    def volume(self, xin: dict) -> dict:
        """Mesh-path densities/rgbs (requires volume_resolution at export)."""
        if self._vcall is None:
            raise ValueError("bundle was exported without a volume decoder "
                             "(pass volume_resolution to save_serving_bundle)")
        vin = {"z": xin["z"]}
        if xin.get("cond") is not None:
            vin["cond"] = xin["cond"]
        return self._vcall(self.variables, vin)


if __name__ == "__main__":
    main()
