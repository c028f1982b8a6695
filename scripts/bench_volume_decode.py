"""Probe the 256³ volume decode: chunk size and row-dtype sensitivity.

decode time should be ~gather-bound (50M packed fp32 rows @ ~40 Mrows/s
= 1.3 s); measures where the extra wall time comes from.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/panic3d_jax_cache_tpu")

from panic3d_tpu import configs
from panic3d_tpu.eval import volume as vol
from panic3d_tpu.models.triplane import TriPlaneGenerator
from __graft_entry__ import _flagship_inputs


def main():
    g = configs.flagship(eval_mode=True)
    xin = _flagship_inputs(g, bs=1)
    params = g.init({"params": jax.random.PRNGKey(0)}, xin,
                    method=TriPlaneGenerator.f, noise_mode="const")

    planes_from_z, _, _, _ = vol._cached_decoder(g, None)
    from panic3d_tpu.cameras.conventions import camera_label
    cam = camera_label(jnp.zeros(1), jnp.zeros(1), jnp.ones(1),
                       30 * jnp.ones(1))
    _, planes = planes_from_z(params, xin["z"], cam, xin["cond"])
    planes_bf16 = jax.jit(lambda p: p.astype(jnp.bfloat16))(planes)

    N = 256
    samples = vol.create_samples(N, g.rk["box_warp"])

    for chunk_log2 in (17, 19, 21):
        chunk = 2 ** chunk_log2
        pad = (-samples.shape[0]) % chunk
        chunks = jnp.asarray(
            np.pad(samples, ((0, pad), (0, 0))).reshape(-1, chunk, 3))

        for tag, pl in (("fp32", planes), ("bf16", planes_bf16)):
            @jax.jit
            def dec(variables, planes_, chunks_):
                def body(coords):
                    out = g.apply(variables, planes_, coords[None],
                                  method=TriPlaneGenerator.sample_mixed_planes)
                    return out["sigma"][0]
                return jnp.sum(jax.lax.map(body, chunks_).astype(jnp.float32))

            float(dec(params, pl, chunks))  # compile
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(dec(params, pl, chunks))
                ts.append(time.perf_counter() - t0)
            t = float(np.median(ts))
            nrow = samples.shape[0] + pad
            print(f"chunk=2^{chunk_log2} rows={tag}  {t:6.2f} s  "
                  f"({3*nrow/t/1e6:6.1f} Mrows/s)")


if __name__ == "__main__":
    main()
