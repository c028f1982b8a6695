"""Tests: config Dict, image lib, table, sketchers, morphology, checkpoint
roundtrip, synthetic dataset layout, databackend walking."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from panic3d_tpu.utils.config import Dict
from panic3d_tpu.utils.imglib import Img
from panic3d_tpu.utils.table import Table
from panic3d_tpu.utils.imageops import dilation, erosion, resize_nearest, sobel_magnitude
from panic3d_tpu.utils.sketchers import batch_dog, gaussian_blur2d

pytestmark = pytest.mark.fast


def test_dict_recursive_update():
    d = Dict(a=dict(b=1, c=2), x=5)
    d.update(Dict(a=dict(c=3, d=4)))
    assert d.a.b == 1 and d.a.c == 3 and d.a.d == 4 and d.x == 5
    d.y.z = 9  # addict-style autonesting
    assert d["y"]["z"] == 9
    d.w = dict(q=1)
    assert d.w.q == 1


def test_img_roundtrip(tmp_path):
    rgba = np.random.RandomState(0).rand(4, 16, 16).astype(np.float32)
    img = Img(rgba)
    assert img.channels == 4
    rgb = img.bg("w").convert("RGB")
    assert rgb.channels == 3
    # white bg: where alpha=0, pixel = 1
    z = Img(np.concatenate([np.zeros((3, 4, 4)), np.zeros((1, 4, 4))]))
    np.testing.assert_allclose(z.bg("w").convert("RGB").t(), 1.0)
    p = tmp_path / "x.png"
    rgb.save(str(p))
    again = Img(str(p))
    np.testing.assert_allclose(again.t(), rgb.t(), atol=1 / 255 + 1e-6)
    r = rgb.resize(8)
    assert r.t().shape == (3, 8, 8)


def test_table_renders():
    t = str(Table([["a", "b"], ["foo", "1.5"]]))
    assert "foo" in t and "=" in t


def test_morphology():
    x = jnp.zeros((1, 1, 9, 9)).at[:, :, 4, 4].set(1.0)
    d = dilation(x, 3)
    assert float(d[0, 0, 3:6, 3:6].sum()) == 9.0
    e = erosion(d, 3)
    assert float(e[0, 0, 4, 4]) == 1.0
    assert float(e.sum()) == 1.0


def test_resize_nearest():
    x = jnp.arange(16.0).reshape(1, 1, 4, 4)
    y = resize_nearest(x, 8)
    assert y.shape == (1, 1, 8, 8)
    np.testing.assert_allclose(np.asarray(y[0, 0, :2, :2]), 0.0)


def test_sobel_and_dog_shapes():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 3, 32, 32).astype(np.float32))
    s = sobel_magnitude(x)
    assert s.shape == (2, 1, 32, 32)
    d = batch_dog(x, t=1.0, sigma=0.5, k=1.6)
    assert d.shape == (2, 1, 32, 32)
    assert float(d.min()) >= 0 and float(d.max()) <= 1


def test_gaussian_blur_matches_scipy():
    import scipy.ndimage

    x = np.random.RandomState(1).rand(1, 1, 24, 24).astype(np.float32)
    got = np.asarray(gaussian_blur2d(jnp.asarray(x), 9, 1.0))[0, 0]
    # scipy with same truncated kernel (radius 4) and nearest/replicate border
    want = scipy.ndimage.gaussian_filter(x[0, 0], 1.0, mode="nearest", truncate=4.0)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_checkpoint_roundtrip(tmp_path):
    from panic3d_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint

    variables = {
        "params": {"layer": {"w": jnp.arange(6.0).reshape(2, 3)}},
        "buffers": {"n": jnp.ones((4,))},
    }
    save_checkpoint(str(tmp_path / "ck"), variables, config={"a": 1})
    restored, cfg = load_checkpoint(str(tmp_path / "ck"))
    assert cfg == {"a": 1}
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["layer"]["w"]),
        np.asarray(variables["params"]["layer"]["w"]),
    )


def test_checkpoint_name_mapping():
    from panic3d_tpu.runtime.checkpoint import flax_path_from_torch

    assert flax_path_from_torch("backbone.mapping.fc0.weight") == (
        "params", "backbone", "mapping", "fc0", "weight",
    )
    assert flax_path_from_torch("decoder.net.0.weight") == (
        "params", "decoder", "net0", "weight",
    )
    assert flax_path_from_torch("backbone.synthesis.b8.conv1.noise_const") == (
        "buffers", "backbone", "synthesis", "b8", "conv1", "noise_const",
    )
    assert flax_path_from_torch("backbone.synthesis.b8.resample_filter") is None


def test_synthetic_batch_layout():
    from panic3d_tpu.data.dataset import synthetic_batch

    b = synthetic_batch(bs=2, size=32)
    assert b["image"].shape == (2, 3, 32, 32)
    assert b["camera"].shape == (2, 25)
    cond = b["cond"]
    for v in ("front", "left", "right", "back"):
        assert cond[f"image_ortho_{v}"].shape == (2, 3, 32, 32)
        assert cond[f"image_ortho_{v}_camera"].shape == (2, 25)
        # ortho cameras have negative focal (fov -1)
        assert cond[f"image_ortho_{v}_camera"][0, 16] < 0


def test_mirror_camera_label():
    from panic3d_tpu.cameras.conventions import camera_label
    from panic3d_tpu.data.dataset import mirror_camera_label

    l1 = np.asarray(camera_label(10.0, 35.0, 1.0, 30.0))
    l2 = np.asarray(camera_label(10.0, -35.0, 1.0, 30.0))
    m = mirror_camera_label(l1)
    np.testing.assert_allclose(m, l2, atol=1e-5)


def test_databackend_walk(tmp_path):
    from panic3d_tpu.data.databack import DatabackendMinna
    from panic3d_tpu.utils.imglib import Img

    root = tmp_path / "_data" / "lustrous" / "renders" / "rutileE" / "ortho" / "f" / "123"
    os.makedirs(root)
    Img(np.random.rand(3, 8, 8).astype(np.float32)).save(str(root / "front.png"))
    import json

    meta = {"rutileE/ortho/f/123/front": {"render_params": {
        "elev": 0.0, "azim": 0.0, "dist": 1.0, "fov": -1,
    }}}
    with open(tmp_path / "_data" / "lustrous" / "renders" / "rutileE" / "rutileE_meta.json", "w") as f:
        json.dump(meta, f)
    dk = DatabackendMinna(str(tmp_path))
    assert len(dk) == 1
    x = dk["rutileE/ortho/f/123/front"]
    assert x["image"].t().shape == (3, 8, 8)
    assert x["render_params"]["fov"] == -1
    # dtype aliasing injected ortho_xyza entry
    assert "rutileE/ortho_xyza/f/123/front" in dk.rp_meta


# ---------------------------------------------------------------------------
# background prefetcher (data/prefetch.py)

def test_prefetcher_yields_prepared_items_in_order():
    from panic3d_tpu.data.prefetch import Prefetcher

    src = iter(range(20))
    pf = Prefetcher(src, prepare=lambda x: x * 10, depth=3)
    assert list(pf) == [i * 10 for i in range(20)]


def test_prefetcher_propagates_worker_exception():
    from panic3d_tpu.data.prefetch import Prefetcher

    def gen():
        yield 1
        raise ValueError("boom")

    pf = Prefetcher(gen(), prepare=lambda x: x)
    assert next(pf) == 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="boom"):
        next(pf)


def test_prefetcher_close_unblocks_worker():
    from panic3d_tpu.data.prefetch import Prefetcher
    import itertools

    pf = Prefetcher(itertools.count(), prepare=lambda x: x, depth=1)
    assert next(pf) == 0
    pf.close()  # must not hang


def test_infinite_batcher_ranks_partition_epoch():
    """Shared-seed strided sharding (misc.py:113-147 role): ranks draw
    DISJOINT index sets that together cover each epoch exactly."""
    from panic3d_tpu.data.dataset import InfiniteBatcher

    class Spy:
        def __init__(self, n):
            self.n = n
            self.seen = []

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            self.seen.append(i)
            return {"x": np.float32(i)}

    n = 12
    spies = [Spy(n) for _ in range(3)]
    for rank, spy in enumerate(spies):
        it = iter(InfiniteBatcher(spy, batch_size=2, rank=rank, world=3, seed=5))
        for _ in range(2):  # one epoch shard = 4 samples = 2 batches
            next(it)
    sets = [set(s.seen) for s in spies]
    assert sets[0] | sets[1] | sets[2] == set(range(n))
    assert not (sets[0] & sets[1]) and not (sets[0] & sets[2]) \
        and not (sets[1] & sets[2])
