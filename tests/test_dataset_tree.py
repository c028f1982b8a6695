"""End-to-end data-path test against a synthetic on-disk _data/lustrous tree.

Builds the exact directory layout the reference ships (renders/<set>/<dtype>
/<franchise>/<id>/<view>.png + metadata json + subset csv + katepca pickles)
and runs EcrutileEDataset -> InfiniteBatcher, checking the training batch
contract incl. mirror augmentation semantics (ecrutileE.py:83-120).
"""

import json
import os
import pickle

import numpy as np
import pytest

from panic3d_tpu.data.dataset import EcrutileEDataset, InfiniteBatcher, collate
from panic3d_tpu.utils.imglib import Img

pytestmark = pytest.mark.fast


SIZE = 32


@pytest.fixture(scope="module")
def fake_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("data_root")
    base = root / "_data" / "lustrous"
    rng = np.random.RandomState(0)
    franch, idx = "4", "1234"  # franchise bucket = last char of the id
    meta = {}

    def put_png(dtype, view, channels=4):
        d = base / "renders" / "rutileE" / dtype / franch / idx
        os.makedirs(d, exist_ok=True)
        img = rng.rand(channels, SIZE, SIZE).astype(np.float32)
        Img(img).save(str(d / f"{view}.png"))
        return f"rutileE/{dtype}/{franch}/{idx}/{view}"

    # 2 random views (rgb + xyza) for n_generations=2
    for i in range(2):
        bn = put_png("rgb", f"{i:04d}", 4)
        meta[bn] = {"render_params": dict(
            elev=float(rng.uniform(-20, 60)), azim=float(rng.uniform(-180, 180)),
            dist=1.0, fov=30,
        )}
        put_png("xyza", f"{i:04d}", 4)
    # ortho + ortho_xyza + dorthoA views
    for view in ("front", "left", "right", "back"):
        bn = put_png("ortho", view, 4)
        meta[bn] = {"render_params": dict(elev=0.0, azim={
            "front": 0.0, "left": 90.0, "right": -90.0, "back": 180.0
        }[view], dist=1.0, fov=-1)}
        put_png("ortho_xyza", view, 4)
    for view in ("left", "right"):
        put_png("dorthoA", view, 4)

    with open(base / "renders" / "rutileE" / "rutileE_meta.json", "w") as f:
        json.dump(meta, f)

    # pca pickles
    for kind, arr in [
        ("ortho_katepca", rng.randn(2, 512).astype(np.float32)),
        ("ortho_katepca_chonk", rng.randn(2, 512, 8, 8).astype(np.float32)),
    ]:
        d = base / "renders" / "rutileE" / kind / franch / idx
        os.makedirs(d, exist_ok=True)
        with open(d / "front.pkl", "wb") as f:
            pickle.dump(arr, f)

    os.makedirs(base / "subsets", exist_ok=True)
    with open(base / "subsets" / "rutileEA_train.csv", "w") as f:
        f.write(f"{idx}\n")
    return str(root)


def test_dataset_sample_contract(fake_tree):
    ds = EcrutileEDataset(fake_tree, subset="rutileEA", split="train",
                          size=SIZE, n_generations=2, mirror=True)
    assert len(ds) == 4  # 2 views x mirror
    s = ds[0]
    assert s["image"].dtype == np.uint8
    assert s["image"].shape == (3, SIZE, SIZE)
    assert s["xyz"].shape == (3, SIZE, SIZE)
    assert s["camera"].shape == (25,)
    cond = s["condition"]
    for v in ("front", "left", "right", "back"):
        assert cond[f"image_ortho_{v}"].shape == (3, SIZE, SIZE)
        assert cond[f"image_ortho_{v}_camera"].shape == (25,)
        # xyz scaled into boxwarp range
        assert np.abs(cond[f"image_ortho_{v}_xyz"]).max() <= 0.35 + 1e-5
    assert cond["resnet_feats"].shape == (512,)
    assert cond["resnet_chonk"].shape == (512, 8, 8)
    assert cond["image_dorthoA_left"].shape == (4, SIZE, SIZE)


def test_dataset_mirror_semantics(fake_tree):
    ds = EcrutileEDataset(fake_tree, subset="rutileEA", split="train",
                          size=SIZE, n_generations=2, mirror=True)
    a, m = ds[0], ds[2]  # same view, mirrored
    np.testing.assert_array_equal(m["image"], a["image"][..., ::-1])
    # xyz x-channel negated and flipped
    np.testing.assert_allclose(
        m["xyz"][0], -a["xyz"][0][..., ::-1], atol=1e-6
    )
    # left/right swap
    np.testing.assert_array_equal(
        m["condition"]["image_ortho_left"],
        a["condition"]["image_ortho_right"][..., ::-1],
    )
    # camera label mirrored in elements [1,2,3,4,8]
    lbl_a, lbl_m = a["camera"], m["camera"]
    np.testing.assert_allclose(lbl_m[[1, 2, 3, 4, 8]], -lbl_a[[1, 2, 3, 4, 8]],
                               atol=1e-6)
    # resnet feats: flipped slot selected
    assert not np.array_equal(m["condition"]["resnet_feats"],
                              a["condition"]["resnet_feats"])


def test_infinite_batcher_shards(fake_tree):
    ds = EcrutileEDataset(fake_tree, subset="rutileEA", split="train",
                          size=SIZE, n_generations=2, mirror=True)
    it = iter(InfiniteBatcher(ds, batch_size=2, rank=0, world=2, seed=1))
    b = next(it)
    assert b["image"].shape == (2, 3, SIZE, SIZE)
    assert b["condition"]["image_ortho_front"].shape == (2, 3, SIZE, SIZE)
    assert b["camera"].shape == (2, 25)
