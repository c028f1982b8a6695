"""North-star path test: eval.generate -> eval.measure end to end.

Builds a synthetic daredemoE benchmark (fandom_align portrait + ortho/rgb60
GT renders + alignment pkl + a minimal .vrm with head bone) and drives both
CLIs with the tiny random-init model: the full single-portrait -> mesh +
16 views -> CLIP/LPIPS/PSNR + chamfer/F1 pipeline (SURVEY.md §3.1, §3.4).
Random weights mean the VALUES are meaningless; the contract under test is
the file layout, conventions, and that every metric computes finite.
"""

import json
import os
import pickle
import struct

import numpy as np
import pytest

from panic3d_tpu.utils.imglib import Img

SIZE = 64
FRANCH, IDX = "frn", "0007"


def build_vrm(path):
    """Minimal binary glTF with one cube mesh + VRM head bone."""
    c = 0.1
    cy = 0.1
    verts = np.array(
        [
            [x, y + cy, z]
            for x in (-c, c)
            for y in (-c, c)
            for z in (-c, c)
        ],
        dtype=np.float32,
    )
    # cube faces (12 tris, outward-ish winding not required by our loaders)
    quads = [
        (0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
        (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3),
    ]
    tris = []
    for a, b, cq, d in quads:
        tris += [(a, b, cq), (a, cq, d)]
    faces = np.array(tris, dtype=np.uint32)
    ibm = np.eye(4, dtype=np.float32)[None]  # head at origin

    bin_parts = [verts.tobytes(), faces.tobytes(), ibm.tobytes()]
    offsets = [0]
    for p in bin_parts[:-1]:
        offsets.append(offsets[-1] + len(p))
    blob = b"".join(bin_parts)

    gltf = {
        "asset": {"version": "2.0"},
        "buffers": [{"byteLength": len(blob)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": offsets[0], "byteLength": len(bin_parts[0])},
            {"buffer": 0, "byteOffset": offsets[1], "byteLength": len(bin_parts[1])},
            {"buffer": 0, "byteOffset": offsets[2], "byteLength": len(bin_parts[2])},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": len(verts),
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5125, "count": faces.size,
             "type": "SCALAR"},
            {"bufferView": 2, "componentType": 5126, "count": 1, "type": "MAT4"},
        ],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0},
                                    "indices": 1, "mode": 4}]}],
        "nodes": [{"name": "head"}],
        "skins": [{"joints": [0], "inverseBindMatrices": 2}],
        "extensions": {"VRM": {"humanoid": {"humanBones": [
            {"bone": "head", "node": 0},
        ]}}},
    }
    js = json.dumps(gltf).encode()
    js += b" " * ((-len(js)) % 4)
    blob += b"\0" * ((-len(blob)) % 4)
    total = 12 + 8 + len(js) + 8 + len(blob)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(js), 0x4E4F534A))
        f.write(js)
        f.write(struct.pack("<II", len(blob), 0x004E4942))
        f.write(blob)


@pytest.fixture(scope="module")
def bench_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("bench_root")
    base = root / "_data" / "lustrous"
    rng = np.random.RandomState(0)
    meta = {}

    def put_png(dtype, view, channels=4):
        d = base / "renders" / "daredemoE" / dtype / FRANCH / IDX
        os.makedirs(d, exist_ok=True)
        Img(rng.rand(channels, SIZE, SIZE).astype(np.float32)).save(
            str(d / f"{view}.png"))
        return f"daredemoE/{dtype}/{FRANCH}/{IDX}/{view}"

    bn = put_png("fandom_align", "front", 4)
    # GT images the metrics compare against
    for view in ("front", "left", "right", "back"):
        obn = put_png("ortho", view, 4)
        meta[obn] = {"render_params": dict(elev=0.0, azim=0.0, dist=1.0, fov=-1)}
    from panic3d_tpu.cameras.conventions import camsubs

    for v in camsubs["spin12"]:
        sbn = put_png("rgb60", f"{v:04d}", 4)
        meta[sbn] = {"render_params": dict(elev=0.0, azim=0.0, dist=1.0, fov=30)}
    meta[bn] = {"render_params": dict(elev=0.0, azim=0.0, dist=1.0, fov=-1)}
    with open(base / "renders" / "daredemoE" / "daredemoE_meta.json", "w") as f:
        json.dump(meta, f)

    # alignment pkl: identity transform, keypoints inside the image
    kpts = np.concatenate(
        [rng.rand(28, 2) * (SIZE - 1), np.ones((28, 1))], axis=1
    ).astype(np.float32)
    align = {
        f"daredemoE/fandom_align/{FRANCH}/{IDX}/front": {
            "area_of_interest": ((128, 128), (256, 256)),  # 512-space, centered
            "transformation": np.eye(3, dtype=np.float32),
            "_alignment": {"source": {
                "keypoints": kpts[None],
                "_detection_used": 0,
            }},
        }
    }
    with open(base / "renders" / "daredemoE" / "fandom_align_alignment.pkl",
              "wb") as f:
        pickle.dump(align, f)

    os.makedirs(base / "subsets", exist_ok=True)
    with open(base / "subsets" / "daredemoE_test.csv", "w") as f:
        f.write(f"{FRANCH}/{IDX}\n")

    build_vrm(str(base / "raw" / "dssc" / FRANCH / f"{IDX}.vrm"))
    return str(root)


@pytest.mark.slow
def test_generate_then_measure(bench_tree, tmp_path):
    from panic3d_tpu.eval import generate, measure

    out = str(tmp_path / "evalout")
    generate.main([
        "--tiny", "--data", bench_tree, "--out", out, "--skip-rmline",
        # random init has no real surface: drop cull filters + lower level
        "--mesh-res", "24", "--level", "0.17", "--no-filters",
    ])

    # file layout contract (generate.py:132-148 of the reference)
    base = os.path.join(out, "daredemoE")
    assert os.path.isfile(
        os.path.join(base, "marching_cubes", FRANCH, IDX, "front.pkl"))
    for view in ("front", "left", "right", "back"):
        assert os.path.isfile(os.path.join(base, "ortho", FRANCH, IDX, f"{view}.png"))
        assert os.path.isfile(
            os.path.join(base, "ortho_xyza", FRANCH, IDX, f"{view}.png"))
    spins = os.listdir(os.path.join(base, "rgb60", FRANCH, IDX))
    assert len(spins) == 12

    ans2d, ans3d = measure.main(
        ["--data", bench_tree, "--out", out, "--allow-random-metrics"]
    )
    for subset in ("front", "back", "360"):
        for metric in ("clip", "lpips", "psnr"):
            v = np.mean(ans2d[subset][metric])
            assert np.isfinite(v), (subset, metric)
    assert np.isfinite(np.mean(ans3d["cd"]))
