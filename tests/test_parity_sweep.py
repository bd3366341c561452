"""Five-domain parity-sweep dress rehearsal (reference eval loop,
main.py:876-913): the day-1 real-data run — ``cli.eval --domains all
--parity`` off one checkpoint, reference-format per-domain table out —
rehearsed end-to-end over realistic-LAYOUT fake trees so the recipe,
shape protocol, and compile bill are known before real datasets appear.

The slow test runs the whole flow at 1/4 linear scale on CPU (the
mechanics: all five loaders resolve under one --data-root, the parity
guard passes, every domain lands in the JSON table, GTAV is the only
multi-shape bill). The __main__ driver is the full-resolution rehearsal
(native 1024x2048 / 720x1280 / 760x1280 / Mapillary->1536^2 / GTAV mixed)
that records the wall-clock + per-domain compile bill for the README
recipe — run it on the TPU when the device is free.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# full-resolution native shapes per domain (h, w); the test divides by 4.
# Cityscapes/BDD/SYNTHIA: single native val shape -> one compile each.
# Mapillary: arbitrary natives, protocol resizes to eval_size^2 -> one.
# GTAV: the one mixed-native-shape val domain -> one compile per shape.
DOMAIN_SHAPES = {
    "cityscapes": [(1024, 2048)] * 2,
    "bdd100k": [(720, 1280)] * 2,
    "synthia": [(760, 1280)] * 2,
    "mapillary": [(1800, 2400), (1500, 2100)],
    "gtav": [(1052, 1914), (1052, 1914), (1050, 1914)],
}


def _png(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def _rgb(rng, h, w):
    return rng.integers(0, 255, (h, w, 3), dtype=np.uint8)


def build_domain_trees(base: str, scale: int = 1) -> str:
    """All five val-domain trees (reference on-disk layouts) under one
    --data-root, at 1/scale linear resolution."""
    rng = np.random.default_rng(0)
    for dom, shapes in DOMAIN_SHAPES.items():
        root = os.path.join(base, dom)
        for k, (h, w) in enumerate(shapes):
            h, w = h // scale, w // scale
            if dom == "cityscapes":
                _png(f"{root}/leftImg8bit/val/city/city_{k:06d}_000019_"
                     "leftImg8bit.png", _rgb(rng, h, w))
                _png(f"{root}/gtFine/val/city/city_{k:06d}_000019_"
                     "gtFine_labelIds.png",
                     rng.integers(0, 34, (h, w)).astype(np.uint8))
            elif dom == "bdd100k":
                os.makedirs(f"{root}/images/val", exist_ok=True)
                Image.fromarray(_rgb(rng, h, w)).save(
                    f"{root}/images/val/{k:04d}.jpg")
                _png(f"{root}/labels/val/{k:04d}_train_id.png",
                     rng.integers(0, 19, (h, w)).astype(np.uint8))
            elif dom == "synthia":
                _png(f"{root}/RGB/val/{k:06d}.png", _rgb(rng, h, w))
                _png(f"{root}/GT/LABELS/val/{k:06d}.png",
                     np.stack([rng.integers(0, 23, (h, w))] * 3,
                              -1).astype(np.uint8))
            elif dom == "mapillary":
                os.makedirs(f"{root}/validation/images", exist_ok=True)
                Image.fromarray(_rgb(rng, h, w)).save(
                    f"{root}/validation/images/{k:04d}.jpg")
                _png(f"{root}/validation/labels/{k:04d}.png",
                     rng.integers(0, 66, (h, w)).astype(np.uint8))
            elif dom == "gtav":
                _png(f"{root}/images/test/{k:05d}.png", _rgb(rng, h, w))
                _png(f"{root}/labels/test/{k:05d}.png",
                     rng.integers(0, 35, (h, w)).astype(np.uint8))
    return base


def _cli_env(platform="cpu"):
    env = dict(os.environ)
    if platform is not None:
        env["JAX_PLATFORMS"] = platform
        env.pop("PALLAS_AXON_POOL_IPS", None)  # see parallel/dryrun.py
    pp = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = REPO + (os.pathsep + pp if pp else "")
    return env


def run_sweep(data_root, json_out, trunk="resnet-18", variant="D32",
              eval_size=384, ckpt=None, platform="cpu", timeout=7200):
    """The day-1 recipe: one checkpoint, all five domains, parity protocol.
    Returns (results dict, wall seconds)."""
    args = [sys.executable, "-m", "mrfp_tpu.cli.eval", "--domains", "all",
            "--data-root", data_root, "--trunk", trunk, "--variant", variant,
            "--eval-size", str(eval_size), "--parity",
            "--json-out", json_out]
    if ckpt:
        args += ["--ckpt", ckpt]
    t0 = time.time()
    proc = subprocess.run(args, env=_cli_env(platform), capture_output=True,
                          text=True, timeout=timeout)
    wall = time.time() - t0
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    return json.load(open(json_out)), wall


def shape_census(data_root, eval_size=384, platform="cpu", json_out=None):
    json_out = json_out or os.path.join(data_root, "census.json")
    proc = subprocess.run(
        [sys.executable, "-m", "mrfp_tpu.cli.shape_census", "--data-root",
         data_root, "--eval-size", str(eval_size), "--domains", "cityscapes",
         "bdd100k", "synthia", "mapillary", "gtav", "--json-out", json_out],
        env=_cli_env(platform), capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    return json.load(open(json_out))


@pytest.mark.slow
def test_five_domain_parity_sweep_rehearsal(tmp_path):
    root = build_domain_trees(str(tmp_path / "data"), scale=4)
    census = shape_census(root)
    # the protocol's compile bill: one shape per single-shape domain,
    # Mapillary always eval_size^2, GTAV = its native shape count
    assert census["cityscapes"]["distinct_shapes"] == 1
    assert census["bdd100k"]["distinct_shapes"] == 1
    assert census["synthia"]["distinct_shapes"] == 1
    assert census["mapillary"]["distinct_shapes"] == 1
    assert census["gtav"]["distinct_shapes"] == 2
    res, wall = run_sweep(root, str(tmp_path / "table.json"))
    assert sorted(res) == ["bdd100k", "cityscapes", "gtav", "mapillary",
                           "synthia"]
    for dom, m in res.items():
        assert set(m) >= {"mean_iu", "acc", "fwavacc"}, (dom, m)
        assert 0.0 <= m["mean_iu"] <= 1.0


if __name__ == "__main__":
    # Full-resolution rehearsal: python test_parity_sweep.py <workdir>
    #   [trunk] [variant] [ckpt]
    # Platform comes from the env (TPU when JAX_PLATFORMS is unset/axon).
    work = sys.argv[1]
    trunk = sys.argv[2] if len(sys.argv) > 2 else "resnet-50"
    variant = sys.argv[3] if len(sys.argv) > 3 else "D16"
    ckpt = sys.argv[4] if len(sys.argv) > 4 else None
    platform = os.environ.get("JAX_PLATFORMS") or None
    root = os.path.join(work, "data")
    if not os.path.isdir(root):
        build_domain_trees(root, scale=1)
    census = shape_census(root, eval_size=1536, platform=platform)
    print("shape census:", json.dumps(census), flush=True)
    res, wall = run_sweep(root, os.path.join(work, "table.json"),
                          trunk=trunk, variant=variant, eval_size=1536,
                          ckpt=ckpt, platform=platform, timeout=4 * 3600)
    n_imgs = sum(len(v) for v in DOMAIN_SHAPES.values())
    out = {"trunk": trunk, "variant": variant, "ckpt": ckpt or "random-init",
           "census": {d: c["distinct_shapes"] for d, c in census.items()},
           "results": res, "wall_s": round(wall, 1), "n_images": n_imgs,
           "platform": platform or "tpu"}
    with open(os.path.join(work, "rehearsal.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
