"""Synthetic adverse-weather corruptions (data/weather.py): the executable
analog of the reference's Foggy/Rainy Cityscapes protocol (main.py:146-341,
Table 2 — the rendered datasets bake the weather into the images; here it
is applied at eval time, parameterized by severity)."""

import numpy as np
import pytest

from mrfp_tpu.data.weather import (CorruptedDataset, apply_fog, apply_rain)


def _img(seed=0, hw=96):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (hw, hw, 3)).astype(np.uint8)


def test_severity_zero_is_identity():
    x = _img()
    assert apply_fog(x, 0) is x
    assert apply_rain(x, 0) is x


def test_fog_reduces_contrast_monotonically():
    """Fog is an alpha blend toward airlight: per-image std (contrast) must
    fall monotonically with severity, mean must move toward the airlight."""
    x = _img()
    stds = [float(np.std(apply_fog(x, s).astype(np.float32)))
            for s in range(5)]
    assert all(a > b for a, b in zip(stds, stds[1:])), stds
    # the veil brightens a mid-gray scene (airlight >= 170)
    assert apply_fog(x, 4).mean() > x.mean()


def test_fog_preserves_luminance_direction():
    """'Luminance-preserving': airlight comes from the image's own bright
    tail, so a bright scene fogs toward its own light level rather than
    gray-crushing below it."""
    bright = np.full((64, 64, 3), 220, np.uint8)
    out = apply_fog(bright, 3).astype(np.float32)
    assert abs(out.mean() - 220.0) < 12.0


def test_rain_adds_bright_streaks_monotonically():
    """Streak coverage (pixels pushed up toward 235) grows with severity."""
    x = np.full((128, 128, 3), 60, np.uint8)
    frac = []
    for s in range(1, 5):
        out = apply_rain(x, s).astype(np.float32)
        frac.append(float((out.mean(-1) > 120).mean()))
    assert all(a < b for a, b in zip(frac, frac[1:])), frac
    assert frac[0] > 0.0


def test_corruptions_deterministic_and_dtype_stable():
    x = _img(3)
    for fn in (apply_fog, apply_rain):
        a, b = fn(x, 2, seed=5), fn(x, 2, seed=5)
        np.testing.assert_array_equal(a, b)
        assert a.dtype == np.uint8 and a.shape == x.shape
        assert not np.array_equal(a, fn(x, 2, seed=6))
    xf = x.astype(np.float32)
    assert apply_fog(xf, 2).dtype == np.float32


def test_corrupted_dataset_wraps_labels_untouched():
    class DS:
        name = "gtav"

        def __len__(self):
            return 3

        def __getitem__(self, i):
            return {"image": _img(i), "label": np.full((96, 96), i, np.uint8)}

    ds = CorruptedDataset(DS(), "fog", 3)
    assert len(ds) == 3 and ds.name == "gtav_fog3"
    s0a, s0b = ds[0], ds[0]
    np.testing.assert_array_equal(s0a["image"], s0b["image"])  # per-index det
    np.testing.assert_array_equal(s0a["label"], np.zeros((96, 96), np.uint8))
    assert not np.array_equal(s0a["image"], ds[1]["image"])
    with pytest.raises(ValueError, match="unknown corruption"):
        CorruptedDataset(DS(), "snow", 1)
    with pytest.raises(ValueError, match="severity"):
        CorruptedDataset(DS(), "fog", 9)


@pytest.mark.slow
def test_eval_cli_corrupt_smoke(tmp_path):
    """cli.eval --corrupt end-to-end (subprocess): the corrupted sweep must
    run and produce a different histogram than the clean one at a severity
    that visibly perturbs the input (round-3 lesson: every new CLI surface
    gets a subprocess smoke test)."""
    import json
    import subprocess
    import sys

    env = dict(__import__("os").environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # see parallel/dryrun.py
    import os as _os
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    pp = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = repo + (_os.pathsep + pp if pp else "")
    base = ["python", "-m", "mrfp_tpu.cli.eval", "--synthetic",
            "--synthetic-hw", "64", "96", "--domains", "gtav",
            "--trunk", "resnet-18", "--variant", "D32", "--max-images", "2"]
    outs = {}
    for tag, extra in (("clean", []),
                       ("fog", ["--corrupt", "fog", "--severity", "4"])):
        jp = str(tmp_path / f"{tag}.json")
        proc = subprocess.run(
            base + extra + ["--json-out", jp], env=env,
            capture_output=True, text=True, timeout=900)
        assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
        outs[tag] = json.load(open(jp))["gtav"]
    assert outs["clean"] != outs["fog"], outs


if __name__ == "__main__":
    # Severity sweep over DG-driver checkpoints (the Table 2 analog):
    #   python test_weather.py <dg_workdir> [arms] [seeds] [trunk] [variant]
    # Evals each arm's checkpoint on the SOURCE test split under
    # fog/rain x severity 1..4 through the real cli.eval (--corrupt);
    # severity 0 is the cached clean source eval the DG driver already
    # wrote. Results accumulate in <dg_workdir>/weather/summary.json.
    import json
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_dg_generalization import ZOO_ARMS, _run

    work = sys.argv[1]
    arms = sys.argv[2].split(",") if len(sys.argv) > 2 \
        else ["mrfp+", "baseline"]
    seeds = [int(s) for s in sys.argv[3].split(",")] if len(sys.argv) > 3 \
        else [0, 1, 2]
    trunk = sys.argv[4] if len(sys.argv) > 4 else "resnet-18"
    variant = sys.argv[5] if len(sys.argv) > 5 else "D32"
    platform = os.environ.get("JAX_PLATFORMS") or None

    wdir = os.path.join(work, "weather")
    os.makedirs(wdir, exist_ok=True)
    res = {}
    for mode in arms:
        for seed in seeds:
            tag = f"{mode}_s{seed}" if seed else mode
            import glob as _glob
            (ckpt,) = _glob.glob(os.path.join(work, f"runs_{tag}", "*",
                                              "ckpt"))
            clean = json.load(open(os.path.join(work, f"{tag}_src.json")))
            arm = {"clean": clean["gtav"]["mean_iu"]}
            for kind in ("fog", "rain"):
                for sev in (1, 2, 3, 4):
                    jp = os.path.join(wdir, f"{tag}_{kind}{sev}.json")
                    if not os.path.exists(jp):
                        # zoo arms: an explicit --wt-layer selects the zoo
                        # model/restore path in cli.eval (see eval_arm)
                        zoo = [a for a in ZOO_ARMS.get(mode, [])
                               if a != "--use-wtloss"]
                        _run(["mrfp_tpu.cli.eval", "--ckpt", ckpt,
                              "--trunk", trunk, "--variant", variant,
                              "--domains", "gtav",
                              "--data-root", os.path.join(work, "src"),
                              "--corrupt", kind, "--severity", str(sev),
                              "--json-out", jp] + zoo, platform=platform)
                    arm[f"{kind}{sev}"] = \
                        json.load(open(jp))["gtav"]["mean_iu"]
            res[tag] = arm
            print(tag, json.dumps(arm), flush=True)
            with open(os.path.join(wdir, "summary.json"), "w") as f:
                json.dump(res, f, indent=1)
    import numpy as _np
    for mode in arms:
        for key in ["clean"] + [f"{k}{s}" for k in ("fog", "rain")
                                for s in (1, 2, 3, 4)]:
            v = [res[f"{mode}_s{s}" if s else mode][key] for s in seeds]
            print(f"{mode:9s} {key:6s} mIoU {_np.mean(v):.3f} "
                  f"+- {_np.std(v):.3f}")
