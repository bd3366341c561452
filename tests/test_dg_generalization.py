"""Domain-generalization proof through the REAL CLIs: the reference's
scientific claim (feature perturbation improves zero-shot transfer to an
unseen visual domain, README.md:5-27 / the MRFP paper's GTAV->Cityscapes
table) compressed into a sandbox-executable experiment.

Protocol (tests/synthetic_task.py build_dg_tree): a cue-conflict task —
class = TEXTURE (style-invariant, present in both domains) plus a
class-correlated INK-HUE shortcut that holds in ~75% of source images and
NEVER in the target (random hues there, plus a cool/dim paper covariate
shift). Train on source with NO color jitter (isolating the model-level
mechanism), evaluate zero-shot on target through the real CLIs — the
reference's train->eval protocol (main.py:844-913) executed end-to-end.

Assertions (calibrated, see CLAUDE.md round-3 notes): both arms learn the
SOURCE domain (capacity sanity) and both RETAIN most of it zero-shot on
TARGET (the transfer protocol executes; perturbation does not break it).
The test deliberately does NOT assert an MRFP+-over-baseline margin: four
calibrated task designs (CLAUDE.md "DG-task design space") all show the
sandbox-scale margin is not structural — at 300 steps the perturbation
acts as a pure regularizer (~0.05 lower in-domain, equal retention),
because synthetic texture cues are strong enough that a plain CNN never
shortcuts hard enough to collapse. The margin question belongs to the
full-budget multi-seed driver (__main__, TPU), whose measured numbers are
recorded in PARITY.md.

The default slow test runs a small CPU version; MRFP_DG_FULL=1 runs the
full-budget version (minutes on TPU through the same code path).
"""

import glob
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from synthetic_task import DG_STYLES, _dg_sample, _texture_mask, build_dg_tree

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FULL = os.environ.get("MRFP_DG_FULL", "") == "1"


def _cli_env(platform="cpu"):
    env = dict(os.environ)
    if platform is not None:
        env["JAX_PLATFORMS"] = platform
        env.pop("PALLAS_AXON_POOL_IPS", None)  # see parallel/dryrun.py
    pp = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = REPO + (os.pathsep + pp if pp else "")
    return env


def _run(args, timeout=7200, platform="cpu"):
    proc = subprocess.run([sys.executable, "-m"] + args,
                          env=_cli_env(platform), capture_output=True,
                          text=True, timeout=timeout)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    return proc.stdout + proc.stderr


# Zoo (RobustNet) arms: the ISW objective this validates is the zoo
# subsystem's reason to exist (reference network/deepv3.py:561-568, the ISW
# row of Table 1). 'zoo-plain' is the matched control: same DeepV3Plus
# arch + DSN head, whitening plan off — so the measured margin isolates the
# ISW whitening loss, not the arch change vs the MRFP baseline arm. The
# training pipeline stays jitter-free like the MRFP arms (isolating the
# model-level mechanism); ISW's covstat phase supplies its own photometric
# view pairs (cli/train_zoo.py build_view_pairs fallback).
ZOO_ARMS = {
    "zoo-isw": ["--wt-layer", "0", "0", "2", "2", "2", "0", "0",
                "--use-wtloss"],
    "zoo-plain": ["--wt-layer", "0", "0", "0", "0", "0", "0", "0"],
}


def train_arm(src_tree, runs_dir, mode, steps, crop, lr="1e-2",
              platform="cpu", seed=0, trunk="resnet-18", variant="D32"):
    """Train one arm on the source tree; returns its checkpoint dir."""
    # TPU full-budget mode checkpoints every 25 steps: on 2026-08-19 the
    # axon tunnel wedged every ~10-100 executed steps for hours, and any
    # cadence coarser than the typical healthy window accrues ZERO progress
    # across watchdog-restart cycles (each relaunch auto-resumes from the
    # last checkpoint). Orbax saves are async (~4% overhead at this rate).
    ckpt_every = 25 if platform is None else min(steps, 500)
    if mode in ZOO_ARMS:
        head = ["mrfp_tpu.cli.train_zoo"] + ZOO_ARMS[mode]
    else:
        head = ["mrfp_tpu.cli.train", "--mode", mode]
    args = head + ["--source", "gtav", "--data-root", src_tree,
            "--trunk", trunk, "--variant", variant,
            "--batch-size", "8", "--crop-size", str(crop),
            "--max-iter", str(steps), "--lr", lr, "--seed", str(seed),
            "--no-color-jitter", "--no-gaussian-blur",
            "--scale-range", "1.0", "1.0",
            "--ckpt-every", str(ckpt_every),
            "--log-every", "100", "--runs-dir", runs_dir]
    if platform is None:
        # detect a wedged execute in minutes (exit 75) so a supervising
        # retry loop can relaunch; auto-resume + the checkpoint cadence
        # bound the lost work (utils/watchdog.py). The tight first-beat
        # window is safe because the retry loop's first successful attempt
        # leaves the compiled program in the persistent compile cache — a
        # later relaunch that can't produce step 1 inside 1200 s is wedged,
        # not compiling (the crop-256 fresh compile itself fits: ~7 min
        # through the tunnel, CLAUDE.md 15:19-15:26 window).
        args += ["--step-timeout", "600", "--first-beat-timeout", "1200",
                 # bank EVERY healthy window: sync every 10 steps, keep a
                 # host snapshot every 5, and let the watchdog checkpoint
                 # it on fire — a window that executes only 8-15 steps
                 # (2026-08-19 wedge cadence) still makes net progress
                 "--log-every", "10", "--snapshot-every", "5"]
    # a CPU full-budget arm is slow but UNBOUNDED-safe (no watchdog): size
    # the subprocess timeout to the step budget (a 2000-step CPU arm at
    # ~10 s/step plus a ~40-min XLA CPU compile blows the old flat 7200 s);
    # TPU arms stay tightly bounded — the watchdog exits 75 long before.
    timeout = 7200 if platform is None else max(7200, 30 * steps + 3600)
    _run(args, platform=platform, timeout=timeout)
    ckpts = glob.glob(os.path.join(runs_dir, "*", "ckpt"))
    assert len(ckpts) == 1, ckpts
    return ckpts[0]


def eval_arm(ckpt, tree, json_path, platform="cpu", mode="baseline",
             trunk="resnet-18", variant="D32"):
    """Zero-shot eval of a checkpoint on a DG tree's test split.

    An existing ``json_path`` is reused: the full-budget driver is rerun
    by a retry loop after every device wedge, and completed arms' evals
    must not be re-paid (minutes of TPU time each) on every relaunch."""
    if not os.path.exists(json_path):
        zoo = []
        if mode in ZOO_ARMS:
            # an explicit --wt-layer selects the zoo model/restore path in
            # cli.eval (all-zero plans included)
            zoo = [a for a in ZOO_ARMS[mode] if a != "--use-wtloss"]
        _run(["mrfp_tpu.cli.eval", "--ckpt", ckpt, "--trunk", trunk,
              "--variant", variant, "--domains", "gtav", "--data-root", tree,
              "--json-out", json_path] + zoo, platform=platform)
    return json.load(open(json_path))["gtav"]


def run_dg_experiment(workdir, steps, crop=96, block=32, hw=256,
                      n_train=64, n_val=8, platform="cpu",
                      modes=("mrfp+", "baseline"), seed=0,
                      trunk="resnet-18", variant="D32"):
    src = build_dg_tree(os.path.join(workdir, "src"), "source",
                        n_train=n_train, n_val=n_val, hw=hw, block=block)
    tgt = build_dg_tree(os.path.join(workdir, "tgt"), "target",
                        n_train=1, n_val=n_val, hw=hw, block=block)
    out = {}
    for mode in modes:
        tag = f"{mode}_s{seed}" if seed else mode
        ckpt = train_arm(src, os.path.join(workdir, f"runs_{tag}"),
                         mode, steps, crop, platform=platform, seed=seed,
                         trunk=trunk, variant=variant)
        out[mode] = {
            "source": eval_arm(ckpt, src,
                               os.path.join(workdir, f"{tag}_src.json"),
                               platform=platform, mode=mode,
                               trunk=trunk, variant=variant),
            "target": eval_arm(ckpt, tgt,
                               os.path.join(workdir, f"{tag}_tgt.json"),
                               platform=platform, mode=mode,
                               trunk=trunk, variant=variant),
        }
    return out


def _rgb_hue(rgb):
    """Hue in [0,1) of an (r,g,b) float triple (HSV convention)."""
    r, g, b = rgb
    mx, mn = max(rgb), min(rgb)
    if mx - mn < 1e-6:
        return 0.0
    if mx == r:
        h = ((g - b) / (mx - mn)) % 6.0
    elif mx == g:
        h = (b - r) / (mx - mn) + 2.0
    else:
        h = (r - g) / (mx - mn) + 4.0
    return h / 6.0


def _hue_dist(a, b):
    d = abs(a - b) % 1.0
    return min(d, 1.0 - d)


def _class_hue_alignment(img, lab, ink):
    """Mean wheel distance of each class's ink hue to its LUT hue k/19."""
    dists = []
    for k in np.unique(lab):
        sel = ink & (lab == k)
        if sel.sum() < 100:
            continue
        dists.append(_hue_dist(_rgb_hue(img[sel].mean(0) / 255.0), k / 19.0))
    return float(np.mean(dists))


def test_dg_task_structure():
    """Fast, deterministic guard on the DG generator's cue-conflict
    contract: the texture cue is domain-invariant; the class->ink-hue
    shortcut holds in ~75% of source images and in NO target image; the
    paper style is a covariate shift that preserves ink-darker-than-paper."""
    hw, block = 256, 32
    n = 40
    align = {"source": [], "target": []}
    paper_means, gap = {}, {}
    for dom in ("source", "target"):
        rng = np.random.default_rng(7)
        imgs, labs = zip(*(_dg_sample(rng, hw, block, DG_STYLES[dom])
                           for _ in range(n)))
        # same rng stream -> identical class layouts across domains (the
        # texture cue is bit-identical; only photometry differs)
        if dom == "source":
            src_labs = labs
        else:
            assert all((a == b).all() for a, b in zip(src_labs, labs))
        inks = [_texture_mask(l.astype(np.int64), hw) for l in labs]
        assert 0.2 < np.mean([m.mean() for m in inks]) < 0.8
        align[dom] = [_class_hue_alignment(i, l, m)
                      for i, l, m in zip(imgs, labs, inks)]
        paper_means[dom] = np.mean([i[~m].mean() for i, m in zip(imgs, inks)])
        gap[dom] = np.mean([i[~m].mean() - i[m].mean()
                            for i, m in zip(imgs, inks)])
    # source: ~75% of images carry the shortcut (hue aligned to k/19),
    # ~25% are scrambled — texture is the only complete cue
    aligned = np.asarray(align["source"]) < 0.05
    assert 0.55 <= aligned.mean() <= 0.92, align["source"]
    # target: the shortcut NEVER holds (random hues ~ mean wheel dist 0.25)
    assert min(align["target"]) > 0.08, align["target"]
    assert np.mean(align["target"]) > 0.17
    # covariate shift: cool/dim paper, but ink stays darker than paper
    assert paper_means["source"] > paper_means["target"] + 20
    assert gap["source"] > 40 and gap["target"] > 25


@pytest.mark.slow
def test_dg_protocol_transfers_across_style_shift(tmp_path):
    """Calibration (300 CPU steps, 2026-08-19): baseline 0.433 src / 0.322
    tgt, MRFP+ 0.389 / 0.275 — thresholds carry ~0.08-0.10 headroom.
    The env-gated FULL (2000-step) thresholds are provisional: source can
    only improve on a 64-image memorizable set; the target floor stays at
    the 300-step level in case longer source training overfits the source
    style."""
    steps = 2000 if FULL else 300
    res = run_dg_experiment(str(tmp_path), steps)
    m, b = res["mrfp+"], res["baseline"]
    # capacity sanity: both arms learn the source domain
    assert m["source"]["mean_iu"] >= (0.50 if FULL else 0.30), res
    assert b["source"]["mean_iu"] >= (0.50 if FULL else 0.30), res
    # zero-shot transfer executes and retains: the perturbation-trained
    # model must hold up on the unseen style (and not be broken BY the
    # perturbation) — chance is ~0.03
    assert m["target"]["mean_iu"] >= (0.25 if FULL else 0.18), res
    assert b["target"]["mean_iu"] >= (0.25 if FULL else 0.18), res


if __name__ == "__main__":
    # full-budget multi-seed run (TPU: inherits JAX_PLATFORMS from the env):
    #   python test_dg_generalization.py <workdir> [steps] [seeds] [arms] \
    #       [trunk] [variant]
    # arms: comma list of mrfp+, baseline, zoo-isw, zoo-plain
    import tempfile
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="dg_experiment_")
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    seeds = [int(s) for s in sys.argv[3].split(",")] if len(sys.argv) > 3 \
        else [0, 1, 2]
    arms = tuple(sys.argv[4].split(",")) if len(sys.argv) > 4 \
        else ("mrfp+", "baseline")
    trunk = sys.argv[5] if len(sys.argv) > 5 else "resnet-18"
    variant = sys.argv[6] if len(sys.argv) > 6 else "D32"
    res = {}
    for seed in seeds:
        res[seed] = run_dg_experiment(
            workdir, steps, crop=256, block=64, hw=256,
            n_train=200, n_val=16, platform=None, seed=seed,
            modes=arms, trunk=trunk, variant=variant)
        print(f"seed {seed}:", json.dumps(res[seed]), flush=True)
        with open(os.path.join(workdir, "summary.json"), "w") as f:
            json.dump(res, f, indent=1)
    for mode in arms:
        for dom in ("source", "target"):
            v = [res[s][mode][dom]["mean_iu"] for s in seeds]
            print(f"{mode:9s} {dom:7s} mIoU "
                  f"{np.mean(v):.3f} +- {np.std(v):.3f}  {v}")
