"""Convert checkpoints between the reference PyTorch format and Orbax.

Forward (torch -> Orbax): import a reference .pth into a run directory that
train.checkpoint.CheckpointManager restores (optimizer state fresh, step 0),
so training can fine-tune from reference weights and cli.eval can load it
like any native run:

    python -m mrfp_tpu.cli.convert --pth save_model_MRFP_actuallatest.pth \
        --out runs/imported/ckpt [--trunk resnet-50 --variant D16]

Reverse (Orbax -> torch): export a natively trained run back into the exact
on-disk container main.py:867-868 writes ({'epoch','state_dict'}, keys
'module.'-prefixed), loadable by the reference's
model.load_state_dict(checkpoint['state_dict']) with strict keys
(main.py:884-886) — TPU-trained models can be evaluated/served by the
existing reference tooling:

    python -m mrfp_tpu.cli.convert --run runs/exp/ckpt --out model.pth \
        [--trunk resnet-50 --variant D16]
"""

from __future__ import annotations

import argparse
import logging

import jax
import jax.numpy as jnp


def parse_args():
    p = argparse.ArgumentParser()
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--pth", help="reference .pth to import (torch -> Orbax)")
    src.add_argument("--run", help="Orbax checkpoint dir to export "
                                   "(Orbax -> torch .pth)")
    p.add_argument("--out", required=True,
                   help="output: Orbax dir (--pth) or .pth file (--run)")
    p.add_argument("--trunk", default="resnet-50")
    p.add_argument("--variant", default="D16")
    return p.parse_args()


def _import_pth(args):
    from mrfp_tpu.core.config import Config
    from mrfp_tpu.models import MRFP
    from mrfp_tpu.perturb import oc_init
    from mrfp_tpu.train import create_train_state
    from mrfp_tpu.train.checkpoint import CheckpointManager
    from mrfp_tpu.train.import_torch import load_torch_checkpoint

    model = MRFP(trunk=args.trunk, variant=args.variant)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3)), train=False)
    params, stats, oc, report = load_torch_checkpoint(args.pth, variables,
                                                      verbose=True)
    logging.info("imported %d tensors (%d skipped)", report["loaded"],
                 len(report["skipped"]))

    state = create_train_state(model, Config().train, (1, 64, 64, 3),
                               oc_params=oc or oc_init(jax.random.PRNGKey(1)))
    state = state.replace(
        params=jax.tree_util.tree_map(jnp.asarray, params),
        batch_stats=jax.tree_util.tree_map(jnp.asarray, stats))
    mgr = CheckpointManager(args.out)
    mgr.save(state)
    mgr.wait()
    mgr.close()
    logging.info("wrote Orbax checkpoint (step %d) to %s",
                 int(state.step), args.out)


def _export_pth(args):
    from mrfp_tpu.core.config import Config
    from mrfp_tpu.models import MRFP
    from mrfp_tpu.perturb import oc_init
    from mrfp_tpu.train import create_train_state
    from mrfp_tpu.train.checkpoint import CheckpointManager
    from mrfp_tpu.train.export_torch import save_torch_checkpoint

    model = MRFP(trunk=args.trunk, variant=args.variant)
    mgr = CheckpointManager(args.run)
    # MRFP+/MRFP runs carry OC params in the state; baseline runs store None
    state, errors = None, []
    for oc in (oc_init(jax.random.PRNGKey(1)), None):
        template = create_train_state(model, Config().train, (1, 64, 64, 3),
                                      oc_params=oc)
        try:
            state = mgr.restore(template)
            break
        except Exception as e:  # structure mismatch, corruption, IO...
            errors.append(f"{'mrfp+' if oc else 'baseline'} template: "
                          f"{type(e).__name__}: {e}")
    mgr.close()
    if state is None:
        raise FileNotFoundError(
            f"no restorable checkpoint under {args.run}; attempts:\n"
            + "\n".join(errors))
    n = save_torch_checkpoint(args.out, state.params, state.batch_stats,
                              state.oc_params, epoch=int(state.step))
    logging.info("wrote reference-format checkpoint (%d tensors, step %d) "
                 "to %s", n, int(state.step), args.out)


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO)
    if args.pth:
        _import_pth(args)
    else:
        _export_pth(args)


if __name__ == "__main__":
    main()
