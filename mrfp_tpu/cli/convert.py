"""Convert a reference PyTorch checkpoint to an Orbax run directory.

    python -m mrfp_tpu.cli.convert --pth save_model_MRFP_actuallatest.pth \
        --out runs/imported/ckpt [--trunk resnet-50 --variant D16]

The resulting directory restores through train.checkpoint.CheckpointManager
(optimizer state fresh, step 0) so training can fine-tune from reference
weights and cli.eval can load it like any native run.
"""

from __future__ import annotations

import argparse
import logging

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--trunk", default="resnet-50")
    p.add_argument("--variant", default="D16")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

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


if __name__ == "__main__":
    main()
