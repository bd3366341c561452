"""Loss-curve parity: N SGD steps of our jitted train_step vs a torch
training oracle (same initial weights, same batches, perturbation gates off).

Validates end-to-end: conv/BN train-mode forward, CE with ignore_index,
gradients, coupled weight decay, momentum, and the poly LR schedule — i.e.
SURVEY.md §7 step 6 ("short-run loss-curve comparison vs PyTorch on
identical batches") without needing GPU or datasets.
"""


import numpy as np
import torch
import jax
import jax.numpy as jnp

from mrfp_tpu.core.config import baseline_config
from mrfp_tpu.models import MRFP
from mrfp_tpu.train import create_train_state, make_jitted_steps
from mrfp_tpu.train.import_torch import convert_state_dict

from torch_oracle import make_reference_state_dict, reference_train_forward

N_STEPS = 3
LR, MOM, WD, MAX_IT, POWER = 1e-2, 0.9, 5e-4, 40000, 0.9


def _torch_trainable(sd):
    """The reference's trainable set: everything except OC branch tensors and
    BN running stats (OC is requires_grad_(False), deepv3.py:221-237)."""
    out = {}
    for k, v in sd.items():
        name = k[len("module."):] if k.startswith("module.") else k
        if name.startswith("OC"):
            continue
        if name.endswith(("running_mean", "running_var", "num_batches_tracked")):
            continue
        out[k] = v
    return out


def test_three_step_loss_parity():
    sd = make_reference_state_dict(seed=3)
    rng = np.random.default_rng(7)
    batches = [(rng.standard_normal((2, 48, 48, 3)).astype(np.float32),
                rng.integers(0, 19, (2, 48, 48)).astype(np.int64))
               for _ in range(N_STEPS)]
    batches[0][1][0, :5] = 255  # exercise ignore pixels

    # ---- torch oracle training loop ----
    sd_t = {k: v.clone() for k, v in sd.items()}
    trainable = _torch_trainable(sd_t)
    for v in trainable.values():
        v.requires_grad_(True)
    opt = torch.optim.SGD(list(trainable.values()), lr=LR, momentum=MOM,
                          weight_decay=WD)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lambda it: (1 - it / MAX_IT) ** POWER)
    torch_losses = []
    for img, lbl in batches:
        x = torch.from_numpy(np.transpose(img, (0, 3, 1, 2)).copy())
        logits = reference_train_forward(sd_t, x)
        loss = torch.nn.functional.cross_entropy(
            logits, torch.from_numpy(lbl), ignore_index=255)
        opt.zero_grad()
        loss.backward()
        opt.step()
        sched.step()
        torch_losses.append(float(loss))

    # ---- our training loop ----
    cfg = baseline_config()
    model = MRFP(trunk="resnet-50", variant="D16", hrfp_plus=False)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 48, 48, 3)), train=False)
    params, stats, _oc, report = convert_state_dict(sd, variables)
    assert not report["skipped"]
    state = create_train_state(model, cfg.train, (1, 48, 48, 3))
    state = state.replace(params=jax.tree_util.tree_map(jnp.asarray, params),
                          batch_stats=jax.tree_util.tree_map(jnp.asarray, stats))
    jtrain, _ = make_jitted_steps(model, cfg, None)
    our_losses = []
    for img, lbl in batches:
        state, metrics = jtrain(state, jnp.asarray(img),
                                jnp.asarray(lbl, jnp.int32))
        our_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(our_losses, torch_losses, rtol=2e-3, atol=2e-3)
