"""Norm layers vs torch oracles: BatchNorm (train+eval+running stats),
InstanceNorm, and SwitchWhiten2d (Newton-Schulz whitening math of
network/sync_switchwhiten.py at world size 1)."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from mrfp_tpu.nn.norms import BatchNorm, InstanceNorm, SwitchWhiten2d


def _nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def test_batchnorm_train_and_running_stats():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 6, 6, 16)).astype(np.float32) * 2 + 1
    bn = BatchNorm(16)
    vs = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), True)
    # two train steps, then eval
    stats = vs["batch_stats"]
    t = torch.nn.BatchNorm2d(16, eps=1e-5, momentum=0.1)
    for i in range(2):
        xi = (x + i).astype(np.float32)
        out, mut = bn.apply({"params": vs["params"], "batch_stats": stats},
                            jnp.asarray(xi), True, mutable=["batch_stats"])
        stats = mut["batch_stats"]
        ref = t(torch.from_numpy(np.transpose(xi, (0, 3, 1, 2)).copy()))
        np.testing.assert_allclose(np.asarray(out), _nhwc(ref.detach().numpy()),
                                   atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(stats["mean"]),
                               t.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats["var"]),
                               t.running_var.numpy(), atol=1e-5, rtol=1e-5)
    t.eval()
    xe = (x * 0.5).astype(np.float32)
    out = bn.apply({"params": vs["params"], "batch_stats": stats},
                   jnp.asarray(xe), False)
    ref = t(torch.from_numpy(np.transpose(xe, (0, 3, 1, 2)).copy()))
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref.detach().numpy()),
                               atol=1e-5, rtol=1e-4)


def test_instance_norm_affine_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 5, 7, 8)).astype(np.float32)
    m = InstanceNorm(8, affine=True)
    vs = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = dict(vs["params"])
    params["scale"] = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    params["bias"] = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    out = m.apply({"params": params}, jnp.asarray(x))
    ref = torch.nn.functional.instance_norm(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()),
        weight=torch.from_numpy(np.asarray(params["scale"]).copy()),
        bias=torch.from_numpy(np.asarray(params["bias"]).copy()), eps=1e-5)
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref.numpy()),
                               atol=1e-5, rtol=1e-4)


def _torch_switch_whiten(x, mean_w, var_w, weight, bias, run_mean, run_cov,
                         training, num_pergroup=16, T=5, eps=1e-5,
                         momentum=0.99):
    """Oracle of the documented SyncSwitchWhiten2d math (sw_type=2, world 1)."""
    N, C, H, W = x.shape
    c, g = num_pergroup, C // num_pergroup
    xt = x.transpose(0, 1).contiguous().view(g, c, -1)
    if training:
        mean_bn = xt.mean(-1, keepdim=True)
        xc = xt - mean_bn
        cov_bn = torch.bmm(xc, xc.transpose(1, 2)) / xt.shape[-1]
    else:
        mean_bn, cov_bn = run_mean, run_cov
    mean_bn = mean_bn.view(1, g, c, 1).expand(N, g, c, 1).reshape(N * g, c, 1)
    cov_bn = cov_bn.view(1, g, c, c).expand(N, g, c, c).reshape(N * g, c, c)
    xin = x.view(N * g, c, -1)
    mean_in = xin.mean(-1, keepdim=True)
    xi = xin - mean_in
    cov_in = torch.bmm(xi, xi.transpose(1, 2)) / (H * W)
    mw = torch.softmax(mean_w, 0)
    vw = torch.softmax(var_w, 0)
    eye = torch.eye(c).expand(N * g, c, c)
    mean = mw[0] * mean_bn + mw[1] * mean_in
    cov = vw[0] * cov_bn + vw[1] * cov_in + eps * eye
    P = torch.eye(c).expand(N * g, c, c).clone()
    rTr = 1.0 / (cov * torch.eye(c)).sum((1, 2), keepdim=True)
    cov_n = cov * rTr
    for _ in range(T):
        P = 1.5 * P - 0.5 * torch.matmul(torch.matrix_power(P, 3), cov_n)
    wm = P * rTr.sqrt()
    xh = torch.bmm(wm, xin - mean).view(N, C, H, W)
    return xh * weight.view(1, C, 1, 1) + bias.view(1, C, 1, 1)


def test_switch_whiten_matches_oracle_train_and_eval():
    rng = np.random.default_rng(2)
    N, H, W, C = 2, 6, 6, 32
    x = rng.standard_normal((N, H, W, C)).astype(np.float32)
    m = SwitchWhiten2d(C, num_pergroup=16, sw_type=2, T=5)
    vs = m.init(jax.random.PRNGKey(0), jnp.asarray(x), True)
    params = {k: jnp.asarray(rng.standard_normal(np.shape(v)).astype(np.float32)
                             * 0.3 + np.asarray(v))
              for k, v in vs["params"].items()}

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    args = dict(
        mean_w=torch.from_numpy(np.asarray(params["sw_mean_weight"]).copy()),
        var_w=torch.from_numpy(np.asarray(params["sw_var_weight"]).copy()),
        weight=torch.from_numpy(np.asarray(params["scale"]).copy()),
        bias=torch.from_numpy(np.asarray(params["bias"]).copy()),
        run_mean=torch.from_numpy(np.asarray(
            vs["batch_stats"]["running_mean"]).copy()),
        run_cov=torch.from_numpy(np.asarray(
            vs["batch_stats"]["running_cov"]).copy()),
    )
    # train mode
    out, mut = m.apply({"params": params, "batch_stats": vs["batch_stats"]},
                       jnp.asarray(x), True, mutable=["batch_stats"])
    ref = _torch_switch_whiten(xt, training=True, **args)
    np.testing.assert_allclose(np.asarray(out), _nhwc(ref.numpy()),
                               atol=2e-4, rtol=1e-3)
    # running stats updated with momentum .99 (sync_switchwhiten.py:28-31)
    rm = np.asarray(mut["batch_stats"]["running_mean"])
    xt_g = xt.transpose(0, 1).contiguous().view(C // 16, 16, -1)
    exp_rm = 0.99 * args["run_mean"].numpy() + \
        0.01 * xt_g.mean(-1, keepdim=True).numpy()
    np.testing.assert_allclose(rm, exp_rm, atol=1e-5, rtol=1e-4)
    # eval mode uses running stats
    out_e = m.apply({"params": params, "batch_stats": mut["batch_stats"]},
                    jnp.asarray(x), False)
    ref_e = _torch_switch_whiten(
        xt, training=False,
        mean_w=args["mean_w"], var_w=args["var_w"], weight=args["weight"],
        bias=args["bias"],
        run_mean=torch.from_numpy(np.asarray(
            mut["batch_stats"]["running_mean"]).copy()),
        run_cov=torch.from_numpy(np.asarray(
            mut["batch_stats"]["running_cov"]).copy()))
    np.testing.assert_allclose(np.asarray(out_e), _nhwc(ref_e.numpy()),
                               atol=2e-4, rtol=1e-3)
