"""Perturbation gate semantics (deepv3.py:290-357): each gate toggles exactly
its own effect; all-off equals the unperturbed train forward."""

import numpy as np
import jax
import jax.numpy as jnp

from mrfp_tpu.models import MRFP, PerturbArgs
from mrfp_tpu.perturb import oc_init


def _setup():
    model = MRFP(trunk="resnet-18", variant="D32", hrfp_plus=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3)),
                    jnp.float32)
    vs = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    oc = oc_init(jax.random.PRNGKey(1))
    return model, x, vs, oc


def _fwd(model, vs, x, pa):
    out, _ = model.apply(vs, x, train=True, perturb=pa,
                         mutable=["batch_stats"])
    return np.asarray(out["logits"])


def _pa(oc, o=False, n=False, d=False):
    return PerturbArgs(gate_oc=jnp.array(o), gate_np=jnp.array(n),
                       gate_dec=jnp.array(d),
                       key_np0=jax.random.PRNGKey(2),
                       key_np1=jax.random.PRNGKey(3), oc_params=oc)


def test_all_gates_off_equals_plain():
    model, x, vs, oc = _setup()
    plain = _fwd(model, vs, x, None)
    gated = _fwd(model, vs, x, _pa(oc))
    np.testing.assert_allclose(gated, plain, atol=1e-5, rtol=1e-5)


def test_each_gate_changes_output():
    model, x, vs, oc = _setup()
    base = _fwd(model, vs, x, _pa(oc))
    for kw in ({"o": True}, {"n": True}, {"d": True}):
        out = _fwd(model, vs, x, _pa(oc, **kw))
        assert not np.allclose(out, base, atol=1e-4), f"gate {kw} had no effect"


def test_eval_ignores_perturb():
    model, x, vs, oc = _setup()
    e1 = model.apply(vs, x, train=False, mutable=False)["logits"]
    e2 = model.apply(vs, x, train=False, perturb=_pa(oc, o=True, n=True, d=True),
                     mutable=False)["logits"]
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_commuted_final2_identity():
    """The commuted dual-res form (models/mrfp.py _with_dec) is the same
    function as the reference-shaped graph: W(resize(x)+oc)+b ==
    resize(Wx+b) + (W oc + b) - b, with our align-corners bilinear."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mrfp_tpu.nn.layers import PointwiseConv
    from mrfp_tpu.ops.resize import resize_bilinear_align_corners as rz

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 32)), jnp.float32)
    oc = jnp.asarray(rng.standard_normal((2, 32, 32, 32)), jnp.float32)
    f2 = PointwiseConv(7)
    v = f2.init(jax.random.PRNGKey(1), x)
    b = v["params"]["bias"]

    direct = f2.apply(v, rz(x, (32, 32)) + oc)
    commuted = rz(f2.apply(v, x), (32, 32)) + f2.apply(v, oc) - b
    np.testing.assert_allclose(commuted, direct, rtol=2e-5, atol=2e-5)
