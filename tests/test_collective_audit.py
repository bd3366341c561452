"""GSPMD collective audit of the compiled 8-device MRFP+ train step
(VERDICT round-2 item 3): what a pod actually pays per step.

Replaces, as compiler-level evidence, the reference's three NCCL uses —
DDP grad all-reduce (network/__init__.py:30-38), SyncBatchNorm stat sync
(config.py:92-93), SyncSwitchWhiten mean/cov all_reduce
(sync_switchwhiten.py:22,26,44-45). Measured profile on the audited program
(r50-D16 MRFP+, 16x64x64 batch over 8 CPU devices, recorded 2026-08-17):
136 all-reduces totaling 161.7 MB vs 161.4 MB of fp32 grads — i.e. grads +
~0.3 MB of per-BN (sum, sumsq) f32 stat tuples — and ZERO all-gather /
all-to-all / collective-permute / reduce-scatter: no activation ever
crosses the mesh, so pod scaling is pure grad+stat bandwidth on ICI.
"""

import jax
import numpy as np
import pytest

from mrfp_tpu.parallel.audit import parse_collectives, summarize


@pytest.mark.slow
def test_sharded_train_step_collective_profile():
    from mrfp_tpu.core.config import Config, MeshConfig
    from mrfp_tpu.core.mesh import create_mesh, shard_batch
    from mrfp_tpu.models import MRFP
    from mrfp_tpu.perturb import oc_init
    from mrfp_tpu.train import create_train_state, make_jitted_steps

    assert len(jax.devices()) >= 8, "conftest forces 8 CPU devices"
    cfg = Config()
    model = MRFP(trunk="resnet-50", variant="D16")
    hw, batch = 64, 16
    state = create_train_state(model, cfg.train, (1, hw, hw, 3),
                               oc_params=oc_init(jax.random.PRNGKey(1)))
    mesh = create_mesh(MeshConfig(), jax.devices()[:8])
    state = jax.device_put(state, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    rng = np.random.default_rng(0)
    imgs, lbls = shard_batch(mesh, (
        rng.standard_normal((batch, hw, hw, 3)).astype(np.float32),
        rng.integers(0, 19, (batch, hw, hw)).astype(np.int32)))
    jtrain, _ = make_jitted_steps(model, cfg, mesh)
    txt = jtrain.lower(state, imgs, lbls).compile().as_text()

    colls = parse_collectives(txt)
    s = summarize(colls)

    # 1. no activation ever crosses the mesh: a single all-gather at a BN or
    #    cond boundary would tax every one of ~53 norm layers on a pod
    for bad in ("all-gather", "all-to-all", "collective-permute"):
        assert bad not in s, (bad, s)

    # 2. everything that does cross is fp32 (stats + grads; s32 only for the
    #    CE valid-pixel count) — no silent bf16 gradient sync
    dtypes = {dt for c in colls for dt in c.dtypes}
    assert dtypes <= {"f32", "s32"}, dtypes

    # 3. total all-reduce payload ~= one fp32 grad set + small stat tuples.
    #    (reduce-scatter is an acceptable alternative decomposition half.)
    param_bytes = sum(int(np.prod(x.shape)) * 4
                      for x in jax.tree_util.tree_leaves(state.params))
    ar = s.get("all-reduce", {"count": 0, "bytes": 0})
    rs = s.get("reduce-scatter", {"count": 0, "bytes": 0})
    total = ar["bytes"] + rs["bytes"] * 8  # rs result is 1/8 shard
    assert total >= param_bytes, (total, param_bytes)  # grads ARE synced
    assert total <= 1.1 * param_bytes + (16 << 20), (total, param_bytes)

    # 4. SyncBN evidence: many small per-channel stat reductions
    #    (the (sum, sumsq) f32 tuples GSPMD inserts for global-batch BN)
    small = [c for c in colls if c.op == "all-reduce" and c.bytes <= 65536]
    assert len(small) >= 40, len(small)


@pytest.mark.slow
def test_spatial_sharded_step_collective_profile():
    """Collective audit of the dp x sp (2x4) sharded step — what spatial
    partitioning costs on a pod. Measured on the audited program (r50-D16
    MRFP+, 16x64x64 over 8 CPU devices, 2026-08-18):

      all-reduce          262 / 240.8 MB  (two-stage grad reduce over the
                                           data and spatial groups + BN stats;
                                           dp-only pays 161.7 MB)
      collective-permute   98 /   5.0 MB  (conv halo exchanges — thin border
                                           rows, the SP design working)
      all-gather           22 /  10.2 MB  (full-H gathers at resize/ASPP-pool
                                           points where GSPMD gathers instead
                                           of partial-summing the one-hot
                                           resize contraction; grows with
                                           activation size — the known SP
                                           overhead to revisit if SP becomes
                                           a hot path)

    The asserts pin the structure, not exact counts."""
    from mrfp_tpu.core.config import Config, MeshConfig
    from mrfp_tpu.core.mesh import create_mesh, shard_batch
    from mrfp_tpu.models import MRFP
    from mrfp_tpu.perturb import oc_init
    from mrfp_tpu.train import create_train_state, make_jitted_steps

    assert len(jax.devices()) >= 8
    cfg = Config()
    model = MRFP(trunk="resnet-50", variant="D16")
    hw, batch = 64, 16
    state = create_train_state(model, cfg.train, (1, hw, hw, 3),
                               oc_params=oc_init(jax.random.PRNGKey(1)))
    mesh = create_mesh(MeshConfig(data_parallel=2, spatial_parallel=4),
                       jax.devices()[:8])
    state = jax.device_put(state, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    rng = np.random.default_rng(0)
    imgs, lbls = shard_batch(mesh, (
        rng.standard_normal((batch, hw, hw, 3)).astype(np.float32),
        rng.integers(0, 19, (batch, hw, hw)).astype(np.int32)))
    jtrain, _ = make_jitted_steps(model, cfg, mesh)
    txt = jtrain.lower(state, imgs, lbls).compile().as_text()

    colls = parse_collectives(txt)
    s = summarize(colls)

    # halo exchanges exist and stay thin (border rows, not whole maps)
    cp = s.get("collective-permute", {"count": 0, "bytes": 0})
    assert cp["count"] >= 20, s
    assert cp["bytes"] <= 32 << 20, s

    # H-gathers at resize/pool points are bounded at this size
    ag = s.get("all-gather", {"count": 0, "bytes": 0})
    assert ag["bytes"] <= 32 << 20, s

    # grads still sync (possibly two-stage: <= ~2x params + stats slack)
    param_bytes = sum(int(np.prod(x.shape)) * 4
                      for x in jax.tree_util.tree_leaves(state.params))
    ar = s.get("all-reduce", {"count": 0, "bytes": 0})
    assert ar["bytes"] >= param_bytes, (ar, param_bytes)
    assert ar["bytes"] <= 2.2 * param_bytes + (32 << 20), (ar, param_bytes)

    # nothing silently drops to bf16 on the wire
    dtypes = {dt for c in colls for dt in c.dtypes}
    assert dtypes <= {"f32", "s32"}, dtypes


@pytest.mark.slow
def test_tensor_sharded_step_collective_profile():
    """Collective audit of the dp x tp (2x4) sharded step — what tensor
    (channel) parallelism costs on a pod, next to what it buys (params +
    momentum + BN stats no longer replicated per chip). Measured on the
    audited program (r50-D16 MRFP+, 16x64x64 over 8 CPU devices, 2026-08-19):

      all-reduce          198 / 91.3 MB  (grad sync SHRINKS vs dp-only's
                                          161.7 MB: each 'model' group owns
                                          1/4 of the channel-sharded params)
      all-gather           74 / 53.0 MB  (channel-sharded activations
                                          regathered where a consumer needs
                                          full channels — the TP activation
                                          tax, grows with activation size)
      all-to-all            9 /  1.6 MB  (channel<->batch reshards GSPMD
                                          picks at a few layout boundaries)
      collective-permute   15 /  1.0 MB  (thin reshard shuffles)

    The asserts pin the structure, not exact counts."""
    from mrfp_tpu.core.config import Config, MeshConfig
    from mrfp_tpu.core.mesh import create_mesh, shard_batch, shard_state
    from mrfp_tpu.models import MRFP
    from mrfp_tpu.perturb import oc_init
    from mrfp_tpu.train import create_train_state, make_jitted_steps

    assert len(jax.devices()) >= 8
    cfg = Config()
    model = MRFP(trunk="resnet-50", variant="D16")
    hw, batch = 64, 16
    state = create_train_state(model, cfg.train, (1, hw, hw, 3),
                               oc_params=oc_init(jax.random.PRNGKey(1)))
    mesh = create_mesh(MeshConfig(data_parallel=2, model_parallel=4),
                       jax.devices()[:8])
    state = shard_state(mesh, state)
    rng = np.random.default_rng(0)
    imgs, lbls = shard_batch(mesh, (
        rng.standard_normal((batch, hw, hw, 3)).astype(np.float32),
        rng.integers(0, 19, (batch, hw, hw)).astype(np.int32)))
    jtrain, _ = make_jitted_steps(model, cfg, mesh)
    txt = jtrain.lower(state, imgs, lbls).compile().as_text()

    colls = parse_collectives(txt)
    s = summarize(colls)
    print("TP collective profile:", {k: (v["count"], round(v["bytes"] / 1e6, 1))
                                     for k, v in s.items()})

    # grad sync shrinks: each 'model' group owns 1/4 of the channel-sharded
    # params, so the dp all-reduce carries less than the full fp32 grad set
    param_bytes = sum(int(np.prod(x.shape)) * 4
                      for x in jax.tree_util.tree_leaves(state.params))
    ar = s.get("all-reduce", {"count": 0, "bytes": 0})
    assert ar["bytes"] <= 1.2 * param_bytes + (64 << 20), (ar, param_bytes)

    # nothing silently drops to bf16 on the wire
    dtypes = {dt for c in colls for dt in c.dtypes}
    assert dtypes <= {"f32", "s32"}, dtypes


def test_parse_collectives_unit():
    """Parser behavior pinned on hand-written HLO lines, incl. the async
    -start tuple-aliasing rule (operands+results must not double-count)."""
    hlo = """
  %add.1 = f32[64]{0} add(%a, %b)
  %all-reduce.1 = f32[1024]{0} all-reduce(%x), to_apply=%sum
  %all-reduce-start.2 = (f32[256]{0}, f32[256]{0}) all-reduce-start(%y), to_apply=%sum
  %all-reduce-done.2 = f32[256]{0} all-reduce-done(%all-reduce-start.2)
  %all-gather-start.3 = (f32[16]{0}, f32[128]{0}, u32[], u32[]) all-gather-start(%z), dimensions={0}
  %all-gather-done.3 = f32[128]{0} all-gather-done(%all-gather-start.3)
  %collective-permute.4 = bf16[8,8]{1,0} collective-permute(%w), source_target_pairs={{0,1}}
"""
    colls = parse_collectives(hlo)
    by_op = {}
    for c in colls:
        by_op.setdefault(c.op, []).append(c)

    # the sync all-reduce counts its full result
    assert [c.bytes for c in by_op["all-reduce"]][:1] == [4096]
    # the async pair counts ONCE (the -start), result half only: 256*4
    assert len(by_op["all-reduce"]) == 2
    assert by_op["all-reduce"][1].bytes == 1024
    # odd tuple (operand, result, u32 contexts): keep result + negligible
    # context scalars, drop the operand
    (ag,) = by_op["all-gather"]
    assert ag.bytes == 128 * 4 + 4 + 4
    assert ag.dtypes == ["f32", "u32"]
    # plain elementwise ops are not collectives
    assert len(colls) == 4
    (cp,) = by_op["collective-permute"]
    assert cp.bytes == 128 and cp.dtypes == ["bf16"]
