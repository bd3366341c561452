"""2-process jax.distributed CPU cluster: the multi-host DP path of
cli/train.py (initialize_distributed -> global mesh -> per-process batch
shards via make_array_from_process_local_data -> GSPMD collectives).
Replaces, as machine-checked evidence, the reference's NCCL substrate
(main.py:42-52, network/__init__.py:30-38)."""

import pytest


@pytest.mark.slow
def test_two_process_cpu_cluster_agrees_on_loss():
    from mrfp_tpu.parallel.dryrun import launch_multiprocess

    losses = launch_multiprocess(n_processes=2, devices_per_proc=2,
                                 port=47631)
    assert len(losses) == 2
    assert abs(losses[0] - losses[1]) < 1e-6
