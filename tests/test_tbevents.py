"""TensorBoard event-file writer/reader (utils/tbevents.py — the working
replacement for the reference harness's tensorboardX scalars,
utils/misc.py:115,249-254)."""

import glob
import math
import os

import pytest

from mrfp_tpu.utils.tbevents import TBEventWriter, crc32c, read_tfevents


def test_crc32c_check_value():
    # the standard CRC-32C check value (RFC 3720 appendix B / Castagnoli)
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    assert crc32c(bytes(32)) == 0x8A9136AA  # iSCSI test vector: 32 zeros


def test_roundtrip_own_reader(tmp_path):
    w = TBEventWriter(str(tmp_path))
    rows = [("train/loss", 3.5, 1), ("train/loss", 2.25, 2),
            ("val/mean_iu", 0.406, 2), ("neg", -1.5, 40000)]
    for tag, v, s in rows:
        w.add_scalar(tag, v, s, wall_time=123.5)
    w.close()
    got = list(read_tfevents(w.path))
    assert [(t, s) for t, _v, s, _w in got] == [(t, s) for t, _v, s in rows]
    for (_, v_in, _), (_, v_out, _, wall) in zip(rows, got):
        assert math.isclose(v_in, v_out, rel_tol=1e-6)
        assert wall == 123.5


def test_tensorboard_loads_our_file(tmp_path):
    """Gold check: stock TensorBoard's own loader must parse our encoding."""
    tb = pytest.importorskip("tensorboard.backend.event_processing"
                             ".event_file_loader")
    w = TBEventWriter(str(tmp_path))
    w.add_scalar("a/b", 1.25, 7)
    w.add_scalar("a/b", 0.5, 8)
    w.close()
    events = list(tb.LegacyEventFileLoader(w.path).Load())
    assert events[0].file_version == "brain.Event:2"
    scalars = [(ev.summary.value[0].tag, ev.summary.value[0].simple_value,
                ev.step) for ev in events[1:]]
    assert scalars == [("a/b", 1.25, 7), ("a/b", 0.5, 8)]


def test_our_reader_loads_tensorboardx_file(tmp_path):
    """Reverse gold check: read a file written by a real TB writer."""
    tbx = pytest.importorskip("tensorboardX")
    d = str(tmp_path / "tbx")
    w = tbx.SummaryWriter(d, flush_secs=1)
    w.add_scalar("x", 2.5, 3)
    w.close()
    (path,) = glob.glob(os.path.join(d, "events.out.tfevents.*"))
    got = [(t, v, s) for t, v, s, _ in read_tfevents(path)]
    assert ("x", 2.5, 3) in got


def test_metric_writer_dual_sink(tmp_path):
    from mrfp_tpu.utils.experiment import MetricWriter

    mw = MetricWriter(str(tmp_path / "metrics.jsonl"),
                      tb_dir=str(tmp_path / "tb"))
    mw.add_scalar("train/loss", 1.0, 5)
    mw.close()
    assert os.path.exists(tmp_path / "metrics.jsonl")
    (path,) = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    assert [(t, v, s) for t, v, s, _ in read_tfevents(path)] == \
        [("train/loss", 1.0, 5)]
