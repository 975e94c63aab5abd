"""The dependency-free TensorBoard event writer (utils/tb_events.py).

The reference always emits TB event files (training.py:40-45); the
fallback writer must produce files TensorBoard itself can read.
"""

import numpy as np
import pytest

from deepgrp_tpu.utils.tb_events import (EventFileWriter, _crc32c,
                                         _varint)


def test_crc32c_known_vectors():
    # RFC 3720 test vectors.
    assert _crc32c(b"") == 0x0
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(bytes([0] * 32)) == 0x8A9136AA


def test_varint_roundtrip():
    def decode(buf):
        shift = value = 0
        for i, byte in enumerate(buf):
            value |= (byte & 0x7F) << shift
            shift += 7
            if not byte & 0x80:
                return value, i + 1
        raise ValueError

    for n in [0, 1, 127, 128, 300, 2 ** 32, 2 ** 63]:
        value, _ = decode(_varint(n))
        assert value == n


def test_events_readable_by_tensorboard(tmp_path):
    ea = pytest.importorskip(
        "tensorboard.backend.event_processing.event_accumulator")

    writer = EventFileWriter(tmp_path)
    writer.add_scalar("loss", 0.5, 1)
    writer.add_scalar("loss", 0.25, 2)
    writer.add_scalar("val_loss", 1.5, 1)
    writer.close()

    acc = ea.EventAccumulator(str(tmp_path))
    acc.Reload()
    assert sorted(acc.Tags()["scalars"]) == ["loss", "val_loss"]
    loss = [(e.step, e.value) for e in acc.Scalars("loss")]
    assert loss == [(1, 0.5), (2, 0.25)]
    np.testing.assert_allclose(acc.Scalars("val_loss")[0].value, 1.5)


def test_metrics_writer_falls_back_without_torch(tmp_path, monkeypatch):
    import builtins

    real_import = builtins.__import__

    def no_torch(name, *args, **kwargs):
        if name.startswith("torch"):
            raise ImportError("torch disabled for test")
        return real_import(name, *args, **kwargs)

    monkeypatch.setattr(builtins, "__import__", no_torch)
    from deepgrp_tpu.train.training import MetricsWriter
    from deepgrp_tpu.utils.tb_events import EventFileWriter as EFW

    writer = MetricsWriter(tmp_path, tensorboard=True)
    assert isinstance(writer._tb, EFW)
    writer.write(1, {"loss": 0.1})
    writer.close()
    events = [p for p in tmp_path.iterdir()
              if p.name.startswith("events.out.tfevents")]
    assert events and events[0].stat().st_size > 0
