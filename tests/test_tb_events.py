"""Native TensorBoard event writer (utils/tb_events.py): CRC32C against the
published test vectors, TFRecord framing, and an independent proto decode of
the scalar events (the observability parity for the reference's
SummaryWriter scalars, dassl/engine/trainer.py:228-246)."""

import glob
import os
import struct

from leclip_tpu.engine.metrics import MetricsWriter
from leclip_tpu.utils.tb_events import EventFileWriter, _masked_crc, crc32c


def test_crc32c_known_vectors():
    # RFC 3720 / Castagnoli reference vectors
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"a") == 0xC1D04330
    assert crc32c(bytes(32)) == 0x8A9136AA


def _read_records(path):
    """Independent TFRecord parser: verifies both masked CRCs per record."""
    records = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if not header:
                return records
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header)
            payload = f.read(length)
            (pcrc,) = struct.unpack("<I", f.read(4))
            assert pcrc == _masked_crc(payload)
            records.append(payload)


def _walk_fields(buf):
    """Minimal independent protobuf field walker → (num, wire, raw) tuples."""
    i = 0

    def varint():
        nonlocal i
        shift = n = 0
        while True:
            b = buf[i]
            i += 1
            n |= (b & 0x7F) << shift
            if not b & 0x80:
                return n
            shift += 7

    while i < len(buf):
        key = varint()
        num, wire = key >> 3, key & 7
        if wire == 0:
            yield num, wire, varint()
        elif wire == 1:
            yield num, wire, buf[i:i + 8]
            i += 8
        elif wire == 5:
            yield num, wire, buf[i:i + 4]
            i += 4
        elif wire == 2:
            ln = varint()
            yield num, wire, buf[i:i + ln]
            i += ln
        else:
            raise AssertionError(f"wire type {wire}")


def _decode_scalar(buf):
    """Event → (step, tag, simple_value, file_version) via the proto schema:
    Event{step=2, file_version=3, summary=5:Summary{value=1:Value{
    tag=1, simple_value=2}}}."""
    step, tag, value, version = 0, None, None, None
    for num, wire, raw in _walk_fields(buf):
        if num == 2 and wire == 0:
            step = raw
        elif num == 3 and wire == 2:
            version = raw.decode()
        elif num == 5 and wire == 2:  # Summary
            for snum, swire, sraw in _walk_fields(raw):
                assert (snum, swire) == (1, 2)  # repeated Value
                for vnum, vwire, vraw in _walk_fields(sraw):
                    if vnum == 1 and vwire == 2:
                        tag = vraw.decode()
                    elif vnum == 2 and vwire == 5:
                        (value,) = struct.unpack("<f", vraw)
    return step, tag, value, version


def test_event_file_roundtrip(tmp_path):
    w = EventFileWriter(str(tmp_path))
    w.add_scalar("train/loss", 0.625, 3)
    w.add_scalar("val/mAP", 73.25, 10)
    w.close()
    (path,) = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    records = _read_records(path)
    assert len(records) == 3
    assert _decode_scalar(records[0])[3] == "brain.Event:2"
    assert _decode_scalar(records[1])[:3] == (3, "train/loss", 0.625)
    assert _decode_scalar(records[2])[:3] == (10, "val/mAP", 73.25)


def test_metrics_writer_mirrors_to_tensorboard(tmp_path):
    m = MetricsWriter(str(tmp_path))
    m.write_scalar("train/acc", 0.5, 1)
    m.write_scalars({"a": 1.0, "b": 2.0}, 2, prefix="val/")
    m.flush()
    m.close()
    assert os.path.exists(tmp_path / "metrics.jsonl")
    (path,) = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    records = _read_records(path)
    decoded = [_decode_scalar(r)[:3] for r in records[1:]]
    assert decoded == [(1, "train/acc", 0.5), (2, "val/a", 1.0),
                       (2, "val/b", 2.0)]
    # opt-out writes JSONL only
    m2 = MetricsWriter(str(tmp_path / "notb"), tensorboard=False)
    m2.write_scalar("x", 1.0, 1)
    m2.close()
    assert not glob.glob(str(tmp_path / "notb" / "tb" / "*"))


def test_two_writers_same_second_get_distinct_files(tmp_path):
    # ADVICE r4: same host + same second must not interleave one TFRecord
    # stream — filenames carry pid + a per-process counter
    w1 = EventFileWriter(str(tmp_path))
    w2 = EventFileWriter(str(tmp_path))
    w1.add_scalar("a", 1.0, 1)
    w2.add_scalar("b", 2.0, 1)
    w1.close()
    w2.close()
    paths = sorted(glob.glob(str(tmp_path / "events.out.tfevents.*")))
    assert len(paths) == 2
    for p in paths:  # each file independently well-formed
        records = _read_records(p)
        assert _decode_scalar(records[0])[3] == "brain.Event:2"
        assert len(records) == 2
