"""Utility tests: timers, metrics logger, progress, clustering wrapper."""

import json
import time

import numpy as np

from object_keypoints_tpu.utils import Rate, Timing
from object_keypoints_tpu.utils.clustering import KeypointClustering
from object_keypoints_tpu.utils.metrics import MetricsLogger
from object_keypoints_tpu.utils.progress import Timer, stdout_to_tqdm


class TestTimers:
    def test_timing_stats(self):
        t = Timing()
        for _ in range(3):
            with t.measure("op"):
                time.sleep(0.001)
        mean, std, n = t.stats()["op"]
        assert n == 3 and mean >= 0.001

    def test_tic_toc(self):
        t = Timer()
        t.tic()
        time.sleep(0.001)
        avg = t.toc()
        assert avg >= 0.001 and t.calls == 1

    def test_rate_sleeps(self):
        r = Rate(200)
        t0 = time.monotonic()
        r.sleep()
        r.sleep()
        assert time.monotonic() - t0 >= 0.004


class TestMetricsLogger:
    def test_jsonl_roundtrip(self, tmp_path):
        logger = MetricsLogger(str(tmp_path))
        logger.log(1, {"loss": 2.5})
        logger.log(2, {"loss": 1.25}, prefix="val_")
        logger.close()
        lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
        assert lines[0]["loss"] == 2.5
        assert lines[1]["val_loss"] == 1.25


class TestProgress:
    def test_stdout_to_tqdm(self, capsys):
        with stdout_to_tqdm():
            print("hello")
        out = capsys.readouterr()
        assert "hello" in out.out or "hello" in out.err


class TestClustering:
    def test_meanshift_two_clusters(self):
        rng = np.random.default_rng(0)
        a = rng.normal([0, 0], 0.1, size=(20, 2))
        b = rng.normal([5, 5], 0.1, size=(20, 2))
        centers, labels = KeypointClustering(bandwidth=1.0)(np.concatenate([a, b]))
        assert centers.shape[0] == 2
        assert len(set(labels[:20])) == 1 and len(set(labels[20:])) == 1


def _decode_tfrecords(path):
    """Independent TFRecord+Event decoder (no code shared with tb_events):
    verifies the masked crc32c framing and parses Event/Summary protos."""
    import struct

    def crc32c(data):  # bitwise (table-free) variant — independent of tb_events

        poly = 0x82F63B78
        crc = 0xFFFFFFFF
        for b in data:
            crc ^= b
            for _ in range(8):
                crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
        return crc ^ 0xFFFFFFFF

    def unmask(masked):
        rot = (masked - 0xA282EAD8) & 0xFFFFFFFF
        return ((rot >> 17) | (rot << 15)) & 0xFFFFFFFF

    def read_varint(buf, i):
        shift = val = 0
        while True:
            b = buf[i]
            i += 1
            val |= (b & 0x7F) << shift
            if not b & 0x80:
                return val, i
            shift += 7

    def parse_fields(buf):
        fields = {}
        i = 0
        while i < len(buf):
            key, i = read_varint(buf, i)
            field, wt = key >> 3, key & 7
            if wt == 0:
                val, i = read_varint(buf, i)
            elif wt == 1:
                val = struct.unpack("<d", buf[i:i + 8])[0]
                i += 8
            elif wt == 5:
                val = struct.unpack("<f", buf[i:i + 4])[0]
                i += 4
            elif wt == 2:
                n, i = read_varint(buf, i)
                val = buf[i:i + n]
                i += n
            else:
                raise AssertionError(f"wire type {wt}")
            fields.setdefault(field, []).append(val)
        return fields

    events = []
    raw = open(path, "rb").read()
    i = 0
    while i < len(raw):
        (length,) = struct.unpack("<Q", raw[i:i + 8])
        (len_crc,) = struct.unpack("<I", raw[i + 8:i + 12])
        assert unmask(len_crc) == crc32c(raw[i:i + 8]), "length crc mismatch"
        data = raw[i + 12:i + 12 + length]
        (data_crc,) = struct.unpack("<I", raw[i + 12 + length:i + 16 + length])
        assert unmask(data_crc) == crc32c(data), "data crc mismatch"
        event = parse_fields(data)
        parsed = {"wall_time": event[1][0]}
        if 2 in event:
            parsed["step"] = event[2][0]
        if 3 in event:
            parsed["file_version"] = event[3][0].decode()
        if 5 in event:
            scalars = {}
            for value_bytes in parse_fields(event[5][0]).get(1, []):
                value = parse_fields(value_bytes)
                scalars[value[1][0].decode()] = value[2][0]
            parsed["scalars"] = scalars
        events.append(parsed)
        i += 16 + length
    return events


class TestLiveViewer:
    def test_headless_is_inert(self, monkeypatch, capsys):
        """No DISPLAY -> one notice, always 'keep playing', close is safe."""
        from object_keypoints_tpu.utils.vis import LiveViewer

        monkeypatch.delenv("DISPLAY", raising=False)
        v = LiveViewer("test")
        frame = np.zeros((4, 4, 3), np.uint8)
        assert v.show(frame) is True
        assert v.show(frame) is True
        v.close()
        out = capsys.readouterr().out
        assert out.count("no display") == 1


class TestTensorBoardEvents:
    def test_event_file_decodes(self, tmp_path):
        """metrics -> event file -> independent decoder round trip."""
        logger = MetricsLogger(str(tmp_path), tensorboard=True)
        logger.log(10, {"loss": 2.5, "heatmap_loss1": 0.5})
        logger.log(20, {"val_loss": 1.25}, prefix="")
        logger.close()
        paths = [p for p in tmp_path.iterdir() if "tfevents" in p.name]
        assert len(paths) == 1
        events = _decode_tfrecords(paths[0])
        assert events[0]["file_version"] == "brain.Event:2"
        assert events[1]["step"] == 10
        assert events[1]["scalars"]["loss"] == 2.5
        assert abs(events[1]["scalars"]["heatmap_loss1"] - 0.5) < 1e-7
        assert events[2]["step"] == 20
        assert events[2]["scalars"]["val_loss"] == 1.25

    def test_crc32c_known_vectors(self):
        """crc32c against published test vectors (RFC 3720 / kernel tests)."""
        from object_keypoints_tpu.utils.tb_events import crc32c

        assert crc32c(b"") == 0x0
        assert crc32c(b"123456789") == 0xE3069283
        assert crc32c(b"\x00" * 32) == 0x8A9136AA
