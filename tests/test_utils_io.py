"""Artifact store, TxtConfig, and OTB4 importer tests."""
import json
import os
import tarfile
import time

import numpy as np
import pandas as pd
import pytest

from mba_tpu.utils.file_management import (file_title, most_recent_file,
                                           assert_dir, TxtConfig,
                                           fetch_json_recursively)
from mba_tpu.io.otb4 import read_otb4, import_otb4_to_csv


class TestFileTitle:
    def test_format(self):
        t = file_title("My Artifact", ".npy")
        assert t.endswith(" My Artifact.npy")
        assert t[4] == '-' and t[7] == '-' and t[13] == '_'

    def test_short(self):
        t = file_title("X", ".csv", short=True)
        assert len(t.split(" ")[0]) == 8


class TestMostRecentFile:
    def test_resolves_newest_by_title(self, tmp_path):
        (tmp_path / "2024-01-01 10_00_00 Result A.npy").touch()
        (tmp_path / "2024-06-01 10_00_00 Result A.npy").touch()
        (tmp_path / "2024-03-01 10_00_00 Result B.npy").touch()
        newest = most_recent_file(tmp_path, ".npy", ["Result", "A"])
        assert newest.name.startswith("2024-06-01")

    def test_keyword_filtering_and_errors(self, tmp_path):
        (tmp_path / "2024-01-01 10_00_00 Foo.csv").touch()
        with pytest.raises(ValueError):
            most_recent_file(tmp_path, ".csv", ["Bar"])
        with pytest.raises(ValueError):
            most_recent_file(tmp_path / "nodir", ".csv")

    def test_dict_return_sorted_desc(self, tmp_path):
        for d in ["2024-01-01", "2024-02-01", "2024-03-01"]:
            (tmp_path / f"{d} 10_00_00 R.npy").touch()
        res = most_recent_file(tmp_path, ".npy", return_type="dict")
        names = [f.name for f in res["files"]]
        assert names == sorted(names, reverse=True)

    def test_invalid_date_prefix_skipped(self, tmp_path):
        (tmp_path / "not-a-date R.npy").touch()
        (tmp_path / "2024-01-01 10_00_00 R.npy").touch()
        assert most_recent_file(tmp_path, ".npy").name.startswith("2024")


class TestTxtConfig:
    def test_roundtrip(self, tmp_path):
        p = tmp_path / "config.txt"
        p.write_text("# comment\nRate --- 2048\nBands --- 1.0, 2.0, 3.0\n"
                     "Flag --- True\nName --- hello\n")
        cfg = TxtConfig(p)
        assert cfg.get_as_type("Rate", "int") == 2048
        assert cfg.get_as_type("Bands", "float_list") == [1.0, 2.0, 3.0]
        assert cfg.get_as_type("Flag", "bool") is True
        assert cfg.get_as_type("Name", "str") == "hello"

    def test_write_protection_and_change(self, tmp_path):
        p = tmp_path / "config.txt"
        p.write_text("A --- 1\n")
        with pytest.raises(ValueError):
            TxtConfig(p).change_entry("A", 2)
        rw = TxtConfig(p, read_only_mode=False)
        rw.change_entry("A", 2)
        assert TxtConfig(p).get_as_type("A", "int") == 2

    def test_malformed_line(self, tmp_path):
        p = tmp_path / "bad.txt"
        p.write_text("no separator here\n")
        with pytest.raises(ValueError, match="PROPERTY_NAME"):
            TxtConfig(p).settings_dict


class TestFetchJson:
    def test_recursive_collection(self, tmp_path):
        sub = tmp_path / "sub-01"
        sub.mkdir()
        (sub / "2024-01-01 10_00_00 Trial Summary.json").write_text(
            json.dumps({"score": 5}))
        (tmp_path / "2024-01-02 11_00_00 Trial Summary.json").write_text(
            json.dumps({"score": 7}))
        vals = fetch_json_recursively(tmp_path, "Trial Summary", "score")
        assert sorted(vals) == [5, 7]
        tv = fetch_json_recursively(tmp_path, "Trial Summary", "score",
                                    with_time_from_file_title=True)
        assert tv == {"2024-01-01 10_00_00": 5, "2024-01-02 11_00_00": 7}


def _make_otb4(path, n_tracks=2, n_ch_per=4, n_samples=100, fs=2048,
               gain=150.0, bits=16, adc_range=5.0, device="Quattrocento"):
    """Build a synthetic .otb4 tar archive (int16 single-sig layout)."""
    tracks_xml = ['<?xml version="1.0"?>', '<ArrayOfTrackInfo>']
    for i in range(n_tracks):
        tracks_xml.append(f"""<TrackInfo>
  <Device>{device};extra</Device>
  <Gain>{gain}</Gain>
  <ADC_Nbits>{bits}</ADC_Nbits>
  <ADC_Range>{adc_range}</ADC_Range>
  <SamplingFrequency>{fs}</SamplingFrequency>
  <SignalStreamPath>data_000.sig</SignalStreamPath>
  <NumberOfChannels>{n_ch_per}</NumberOfChannels>
  <AcquisitionChannel>{i * n_ch_per}</AcquisitionChannel>
</TrackInfo>""")
    tracks_xml.append('</ArrayOfTrackInfo>')
    xml_bytes = "\n".join(tracks_xml).encode()

    tot_ch = n_tracks * n_ch_per
    rng = np.random.default_rng(0)
    raw = rng.integers(-1000, 1000, size=(tot_ch, n_samples),
                       dtype=np.int16)
    sig_bytes = raw.reshape(-1, order='F').tobytes()

    import io as _io
    with tarfile.open(path, "w") as tar:
        for name, payload in [("Tracks_000.xml", xml_bytes),
                              ("data_000.sig", sig_bytes)]:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tar.addfile(info, _io.BytesIO(payload))
    return raw, gain, bits, adc_range, fs


class TestOtb4:
    def test_read_adc_conversion(self, tmp_path):
        p = tmp_path / "rec.otb4"
        raw, gain, bits, adc_range, fs = _make_otb4(p)
        parsed = read_otb4(p)
        assert parsed["device"] == "Quattrocento"
        assert parsed["n_channels"] == 8
        name, data, got_fs = parsed["signals"][0]
        assert got_fs == fs
        expected = raw.astype(np.float32) * adc_range / 2 ** bits * 1000 / gain
        np.testing.assert_allclose(data, expected, rtol=1e-6)

    def test_csv_export_layout(self, tmp_path):
        p = tmp_path / "rec.otb4"
        raw, gain, bits, adc_range, fs = _make_otb4(p)
        out = import_otb4_to_csv(str(p), str(tmp_path / "out"),
                                 output_title="subj0_eeg",
                                 channel_range=(0, 4), verbose=False)
        assert out["n_channels_exported"] == 4
        df = pd.read_csv(out["output_files"][0])
        assert list(df.columns) == ["Time_s", "Channel_1", "Channel_2",
                                    "Channel_3", "Channel_4"]
        np.testing.assert_allclose(df["Time_s"], np.arange(100) / fs)

    def test_invalid_channel_range(self, tmp_path):
        p = tmp_path / "rec.otb4"
        _make_otb4(p)
        with pytest.raises(ValueError, match="channel_range"):
            import_otb4_to_csv(str(p), str(tmp_path / "o"),
                               channel_range=(0, 99), verbose=False)

    def test_missing_file(self):
        with pytest.raises(FileNotFoundError):
            read_otb4("/nonexistent.otb4")

    def test_write_read_roundtrip_int16(self, tmp_path):
        """write_otb4 ∘ read_otb4 must be the identity on ADC counts and
        reproduce the mV conversion of the reader."""
        from mba_tpu.io.otb4 import write_otb4
        rng = np.random.default_rng(5)
        counts = rng.integers(-30000, 30000, size=(6, 500),
                              dtype=np.int16)
        p = tmp_path / "written.otb4"
        write_otb4(p, counts, 2048.0, gain=2.0, adc_nbits=16,
                   adc_range=2.4)
        parsed = read_otb4(p)
        assert parsed["n_channels"] == 6
        name, data, fs = parsed["signals"][0]
        assert fs == 2048
        expected = counts.astype(np.float32) * 2.4 / 2 ** 16 * 1000 / 2.0
        np.testing.assert_allclose(data, expected, rtol=1e-6)

    def test_raw_counts_matches_float_path(self, tmp_path):
        """raw_counts=True returns the verbatim int16 ADC matrix plus
        per-channel mV factors whose product is bit-identical to the
        default float path."""
        p = tmp_path / "rec.otb4"
        raw, gain, bits, adc_range, fs = _make_otb4(p)
        full = read_otb4(p)
        parsed = read_otb4(p, raw_counts=True)
        name, counts, got_fs = parsed["signals"][0]
        assert counts.dtype == np.int16 and got_fs == fs
        np.testing.assert_array_equal(counts, raw)
        factors = parsed["mv_per_count"][0]
        assert factors.dtype == np.float32 and factors.shape == (8,)
        np.testing.assert_array_equal(
            counts.astype(np.float32) * factors[:, None],
            full["signals"][0][1])
        # the transposed (n_samples, n_ch) orientation is a C-contiguous
        # zero-copy view of the tar member bytes — free to upload
        assert counts.T.flags.c_contiguous

    def test_write_roundtrip_float_mv(self, tmp_path):
        """Float input is interpreted as mV and quantized to counts with
        the inverse conversion; round-trip error ≤ half an ADC step."""
        from mba_tpu.io.otb4 import write_otb4
        rng = np.random.default_rng(6)
        mv = (rng.standard_normal((4, 300)) * 5.0).astype(np.float64)
        p = tmp_path / "float.otb4"
        write_otb4(p, mv, 1000.0, gain=1.0, adc_nbits=16, adc_range=2.4)
        _, data, _ = read_otb4(p)["signals"][0]
        step = 2.4 / 2 ** 16 * 1000
        assert np.abs(data - mv).max() <= step / 2 + 1e-9


class TestProfiling:
    def test_stage_timer_and_save(self, tmp_path):
        import json as _json
        import time as _time
        from mba_tpu.utils.profiling import StageTimer
        timer = StageTimer("unit")
        with timer.stage("a"):
            _time.sleep(0.01)
        with timer.stage("b"):
            _time.sleep(0.02)

        @timer.timed("c")
        def work():
            return sum(range(100))
        assert work() == 4950
        assert [lb for lb, _ in timer.stages] == ["a", "b", "c"]
        assert timer.stages[1][1] >= 0.015
        text = timer.report(printer=None)
        assert "TOTAL" in text and "b" in text
        path = timer.save(tmp_path)
        payload = _json.loads(path.read_text())
        assert payload["total_seconds"] == timer.total

    def test_device_trace_noop_and_real(self, tmp_path):
        import jax.numpy as jnp
        from mba_tpu.utils.profiling import device_trace, annotate
        with device_trace(tmp_path, enabled=False):
            pass                                  # no-op path
        with device_trace(tmp_path / "t"):
            with annotate("matmul"):
                x = jnp.ones((32, 32))
                (x @ x).block_until_ready()
        assert any((tmp_path / "t").rglob("*"))   # trace files exist


def _make_otb4_novecento(path, n_samples=50, fs=2000, gain=200.0,
                         bits=24, adc_range=10.0):
    """Novecento+ archive: two int32 blocks in the SECOND .sig (the
    first .sig is the typically-empty stream), mapped via
    SignalStreamPath."""
    blocks = [("data_001.sig", 4), ("data_001.sig", 2)]
    tracks_xml = ['<?xml version="1.0"?>', '<ArrayOfTrackInfo>']
    acq = 0
    for sig_name, n_ch in blocks:
        tracks_xml.append(f"""<TrackInfo>
  <Device>Novecento+;extra</Device>
  <Gain>{gain}</Gain>
  <ADC_Nbits>{bits}</ADC_Nbits>
  <ADC_Range>{adc_range}</ADC_Range>
  <SamplingFrequency>{fs}</SamplingFrequency>
  <SignalStreamPath>{sig_name}</SignalStreamPath>
  <NumberOfChannels>{n_ch}</NumberOfChannels>
  <AcquisitionChannel>{acq}</AcquisitionChannel>
</TrackInfo>""")
        acq += n_ch
    tracks_xml.append('</ArrayOfTrackInfo>')
    rng = np.random.default_rng(1)
    raw = rng.integers(-2 ** 20, 2 ** 20, size=(6, n_samples),
                       dtype=np.int32)
    import io as _io
    with tarfile.open(path, "w") as tar:
        payloads = [("Tracks_000.xml",
                     "\n".join(tracks_xml).encode()),
                    ("data_000.sig", b""),          # empty first stream
                    ("data_001.sig",
                     raw.reshape(-1, order="F").tobytes())]
        for name, payload in payloads:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tar.addfile(info, _io.BytesIO(payload))
    return raw, gain, bits, adc_range, fs


class TestOtb4Novecento:
    def test_int32_multiblock(self, tmp_path):
        p = tmp_path / "nov.otb4"
        raw, gain, bits, adc_range, fs = _make_otb4_novecento(p)
        parsed = read_otb4(p)
        assert parsed["device"] == "Novecento+"
        assert parsed["n_channels"] == 6
        name, data, got_fs = parsed["signals"][0]
        assert got_fs == fs
        assert data.shape == (6, 50)
        expected = raw * adc_range / 2 ** bits * 1000.0 / gain
        np.testing.assert_allclose(data, expected.astype(np.float32),
                                   rtol=1e-6)

    def test_int32_raw_counts(self, tmp_path):
        p = tmp_path / "nov.otb4"
        raw, gain, bits, adc_range, fs = _make_otb4_novecento(p)
        full = read_otb4(p)
        parsed = read_otb4(p, raw_counts=True)
        name, counts, got_fs = parsed["signals"][0]
        assert counts.dtype == np.int32
        np.testing.assert_array_equal(counts, raw)
        factors = parsed["mv_per_count"][0]
        np.testing.assert_array_equal(
            counts.astype(np.float32) * factors[:, None],
            full["signals"][0][1])


class TestDecorators:
    def test_retry_decorator_recovers(self):
        from mba_tpu.utils.function_decorators import retry_decorator
        calls = {"n": 0}

        @retry_decorator(n_retries=3, delay_sec=0.0, verbose=False)
        def flaky():
            calls["n"] += 1
            if calls["n"] < 3:
                raise ConnectionError("transient")
            return "ok"

        assert flaky() == "ok"
        assert calls["n"] == 3

    def test_retry_decorator_exhausts(self):
        from mba_tpu.utils.function_decorators import retry_decorator

        @retry_decorator(n_retries=2, delay_sec=0.0, verbose=False)
        def always_fails():
            raise ValueError("permanent")

        with pytest.raises(ValueError, match="permanent"):
            always_fails()

    def test_timed_callback_heartbeats(self, capsys):
        import time as _time
        from mba_tpu.utils.function_decorators import (
            timed_callback_decorator)

        @timed_callback_decorator(initial_interval_sec=0.02,
                                  label="worker")
        def work():
            return 42

        assert work() == 42                 # first call: starts clock
        _time.sleep(0.05)
        assert work() == 42                 # past interval: heartbeat
        out = capsys.readouterr().out
        assert "[heartbeat] worker" in out
