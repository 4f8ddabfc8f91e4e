"""Native data-loading core: C++ vs numpy equivalence + build smoke."""

import io
import os
import tarfile

import numpy as np
import pytest

from prompt_tts_tpu.data import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


class TestBuild:
    def test_version(self, lib):
        assert lib.ptts_version() == 1


class TestTarIndex:
    def test_matches_tarfile(self, lib, tmp_path):
        path = str(tmp_path / "t.tar")
        payloads = {f"member_{i}.bin": os.urandom(100 + 700 * i)
                    for i in range(4)}
        with tarfile.open(path, "w") as tf:
            for name, data in payloads.items():
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))

        got = native.tar_index(path)
        ref = native._tar_index_py(path)
        assert got == ref
        # read_at returns the exact payloads
        for name, off, size in got:
            assert native.read_at(path, off, size) == payloads[name]


class TestNpyParse:
    @pytest.mark.parametrize("dtype", [np.int16, np.int32, np.int64])
    def test_roundtrip(self, lib, dtype):
        arr = np.random.default_rng(0).integers(
            0, 1024, (8, 123)).astype(dtype)
        buf = io.BytesIO()
        np.save(buf, arr)
        got = native.npy_to_i16(buf.getvalue())
        np.testing.assert_array_equal(got, arr.astype(np.int16))

    def test_rejects_garbage(self, lib):
        with pytest.raises(ValueError):
            native.npy_to_i16(b"\x93NUMPY" + b"\x01\x00" + b"\x00" * 64)


class TestCollate:
    def test_matches_numpy(self, lib):
        codes = np.random.default_rng(0).integers(
            0, 1024, (4, 8, 900)).astype(np.int16)
        got = native.collate_codes(codes)
        ref = np.ascontiguousarray(
            (codes.astype(np.float32) * 2.0 / 1023.0 - 1.0).transpose(0, 2, 1))
        assert got.shape == (4, 900, 8)
        np.testing.assert_allclose(got, ref, atol=1e-6)


class TestPrefetch:
    def test_order_and_completion(self):
        from prompt_tts_tpu.data.dataset import prefetch
        items = list(prefetch(iter(range(20)), depth=3))
        assert items == list(range(20))

    def test_propagates_nothing_after_exhaustion(self):
        from prompt_tts_tpu.data.dataset import prefetch
        it = prefetch(iter([]), depth=2)
        assert list(it) == []

    def test_production_overlaps_consumption(self):
        """The overlap guarantee itself (r4 verdict #6): while the
        consumer works on batch N, the worker thread produces batch N+1
        — so by the time the consumer asks, it's already waiting.  With
        production at ~30 ms and consumption at ~60 ms, a pipelined
        next() must return in far less than production cost; a serial
        (non-overlapping) implementation would pay the full 30 ms."""
        import time
        from prompt_tts_tpu.data.dataset import prefetch

        def produce():
            for i in range(6):
                time.sleep(0.03)
                yield i

        it = prefetch(produce(), depth=2)
        next(it)                      # batch 0: pays initial production
        waits = []
        for _ in range(4):
            time.sleep(0.06)          # "device step" on batch N
            t0 = time.perf_counter()
            next(it)                  # batch N+1 must be ready
            waits.append(time.perf_counter() - t0)
        # generous threshold for a loaded 1-core CI box: half the
        # production cost still separates pipelined from serial
        assert max(waits) < 0.015, f"prefetch did not overlap: {waits}"
