"""Streaming dataset: batches must be identical to the in-RAM dataset."""

import numpy as np
import pytest

from prompt_tts_tpu.data import CodeDataset
from prompt_tts_tpu.data.streaming import StreamingCodeDataset


@pytest.fixture(scope="module")
def corpus_tar(tmp_path_factory):
    import io
    import tarfile
    tmp = tmp_path_factory.mktemp("stream")
    path = str(tmp / "corpus.tar")
    rng = np.random.default_rng(0)
    with tarfile.open(path, "w") as tf:
        for i in range(7):
            stem = f"LJ{i:03d}"
            codes = rng.integers(0, 1024, (8, 60)).astype(np.int64)
            buf = io.BytesIO()
            np.save(buf, codes)
            data = buf.getvalue()
            info = tarfile.TarInfo(stem + ".npy")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            for name, payload in [
                (stem + ".txt", f"utterance number {i}".encode()),
                (stem + ".normalized.txt", f"utterance number {i}".encode()),
                (stem + ".len.txt", b"60.0"),
            ]:
                info = tarfile.TarInfo(name)
                info.size = len(payload)
                tf.addfile(info, io.BytesIO(payload))
    return path


class TestStreamingEquivalence:
    def test_batches_identical_to_in_ram(self, corpus_tar):
        ram = CodeDataset(corpus_tar, max_seq_length=32)
        stream = StreamingCodeDataset(corpus_tar, max_seq_length=32)
        assert len(ram) == len(stream) == 7

        ram_batches = list(ram.batches(3, shuffle=True, seed=5))
        stream_batches = list(stream.batches(3, shuffle=True, seed=5))
        assert len(ram_batches) == len(stream_batches) == 2
        for a, b in zip(ram_batches, stream_batches):
            for key in ("codes", "text_ids", "text_mask", "code_len"):
                np.testing.assert_array_equal(a[key], b[key])

    def test_prompt_crops(self, corpus_tar):
        stream = StreamingCodeDataset(corpus_tar, max_seq_length=32,
                                      prompt_frames=16)
        batch = next(iter(stream.batches(2)))
        assert batch["prompt"].shape == (2, 16, 8)
        assert np.abs(batch["prompt"]).max() <= 1.0
