"""Data-prep tool tests: transcript extraction, code generation round trip,
VAD cutting — all on CPU with tiny synthetic corpora."""

import io
import json
import os
import tarfile

import numpy as np
import pytest

from prompt_tts_tpu.utils.wav import read_wav, write_wav


def _add_bytes(tf, name, data: bytes):
    info = tarfile.TarInfo(name)
    info.size = len(data)
    tf.addfile(info, io.BytesIO(data))


@pytest.fixture()
def wav_tar(tmp_path):
    """Tar with 3 wavs (24 kHz) + transcripts, LJSpeech-processed layout."""
    path = str(tmp_path / "corpus.tar")
    rng = np.random.default_rng(0)
    with tarfile.open(path, "w") as tf:
        for i in range(3):
            wav = (rng.normal(size=24000 * (i + 1)) * 0.1).astype(np.float32)
            tmp = str(tmp_path / f"LJ00{i}.wav")
            write_wav(tmp, wav, 24000)
            tf.add(tmp, arcname=f"LJ00{i}.wav")
            _add_bytes(tf, f"LJ00{i}.txt", f"sample text {i}".encode())
            _add_bytes(tf, f"LJ00{i}.normalized.txt",
                       f"sample text {i}".encode())
    return path


class TestGenerateCodes:
    def test_roundtrip_to_dataset(self, wav_tar, tmp_path):
        from prompt_tts_tpu.cli.generate_codes import main as gen_main
        gen_main(["--input_file", wav_tar, "--batch_size", "2",
                  "--max_duration", "4"])
        out = wav_tar.replace(".tar", "_processed.tar")
        assert os.path.exists(out)

        with tarfile.open(out) as tf:
            names = tf.getnames()
        assert "LJ000.npy" in names and "LJ000.len.txt" in names
        assert "LJ000.normalized.txt" in names

        from prompt_tts_tpu.data import CodeDataset
        ds = CodeDataset(out, max_seq_length=64)
        assert len(ds) == 3
        batch = next(ds.batches(2))
        assert batch["codes"].shape == (2, 4 * 75, 8)  # 4 s -> 300 frames
        assert batch["codes"].min() >= -1.0 and batch["codes"].max() <= 1.0
        # true frame lengths: ceil(samples/320)
        assert sorted(ds.code_len) == [75, 150, 225]


class TestExtractTranscript:
    def test_ljspeech_metadata(self, tmp_path):
        src = str(tmp_path / "lj.tar")
        with tarfile.open(src, "w") as tf:
            meta = ("LJ001-0001|Printing, in the only sense|"
                    "Printing, in the only sense\n"
                    "LJ001-0002|Second row|Second row normalized\n")
            _add_bytes(tf, "LJSpeech-1.1/metadata.csv", meta.encode())
            wav = np.zeros(100, np.float32)
            tmp = str(tmp_path / "w.wav")
            write_wav(tmp, wav, 22050)
            tf.add(tmp, arcname="LJSpeech-1.1/wavs/LJ001-0001.wav")

        from prompt_tts_tpu.cli.extract_transcript import main
        out = str(tmp_path / "lj_out.tar")
        main(["--input_file", src, "--output_file", out])
        with tarfile.open(out) as tf:
            names = tf.getnames()
            assert "LJ001-0001.txt" in names
            assert "LJ001-0002.normalized.txt" in names
            got = tf.extractfile("LJ001-0002.normalized.txt").read().decode()
            assert got == "Second row normalized"
            assert any(n.endswith(".wav") for n in names)


class TestVadCut:
    def test_cut_sequence_and_resume(self, tmp_path):
        from prompt_tts_tpu.data.vad_cut import cut_corpus

        src = str(tmp_path / "books.tar")
        sr = 16000
        with tarfile.open(src, "w") as tf:
            for b in range(2):
                wav = np.sin(np.arange(sr * 30) * 0.05).astype(np.float32)
                tmp = str(tmp_path / "b.wav")
                write_wav(tmp, wav, sr)
                tf.add(tmp, arcname=f"spk/book{b}/chap.wav")
                meta = {"book_meta": {"id": f"book{b}"},
                        "voice_activity": [[0.0, 4.0], [5.0, 9.0],
                                           [10.0, 16.0], [17.0, 25.0]]}
                _add_bytes(tf, f"spk/book{b}/chap.json",
                           json.dumps(meta).encode())

        n_ok, n_err = cut_corpus(src, n_workers=2, state_dir=str(tmp_path))
        assert (n_ok, n_err) == (2, 0)

        seg_tars = [str(tmp_path / f"books_vad_{i}.tar") for i in range(2)]
        seg_names = []
        for st in seg_tars:
            if os.path.exists(st):
                with tarfile.open(st) as tf:
                    seg_names += tf.getnames()
        assert len(seg_names) >= 2
        # segments are valid 16 kHz wavs
        with tarfile.open([s for s in seg_tars if os.path.exists(s)][0]) as tf:
            member = tf.getmembers()[0]
            audio, got_sr = read_wav(io.BytesIO(tf.extractfile(member).read()))
            assert got_sr == 16000 and len(audio) > 0

        # resume: everything already in ignore_list -> nothing to do
        n_ok2, n_err2 = cut_corpus(src, n_workers=2,
                                   state_dir=str(tmp_path))
        assert (n_ok2, n_err2) == (0, 0)
