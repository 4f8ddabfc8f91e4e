"""CLI surface tests: argument parsing, error paths, trim helper."""

import numpy as np
import pytest


class TestArgParsing:
    def test_train_args(self):
        from prompt_tts_tpu.cli.train import parse_args
        a = parse_args(["--smoke", "--log_dir", "/tmp/x"])
        assert a.smoke and a.log_dir == "/tmp/x"
        assert a.max_seq_length == 550  # reference default

    def test_synthesize_requires_text_and_out(self):
        from prompt_tts_tpu.cli.synthesize import parse_args
        with pytest.raises(SystemExit):
            parse_args([])
        a = parse_args(["--text", "hi", "--text", "there", "--out", "o.wav"])
        assert a.text == ["hi", "there"]
        assert a.steps == 50

    def test_decode_codec_args(self):
        from prompt_tts_tpu.cli.decode_codec import parse_args
        a = parse_args(["--npy_path", "c.npy", "--cpu"])
        assert a.npy_path == "c.npy" and a.cpu

    def test_generate_codes_defaults_match_reference(self):
        from prompt_tts_tpu.cli.generate_codes import parse_args
        a = parse_args(["--input_file", "x.tar"])
        assert a.batch_size == 32      # reference generate_code.py default
        assert a.max_duration == 12    # reference default -> 900 frames

    def test_serve_args(self):
        from prompt_tts_tpu.cli.serve import parse_args
        a = parse_args(["--port", "9000", "--max_batch", "4"])
        assert a.port == 9000 and a.max_batch == 4
        # sharded/EMA serving surface mirrors synthesize's
        a = parse_args(["--tp", "2", "--sp", "2", "--ema"])
        assert a.tp == 2 and a.sp == 2 and a.ema

    def test_synthesize_sharding_and_ema_args(self):
        from prompt_tts_tpu.cli.synthesize import parse_args
        a = parse_args(["--text", "x", "--out", "o.wav",
                        "--tp", "4", "--sp", "2", "--ema"])
        assert a.tp == 4 and a.sp == 2 and a.ema


class TestTrimHelper:
    def test_trims_trailing_silence(self):
        from prompt_tts_tpu.utils.wav import trim_trailing_silence as _trim_trailing_silence
        sr = 24000
        speech = np.sin(np.arange(sr) * 0.05).astype(np.float32)
        silence = np.zeros(sr, np.float32)
        wav = np.concatenate([speech, silence])
        out = _trim_trailing_silence(wav)
        assert len(out) < len(wav)
        assert len(out) >= len(speech)

    def test_all_silence_untouched(self):
        from prompt_tts_tpu.utils.wav import trim_trailing_silence as _trim_trailing_silence
        wav = np.zeros(24000, np.float32)
        out = _trim_trailing_silence(wav)
        assert len(out) == len(wav)  # nothing active -> no trim

    def test_short_input(self):
        from prompt_tts_tpu.utils.wav import trim_trailing_silence as _trim_trailing_silence
        wav = np.ones(100, np.float32)
        assert len(_trim_trailing_silence(wav)) == 100


class TestTextFileInput:
    def test_text_file_loads_lines(self, tmp_path):
        from prompt_tts_tpu.cli import synthesize as syn
        tf = tmp_path / "lines.txt"
        tf.write_text("First utterance.\n\nSecond one.\n")
        args = syn.parse_args(["--text_file", str(tf), "--out", "x.wav"])
        assert args.text is None and args.text_file == str(tf)

    def test_both_sources_rejected(self, tmp_path):
        import pytest as _pytest
        from prompt_tts_tpu.cli import synthesize as syn
        tf = tmp_path / "lines.txt"
        tf.write_text("hello\n")
        with _pytest.raises(SystemExit):
            syn.main(["--text", "a", "--text_file", str(tf),
                      "--out", "x.wav"])

    def test_neither_source_rejected(self):
        import pytest as _pytest
        from prompt_tts_tpu.cli import synthesize as syn
        with _pytest.raises(SystemExit):
            syn.main(["--out", "x.wav"])

    def test_empty_file_rejected(self, tmp_path):
        import pytest as _pytest
        from prompt_tts_tpu.cli import synthesize as syn
        tf = tmp_path / "empty.txt"
        tf.write_text("\n\n")
        with _pytest.raises(SystemExit):
            syn.main(["--text_file", str(tf), "--out", "x.wav"])
