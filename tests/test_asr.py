"""ASR pseudo-labeling tool: full tar -> transcribe -> resume path.

The reference's tool (data_preparation/asr/generate_transcript.py:44-70)
hard-codes a local Speech2Text checkpoint; a real s2t tokenizer cannot be
constructed offline here (sentencepiece is not installed), so the
end-to-end exercise uses a tiny random wav2vec2 CTC checkpoint — whose
char tokenizer needs only a vocab.json — through the SAME tool code path
(tar read, wav decode, batching, processor, model, decode, resumable
ignore-list, output tar).  Only the `model.generate` branch is specific to
the seq2seq architecture.
"""

import io
import json
import os
import tarfile

import numpy as np
import pytest

from prompt_tts_tpu.cli.generate_transcript import main, parse_args
from prompt_tts_tpu.utils.wav import write_wav


@pytest.fixture(scope="module")
def tiny_ctc_checkpoint(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_wav2vec2")
    import torch
    from transformers import (
        Wav2Vec2Config,
        Wav2Vec2CTCTokenizer,
        Wav2Vec2FeatureExtractor,
        Wav2Vec2ForCTC,
        Wav2Vec2Processor,
    )

    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3, "|": 4}
    for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz"):
        vocab[ch] = 5 + i
    vocab_path = d / "vocab.json"
    vocab_path.write_text(json.dumps(vocab))

    tok = Wav2Vec2CTCTokenizer(str(vocab_path), unk_token="<unk>",
                               pad_token="<pad>", word_delimiter_token="|")
    fe = Wav2Vec2FeatureExtractor(feature_size=1, sampling_rate=16000,
                                  padding_value=0.0,
                                  return_attention_mask=False)
    processor = Wav2Vec2Processor(feature_extractor=fe, tokenizer=tok)
    processor.save_pretrained(str(d))

    torch.manual_seed(0)
    cfg = Wav2Vec2Config(
        vocab_size=len(vocab), hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        conv_dim=(32, 32), conv_stride=(4, 4), conv_kernel=(8, 8),
        num_feat_extract_layers=2, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=2, do_stable_layer_norm=False,
        architectures=["Wav2Vec2ForCTC"])
    model = Wav2Vec2ForCTC(cfg)
    model.save_pretrained(str(d))
    return str(d)


@pytest.fixture()
def wav_tar(tmp_path):
    tar_path = tmp_path / "cut.tar"
    rng = np.random.default_rng(0)
    with tarfile.open(tar_path, "w") as tf:
        for i in range(3):
            wav = (rng.standard_normal(16000 // 4) * 0.1).astype(np.float32)
            tmp = tmp_path / f"u{i}.wav"
            write_wav(str(tmp), wav, 16000)
            tf.add(str(tmp), arcname=f"u{i}.wav")
    return str(tar_path)


class TestGenerateTranscript:
    def test_args(self):
        a = parse_args(["--input_file", "x.tar", "--model_dir", "m"])
        assert a.batch_size == 8 and a.state_dir == "."

    def test_missing_model_dir_exits(self, tmp_path):
        with pytest.raises(SystemExit):
            main(["--input_file", "x.tar",
                  "--model_dir", str(tmp_path / "nope")])

    def test_transcribe_and_resume(self, tiny_ctc_checkpoint, wav_tar,
                                   tmp_path, capsys):
        state = str(tmp_path / "state")
        os.makedirs(state)
        main(["--input_file", wav_tar,
              "--model_dir", tiny_ctc_checkpoint,
              "--batch_size", "2", "--state_dir", state])
        out_tar = wav_tar.replace(".tar", "_asr.tar")
        with tarfile.open(out_tar) as tf:
            names = sorted(tf.getnames())
            assert names == ["u0.txt", "u1.txt", "u2.txt"]
            # transcripts decode as text (random weights -> maybe empty)
            for n in names:
                tf.extractfile(n).read().decode()
        assert "3 transcripts" in capsys.readouterr().out

        # ignore list written per item -> a second run is a no-op resume
        ignore = open(os.path.join(state, "asr_ignore_list.txt")).read()
        assert ignore.count("\n") == 3
        main(["--input_file", wav_tar,
              "--model_dir", tiny_ctc_checkpoint,
              "--batch_size", "2", "--state_dir", state])
        assert "0 transcripts" in capsys.readouterr().out
        with tarfile.open(out_tar) as tf:
            assert len(tf.getnames()) == 3  # nothing re-appended
