"""ASR pseudo-labeling tool: full tar -> transcribe -> resume path.

Covers BOTH architectures the tool supports:
* the reference's actual seq2seq Speech2Text path (reference
  data_preparation/asr/generate_transcript.py:13-18,44-70) — a tiny
  random s2t checkpoint built offline; the stock tokenizer needs the
  sentencepiece wheel (absent here), so decode goes through the in-repo
  decode-only unigram shim (prompt_tts_tpu/data/unigram.py), which is
  exactly the fallback the tool ships;
* the beyond-reference wav2vec2 CTC auto-detect path, whose char
  tokenizer needs only a vocab.json.
Both run the same surrounding machinery: tar read, wav decode, batching,
processor, model, decode, resumable ignore-list, output tar.
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


@pytest.fixture(scope="module")
def tiny_s2t_checkpoint(tmp_path_factory):
    """Tiny random Speech2Text seq2seq checkpoint, built offline.

    vocab.json carries sentencepiece-style unigram pieces ("▁"-marked)
    so decode exercises the SPM whitespace convention.
    """
    d = tmp_path_factory.mktemp("tiny_s2t")
    import torch
    from transformers import (
        Speech2TextConfig,
        Speech2TextFeatureExtractor,
        Speech2TextForConditionalGeneration,
    )

    pieces = ["<s>", "<pad>", "</s>", "<unk>"] + [
        "▁the", "▁a", "▁and", "cat", "dog", "s",
        "▁quick", "brown", "ing", "ed", "▁fox",
    ]
    vocab = {t: i for i, t in enumerate(pieces)}
    (d / "vocab.json").write_text(json.dumps(vocab), encoding="utf-8")
    (d / "special_tokens_map.json").write_text(json.dumps({
        "bos_token": "<s>", "eos_token": "</s>",
        "pad_token": "<pad>", "unk_token": "<unk>"}))

    torch.manual_seed(0)
    cfg = Speech2TextConfig(
        vocab_size=len(vocab), d_model=32, encoder_layers=1,
        decoder_layers=1, encoder_attention_heads=2,
        decoder_attention_heads=2, encoder_ffn_dim=64, decoder_ffn_dim=64,
        num_conv_layers=1, conv_kernel_sizes=(5,), conv_channels=32,
        input_feat_per_channel=80, input_channels=1,
        max_source_positions=600, max_target_positions=32,
        pad_token_id=1, bos_token_id=0, eos_token_id=2,
        decoder_start_token_id=2, max_length=8,
        architectures=["Speech2TextForConditionalGeneration"])
    Speech2TextForConditionalGeneration(cfg).save_pretrained(str(d))
    Speech2TextFeatureExtractor(
        feature_size=80, num_mel_bins=80, sampling_rate=16000,
        padding_value=0.0).save_pretrained(str(d))
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

    def test_s2t_seq2seq_branch(self, tiny_s2t_checkpoint, wav_tar,
                                tmp_path, capsys):
        """The reference's actual Speech2Text generate path, end to end
        (through the sentencepiece-free unigram decode fallback)."""
        state = str(tmp_path / "state_s2t")
        os.makedirs(state)
        main(["--input_file", wav_tar,
              "--model_dir", tiny_s2t_checkpoint,
              "--batch_size", "2", "--state_dir", state])
        out_tar = wav_tar.replace(".tar", "_asr.tar")
        with tarfile.open(out_tar) as tf:
            names = sorted(tf.getnames())
            assert names == ["u0.txt", "u1.txt", "u2.txt"]
            for n in names:
                text = tf.extractfile(n).read().decode()
                # decode-only shim: no special tokens, no raw SPM marker
                assert "▁" not in text and "<" not in text
        assert "3 transcripts" in capsys.readouterr().out

        # resume is a no-op on the second run
        main(["--input_file", wav_tar,
              "--model_dir", tiny_s2t_checkpoint,
              "--batch_size", "2", "--state_dir", state])
        assert "0 transcripts" in capsys.readouterr().out


class TestUnigramDecoder:
    def test_decode_semantics(self, tiny_s2t_checkpoint):
        from prompt_tts_tpu.data.unigram import UnigramDecoder
        dec = UnigramDecoder(tiny_s2t_checkpoint)
        # "▁" marks word START; unmarked pieces are continuations:
        # "<s> ▁the ▁fox s </s> ▁quick brown <pad>" -> "the foxs quickbrown"
        ids = [0, 4, 14, 9, 2, 10, 11, 1]
        assert dec.decode(ids) == "the foxs quickbrown"
        assert dec.batch_decode([ids, [2, 1]]) == ["the foxs quickbrown",
                                                   ""]
