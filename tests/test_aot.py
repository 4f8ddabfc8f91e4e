"""AOT synthesis-program export (aot.py + cli/export_program.py).

The artifact must reproduce the live jitted program BIT-FOR-BIT when
reloaded on the same platform: same StableHLO, same backend, same
inputs -> identical int16 PCM.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from prompt_tts_tpu import aot
from prompt_tts_tpu.config import Config, ModelConfig, TrainConfig
from prompt_tts_tpu.pipeline import Synthesizer, codes_to_latents

TINY = dict(
    block_out_channels=(32, 64, 64, 64), cross_attention_dim=64,
    attention_head_dim=32, text_encoder_layers=1, cmu_seq_len=32,
    sample_size=48, layers_per_block=1, unet_num_heads=4)


def _tiny_synth(**model_kw):
    cfg = Config(model=ModelConfig(**TINY, **model_kw),
                 train=TrainConfig())
    return Synthesizer(config=cfg, num_inference_steps=2,
                       dtype=jnp.float32)


@pytest.mark.slow
class TestExportRoundTrip:
    def test_pcm16_bit_exact(self, tmp_path):
        synth = _tiny_synth()
        path = str(tmp_path / "synth_b2.ptts")
        header = aot.export_synthesis(synth, 2, path, pcm16=True)
        assert header["batch_size"] == 2 and header["pcm16"]

        prog = aot.SynthesisProgram(path)
        texts = ["hello world", "printing"]
        got, codes = prog.synthesize(texts, seed=3, return_codes=True)
        want, want_codes = synth.synthesize(
            texts, seed=3, pcm16=True, return_codes=True)
        assert got.dtype == np.int16
        np.testing.assert_array_equal(got, np.asarray(want))
        np.testing.assert_array_equal(codes, want_codes)

    def test_float32_and_batch_guard(self, tmp_path):
        synth = _tiny_synth()
        path = str(tmp_path / "synth_f32.ptts")
        aot.export_synthesis(synth, 1, path, pcm16=False)
        prog = aot.SynthesisProgram(path)
        got = prog.synthesize(["one"], seed=0)
        want = synth.synthesize(["one"], seed=0)
        assert got.dtype == np.float32
        np.testing.assert_array_equal(got, np.asarray(want))
        with pytest.raises(ValueError, match="batch-1"):
            prog.synthesize(["a", "b"])

    def test_prompted_model(self, tmp_path):
        synth = _tiny_synth(prompt_conditioning=True, prompt_frames=24,
                            prompt_encoder_layers=1, prompt_tokens=8)
        path = str(tmp_path / "synth_prompted.ptts")
        header = aot.export_synthesis(synth, 1, path, pcm16=True)
        assert header["prompted"] and header["prompt_frames"] == 24

        prog = aot.SynthesisProgram(path)
        codes = np.full((1, 8, 24), 512, np.int32)
        lat = np.asarray(codes_to_latents(jnp.asarray(codes)))
        got = prog.synthesize(["speak"], seed=1, prompt_latents=lat)
        want = synth.synthesize(["speak"], seed=1, pcm16=True,
                                prompt_codes=codes)
        np.testing.assert_array_equal(got, np.asarray(want))
        with pytest.raises(ValueError, match="prompt_latents"):
            prog.synthesize(["speak"])

        # a SHORTER prompt is padded/cropped exactly like the live
        # Synthesizer._device_args, so the deployment API matches the
        # live API for arbitrary-length prompts
        short_codes = np.full((1, 8, 10), 512, np.int32)
        short_lat = np.asarray(codes_to_latents(jnp.asarray(short_codes)))
        got_s = prog.synthesize(["speak"], seed=1, prompt_latents=short_lat)
        want_s = synth.synthesize(["speak"], seed=1, pcm16=True,
                                  prompt_codes=short_codes)
        np.testing.assert_array_equal(got_s, np.asarray(want_s))

    def test_bad_magic_rejected(self, tmp_path):
        path = tmp_path / "junk.ptts"
        path.write_bytes(b"NOTANART" + b"\x00" * 16)
        with pytest.raises(ValueError, match="not a ptts AOT artifact"):
            aot.load_synthesis(str(path))

    def test_wrong_version_rejected(self, tmp_path):
        import json
        import struct
        path = tmp_path / "old.ptts"
        hdr = json.dumps({"version": 1}).encode()
        path.write_bytes(b"PTTSAOT1" + struct.pack("<I", len(hdr)) + hdr)
        with pytest.raises(ValueError, match="version 1"):
            aot.load_synthesis(str(path))

    def test_wrong_platform_rejected(self, tmp_path):
        # header claims a platform set disjoint from the current backend
        import json
        import struct
        path = tmp_path / "wrongplat.ptts"
        hdr = json.dumps({
            "version": 2, "platforms": ["nonexistent_hw"],
            "model_params_nbytes": 0, "codec_params_nbytes": 0,
        }).encode()
        path.write_bytes(b"PTTSAOT1" + struct.pack("<I", len(hdr)) + hdr)
        with pytest.raises(ValueError, match="current backend"):
            aot.load_synthesis(str(path))

    def test_sharded_synth_refused(self, tmp_path):
        # an SP/TP-armed synthesizer traces collectives over a mesh the
        # loading box cannot reconstruct — export must refuse clearly
        import jax
        from prompt_tts_tpu.parallel.mesh import make_mesh
        devs = jax.devices()
        if len(devs) < 2:
            pytest.skip("needs >=2 devices")
        mesh = make_mesh(n_seq=2)
        cfg = Config(model=ModelConfig(**TINY), train=TrainConfig())
        synth = Synthesizer(config=cfg, num_inference_steps=2,
                            dtype=jnp.float32, mesh=mesh)
        with pytest.raises(ValueError, match="mesh-sharded"):
            aot.export_synthesis(synth, 2, str(tmp_path / "sp.ptts"))


@pytest.mark.slow
class TestExportCLI:
    def test_cli_check(self, tmp_path):
        from prompt_tts_tpu.cli import export_program
        out = str(tmp_path / "cli.ptts")
        # tiny config via a JSON file so the CLI path is exercised
        import json
        cfg_path = tmp_path / "cfg.json"
        cfg_path.write_text(json.dumps(dict(TINY)))
        export_program.main([
            "--out", out, "--batch", "1", "--steps", "2",
            "--config_file", str(cfg_path), "--check"])
        prog = aot.SynthesisProgram(out)
        assert prog.batch_size == 1
