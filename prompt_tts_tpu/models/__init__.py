"""Model zoo: text encoder, conditional 1-D UNet, and the TTS composite."""

from prompt_tts_tpu.models.text_encoder import TextEncoder
from prompt_tts_tpu.models.tts import TTSSingleSpeaker
from prompt_tts_tpu.models.unet1d import UNet1DCondition

__all__ = ["TextEncoder", "UNet1DCondition", "TTSSingleSpeaker"]
