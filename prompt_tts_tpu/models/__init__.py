"""Model zoo: text/prompt encoders, conditional 1-D UNet, TTS composites."""

from prompt_tts_tpu.models.prompt_encoder import PromptEncoder
from prompt_tts_tpu.models.prompt_tts import TTSPromptSpeaker
from prompt_tts_tpu.models.text_encoder import TextEncoder
from prompt_tts_tpu.models.tts import TTSSingleSpeaker
from prompt_tts_tpu.models.unet1d import UNet1DCondition

__all__ = ["PromptEncoder", "TextEncoder", "UNet1DCondition",
           "TTSSingleSpeaker", "TTSPromptSpeaker"]
