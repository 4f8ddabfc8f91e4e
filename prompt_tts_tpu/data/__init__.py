"""Data layer: corpus datasets and fixed-shape host batching."""

from prompt_tts_tpu.data.dataset import CodeDataset, SyntheticDataset

__all__ = ["CodeDataset", "SyntheticDataset"]
