"""Data layer: corpus datasets and fixed-shape host batching."""

from prompt_tts_tpu.data.dataset import CodeDataset, SyntheticDataset

__all__ = ["CodeDataset", "StreamingCodeDataset", "SyntheticDataset"]


def __getattr__(name):
    # StreamingCodeDataset imported lazily (pulls in the native bindings)
    if name == "StreamingCodeDataset":
        from prompt_tts_tpu.data.streaming import StreamingCodeDataset
        return StreamingCodeDataset
    raise AttributeError(name)
