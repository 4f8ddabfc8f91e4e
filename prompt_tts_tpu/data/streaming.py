"""Streaming dataset: batches read lazily from the tar via the native index.

The reference materializes the whole corpus in RAM up front
(tts/dataloader.py:18-84, a SURVEY §7 defect for anything beyond LJSpeech).
This dataset keeps only the tar INDEX and tokenized text in memory; code
matrices are read per batch (native pread when available) and collated with
the C++ kernel, overlapped with device compute via
:func:`prompt_tts_tpu.data.dataset.prefetch`.

Suited to LibriTTS-scale corpora where codes alone would be tens of GB.
"""

import io
from typing import Dict, Iterator, Optional

import numpy as np

from prompt_tts_tpu.data import native
from prompt_tts_tpu.data.dataset import _crop_prompts, local_rows, prefetch
from prompt_tts_tpu.frontend.tokenizer import Tokenizer


class StreamingCodeDataset:
    """Lazy-reading dataset over a processed code tar."""

    def __init__(self, tar_path: str, max_seq_length: int = 550,
                 tokenizer: Optional[Tokenizer] = None,
                 prompt_frames: Optional[int] = None,
                 prefetch_depth: int = 2):
        self.tar_path = tar_path
        self.max_seq_length = max_seq_length
        self.prompt_frames = prompt_frames
        self.prefetch_depth = prefetch_depth
        tok = tokenizer or Tokenizer(max_len=max_seq_length)

        index = {name: (off, size)
                 for name, off, size in native.tar_index(tar_path)}
        self._items = []  # (npy_off, npy_size, ids, mask, code_len)
        for name, (off, size) in sorted(index.items()):
            if not name.endswith(".npy"):
                continue
            stem = name[: -len(".npy")]
            txt_key = (stem + ".normalized.txt"
                       if stem + ".normalized.txt" in index
                       else stem + ".txt")
            if txt_key not in index or stem + ".len.txt" not in index:
                continue
            t_off, t_size = index[txt_key]
            text = native.read_at(tar_path, t_off, t_size).decode()
            l_off, l_size = index[stem + ".len.txt"]
            length = float(native.read_at(tar_path, l_off, l_size).decode())
            ids, mask = tok.encode(text)
            self._items.append((off, size, ids, mask, int(length)))

    def __len__(self) -> int:
        return len(self._items)

    def _load_codes(self, i: int) -> np.ndarray:
        off, size, _, _, _ = self._items[i]
        buf = native.read_at(self.tar_path, off, size)
        return native.npy_to_i16(buf)

    def batches(self, batch_size: int, shuffle: bool = False, seed: int = 0,
                drop_last: bool = True,
                process_shard=None) -> Iterator[Dict[str, np.ndarray]]:
        """``process_shard=(rank, count)``: yield only this process's rows
        of each global batch — the rows other processes own are NEVER read
        from disk (per-host corpus I/O scales as 1/count)."""
        def gen():
            n = len(self)
            order = np.arange(n)
            if shuffle:
                np.random.default_rng(seed).shuffle(order)
            for start in range(0, n - batch_size + 1, batch_size):
                idx = local_rows(order[start: start + batch_size],
                                 process_shard)
                codes = np.stack([self._load_codes(i) for i in idx])
                latents = native.collate_codes(codes)
                batch = {
                    "codes": latents,
                    "text_ids": np.stack(
                        [self._items[i][2] for i in idx]),
                    "text_mask": np.stack(
                        [self._items[i][3] for i in idx]),
                    "code_len": np.asarray(
                        [self._items[i][4] for i in idx], np.int32),
                }
                if self.prompt_frames:
                    crop_seed = ((seed, start) if process_shard is None
                                 else (seed, start, process_shard[0]))
                    batch["prompt"] = _crop_prompts(
                        latents, batch["code_len"], self.prompt_frames,
                        seed=crop_seed)
                yield batch

        return prefetch(gen(), depth=self.prefetch_depth)
