"""Datasets over processed code tars + synthetic data for smoke tests.

Corpus format matches the reference pipeline output
(reference data_preparation/generate_code.py:54-86): an uncompressed tar
holding, per utterance, ``<id>.npy`` (EnCodec codes ``[8, T]`` int),
``<id>.len.txt`` (true frame count), ``<id>.txt`` and optionally
``<id>.normalized.txt``.

Differences from the reference loader (tts/dataloader.py:18-90), by design:
* codes are kept as int16 in RAM (vs float64 after ``/1023``) — ~8x smaller;
* batches come out channels-last ``[B, T, 8]`` float32 in [-1, 1]
  (the combined ``c/1023`` + Normalize(0.5, 0.5) map, dataloader.py:64,
  168-170, algebraically ``c * 2/1023 - 1``);
* phonemization is done once at load via the static-shape Tokenizer.
"""

import io
import queue
import tarfile
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np

from prompt_tts_tpu.data import native
from prompt_tts_tpu.frontend.tokenizer import Tokenizer

_CODE_SCALE = 2.0 / 1023.0  # c/1023 then (x-0.5)/0.5


def local_rows(idx: np.ndarray, process_shard) -> np.ndarray:
    """This process's row slice of a global batch's index set.

    ``process_shard``: ``None`` (whole batch) or ``(rank, count)`` — every
    process computes the SAME global order (seeded shuffle), then keeps
    rows ``[rank*b/count, (rank+1)*b/count)``.  Pairs with
    ``parallel.mesh.shard_local_batch``: under ``--multihost
    --per_process_data`` each host reads/collates only 1/count of every
    batch (the scalable data path — for streaming datasets the skipped
    rows are never read from disk at all)."""
    if process_shard is None:
        return idx
    rank, count = process_shard
    if len(idx) % count:
        raise ValueError(
            f"batch size {len(idx)} not divisible by process count {count}")
    loc = len(idx) // count
    return idx[rank * loc:(rank + 1) * loc]


def prefetch(iterator: Iterator, depth: int = 2) -> Iterator:
    """Run ``iterator`` in a background thread, ``depth`` items ahead.

    Host-side double buffering: batch collation overlaps device compute
    (the thread releases the GIL in the native collate / numpy copies).
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    stop = threading.Event()

    def worker():
        try:
            for item in iterator:
                if stop.is_set():
                    break
                q.put(item)
        finally:
            try:
                q.put_nowait(sentinel)
            except queue.Full:
                pass

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
    finally:
        # a consumer that abandons the generator (e.g. a one-batch
        # structure peek) must not leak the worker: signal stop, then
        # drain so a worker blocked in q.put() wakes, sees stop, exits
        stop.set()
        while True:
            try:
                q.get_nowait()
            except queue.Empty:
                break


class CodeDataset:
    """In-RAM dataset over a processed code tar (LJSpeech-scale).

    ``prompt_frames``: when set, each batch carries a ``prompt`` key — a
    random same-utterance crop of the normalized code latents
    ``[B, prompt_frames, n_q]`` for prompt-conditioned (multi-speaker)
    training.
    """

    def __init__(self, tar_path: str, max_seq_length: int = 550,
                 tokenizer: Optional[Tokenizer] = None,
                 prompt_frames: Optional[int] = None):
        self.max_seq_length = max_seq_length
        self.prompt_frames = prompt_frames
        tok = tokenizer or Tokenizer(max_len=max_seq_length)

        self.codes: List[np.ndarray] = []
        self.text_ids: List[np.ndarray] = []
        self.text_mask: List[np.ndarray] = []
        self.code_len: List[int] = []
        self.texts: List[str] = []

        with tarfile.open(tar_path, "r") as tf:
            names = set(tf.getnames())
            npy_names = sorted(n for n in names if n.endswith(".npy"))
            for name in npy_names:
                stem = name[: -len(".npy")]
                code = np.load(io.BytesIO(tf.extractfile(name).read()))
                if code.ndim != 2:
                    raise ValueError(f"{name}: expected [n_q, T] codes")
                text = tf.extractfile(stem + ".txt").read().decode()
                norm_name = stem + ".normalized.txt"
                text_norm = (tf.extractfile(norm_name).read().decode()
                             if norm_name in names else text)
                length = float(
                    tf.extractfile(stem + ".len.txt").read().decode())

                ids, mask = tok.encode(text_norm)
                self.codes.append(code.astype(np.int16))
                self.text_ids.append(ids)
                self.text_mask.append(mask)
                self.code_len.append(int(length))
                self.texts.append(text)

    def __len__(self) -> int:
        return len(self.codes)

    def batches(
        self,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = True,
        process_shard=None,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Fixed-shape numpy batches (static shapes for jit).

        ``process_shard=(rank, count)``: yield only this process's rows of
        each global batch (see :func:`local_rows`)."""
        n = len(self)
        order = np.arange(n)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        stop = n - batch_size + 1 if drop_last else n
        for start in range(0, max(stop, 0), batch_size):
            idx = order[start: start + batch_size]
            if drop_last and len(idx) < batch_size:
                break
            # crop seed folds in the epoch seed + batch position, so prompt
            # crops vary across epochs (not just across batch compositions);
            # sharded runs additionally fold the rank (each process draws
            # its own deterministic crop stream for its rows)
            crop_seed = ((seed, start) if process_shard is None
                         else (seed, start, process_shard[0]))
            yield self._collate(local_rows(idx, process_shard),
                                crop_seed=crop_seed)

    def _collate(self, idx: np.ndarray,
                 crop_seed=(0, 0)) -> Dict[str, np.ndarray]:
        codes = np.stack([self.codes[i] for i in idx])        # [B, 8, T]
        # native multithreaded normalize+transpose (numpy fallback inside)
        latents = native.collate_codes(codes)
        batch = {
            "codes": latents,
            "text_ids": np.stack([self.text_ids[i] for i in idx]),
            "text_mask": np.stack([self.text_mask[i] for i in idx]),
            "code_len": np.asarray([self.code_len[i] for i in idx],
                                   np.int32),
        }
        if self.prompt_frames:
            batch["prompt"] = _crop_prompts(
                latents,
                np.asarray([self.code_len[i] for i in idx]),
                self.prompt_frames, seed=crop_seed)
        return batch


def _crop_prompts(latents: np.ndarray, lengths: np.ndarray,
                  prompt_frames: int, seed=(0, 0)) -> np.ndarray:
    """Random same-utterance crops ``[B, prompt_frames, n_q]``.

    Crops stay inside the true (unpadded) frame span when possible.
    ``seed`` is an (epoch_seed, batch_start) pair: the same batch gets
    DIFFERENT crops in different epochs (augmentation), deterministically.
    """
    B, T, _ = latents.shape
    rng = np.random.default_rng(tuple(seed))
    out = np.zeros((B, prompt_frames, latents.shape[-1]), np.float32)
    for i in range(B):
        span = min(int(lengths[i]), T)
        hi = max(span - prompt_frames, 0)
        start = int(rng.integers(0, hi + 1))
        chunk = latents[i, start: start + prompt_frames]
        out[i, : chunk.shape[0]] = chunk
    return out


class SyntheticDataset:
    """Deterministic fake corpus for smoke tests and compile checks."""

    def __init__(self, n: int = 64, frames: int = 900, n_q: int = 8,
                 max_seq_length: int = 550, seed: int = 0,
                 prompt_frames=None):
        self.prompt_frames = prompt_frames
        rng = np.random.default_rng(seed)
        self.codes = rng.integers(
            0, 1024, size=(n, n_q, frames)).astype(np.int16)
        lens = rng.integers(8, max_seq_length // 2, size=n)
        self.text_ids = np.zeros((n, max_seq_length), np.int32)
        self.text_mask = np.zeros((n, max_seq_length), np.int32)
        for i, ln in enumerate(lens):
            self.text_ids[i, :ln] = rng.integers(1, 149, size=ln)
            self.text_mask[i, :ln] = 1
        self.code_len = np.full((n,), frames, np.int32)

    def __len__(self) -> int:
        return self.codes.shape[0]

    def batches(self, batch_size: int, shuffle: bool = False, seed: int = 0,
                drop_last: bool = True,
                process_shard=None) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self)
        order = np.arange(n)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for start in range(0, n - batch_size + 1, batch_size):
            idx = local_rows(order[start: start + batch_size],
                             process_shard)
            codes = self.codes[idx].astype(np.float32) * _CODE_SCALE - 1.0
            latents = np.ascontiguousarray(codes.transpose(0, 2, 1))
            batch = {
                "codes": latents,
                "text_ids": self.text_ids[idx],
                "text_mask": self.text_mask[idx],
                "code_len": self.code_len[idx],
            }
            if self.prompt_frames:
                crop_seed = ((seed, start) if process_shard is None
                             else (seed, start, process_shard[0]))
                batch["prompt"] = _crop_prompts(
                    latents, self.code_len[idx], self.prompt_frames,
                    seed=crop_seed)
            yield batch
