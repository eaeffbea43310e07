"""Input pipeline: clip sampling → host batching/augmentation → device
prefetch.

Host side stays uint8 (4× less host→device bandwidth); normalization to
float happens on device inside the jitted step (see train/loop.py).  Decode
and augmentation run in a thread pool overlapped with device compute via a
double-buffered prefetch queue — the TPU-native replacement for the
reference's PyTorch DataLoader feeding 2-GPU DDP (reference:
website/src/pages/[lang]/reprod/index.astro:238-246).
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import flax.struct
import jax
import numpy as np

from gdkvm_tpu.config.schema import DataConfig


@flax.struct.dataclass
class Batch:
    """One training/eval batch.

    frames: (B, T, H, W, 1) uint8.
    masks:  (B, T, H, W) uint8 class ids.
    valid:  (B, T) float32 — 1 where the frame has ground truth.
    """
    frames: jax.Array
    masks: jax.Array
    valid: jax.Array


def make_dataset(cfg: DataConfig, split: str, num_classes: int):
    """Dataset factory keyed by cfg.dataset."""
    if cfg.dataset == "synthetic":
        from gdkvm_tpu.data.synthetic import SyntheticDataset
        n = 64 if split == "train" else 8
        return SyntheticDataset(num_clips=n, clip_len=cfg.clip_len,
                                image_size=cfg.image_size,
                                num_classes=num_classes,
                                seed=cfg.seed + (0 if split == "train" else 1),
                                difficulty=cfg.synth_difficulty)
    if cfg.dataset == "camus":
        from gdkvm_tpu.data.camus import CamusDataset
        return CamusDataset(cfg.data_path, split=split,
                            image_size=cfg.image_size,
                            clip_len=cfg.clip_len, num_classes=num_classes)
    if cfg.dataset == "echonet":
        from gdkvm_tpu.data.echonet import EchoNetDataset
        return EchoNetDataset(cfg.data_path, split=split,
                              image_size=cfg.image_size,
                              clip_len=cfg.clip_len, num_classes=num_classes,
                              seed=cfg.seed)
    if cfg.dataset == "packed":
        from gdkvm_tpu.data.packed import PackedDataset
        return PackedDataset(os.path.join(cfg.data_path, f"{split}.pck"),
                             num_workers=cfg.num_workers)
    raise ValueError(f"unknown dataset {cfg.dataset!r}")


def _augment(rng: np.random.Generator, frames: np.ndarray,
             masks: np.ndarray, occlude_prob: float = 0.0
             ) -> tuple[np.ndarray, np.ndarray]:
    """Cheap host-side augmentation: horizontal flip, brightness/gamma,
    and optional acoustic-dropout occlusion (frames blanked, GT kept — the
    loss then forces the model to read through the gap from memory)."""
    if rng.random() < 0.5:
        frames = frames[:, :, ::-1]
        masks = masks[:, :, ::-1]
    if rng.random() < 0.5:
        gain = rng.uniform(0.8, 1.25)
        gamma = rng.uniform(0.8, 1.25)
        x = frames.astype(np.float32) / 255.0
        x = np.clip(gain * np.power(x, gamma), 0, 1)
        frames = (x * 255).astype(np.uint8)
    if occlude_prob > 0:
        frames = _occlude(rng, np.ascontiguousarray(frames), occlude_prob)
    return np.ascontiguousarray(frames), np.ascontiguousarray(masks)


def _occlude(rng: np.random.Generator, frames: np.ndarray,
             occlude_prob: float) -> np.ndarray:
    """Blank a region over 1-4 consecutive frames (never frame 0)."""
    if rng.random() >= occlude_prob:
        return frames
    t_total, hh, ww = frames.shape[:3]
    if t_total <= 1:
        return frames
    span = int(rng.integers(1, min(4, t_total - 1) + 1))
    start = int(rng.integers(1, t_total - span + 1))
    oh = int(rng.uniform(0.4, 0.7) * hh)
    ow = int(rng.uniform(0.4, 0.7) * ww)
    oy = int(rng.integers(0, hh - oh + 1))
    ox = int(rng.integers(0, ww - ow + 1))
    frames[start:start + span, oy:oy + oh, ox:ox + ow] = 0
    return frames


def batch_iterator(dataset, batch_size: int, *, shuffle: bool = True,
                   augment: bool = False, occlude_prob: float = 0.0,
                   seed: int = 0,
                   num_workers: int = 4, drop_last: bool = True,
                   loop: bool = True, start_step: int = 0
                   ) -> Iterator[Batch]:
    """Yield host-side Batch objects forever (loop=True) or one epoch.

    Deterministic by construction: every random draw derives from
    ``(seed, epoch, batch, slot)`` via independent Generators, so the
    batch stream is identical regardless of thread scheduling, and
    ``start_step`` fast-forwards the schedule without touching data —
    resume reproduces the exact batch sequence a straight-through run
    would have seen (SURVEY §5 checkpoint/resume: iterator state is a
    pure function of (seed, step)).
    """
    pool = ThreadPoolExecutor(max_workers=max(num_workers, 1))
    n = len(dataset)
    if drop_last:
        batches_per_epoch = max(n // batch_size, 1)
    else:
        batches_per_epoch = max(-(-n // batch_size), 1)

    def load(args) -> tuple:
        idx, erng = args
        frames, masks, valid = dataset[idx]
        if augment:
            f, m = _augment(erng, frames, masks, occlude_prob)
            return f, m, valid
        return frames, masks, valid

    # Fast path: PCK datasets gather a whole batch in one native call
    # (thread-pool memcpy + flip, no GIL) — see gdkvm_tpu/data/packed.py.
    has_gather = hasattr(dataset, "gather")

    epoch = (start_step // batches_per_epoch) if loop else 0
    step = epoch * batches_per_epoch
    while True:
        order = np.arange(n)
        if shuffle:
            np.random.default_rng((seed, epoch, 0x0D0E)).shuffle(order)
        for bi, lo in enumerate(range(0, n, batch_size)):
            idxs = order[lo:lo + batch_size]
            if len(idxs) < batch_size and drop_last:
                continue
            if step < start_step:
                step += 1
                continue
            step += 1
            if has_gather:
                brng = np.random.default_rng((seed, epoch, bi))
                flips = (brng.random(len(idxs)) < 0.5).astype(np.uint8) \
                    if augment else None
                frames, masks, valid = dataset.gather(idxs, flips)
                if augment:
                    # The native gather handles flips (GIL-free memcpy
                    # path); gain/gamma applies here as a per-clip
                    # 256-entry uint8 LUT — one vectorized np.take pass,
                    # no per-pixel pow (the host has 1 CPU).
                    for j in range(frames.shape[0]):
                        crng = np.random.default_rng(
                            (seed, epoch, bi, j, 1))
                        if crng.random() < 0.5:
                            gain = crng.uniform(0.8, 1.25)
                            gamma = crng.uniform(0.8, 1.25)
                            lut = (np.clip(
                                gain * (np.arange(256) / 255.0) ** gamma,
                                0, 1) * 255).astype(np.uint8)
                            frames[j] = lut[frames[j]]
                    if occlude_prob > 0:
                        for j in range(frames.shape[0]):
                            frames[j] = _occlude(
                                np.random.default_rng((seed, epoch, bi, j)),
                                frames[j], occlude_prob)
                yield Batch(frames=frames, masks=masks, valid=valid)
                continue
            items = list(pool.map(load, [
                (int(idx), np.random.default_rng((seed, epoch, bi, j)))
                for j, idx in enumerate(idxs)]))
            yield Batch(
                frames=np.stack([it[0] for it in items]),
                masks=np.stack([it[1] for it in items]),
                valid=np.stack([it[2] for it in items]),
            )
        epoch += 1
        if not loop:
            break


def prefetch_to_device(iterator: Iterator[Batch], size: int = 2,
                       sharding: Optional[jax.sharding.Sharding] = None
                       ) -> Iterator[Batch]:
    """Double-buffered host→device prefetch.

    A daemon thread keeps `size` batches in flight on device (optionally
    laid out with `sharding`, e.g. batch-sharded over the ('data',) mesh
    axis), so the host transfer of batch N+1 overlaps the device compute of
    batch N.
    """
    q: queue.Queue = queue.Queue(maxsize=size)
    stop = object()
    # Cooperative shutdown: when the consumer abandons the generator
    # (break / GC / test teardown), the producer must stop touching the
    # device — a device_put racing backend teardown raises in the daemon
    # thread (shows up as PytestUnhandledThreadExceptionWarning).
    cancel = threading.Event()

    def q_put(item) -> bool:
        while not cancel.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in iterator:
                if cancel.is_set():
                    return
                if sharding is not None:
                    dev = jax.tree.map(
                        lambda x: jax.device_put(x, sharding), batch)
                else:
                    dev = jax.tree.map(jax.device_put, batch)
                if not q_put(dev):
                    return
        except BaseException as exc:   # surface data-thread death, don't
            q_put(exc)                 # hang the consumer on q.get()
            return
        q_put(stop)

    threading.Thread(target=producer, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is stop:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        cancel.set()
