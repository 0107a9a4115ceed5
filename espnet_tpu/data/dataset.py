"""scp-driven dataset + collate (reference: espnet2/train/dataset.py:261
ESPnetDataset, collate_fn.py:15 CommonCollateFn, preprocessor.py:30).

A dataset is a set of (path, name, type) triplets; __getitem__ returns
{name: np.ndarray}. The collate fn pads each names' arrays to bucketed
static shapes and adds `{name}_lengths`, producing the kwargs dict the
jitted train step consumes. Iter factories give epoch-seeded reproducible
shuffling (sequence_iter_factory.py:27).
"""
from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from espnet_tpu.data.batching import make_batches, pad_batch
from espnet_tpu.data.kaldi_io import load_scp_entry, read_scp
from espnet_tpu.data.wav import read_audio

INT_PAD = -1  # text padding (ignore_id), reference convention


def _load_sound(path: str) -> np.ndarray:
    _, wav = read_audio(path)
    if wav.ndim > 1:
        wav = wav[:, 0]
    return wav.astype(np.float32)


def _load_npy(path: str) -> np.ndarray:
    return np.load(path)


def _load_multichannel_sound(path: str) -> np.ndarray:
    """(L, C) multi-channel waveform (beamformer frontend input)."""
    _, wav = read_audio(path)
    if wav.ndim == 1:
        wav = wav[:, None]
    return wav.astype(np.float32)


def _load_hdf5(path: str) -> np.ndarray:
    from espnet_tpu.data.hdf5 import load_hdf5

    return load_hdf5(path)


def _load_sound_hdf5(path: str) -> np.ndarray:
    from espnet_tpu.data.hdf5 import load_sound_hdf5

    return load_sound_hdf5(path)


LOADERS: Dict[str, Callable[[str], np.ndarray]] = {
    "sound": _load_sound,
    "multichannel_sound": _load_multichannel_sound,
    "kaldi_ark": load_scp_entry,
    "npy": _load_npy,
    "hdf5": _load_hdf5,
    "sound.hdf5": _load_sound_hdf5,
    "text_int": lambda s: np.array([int(x) for x in s.split()], dtype=np.int32),
}


class ESPnetDataset:
    """Random-access dataset over scp files.

    path_name_type_list: [(path, name, type)], type in LOADERS or 'text'.
    For 'text', a preprocessor (tokenize→ids) must be given.
    """

    def __init__(
        self,
        path_name_type_list: Sequence[Tuple[str, str, str]],
        preprocessor: Optional[Callable[[str, Dict], Dict]] = None,
    ):
        self.specs = list(path_name_type_list)
        self.tables: Dict[str, Dict[str, str]] = {}
        self.types: Dict[str, str] = {}
        keys = None
        for path, name, typ in self.specs:
            table = read_scp(path)
            self.tables[name] = table
            self.types[name] = typ
            if keys is None:
                keys = list(table.keys())
        self.keys: List[str] = keys or []
        self.preprocessor = preprocessor

    def __len__(self) -> int:
        return len(self.keys)

    def __getitem__(self, uid: str) -> Dict[str, np.ndarray]:
        out: Dict[str, np.ndarray] = {}
        for name, table in self.tables.items():
            typ = self.types[name]
            val = table[uid]
            if typ == "text":
                out[name] = val  # raw string; preprocessor converts
            else:
                out[name] = LOADERS[typ](val)
        if self.preprocessor is not None:
            out = self.preprocessor(uid, out)
        return out


class CommonPreprocessor:
    """Tokenize 'text' fields to int ids (preprocessor.py:30)."""

    def __init__(self, tokenizer, converter, text_names: Sequence[str] = ("text",)):
        self.tokenizer = tokenizer
        self.converter = converter
        self.text_names = text_names

    def __call__(self, uid: str, data: Dict) -> Dict:
        for name in self.text_names:
            if name in data and isinstance(data[name], str):
                toks = self.tokenizer.text2tokens(data[name])
                data[name] = np.array(
                    self.converter.tokens2ids(toks), dtype=np.int32
                )
        return data


def common_collate(
    samples: List[Dict[str, np.ndarray]],
    int_pad: int = INT_PAD,
    float_pad: float = 0.0,
    bucket: bool = True,
) -> Dict[str, np.ndarray]:
    """List of sample dicts → padded batch dict with *_lengths."""
    out: Dict[str, np.ndarray] = {}
    names = samples[0].keys()
    for name in names:
        arrays = [s[name] for s in samples]
        if arrays[0].ndim == 0:
            out[name] = np.stack(arrays)
            continue
        pad = int_pad if np.issubdtype(arrays[0].dtype, np.integer) else float_pad
        padded, lens = pad_batch(arrays, pad_value=pad, bucket=bucket)
        out[name] = padded
        out[f"{name}_lengths"] = lens
    return out


class SequenceIterFactory:
    """Epoch-seeded reproducible batch iterator
    (sequence_iter_factory.py:27)."""

    def __init__(
        self,
        dataset: ESPnetDataset,
        shapes: Dict[str, Sequence[int]],
        batch_size: int = 32,
        batch_bins: Optional[int] = None,
        mode: str = "seq",
        seed: int = 0,
        sortagrad: bool = False,
        shuffle: bool = True,
        collate: Callable = common_collate,
        categories: "Dict[str, str] | None" = None,
    ):
        self.dataset = dataset
        self.shapes = shapes
        self.batch_size = batch_size
        self.batch_bins = batch_bins
        self.mode = mode
        self.seed = seed
        self.sortagrad = sortagrad
        self.shuffle = shuffle
        self.collate = collate
        self.categories = categories

    def __call__(self, epoch: int) -> Iterable[Dict[str, np.ndarray]]:
        batches = make_batches(
            self.shapes,
            batch_size=self.batch_size,
            batch_bins=self.batch_bins,
            mode=self.mode,
            sortagrad=self.sortagrad and epoch == 1,
            shuffle_seed=(self.seed + epoch) if self.shuffle else None,
            categories=self.categories,
        )
        for batch_keys in batches:
            yield self.collate([self.dataset[k] for k in batch_keys])


class ChunkIterFactory:
    """Fixed-length chunk batches for enhancement training
    (reference: espnet2/iterators/chunk_iter_factory.py:19): long
    utterances are cut into `chunk_length` windows; chunks are shuffled
    epoch-seeded and batched — every batch has identical static shape.
    """

    def __init__(
        self,
        dataset: ESPnetDataset,
        shapes: Dict[str, Sequence[int]],
        chunk_length: int = 16000,
        batch_size: int = 8,
        seed: int = 0,
        shuffle: bool = True,
        speech_name: str = "speech_mix",
    ):
        self.dataset = dataset
        self.shapes = shapes
        self.chunk_length = chunk_length
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.speech_name = speech_name

    def __call__(self, epoch: int) -> Iterable[Dict[str, np.ndarray]]:
        L = self.chunk_length
        chunks = []  # (uid, start)
        for uid, shp in self.shapes.items():
            n = int(shp[0])
            for start in range(0, max(n - L + 1, 1), L):
                if start + L <= n:
                    chunks.append((uid, start))
        rng = np.random.RandomState(self.seed + epoch)
        if self.shuffle:
            rng.shuffle(chunks)
        for i in range(0, len(chunks) - self.batch_size + 1, self.batch_size):
            group = chunks[i: i + self.batch_size]
            batch: Dict[str, List[np.ndarray]] = {}
            for uid, start in group:
                sample = self.dataset[uid]
                for name, arr in sample.items():
                    if arr.ndim >= 1 and arr.shape[-1] >= start + L:
                        arr = arr[..., start: start + L]
                    batch.setdefault(name, []).append(arr)
            out = {k: np.stack(v) for k, v in batch.items()}
            out[f"{self.speech_name}_lengths"] = np.full(
                len(group), L, dtype=np.int32
            )
            yield out


class MultipleIterFactory:
    """Corpus-split iterator (reference: espnet2/iterators/
    multiple_iter_factory.py): the utterance set is partitioned into
    `num_splits` groups and each epoch streams the splits one after
    another, building the inner SequenceIterFactory per split on demand —
    bounds host memory on corpora too large to batch-plan at once.

    Split ORDER is shuffled epoch-seeded (like the reference's
    shuffled split files); batching inside a split is delegated to
    SequenceIterFactory with a per-(epoch, split) seed so every epoch
    sees a fresh batch order while remaining reproducible.
    """

    def __init__(
        self,
        dataset: ESPnetDataset,
        shapes: Dict[str, Sequence[int]],
        num_splits: int = 2,
        seed: int = 0,
        shuffle: bool = True,
        **iter_kwargs,
    ):
        self.dataset = dataset
        self.shapes = shapes
        self.num_splits = max(int(num_splits), 1)
        self.seed = seed
        self.shuffle = shuffle
        self.iter_kwargs = iter_kwargs

    def __call__(self, epoch: int) -> Iterable[Dict[str, np.ndarray]]:
        keys = sorted(self.shapes.keys())
        n = self.num_splits
        splits = [keys[i::n] for i in range(n)]
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(order)
        for rank, si in enumerate(order):
            if not splits[si]:
                continue
            sub_shapes = {k: self.shapes[k] for k in splits[si]}
            sub = SequenceIterFactory(
                self.dataset,
                sub_shapes,
                seed=self.seed + 1000 * (si + 1),
                shuffle=self.shuffle,
                **self.iter_kwargs,
            )
            yield from sub(epoch)
