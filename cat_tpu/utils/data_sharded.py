"""Sharded streaming dataset for large corpora (10k-hour scale).

Counterpart of the reference's WebDataset path
(/root/reference/cat/shared/manager.py:100-202 — brace-expanded tar
shards, split_by_node, shuffle buffer, on-the-fly tokenization,
PipeDynamicBatching; shard writer cat/utils/data/prep_wds.py:38-328;
rationale docs/how_to_prepare_large_dataset.md).

Native design: shards are .npz archives (sequential reads, no tar
parsing); an iterator pipeline does host-sharding → shard shuffle →
within-buffer shuffle → tokenize → static-shape bucket batching, with a
background prefetch thread so device steps never wait on IO.
"""
from __future__ import annotations

import glob
import os
import queue
import re
import threading

import numpy as np

from cat_tpu.utils.data import Batch


def write_shards(out_dir, utterances, tokenizer=None, shard_size=500,
                 prefix="shard"):
    """utterances: iterable of (uid, feats (T,F) f32, transcript str or
    ids). Writes {prefix}-NNNNNN.npz files; returns shard count."""
    os.makedirs(out_dir, exist_ok=True)
    buf, shard_idx = [], 0

    def flush():
        nonlocal buf, shard_idx
        if not buf:
            return
        feats = np.concatenate([u[1] for u in buf]).astype(np.float32)
        offsets = np.cumsum([0] + [u[1].shape[0] for u in buf])
        labels_flat, label_offsets = [], [0]
        for u in buf:
            ids = (tokenizer.encode(u[2]) if isinstance(u[2], str)
                   else list(u[2]))
            labels_flat.extend(ids)
            label_offsets.append(label_offsets[-1] + len(ids))
        np.savez(os.path.join(out_dir,
                              f"{prefix}-{shard_idx:06d}.npz"),
                 feats=feats, offsets=offsets,
                 labels=np.asarray(labels_flat, np.int32),
                 label_offsets=np.asarray(label_offsets, np.int64),
                 uids=np.asarray([u[0] for u in buf]))
        buf = []
        shard_idx += 1

    for utt in utterances:
        buf.append(utt)
        if len(buf) >= shard_size:
            flush()
    flush()
    return shard_idx


def expand_shards(pattern):
    """Brace expansion 'shard-{000000..000009}.npz' or glob."""
    m = re.search(r"\{(\d+)\.\.(\d+)\}", pattern)
    if m:
        lo, hi = m.group(1), m.group(2)
        width = len(lo)
        return [pattern[:m.start()] + str(i).zfill(width)
                + pattern[m.end():]
                for i in range(int(lo), int(hi) + 1)]
    return sorted(glob.glob(pattern))


class ShardedSpeechDataset:
    """Iterator-style dataset over npz shards.

    split_by_node semantics: shards[host_index::host_count]."""

    def __init__(self, pattern, host_index=0, host_count=1,
                 shuffle_shards=True, shuffle_buffer=256, seed=0):
        self.shards = expand_shards(pattern)
        if not self.shards:
            raise FileNotFoundError(pattern)
        self.host_index = host_index
        self.host_count = host_count
        self.shuffle_shards = shuffle_shards
        self.shuffle_buffer = shuffle_buffer
        self.seed = seed

    def epoch(self, epoch_idx):
        rng = np.random.default_rng(self.seed + epoch_idx)
        shards = self.shards[self.host_index::self.host_count]
        shards = list(shards)
        if self.shuffle_shards:
            rng.shuffle(shards)
        buf = []
        for path in shards:
            z = np.load(path, allow_pickle=False)
            feats, offs = z["feats"], z["offsets"]
            labels, loffs = z["labels"], z["label_offsets"]
            uids = z["uids"]
            for i in range(len(offs) - 1):
                item = (str(uids[i]),
                        feats[offs[i]:offs[i + 1]],
                        labels[loffs[i]:loffs[i + 1]])
                buf.append(item)
                if len(buf) >= self.shuffle_buffer:
                    j = int(rng.integers(0, len(buf)))
                    yield buf.pop(j)
        rng.shuffle(buf)
        yield from buf


class StreamingBucketLoader:
    """Static-shape bucket batching over a sharded stream + prefetch.

    Buckets are FIXED (frame-count edges passed in or defaults), so the
    number of compiled programs stays bounded even on endless streams —
    the TPU answer to PipeDynamicBatching (data.py:662-801)."""

    def __init__(self, dataset, frame_budget=40000,
                 buckets=(400, 800, 1200, 1700), label_caps=None,
                 multiple_of=1, feat_dim=80, prefetch=4,
                 drop_infeasible=True):
        self.ds = dataset
        self.buckets = list(buckets)
        self.label_caps = label_caps or [max(8, b // 8)
                                         for b in self.buckets]
        self.batch_sizes = []
        for edge in self.buckets:
            bs = max(frame_budget // edge, 1)
            bs = max((bs // multiple_of) * multiple_of, multiple_of)
            self.batch_sizes.append(bs)
        self.feat_dim = feat_dim
        self.prefetch = prefetch
        self.drop_infeasible = drop_infeasible

    def _bucket_of(self, length):
        for b, edge in enumerate(self.buckets):
            if length <= edge:
                return b
        return None  # too long → dropped

    def _collate(self, idx_items, b):
        B = self.batch_sizes[b]
        T = self.buckets[b]
        U = self.label_caps[b]
        F = self.feat_dim
        feats = np.zeros((B, T, F), np.float32)
        labels = np.zeros((B, U), np.int32)
        flen = np.zeros((B,), np.int32)
        llen = np.zeros((B,), np.int32)
        weight = np.zeros((B,), np.float32)
        real = len(idx_items)
        uids = []
        for j in range(B):
            uid, f, l = idx_items[j % real]
            t = min(f.shape[0], T)
            u = min(len(l), U)
            feats[j, :t] = f[:t]
            labels[j, :u] = l[:u]
            flen[j], llen[j] = t, u
            weight[j] = 1.0 if j < real else 0.0
            if j < real:
                uids.append(uid)
        return Batch(feats, flen, labels, llen, weight, uids=uids)

    def _producer(self, epoch_idx, q):
        pools = [[] for _ in self.buckets]
        try:
            for item in self.ds.epoch(epoch_idx):
                uid, f, l = item
                if self.drop_infeasible and f.shape[0] // 4 <= len(l):
                    continue
                b = self._bucket_of(f.shape[0])
                if b is None:
                    continue
                pools[b].append(item)
                if len(pools[b]) == self.batch_sizes[b]:
                    q.put(self._collate(pools[b], b))
                    pools[b] = []
            for b, pool in enumerate(pools):
                if pool:
                    q.put(self._collate(pool, b))
        finally:
            q.put(None)

    def epoch(self, epoch_idx):
        q = queue.Queue(maxsize=self.prefetch)
        th = threading.Thread(target=self._producer,
                              args=(epoch_idx, q), daemon=True)
        th.start()
        while True:
            batch = q.get()
            if batch is None:
                break
            yield batch
        th.join()

    def __iter__(self):
        return self.epoch(0)
