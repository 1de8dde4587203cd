"""Data layer: packed datasets + static-shape bucketed batching.

Replaces /root/reference/cat/shared/data.py: KaldiSpeechDataset /
ModifiedSpeechDataset (:148-210 — pickled index + ark reads),
CorpusDataset (:213-269), sortedPadCollate* (:379-468), and the
BatchDistSampler bucket/batch modes (:471-659) with TPU-friendly
semantics:

- Packed on-disk format: one flat f32 memmap of frames + offset tables
  (features), one flat int32 array + offsets (labels). No pickle-per-item,
  no lazy ark handles — sequential reads, mmap-backed, sharable across
  hosts.
- Bucketed batching with a FIXED set of (T_bucket, U_bucket, batch_size)
  shapes so XLA compiles a small number of programs (SURVEY.md §7 hard
  part 3). Global batches are always divisible by the data-axis size
  (even SPMD dispatch); short batches are padded with repeated items
  carrying weight 0, replacing the reference's uneven-dispatch loss
  rescale (manager.py:482-505).
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np


def pack_speech_data(out_dir, utterances, tokenizer=None):
    """Pack features + transcripts.

    utterances: iterable of (uid, feats (T, F) f32, transcript) where
    transcript is a string (tokenized via tokenizer) or list[int].
    Mirrors pipeline Stage 2 pack_data (cat/utils/pipeline/asr.py:24-150).
    """
    os.makedirs(out_dir, exist_ok=True)
    feat_offsets = [0]
    label_offsets = [0]
    labels_flat = []
    uids = []
    feat_dim = None
    fbin = open(os.path.join(out_dir, "feats.bin"), "wb")
    try:
        for uid, feats, trans in utterances:
            feats = np.ascontiguousarray(feats, np.float32)
            if feat_dim is None:
                feat_dim = feats.shape[1]
            assert feats.shape[1] == feat_dim
            fbin.write(feats.tobytes())
            feat_offsets.append(feat_offsets[-1] + feats.shape[0])
            if isinstance(trans, str):
                ids = tokenizer.encode(trans)
            else:
                ids = list(trans)
            labels_flat.extend(ids)
            label_offsets.append(label_offsets[-1] + len(ids))
            uids.append(uid)
    finally:
        fbin.close()
    np.savez(os.path.join(out_dir, "meta.npz"),
             feat_offsets=np.asarray(feat_offsets, np.int64),
             label_offsets=np.asarray(label_offsets, np.int64),
             labels=np.asarray(labels_flat, np.int32),
             feat_dim=np.int32(feat_dim or 0))
    with open(os.path.join(out_dir, "uids.txt"), "w") as f:
        f.write("\n".join(uids))
    return out_dir


class SpeechDataset:
    """Memmap-backed packed dataset: __getitem__ → (feats, labels)."""

    def __init__(self, path):
        meta = np.load(os.path.join(path, "meta.npz"))
        self.feat_offsets = meta["feat_offsets"]
        self.label_offsets = meta["label_offsets"]
        self.labels = meta["labels"]
        self.feat_dim = int(meta["feat_dim"])
        self.feats = np.memmap(os.path.join(path, "feats.bin"),
                               dtype=np.float32, mode="r").reshape(
                                   -1, self.feat_dim)
        with open(os.path.join(path, "uids.txt")) as f:
            self.uids = f.read().splitlines()

    def __len__(self):
        return len(self.feat_offsets) - 1

    def frame_length(self, i):
        return int(self.feat_offsets[i + 1] - self.feat_offsets[i])

    def label_length(self, i):
        return int(self.label_offsets[i + 1] - self.label_offsets[i])

    def __getitem__(self, i):
        f = self.feats[self.feat_offsets[i]:self.feat_offsets[i + 1]]
        l = self.labels[self.label_offsets[i]:self.label_offsets[i + 1]]
        return np.asarray(f), np.asarray(l)


def pack_corpus(out_dir, id_sequences):
    """LM corpus packing (cat/utils/data/pack_corpus.py equivalent)."""
    os.makedirs(out_dir, exist_ok=True)
    offsets = [0]
    flat = []
    for ids in id_sequences:
        flat.extend(ids)
        offsets.append(offsets[-1] + len(ids))
    np.savez(os.path.join(out_dir, "corpus.npz"),
             tokens=np.asarray(flat, np.int32),
             offsets=np.asarray(offsets, np.int64))
    return out_dir


class CorpusDataset:
    def __init__(self, path):
        z = np.load(os.path.join(path, "corpus.npz"))
        self.tokens = z["tokens"]
        self.offsets = z["offsets"]

    def __len__(self):
        return len(self.offsets) - 1

    def __getitem__(self, i):
        return np.asarray(self.tokens[self.offsets[i]:self.offsets[i + 1]])

    def token_length(self, i):
        return int(self.offsets[i + 1] - self.offsets[i])


def pack_seq2seq(out_dir, pairs):
    """Pack paired token sequences (P2G / seq2seq tasks).

    pairs: iterable of (uid, src_ids, tgt_ids) or (uid, src_ids,
    tgt_ids, nbest) where nbest = [(score, cand_ids), ...] (TKM/SKM
    candidate sets, reference egs/llm-p2g data prep). Counterpart of the
    reference's offline DANP/TKM data generation."""
    os.makedirs(out_dir, exist_ok=True)
    src_off, tgt_off = [0], [0]
    src_flat, tgt_flat = [], []
    uids = []
    cand_utt_off = [0]     # per-utt slice into the candidate list
    cand_off = [0]         # per-candidate slice into cand_flat
    cand_flat, cand_scores = [], []
    has_nbest = False
    for item in pairs:
        uid, src, tgt = item[0], item[1], item[2]
        nbest = item[3] if len(item) > 3 else None
        src_flat.extend(int(x) for x in src)
        tgt_flat.extend(int(x) for x in tgt)
        src_off.append(len(src_flat))
        tgt_off.append(len(tgt_flat))
        uids.append(uid)
        if nbest:
            has_nbest = True
            for score, cand in nbest:
                cand_flat.extend(int(x) for x in cand)
                cand_off.append(len(cand_flat))
                cand_scores.append(float(score))
        cand_utt_off.append(len(cand_off) - 1)
    np.savez(os.path.join(out_dir, "seq2seq.npz"),
             src=np.asarray(src_flat, np.int32),
             src_offsets=np.asarray(src_off, np.int64),
             tgt=np.asarray(tgt_flat, np.int32),
             tgt_offsets=np.asarray(tgt_off, np.int64),
             cand=np.asarray(cand_flat, np.int32),
             cand_offsets=np.asarray(cand_off, np.int64),
             cand_utt_offsets=np.asarray(cand_utt_off, np.int64),
             cand_scores=np.asarray(cand_scores, np.float32),
             has_nbest=np.bool_(has_nbest))
    with open(os.path.join(out_dir, "uids.txt"), "w") as f:
        f.write("\n".join(uids))
    return out_dir


class Seq2SeqDataset:
    """Packed paired-token dataset: __getitem__ → (src, tgt)."""

    feat_dim = 0  # token inputs, no feature axis

    def __init__(self, path):
        z = np.load(os.path.join(path, "seq2seq.npz"))
        self.src, self.src_offsets = z["src"], z["src_offsets"]
        self.tgt, self.tgt_offsets = z["tgt"], z["tgt_offsets"]
        self.cand, self.cand_offsets = z["cand"], z["cand_offsets"]
        self.cand_utt_offsets = z["cand_utt_offsets"]
        self.cand_scores = z["cand_scores"]
        self.has_nbest = bool(z["has_nbest"])
        with open(os.path.join(path, "uids.txt")) as f:
            self.uids = f.read().splitlines()

    def __len__(self):
        return len(self.src_offsets) - 1

    def frame_length(self, i):  # bucketing key = source length
        return int(self.src_offsets[i + 1] - self.src_offsets[i])

    def label_length(self, i):
        return int(self.tgt_offsets[i + 1] - self.tgt_offsets[i])

    def __getitem__(self, i):
        s = self.src[self.src_offsets[i]:self.src_offsets[i + 1]]
        t = self.tgt[self.tgt_offsets[i]:self.tgt_offsets[i + 1]]
        return np.asarray(s), np.asarray(t)

    def nbest(self, i):
        """[(score, cand_ids)] for utterance i (TKM candidates)."""
        out = []
        for k in range(int(self.cand_utt_offsets[i]),
                       int(self.cand_utt_offsets[i + 1])):
            c = self.cand[self.cand_offsets[k]:self.cand_offsets[k + 1]]
            out.append((float(self.cand_scores[k]), np.asarray(c)))
        return out


@dataclass
class Seq2SeqBatch:
    """Static-shape padded seq2seq batch (+ optional TKM candidates)."""

    src: np.ndarray          # (B, S) int32
    src_lens: np.ndarray     # (B,) int32
    tgt: np.ndarray          # (B, U) int32
    tgt_lens: np.ndarray     # (B,) int32
    weight: np.ndarray       # (B,) f32
    uids: list | None = None
    cands: np.ndarray | None = None        # (B, K, S) int32
    cand_lens: np.ndarray | None = None    # (B, K) int32
    cand_scores: np.ndarray | None = None  # (B, K) f32

    def asdict(self):
        d = dict(src=self.src, src_lens=self.src_lens, tgt=self.tgt,
                 tgt_lens=self.tgt_lens, weight=self.weight)
        if self.cands is not None:
            d.update(cands=self.cands, cand_lens=self.cand_lens,
                     cand_scores=self.cand_scores)
        return d


class Seq2SeqLoader:
    """Bucketed static-shape batching for Seq2SeqDataset (the P2G /
    LLM-P2G loader; same fixed-shape-set design as BucketedLoader)."""

    def __init__(self, dataset, frame_budget=4096, num_buckets=4,
                 multiple_of=1, shuffle=True, seed=0, num_cands=None,
                 host_index=0, host_count=1):
        self.ds = dataset
        self.shuffle = shuffle
        self.seed = seed
        self.host_index = int(host_index)
        self.host_count = max(int(host_count), 1)
        multiple_of = int(np.lcm(multiple_of, self.host_count))
        self.multiple_of = multiple_of
        n = len(dataset)
        self.slens = np.asarray([dataset.frame_length(i)
                                 for i in range(n)])
        self.tlens = np.asarray([dataset.label_length(i)
                                 for i in range(n)])
        self.indices = np.nonzero((self.slens > 0) & (self.tlens > 0))[0]
        if len(self.indices) == 0:
            raise ValueError("no usable pairs (empty src or tgt)")
        self.buckets = make_buckets(self.slens[self.indices], num_buckets,
                                    min_len=8)
        self.batch_sizes, self.tgt_caps = [], []
        for edge in self.buckets:
            bs = max(frame_budget // edge, 1)
            bs = max((bs // multiple_of) * multiple_of, multiple_of)
            self.batch_sizes.append(bs)
            in_b = self.indices[self.slens[self.indices] <= edge]
            cap = int(self.tlens[in_b].max()) if len(in_b) else 1
            self.tgt_caps.append(max(cap, 1))
        self.K = 0
        if dataset.has_nbest:
            ks = [len(dataset.nbest(int(i))) for i in self.indices]
            self.K = num_cands or max(max(ks), 1)
            # candidates are phoneme sequences ≈ src length
            self.cand_cap = int(max(
                (dataset.cand_offsets[1:] - dataset.cand_offsets[:-1]).max(),
                1)) if len(dataset.cand_offsets) > 1 else 1

    def bucket_of(self, length):
        for b, edge in enumerate(self.buckets):
            if length <= edge:
                return b
        return len(self.buckets) - 1

    def __iter__(self):
        return self.epoch(0)

    def epoch(self, epoch_idx):
        rng = np.random.default_rng(self.seed + epoch_idx)
        order = self.indices.copy()
        if self.shuffle:
            rng.shuffle(order)
        pools = [[] for _ in self.buckets]
        for i in order:
            b = self.bucket_of(self.slens[i])
            pools[b].append(i)
            if len(pools[b]) == self.batch_sizes[b]:
                yield self._collate(pools[b], b)
                pools[b] = []
        for b, pool in enumerate(pools):
            if pool:
                yield self._collate(pool, b)

    def num_batches(self):
        cnt = 0
        pools = [0] * len(self.buckets)
        for i in self.indices:
            pools[self.bucket_of(self.slens[i])] += 1
        for b, n in enumerate(pools):
            cnt += (n + self.batch_sizes[b] - 1) // self.batch_sizes[b]
        return cnt

    def _collate(self, idxs, b):
        B, S, U = self.batch_sizes[b], self.buckets[b], self.tgt_caps[b]
        real = len(idxs)
        B_loc = B // self.host_count
        j0 = self.host_index * B_loc
        src = np.zeros((B_loc, S), np.int32)
        tgt = np.zeros((B_loc, U), np.int32)
        sl = np.zeros((B_loc,), np.int32)
        tl = np.zeros((B_loc,), np.int32)
        w = np.zeros((B_loc,), np.float32)
        uids = []
        cands = cl = cs = None
        if self.K:
            Tp = self.cand_cap
            cands = np.zeros((B_loc, self.K, Tp), np.int32)
            cl = np.ones((B_loc, self.K), np.int32)
            cs = np.full((B_loc, self.K), -1e30, np.float32)
        for k in range(B_loc):
            j = j0 + k
            i = int(idxs[j % real])
            s, t = self.ds[i]
            src[k, : min(len(s), S)] = s[:S]
            tgt[k, : min(len(t), U)] = t[:U]
            sl[k] = min(len(s), S)
            tl[k] = min(len(t), U)
            w[k] = 1.0 if j < real else 0.0
            if j < real:
                uids.append(self.ds.uids[i])
            if self.K:
                nb = self.ds.nbest(i)
                if not nb:  # no candidates: the src itself, weight 1
                    nb = [(0.0, s)]
                for q, (score, c) in enumerate(nb[: self.K]):
                    c = np.asarray(c)[: cands.shape[2]]
                    cands[k, q, : len(c)] = c
                    cl[k, q] = max(len(c), 1)
                    cs[k, q] = score
        return Seq2SeqBatch(src, sl, tgt, tl, w, uids=uids, cands=cands,
                            cand_lens=cl, cand_scores=cs)


def make_buckets(lengths, num_buckets=8, min_len=16):
    """Choose bucket boundaries (frame counts) from the empirical length
    distribution: quantile-based, rounded up to multiples of 16."""
    lengths = np.asarray(lengths)
    qs = np.quantile(lengths, np.linspace(0, 1, num_buckets + 1)[1:])
    edges = sorted(set(int(np.ceil(q / 16.0)) * 16 for q in qs))
    if edges and edges[-1] < lengths.max():
        edges[-1] = int(np.ceil(lengths.max() / 16.0)) * 16
    return [max(e, min_len) for e in edges]


@dataclass
class Batch:
    """Host-side batch; all arrays padded to the bucket's static shape."""

    feats: np.ndarray        # (B, T, F) f32
    feat_lengths: np.ndarray  # (B,) int32
    labels: np.ndarray       # (B, U) int32
    label_lengths: np.ndarray  # (B,) int32
    weight: np.ndarray       # (B,) f32 — 0 for padding duplicates
    uids: list | None = None

    def asdict(self):
        return dict(feats=self.feats, feat_lengths=self.feat_lengths,
                    labels=self.labels, label_lengths=self.label_lengths,
                    weight=self.weight)


class WeightedConcatDataset:
    """Multiple datasets with sampling weights (manager_wo.py's
    WeightedConcatDataset for multi-trainset ME2E training). Exposes the
    SpeechDataset interface; index space is the concatenation, and
    `sample_indices(rng, n)` draws according to the weights."""

    def __init__(self, datasets, weights=None):
        self.datasets = list(datasets)
        self.weights = np.asarray(weights if weights is not None
                                  else [1.0] * len(self.datasets),
                                  np.float64)
        self.weights = self.weights / self.weights.sum()
        self.offsets = np.cumsum([0] + [len(d) for d in self.datasets])
        self.feat_dim = self.datasets[0].feat_dim
        self.uids = []
        for d in self.datasets:
            self.uids.extend(getattr(d, "uids",
                                     [str(i) for i in range(len(d))]))

    def __len__(self):
        return int(self.offsets[-1])

    def _locate(self, i):
        k = int(np.searchsorted(self.offsets, i, side="right") - 1)
        return self.datasets[k], i - int(self.offsets[k])

    def __getitem__(self, i):
        d, j = self._locate(i)
        return d[j]

    def frame_length(self, i):
        d, j = self._locate(i)
        return d.frame_length(j)

    def label_length(self, i):
        d, j = self._locate(i)
        return d.label_length(j)

    def sample_indices(self, rng, n):
        ks = rng.choice(len(self.datasets), size=n, p=self.weights)
        return np.asarray([
            int(self.offsets[k]) + int(rng.integers(0, len(
                self.datasets[k]))) for k in ks])


class BucketedLoader:
    """Padding-aware bucketed batching with a fixed shape set.

    Replaces BatchDistSampler bucket mode (data.py:471-584) +
    weighted_group (coreutils.py:400-490). Every batch size is a multiple
    of `multiple_of` (the data-axis size) and constant per bucket, so XLA
    compiles exactly len(buckets) programs.
    """

    def __init__(self, dataset, frame_budget=40000, num_buckets=8,
                 multiple_of=1, shuffle=True, seed=0, max_label_len=None,
                 drop_infeasible=True, host_index=0, host_count=1,
                 feasibility_divisor=4):
        """host_index/host_count: multi-host SPMD input sharding (the
        reference's split_by_node, cat/shared/manager.py:100-202). Every
        host computes the SAME deterministic global batch schedule
        (shared seed) and materializes only its contiguous row slice;
        parallel.shard_batch assembles the global device array from the
        per-process slices. Global batch sizes are rounded to a multiple
        of lcm(multiple_of, host_count) so slices are even."""
        self.ds = dataset
        self.host_index = int(host_index)
        self.host_count = max(int(host_count), 1)
        multiple_of = int(np.lcm(multiple_of, self.host_count))
        self.multiple_of = multiple_of
        self.shuffle = shuffle
        self.seed = seed
        n = len(dataset)
        self.flens = np.asarray([dataset.frame_length(i) for i in range(n)])
        self.llens = np.asarray([dataset.label_length(i) for i in range(n)])
        keep = np.ones(n, bool)
        if drop_infeasible:
            # CTC feasibility filter x//divisor > y (cat/ctc/train.py:
            # 34-42). divisor = encoder subsampling (4) for fbank input;
            # raw-wave ME2E passes hop*subsampling (e.g. 160*4=640) so
            # the filter sees output FRAMES, not samples.
            keep &= (self.flens // feasibility_divisor) > self.llens
        self.indices = np.nonzero(keep)[0]
        if len(self.indices) == 0:
            raise ValueError(
                f"no usable utterances: dataset has {n}, all filtered "
                "(CTC feasibility requires frames//4 > label_length)")
        self.buckets = make_buckets(self.flens[self.indices], num_buckets)
        # per-bucket batch size, rounded down to multiple_of (min 1x)
        self.batch_sizes = []
        self.label_caps = []
        for edge in self.buckets:
            bs = max(frame_budget // edge, 1)
            bs = max((bs // multiple_of) * multiple_of, multiple_of)
            self.batch_sizes.append(bs)
            in_bucket = self.indices[self.flens[self.indices] <= edge]
            cap = int(self.llens[in_bucket].max()) if len(in_bucket) else 1
            if max_label_len:
                cap = min(cap, max_label_len)
            self.label_caps.append(max(cap, 1))

    def bucket_of(self, length):
        for b, edge in enumerate(self.buckets):
            if length <= edge:
                return b
        return len(self.buckets) - 1

    def __iter__(self):
        return self.epoch(0)

    def epoch(self, epoch_idx):
        rng = np.random.default_rng(self.seed + epoch_idx)
        if self.shuffle and hasattr(self.ds, "sample_indices"):
            # weighted multi-trset sampling (WeightedConcatDataset —
            # manager_wo's multi-trainset semantics): one epoch draws
            # len(indices) utterances according to the set weights,
            # filtered to the feasible index set
            feasible = set(int(i) for i in self.indices)
            draws = self.ds.sample_indices(rng, 2 * len(self.indices))
            order = np.asarray([i for i in draws if i in feasible],
                               np.int64)[: len(self.indices)]
            if len(order) == 0:
                order = self.indices.copy()
        elif self.shuffle:
            order = self.indices.copy()
            rng.shuffle(order)
        else:
            order = self.indices.copy()
        pools = [[] for _ in self.buckets]
        for i in order:
            b = self.bucket_of(self.flens[i])
            pools[b].append(i)
            if len(pools[b]) == self.batch_sizes[b]:
                yield self._collate(pools[b], b)
                pools[b] = []
        for b, pool in enumerate(pools):
            if pool:
                yield self._collate(pool, b)

    def num_batches(self):
        cnt = 0
        pools = [0] * len(self.buckets)
        for i in self.indices:
            b = self.bucket_of(self.flens[i])
            pools[b] += 1
        for b, n in enumerate(pools):
            cnt += (n + self.batch_sizes[b] - 1) // self.batch_sizes[b]
        return cnt

    def _collate(self, idxs, b):
        B = self.batch_sizes[b]
        T = self.buckets[b]
        U = self.label_caps[b]
        F = self.ds.feat_dim
        real = len(idxs)
        # multi-host: materialize only this host's contiguous row slice
        # of the (deterministic) global batch; weights stay global-aware
        # (row j of the global batch is padding iff j >= real)
        B_loc = B // self.host_count
        j0 = self.host_index * B_loc
        feats = np.zeros((B_loc, T, F), np.float32)
        labels = np.zeros((B_loc, U), np.int32)
        flen = np.zeros((B_loc,), np.int32)
        llen = np.zeros((B_loc,), np.int32)
        weight = np.zeros((B_loc,), np.float32)
        local_uids = []
        for k in range(B_loc):
            j = j0 + k
            i = idxs[j % real]  # pad short batches by repetition
            f, l = self.ds[i]
            t = min(f.shape[0], T)
            u = min(len(l), U)
            feats[k, :t] = f[:t]
            labels[k, :u] = l[:u]
            flen[k] = t
            llen[k] = u
            weight[k] = 1.0 if j < real else 0.0
            if j < real:
                local_uids.append(self.ds.uids[i]
                                  if hasattr(self.ds, "uids") else str(i))
        return Batch(feats, flen, labels, llen, weight, uids=local_uids)
