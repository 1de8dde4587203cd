"""Tests for the sharded streaming data path."""
import numpy as np

from cat_tpu.utils.data_sharded import (ShardedSpeechDataset,
                                        StreamingBucketLoader,
                                        expand_shards, write_shards)


def make_utts(n, dim=8, seed=0):
    rng = np.random.default_rng(seed)
    for i in range(n):
        T = int(rng.integers(40, 200))
        feats = rng.standard_normal((T, dim)).astype(np.float32)
        labels = list(rng.integers(1, 5, size=int(rng.integers(2, 8))))
        yield f"u{i:04d}", feats, labels


def test_write_and_expand(tmp_path):
    n = write_shards(str(tmp_path), make_utts(23), shard_size=10)
    assert n == 3
    shards = expand_shards(str(tmp_path / "shard-{000000..000002}.npz"))
    assert len(shards) == 3
    shards_glob = expand_shards(str(tmp_path / "shard-*.npz"))
    assert len(shards_glob) == 3


def test_host_split_and_coverage(tmp_path):
    write_shards(str(tmp_path), make_utts(40), shard_size=10)
    pattern = str(tmp_path / "shard-*.npz")
    seen = set()
    for host in range(2):
        ds = ShardedSpeechDataset(pattern, host_index=host, host_count=2,
                                  shuffle_buffer=8)
        for uid, f, l in ds.epoch(0):
            assert uid not in seen
            seen.add(uid)
    assert len(seen) == 40


def test_streaming_loader_static_shapes(tmp_path):
    write_shards(str(tmp_path), make_utts(60), shard_size=15)
    ds = ShardedSpeechDataset(str(tmp_path / "shard-*.npz"),
                              shuffle_buffer=16)
    loader = StreamingBucketLoader(ds, frame_budget=1600,
                                   buckets=(100, 200), feat_dim=8,
                                   multiple_of=4)
    shapes = set()
    count = 0
    for batch in loader.epoch(0):
        shapes.add(batch.feats.shape)
        assert batch.feats.shape[0] % 4 == 0
        count += int(batch.weight.sum())
    assert len(shapes) <= 2
    assert count > 40  # most utterances feasible and bucketed
