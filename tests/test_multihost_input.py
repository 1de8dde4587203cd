"""Multi-host input path: per-host BucketedLoader slices reassemble the
single-host global batch exactly (split_by_node semantics,
cat/shared/manager.py:100-202), so shard_batch's
make_array_from_process_local_data assembly is sound."""
import numpy as np

from cat_tpu.utils.data import BucketedLoader


class ToyDS:
    feat_dim = 4

    def __init__(self, n=23, seed=0):
        rng = np.random.default_rng(seed)
        self.lens = rng.integers(8, 40, n)
        self.labs = [list(rng.integers(1, 5, max(1, l // 8)))
                     for l in self.lens]
        self.uids = [f"u{i:03d}" for i in range(n)]

    def __len__(self):
        return len(self.lens)

    def frame_length(self, i):
        return int(self.lens[i])

    def label_length(self, i):
        return len(self.labs[i])

    def __getitem__(self, i):
        T = int(self.lens[i])
        f = np.full((T, self.feat_dim), float(i), np.float32)
        return f, np.asarray(self.labs[i], np.int32)


def batches(loader, epoch=3):
    return list(loader.epoch(epoch))


def test_host_slices_reassemble_global_batch():
    ds = ToyDS()
    kw = dict(frame_budget=160, num_buckets=3, multiple_of=2, seed=5)
    global_loader = BucketedLoader(ds, host_index=0, host_count=1, **kw)
    h0 = BucketedLoader(ds, host_index=0, host_count=2, **kw)
    h1 = BucketedLoader(ds, host_index=1, host_count=2, **kw)

    gb = batches(global_loader)
    b0 = batches(h0)
    b1 = batches(h1)
    assert len(gb) == len(b0) == len(b1)
    for g, a, b in zip(gb, b0, b1):
        # identical schedule: same global shapes, concat(a, b) == global
        for field in ("feats", "feat_lengths", "labels",
                      "label_lengths", "weight"):
            ga = getattr(g, field)
            cat = np.concatenate([getattr(a, field),
                                  getattr(b, field)], axis=0)
            assert ga.shape == cat.shape, (field, ga.shape, cat.shape)
            np.testing.assert_array_equal(ga, cat)
        assert list(g.uids) == list(a.uids) + list(b.uids)


def test_host_count_divides_batch():
    ds = ToyDS()
    loader = BucketedLoader(ds, frame_budget=160, num_buckets=3,
                            multiple_of=3, host_index=0, host_count=2)
    # lcm(3, 2) = 6: every global batch divisible by both
    assert all(bs % 6 == 0 for bs in loader.batch_sizes)
