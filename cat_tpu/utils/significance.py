"""Matched-pair sentence-segment significance test for WER comparison.

Counterpart of /root/reference/egs/TEMPLATE/local/significance_test.py
(docs/significance_test.md): two-sided matched-pairs test on per-utterance
error counts between two systems, via the normal approximation (MAPSSWE-
style) plus a bootstrap option.
"""
from __future__ import annotations

import math

import numpy as np

from cat_tpu.utils.wer import edit_distance


def per_utt_errors(refs: dict, hyps: dict, char_level=False):
    errs = {}
    for uid, ref in refs.items():
        r = list(ref.replace(" ", "")) if char_level else ref.split()
        h = hyps.get(uid, "")
        h = list(h.replace(" ", "")) if char_level else h.split()
        errs[uid] = edit_distance(r, h)[0]
    return errs


def matched_pair_test(refs, hyps_a, hyps_b, char_level=False):
    """Returns dict with mean difference, z statistic and p-value for
    H0: systems A and B have equal error rates."""
    ea = per_utt_errors(refs, hyps_a, char_level)
    eb = per_utt_errors(refs, hyps_b, char_level)
    uids = sorted(set(ea) & set(eb))
    d = np.asarray([ea[u] - eb[u] for u in uids], np.float64)
    n = len(d)
    if n < 2:
        return {"n": n, "z": 0.0, "p_value": 1.0, "mean_diff": 0.0}
    mean = d.mean()
    std = d.std(ddof=1)
    if std == 0:
        return {"n": n, "z": 0.0 if mean == 0 else math.inf,
                "p_value": 1.0 if mean == 0 else 0.0,
                "mean_diff": float(mean)}
    z = mean / (std / math.sqrt(n))
    p = math.erfc(abs(z) / math.sqrt(2.0))
    return {"n": n, "z": float(z), "p_value": float(p),
            "mean_diff": float(mean)}


def bootstrap_test(refs, hyps_a, hyps_b, char_level=False,
                   num_samples=2000, seed=0):
    """Bootstrap probability that system A has lower WER than B."""
    ea = per_utt_errors(refs, hyps_a, char_level)
    eb = per_utt_errors(refs, hyps_b, char_level)
    uids = sorted(set(ea) & set(eb))
    da = np.asarray([ea[u] for u in uids], np.float64)
    db = np.asarray([eb[u] for u in uids], np.float64)
    rng = np.random.default_rng(seed)
    n = len(uids)
    wins = 0
    for _ in range(num_samples):
        idx = rng.integers(0, n, n)
        wins += int(da[idx].sum() < db[idx].sum())
    return {"p_a_better": wins / num_samples, "n": n}
