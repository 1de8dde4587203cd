"""CRF-beats-CTC synthetic benchmark (VERDICT r2 item 9).

The reference's central accuracy claim is that CTC-CRF (MMI with a
denominator n-gram over the units) beats plain CTC
(egs/wsj/README.md:22-26: 2.87 vs 6.79 WER). Real corpora are absent
here, so this is the strongest available proxy at test strength:

- 50 confusable units (10 clusters × 5; small within-cluster offsets
  under heavy noise) + a 40-word lexicon of unit trigrams — strong
  phonotactics, weak local acoustics;
- a LIMITED-CONTEXT encoder (TDNN, the reference's WSJ CRF setting)
  so the sequence structure must come from the objective;
- an order-3 dense denominator (51-unit vocab ⇒ thousands of context
  states — far beyond the toy e2e dens).

Measured finding this test locks in: at MATCHED optimizer steps —
which is matched wall-clock on the target TPU, where the dense MXU
denominator adds <2% step time (STATUS.md) — CRF training reaches less
than half the CTC unit error rate (13.0% vs 28.3% at the pinned
seeds). Given ~7× more steps this toy's CTC catches up (the TDNN's
receptive field eventually learns the lexicon); the reference's
final-WER gap additionally rests on real-speech ambiguity and
lexicon/LM graph decoding, which a synthetic toy cannot reproduce —
documented in STATUS.md §accuracy-proxies.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cat_tpu.ctc.decode import greedy_decode
from cat_tpu.ctc.train import build_model, init_state, make_train_step
from cat_tpu.fst.ngram import train_ngram
from cat_tpu.ops.crf_dense import DenseDen
from cat_tpu.utils.data import BucketedLoader
from cat_tpu.utils.scheduler import build_scheduler
from cat_tpu.utils.wer import edit_distance

V = 51          # 50 units + blank
D = 16
FRAMES = 8      # frames per unit
N_CLUSTERS = 10
UNIT_OFF = 0.2  # within-cluster separability
NOISE = 0.5
EPOCHS = 15

_rng = np.random.default_rng(42)
_cluster_pat = _rng.standard_normal(
    (N_CLUSTERS, FRAMES, D)).astype(np.float32) * 1.2
_unit_off = _rng.standard_normal(
    (V, FRAMES, D)).astype(np.float32) * UNIT_OFF
LEX = []
_seen = set()
while len(LEX) < 40:
    w = tuple(int(x) for x in _rng.integers(1, V, 3))
    if w not in _seen:
        _seen.add(w)
        LEX.append(w)


def _unit_feats(u, r):
    pat = _cluster_pat[(u - 1) % N_CLUSTERS] + _unit_off[u]
    return pat + r.standard_normal((FRAMES, D)).astype(np.float32) * NOISE


def _gen_utt(r):
    units = []
    for _ in range(int(r.integers(2, 5))):
        units.extend(LEX[int(r.integers(0, len(LEX)))])
    feats = np.concatenate([_unit_feats(u, r) for u in units])
    return feats, np.asarray(units, np.int32)


class _DS:
    feat_dim = D

    def __init__(self, n, seed):
        r = np.random.default_rng(seed)
        self.items = [_gen_utt(r) for _ in range(n)]
        self.uids = [str(i) for i in range(n)]

    def __len__(self):
        return len(self.items)

    def frame_length(self, i):
        return self.items[i][0].shape[0]

    def label_length(self, i):
        return len(self.items[i][1])

    def __getitem__(self, i):
        return self.items[i]


def _train_and_score(loss_type, den, tr_loader, dv_loader):
    model = build_model(
        {"encoder": {"type": "TDNN_NAS",
                     "kwargs": {"hdim": 128, "dropout_rate": 0.0}}},
        num_classes=V)
    _, tx = build_scheduler({
        "type": "SchedulerFixedStop", "kwargs": {"stop_step": 10 ** 6},
        "optimizer": {"type": "Adam", "kwargs": {"lr": 5e-3}}})
    state = init_state(model, tx, D)
    step = make_train_step(model, tx, loss_type,
                           den=den if loss_type == "crf" else None,
                           lamb=0.1)
    key = jax.random.PRNGKey(0)
    for ep in range(EPOCHS):
        for b in tr_loader.epoch(ep):
            key, sub = jax.random.split(key)
            state, m = step(state, b.asdict(), jnp.float32(5e-3), sub)
    assert np.isfinite(float(m["loss"]))

    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    @jax.jit
    def apply(x, lens):
        lg, ol = model.apply(variables, x, lens, deterministic=True)
        return jax.nn.log_softmax(lg.astype(jnp.float32), -1), ol

    err = tot = 0
    for b in dv_loader:
        d = b.asdict()
        lp, ol = apply(jnp.asarray(d["feats"]),
                       jnp.asarray(d["feat_lengths"]))
        dec = greedy_decode(lp, ol)
        w = np.asarray(d["weight"])
        labels = np.asarray(d["labels"])
        llens = np.asarray(d["label_lengths"])
        for n in range(len(dec)):
            if w[n] <= 0:
                continue
            ref = [int(x) for x in labels[n, : llens[n]]]
            e, *_ = edit_distance(ref, [int(x) for x in dec[n]])
            err += e
            tot += len(ref)
    return 100.0 * err / tot


@pytest.mark.slow
def test_crf_beats_ctc_at_matched_budget():
    tr, dv = _DS(400, 1), _DS(80, 2)
    kw = dict(frame_budget=2048, num_buckets=3, multiple_of=1)
    tr_loader = BucketedLoader(tr, seed=0, **kw)
    dv_loader = BucketedLoader(dv, shuffle=False, **kw)

    seqs = [[int(x) for x in tr[i][1]] for i in range(len(tr))]
    den = DenseDen.from_ngram(train_ngram(seqs, order=3), num_classes=V)
    # test-strength denominator: order-3 context tensor over 50 units
    # (51x51 = 2601 context states, >>100-state bar of VERDICT item 9)
    assert den.logw.shape == (V, V, V)

    ctc = _train_and_score("ctc", None, tr_loader, dv_loader)
    crf = _train_and_score("crf", den, tr_loader, dv_loader)
    # measured at these seeds: ctc 28.3, crf 13.0 — require a real,
    # stable margin (≥ 8 points) and a sane absolute level
    assert crf < 20.0, (crf, ctc)
    assert ctc - crf >= 8.0, (crf, ctc)
