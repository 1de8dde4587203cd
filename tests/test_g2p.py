"""Tests for the joint-sequence G2P trainer (Phonetisaurus equivalent)."""
from cat_tpu.fst.g2p import G2P, graphone


LEXICON = [
    ("cat", ["k", "a", "t"]),
    ("cab", ["k", "a", "b"]),
    ("bat", ["b", "a", "t"]),
    ("tab", ["t", "a", "b"]),
    ("shack", ["S", "a", "k"]),
    ("shab", ["S", "a", "b"]),
    ("cash", ["k", "a", "S"]),
    ("bash", ["b", "a", "S"]),
    ("phat", ["f", "a", "t"]),
    ("phab", ["f", "a", "b"]),
    ("tap", ["t", "a", "p"]),
    ("pat", ["p", "a", "t"]),
    ("back", ["b", "a", "k"]),
    ("tack", ["t", "a", "k"]),
]


def test_graphone_token():
    assert graphone(("s", "h"), ("S",)) == "s|h}S"
    assert graphone(("e",), ()) == "e}_"


def test_g2p_train_and_predict_seen():
    g2p = G2P.train(LEXICON, max_g=2, max_p=1, em_iters=6, order=3)
    # seen words round-trip
    hits = 0
    for w, ph in LEXICON:
        pred = g2p.predict(w, nbest=1)
        assert pred, w
        hits += int(pred[0][0] == ph)
    assert hits >= len(LEXICON) - 2, hits


def test_g2p_generalizes_to_unseen():
    g2p = G2P.train(LEXICON, max_g=2, max_p=1, em_iters=6, order=3)
    # 'phack' = ph + a + ck, all graphones seen in other words
    pred = g2p.predict("phack", nbest=3)
    assert pred
    assert pred[0][0] == ["f", "a", "k"], pred


def test_g2p_nbest_and_save(tmp_path):
    g2p = G2P.train(LEXICON, max_g=2, max_p=1, em_iters=6, order=3)
    nb = g2p.predict("cat", nbest=3)
    assert len(nb) >= 1
    assert nb == sorted(nb, key=lambda x: -x[1])
    p = str(tmp_path / "g2p.pkl")
    g2p.save(p)
    g2 = G2P.load(p)
    assert g2.predict("cat", nbest=1) == g2p.predict("cat", nbest=1)
