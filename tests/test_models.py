"""Shape/finite/jit tests for the model zoo."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cat_tpu.models import encoders, decoders
from cat_tpu.models.joiner import HAT, JointNet, LogAdd


def run_encoder(enc, N=2, T=64, F=80, **kw):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, T, F)).astype(np.float32))
    lengths = jnp.asarray(np.array([T, T - 10], np.int32))
    variables = jax.jit(lambda k, x, l: enc.init(k, x, l,
                        deterministic=True))(jax.random.PRNGKey(0), x,
                                             lengths)
    out, out_len = jax.jit(
        lambda v, x, l: enc.apply(v, x, l, deterministic=True))(
            variables, x, lengths)
    return np.asarray(out), np.asarray(out_len), variables


def test_conformer_shapes():
    enc = encoders.ConformerNet(num_cells=2, hdim=64, num_heads=4,
                                kernel_size=8, num_classes=10)
    out, out_len, _ = run_encoder(enc)
    assert out.shape[0] == 2 and out.shape[2] == 10
    assert out_len[0] == (64 - 1) // 2 // 2 + 0 or out_len[0] > 0
    assert np.all(np.isfinite(out))


def test_conformer_mask_invariance():
    """Padding frames must not affect valid outputs."""
    enc = encoders.ConformerNet(num_cells=1, hdim=32, num_heads=2,
                                kernel_size=4, num_classes=6,
                                use_batchnorm=False)
    rng = np.random.default_rng(1)
    T = 40
    x = rng.standard_normal((1, T, 20)).astype(np.float32)
    lengths = np.array([24], np.int32)
    v = jax.jit(lambda k, a, l: enc.init(k, a, l, deterministic=True))(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(lengths))
    f = jax.jit(lambda x: enc.apply(v, x, jnp.asarray(lengths),
                                    deterministic=True)[0])
    out1 = np.asarray(f(jnp.asarray(x)))
    x2 = x.copy()
    x2[0, 24:] = 99.0  # garbage in padding
    out2 = np.asarray(f(jnp.asarray(x2)))
    valid = int(np.asarray((24 - 1) // 2 - 1) // 2)
    np.testing.assert_allclose(out1[0, :valid], out2[0, :valid], atol=2e-5)


@pytest.mark.parametrize("cls,kw", [
    (encoders.LSTM, dict(hdim=32, num_layers=2, num_classes=8)),
    (encoders.VGGLSTM, dict(hdim=32, num_layers=1, num_classes=8)),
    (encoders.LSTMrowCONV, dict(hdim=32, num_layers=1, num_classes=8)),
    (encoders.TDNN_NAS, dict(hdim=32, num_classes=8)),
    (encoders.TDNN_LSTM, dict(hdim=32, num_classes=8)),
    (encoders.BLSTMN, dict(hdim=32, num_layers=1, num_classes=8)),
])
def test_encoder_zoo(cls, kw):
    out, out_len, _ = run_encoder(cls(**kw), T=32, F=20)
    assert out.shape[-1] == 8
    assert np.all(np.isfinite(out))
    assert out.shape[1] >= int(out_len.max())


def test_lstm_predictor_full_vs_step():
    pred = decoders.LSTMPredictor(vocab_size=16, hdim=24, num_layers=2)
    tokens = jnp.asarray(np.array([[3, 5, 7, 2], [1, 4, 0, 0]], np.int32))
    v = jax.jit(pred.init)(jax.random.PRNGKey(0), tokens)
    full, _ = jax.jit(pred.apply)(v, tokens)
    # step-by-step must reproduce the full pass
    state = pred.init_state(2)
    step = jax.jit(lambda v, t, s: pred.apply(v, t, s, method=pred.step))
    outs = []
    for u in range(4):
        out, state = step(v, tokens[:, u], state)
        outs.append(out)
    step = np.stack([np.asarray(o) for o in outs], axis=1)
    np.testing.assert_allclose(np.asarray(full), step, atol=1e-5)


def test_causal_transformer_is_causal():
    lm = decoders.CausalTransformer(vocab_size=20, hdim=32, num_layers=2,
                                    num_heads=4, ff_dim=64, num_classes=20,
                                    dropout_rate=0.0)
    tokens = np.array([[1, 2, 3, 4, 5]], np.int32)
    v = jax.jit(lm.init)(jax.random.PRNGKey(0), jnp.asarray(tokens))
    f = jax.jit(lambda t: lm.apply(v, t, deterministic=True)[0])
    out1 = np.asarray(f(jnp.asarray(tokens)))
    tokens2 = tokens.copy()
    tokens2[0, -1] = 9  # changing the future must not affect the past
    out2 = np.asarray(f(jnp.asarray(tokens2)))
    np.testing.assert_allclose(out1[0, :4], out2[0, :4], atol=1e-5)


def test_joiners():
    rng = np.random.default_rng(2)
    enc = jnp.asarray(rng.standard_normal((2, 6, 12)).astype(np.float32))
    pr = jnp.asarray(rng.standard_normal((2, 4, 10)).astype(np.float32))
    j = JointNet(odim=8, hdim=16, join_mode="add")
    v = jax.jit(j.init)(jax.random.PRNGKey(0), enc, pr)
    out = jax.jit(j.apply)(v, enc, pr)
    assert out.shape == (2, 6, 4, 8)
    # decode-step variant shares params
    out_step = jax.jit(j.apply)(v, enc[:, 0], pr[:, 0])
    np.testing.assert_allclose(np.asarray(out[:, 0, 0]),
                               np.asarray(out_step), atol=1e-5)

    jc = JointNet(odim=8, hdim=16, join_mode="cat")
    vc = jax.jit(jc.init)(jax.random.PRNGKey(0), enc, pr)
    assert jax.jit(jc.apply)(vc, enc, pr).shape == (2, 6, 4, 8)

    h = HAT(odim=8, hdim=16)
    vh = jax.jit(h.init)(jax.random.PRNGKey(0), enc, pr)
    lp = np.asarray(jax.jit(h.apply)(vh, enc, pr))
    # HAT output is normalized log-probs
    np.testing.assert_allclose(np.exp(lp).sum(-1), 1.0, atol=1e-4)

    la = LogAdd(odim=8)
    vl = jax.jit(la.init)(jax.random.PRNGKey(0), enc, pr)
    e, p = jax.jit(la.apply)(vl, enc, pr)
    assert e.shape == (2, 6, 8) and p.shape == (2, 4, 8)


def test_syllable_embedding_and_lstm():
    import jax
    import jax.numpy as jnp
    from cat_tpu.models.layers import SyllableEmbedding
    from cat_tpu.models.decoders import SyllableEnhancedLSTM

    conv = (0, 1, 1, 2, 0)  # 5 chars → 3 syllables
    emb = SyllableEmbedding(num_classes=5, dim_emb=8, converter=conv)
    x = jnp.array([[1, 2, 3]])
    p = emb.init(jax.random.PRNGKey(0), x)
    out = emb.apply(p, x)
    assert out.shape == (1, 3, 8)
    # chars 1 and 2 share a syllable: outputs differ only by char embed
    w = p["params"]
    d12 = out[0, 0] - out[0, 1]
    expect = (w["char_embedding"]["embedding"][1]
              - w["char_embedding"]["embedding"][2])
    assert jnp.allclose(d12, expect, atol=1e-6)

    dec = SyllableEnhancedLSTM(5, conv, hdim=16, num_classes=5,
                               with_head=True)
    toks = jnp.array([[1, 2, 3, 4]])
    p = jax.jit(dec.init)(jax.random.PRNGKey(0), toks)
    logits, _ = jax.jit(dec.apply)(p, toks)
    assert logits.shape == (1, 4, 5)


def test_sampled_softmax_matches_full_on_support():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cat_tpu.models.layers import sampled_softmax

    rng = np.random.default_rng(0)
    V = 50
    logits = jnp.asarray(rng.standard_normal((2, 3, V)).astype(np.float32))
    labels = jnp.asarray([[3, 7, 3], [7, 9, 9]])
    slog, remap = sampled_softmax(logits, labels)
    assert slog.shape[-1] == labels.size
    # log-softmax over the sampled support == full softmax restricted
    # and renormalized over the unique label classes {3, 7, 9}
    uniq = [3, 7, 9]
    sub = np.asarray(logits)[..., uniq]
    want = sub - np.log(np.exp(sub).sum(-1, keepdims=True))
    got = np.asarray(jax.nn.log_softmax(slog, axis=-1))
    for n in range(2):
        for t in range(3):
            lab = int(np.asarray(labels)[n, t])
            k = int(np.asarray(remap)[n, t])
            assert np.isclose(got[n, t, k], want[n, t, uniq.index(lab)],
                              atol=1e-5)
