"""Tests for the ME2E multichannel MVDR frontend."""
import numpy as np

import jax
import jax.numpy as jnp

from cat_tpu.front.beamformer import BeamformerNet, Stft, mvdr_weights


def test_stft_tone():
    sr, L = 8000, 4000
    t = np.arange(L) / sr
    tone = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    stft = Stft(frame_length=200, frame_shift=80, fft_size=256)
    spec = stft(jnp.asarray(tone[None]))
    assert spec.shape[1] == stft.num_frames(L)
    mag = np.abs(np.asarray(spec[0]))
    peak_bin = mag.mean(axis=0).argmax()
    expect = round(1000.0 / (sr / 256))
    assert abs(int(peak_bin) - expect) <= 1


def test_mvdr_recovers_target_direction():
    """Synthetic 2-channel: target in phase on both mics, noise opposite
    phase. MVDR with oracle covariances should suppress noise."""
    rng = np.random.default_rng(0)
    N, F, C, T = 1, 5, 2, 200
    steer_s = np.array([1.0, 1.0]) / np.sqrt(2)
    steer_n = np.array([1.0, -1.0]) / np.sqrt(2)
    s = (rng.standard_normal((N, F, T)) + 1j * rng.standard_normal(
        (N, F, T)))
    n = (rng.standard_normal((N, F, T)) + 1j * rng.standard_normal(
        (N, F, T)))
    x = (s[..., None] * steer_s[None, None, None, :]
         + 0.5 * n[..., None] * steer_n[None, None, None, :])
    phi_s = np.einsum("nftc,nftd->nfcd",
                      s[..., None] * steer_s, np.conj(
                          s[..., None] * steer_s)) / T
    phi_n = np.einsum("nftc,nftd->nfcd",
                      0.5 * n[..., None] * steer_n, np.conj(
                          0.5 * n[..., None] * steer_n)) / T
    w = np.asarray(mvdr_weights(jnp.asarray(phi_s), jnp.asarray(phi_n)))
    out = np.einsum("nftc,nfc->nft", x, np.conj(w))
    # residual noise energy much lower than in the raw reference channel
    noise_out = np.einsum("nftc,nfc->nft",
                          0.5 * n[..., None] * steer_n, np.conj(w))
    noise_ref = 0.5 * n * steer_n[0]
    assert (np.abs(noise_out) ** 2).mean() < 0.1 * (
        np.abs(noise_ref) ** 2).mean()
    # target roughly preserved
    sig_out = np.einsum("nftc,nfc->nft",
                        s[..., None] * steer_s, np.conj(w))
    assert (np.abs(sig_out) ** 2).mean() > 0.25 * (np.abs(s) ** 2).mean()


def test_beamformer_net_end_to_end():
    rng = np.random.default_rng(1)
    N, C, L = 2, 4, 8000
    wave = rng.standard_normal((N, C, L)).astype(np.float32) * 0.1
    net = BeamformerNet(num_bins=40, sample_rate=8000, frame_length=200,
                        frame_shift=80, fft_size=256, mask_hidden=16)
    lens = jnp.asarray([L, L // 2], jnp.int32)
    v = jax.jit(lambda k: net.init(k, jnp.asarray(wave), lens))(
        jax.random.PRNGKey(0))
    feats, flens = jax.jit(lambda v: net.apply(v, jnp.asarray(wave),
                                               lens))(v)
    assert feats.shape == (N, int(flens[0]), 40) or feats.shape[0] == N
    assert np.all(np.isfinite(np.asarray(feats)))
    # gradient flows through the complex pipeline
    def loss(v):
        f, _ = net.apply(v, jnp.asarray(wave), lens)
        return jnp.sum(f ** 2)
    g = jax.jit(jax.grad(loss))(v)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)


def test_channel_selector_and_neural_filter():
    import numpy as np
    from cat_tpu.front.beamformer import ChannelSelector, NeuralFilter

    rng = np.random.default_rng(0)
    N, C, T, F = 2, 3, 12, 9
    spec = jnp.asarray((rng.standard_normal((N, C, T, F))
                        + 1j * rng.standard_normal((N, C, T, F)))
                       .astype(np.complex64))
    lens = jnp.array([T, T - 3])
    sel, l2 = ChannelSelector(chosen_channel=1)(spec, lens)
    assert sel.shape == (N, T, F)
    assert np.allclose(np.asarray(sel), np.asarray(spec[:, 1]))

    nf = NeuralFilter(hidden=8)
    p = nf.init(jax.random.PRNGKey(0), spec, lens)
    out = nf.apply(p, spec, lens)
    assert out.shape == (N, T, F)
    assert np.isfinite(np.asarray(out).real).all()
