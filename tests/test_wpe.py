"""Tests for WPE dereverberation (cat_tpu/front/wpe.py)."""
import numpy as np

import jax
import jax.numpy as jnp

from cat_tpu.front.wpe import DnnWpe, _tap_stack, wpe, wpe_one_iteration


def _np_wpe_one_iter(spec, power, taps, delay, eps=1e-6, diag_eps=1e-7):
    """Straightforward per-frequency numpy reference of the WPE filter."""
    N, C, T, F = spec.shape
    out = np.empty_like(spec)
    for n in range(N):
        for f in range(F):
            x = spec[n, :, :, f]                        # (C, T)
            u = 1.0 / np.maximum(power[n, :, f], eps)   # (T,)
            ytil = np.zeros((taps * C, T), dtype=spec.dtype)
            for k in range(taps):
                sh = delay + k
                ytil[k * C:(k + 1) * C, sh:] = x[:, :T - sh]
            R = (ytil * u) @ ytil.conj().T
            P = (ytil * u) @ x.conj().T
            tr = max(np.trace(R).real, eps)
            G = np.linalg.solve(
                R + diag_eps * tr * np.eye(taps * C), P)
            out[n, :, :, f] = x - G.conj().T @ ytil
    return out


def test_tap_stack_layout():
    x = jnp.arange(2 * 6, dtype=jnp.complex64).reshape(1, 2, 6)
    y = np.asarray(_tap_stack(x, taps=2, delay=1))
    # row 0..1 = channels shifted by 1, rows 2..3 shifted by 2
    assert np.allclose(y[0, 0, 1:], np.asarray(x)[0, 0, :-1])
    assert np.allclose(y[0, 2, 2:], np.asarray(x)[0, 0, :-2])
    assert np.allclose(y[0, :, 0], 0)


def test_wpe_matches_numpy_reference():
    rng = np.random.default_rng(1)
    N, C, T, F = 2, 2, 40, 5
    spec = (rng.standard_normal((N, C, T, F))
            + 1j * rng.standard_normal((N, C, T, F))).astype(np.complex64)
    power = np.mean(np.abs(spec) ** 2, axis=1)
    lengths = jnp.array([T, T])
    got = np.asarray(wpe_one_iteration(
        jnp.asarray(spec), jnp.asarray(power), lengths, taps=3, delay=2))
    want = _np_wpe_one_iter(spec, power, taps=3, delay=2)
    assert np.allclose(got, want, atol=1e-3)


def test_wpe_reduces_reverberation():
    """Convolve a white source with a long decaying filter across taps;
    iterative WPE should cut the tail energy vs. the wet signal."""
    rng = np.random.default_rng(2)
    C, T, F = 2, 200, 8
    dry = (rng.standard_normal((T, F)) + 1j * rng.standard_normal((T, F)))
    wet = np.zeros((C, T, F), dtype=np.complex64)
    for c in range(C):
        wet[c] = dry
        for lag, g in [(3, 0.7), (5, 0.5), (8, 0.35), (12, 0.25)]:
            wet[c, lag:] += g * np.exp(1j * 0.3 * c) * dry[:-lag]
    spec = jnp.asarray(wet[None])
    out = np.asarray(wpe(spec, jnp.array([T]), taps=10, delay=2,
                         iterations=3))[0]
    err_wet = np.mean(np.abs(wet[0] - dry) ** 2)
    err_out = np.mean(np.abs(out[0] - dry) ** 2)
    assert err_out < 0.5 * err_wet


def test_dnn_wpe_module_shapes_and_grad():
    rng = np.random.default_rng(3)
    N, C, T, F = 2, 2, 30, 9
    spec = jnp.asarray(
        (rng.standard_normal((N, C, T, F))
         + 1j * rng.standard_normal((N, C, T, F))).astype(np.complex64))
    lengths = jnp.array([T, T - 5])
    mod = DnnWpe(taps=3, delay=2, mask_hidden=16)
    params = mod.init(jax.random.PRNGKey(0), spec, lengths)
    out, mask = mod.apply(params, spec, lengths)
    assert out.shape == spec.shape and mask.shape == (N, T, F)

    def loss(p):
        o, _ = mod.apply(p, spec, lengths)
        return jnp.mean(jnp.abs(o) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_beamformer_with_wpe():
    from cat_tpu.front.beamformer import BeamformerNet

    rng = np.random.default_rng(4)
    N, C, L = 1, 2, 3200
    wave = jnp.asarray(rng.standard_normal((N, C, L)).astype(np.float32))
    net = BeamformerNet(num_bins=20, frame_length=400, frame_shift=160,
                        fft_size=512, mask_hidden=8, use_wpe=True,
                        wpe_taps=3, wpe_delay=2)
    params = net.init(jax.random.PRNGKey(0), wave, jnp.array([L]))
    feats, flens = net.apply(params, wave, jnp.array([L]))
    assert feats.shape == (N, int(flens[0]), 20)
    assert np.isfinite(np.asarray(feats)).all()


def test_wpd_beamformer_enhances():
    """WPD on a reverberant 2-ch mixture: output closer to the dry
    source than the raw reference channel."""
    from cat_tpu.front.beamformer import wpd_beamform

    rng = np.random.default_rng(7)
    C, T, F = 2, 160, 6
    dry = (rng.standard_normal((T, F)) + 1j * rng.standard_normal((T, F)))
    wet = np.zeros((C, T, F), dtype=np.complex64)
    for c in range(C):
        wet[c] = dry * np.exp(1j * 0.2 * c)
        for lag, g in [(3, 0.6), (6, 0.4), (10, 0.3)]:
            wet[c, lag:] += g * np.exp(1j * 0.2 * c) * dry[:-lag]
    mask = jnp.ones((1, T, F), jnp.float32)
    out = np.asarray(wpd_beamform(jnp.asarray(wet[None]), mask,
                                  jnp.array([T]), taps=8, delay=2))[0]
    err_raw = np.mean(np.abs(wet[0] - dry) ** 2)
    err_out = np.mean(np.abs(out - dry) ** 2)
    # the distortionless constraint preserves the (reverberant) steering
    # of Φ_s, so perfect dereverberation is not promised — require a
    # solid reduction (measured ~0.62x here)
    assert err_out < 0.75 * err_raw, (err_out, err_raw)


def test_beamformer_net_wpd_mode():
    from cat_tpu.front.beamformer import BeamformerNet

    rng = np.random.default_rng(8)
    N, C, L = 1, 2, 3200
    wave = jnp.asarray(rng.standard_normal((N, C, L)).astype(np.float32))
    net = BeamformerNet(num_bins=20, mask_hidden=8,
                        beamformer_type="wpd", wpe_taps=3, wpe_delay=2)
    params = net.init(jax.random.PRNGKey(0), wave, jnp.array([L]))
    feats, flens = net.apply(params, wave, jnp.array([L]))
    assert feats.shape == (N, int(flens[0]), 20)
    assert np.isfinite(np.asarray(feats)).all()
