"""iSTFT vocoder tests vs an independent scalar-loop reference.

The reference implementation here is a direct numpy port of the C++ algorithm
at /root/reference/src/istft.cpp (naive per-frame irfft + overlap-add) so the
vectorized XLA version is checked against independently-written math.
"""

import numpy as np
import jax.numpy as jnp

from miotts_tpu.ops.istft import istft, make_synthesis_basis, spec_to_audio

N_FFT = 392
HOP = 98
N_FREQ = N_FFT // 2 + 1


def ref_irfft(re, im):
    """irfft per /root/reference/src/istft.cpp:43-66 (vectorized over n)."""
    n = np.arange(N_FFT, dtype=np.float64)
    out = np.full(N_FFT, re[0], dtype=np.float64)
    out += re[N_FREQ - 1] * np.where(np.arange(N_FFT) & 1, -1.0, 1.0)
    for k in range(1, N_FREQ - 1):
        w = 2.0 * np.pi * k * n / N_FFT
        out += 2.0 * (re[k] * np.cos(w) - im[k] * np.sin(w))
    return out / N_FFT


def ref_istft(spec_re, spec_im, hop=HOP):
    """Scalar overlap-add per /root/reference/src/istft.cpp:68-107."""
    S = spec_re.shape[0]
    win = N_FFT
    n_pad = (win - hop) // 2
    n_out = (S - 1) * hop + win
    hann = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(win) / win))
    audio = np.zeros(n_out)
    wsum = np.zeros(n_out)
    for t in range(S):
        time = ref_irfft(spec_re[t], spec_im[t])
        off = t * hop
        audio[off:off + win] += time * hann
        wsum[off:off + win] += hann * hann
    nz = wsum > 1e-8
    audio[nz] /= wsum[nz]
    return audio[n_pad:n_out - n_pad]


def test_istft_matches_scalar_reference(rng):
    S = 12
    re = rng.standard_normal((S, N_FREQ)).astype(np.float32)
    im = rng.standard_normal((S, N_FREQ)).astype(np.float32)
    cos_b, sin_b, hann = make_synthesis_basis(N_FFT)
    got = np.asarray(istft(jnp.array(re), jnp.array(im),
                           jnp.array(cos_b), jnp.array(sin_b), jnp.array(hann), HOP))
    want = ref_istft(re.astype(np.float64), im.astype(np.float64))
    assert got.shape == (S * HOP,)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_istft_output_length():
    for S in (1, 4, 18):
        re = np.zeros((S, N_FREQ), np.float32)
        im = np.zeros((S, N_FREQ), np.float32)
        cos_b, sin_b, hann = make_synthesis_basis(N_FFT)
        out = istft(jnp.array(re), jnp.array(im),
                    jnp.array(cos_b), jnp.array(sin_b), jnp.array(hann), HOP)
        assert out.shape == (S * HOP,)


def test_istft_pure_tone_reconstruction():
    """A constant-per-frame sinusoid bin should reconstruct a steady tone in
    the fully-overlapped interior."""
    S = 20
    k = 10  # bin -> freq k/392 cycles/sample
    re = np.zeros((S, N_FREQ), np.float32)
    im = np.zeros((S, N_FREQ), np.float32)
    # Choose phases so every frame holds the SAME global sinusoid:
    # frame t starts at sample t*hop; X_t[k] = A*exp(-i*2pi*k*(t*hop)/N) only
    # if hop*k divisible... simpler: k*hop/N = 10*98/392 = 2.5 cycles per hop.
    A = 50.0
    # synthesis: frame t local sample n reconstructs cos(2*pi*k*n/N + phi);
    # matching the global tone at absolute sample t*hop + n needs
    # phi = +2*pi*k*(t*hop)/N
    for t in range(S):
        phase = 2.0 * np.pi * k * (t * HOP) / N_FFT
        re[t, k] = A * np.cos(phase)
        im[t, k] = A * np.sin(phase)
    cos_b, sin_b, hann = make_synthesis_basis(N_FFT)
    out = np.asarray(istft(jnp.array(re), jnp.array(im),
                           jnp.array(cos_b), jnp.array(sin_b), jnp.array(hann), HOP))
    # Interior samples: the frames hold the RAW tone (no analysis window), so
    # Hann-weighted OLA with Hann^2 normalization yields x * sum(w)/sum(w^2)
    # = x * 2/1.5 = 4/3 x for Hann at 4x overlap.
    n = np.arange(out.shape[0]) + (N_FFT - HOP) // 2
    want = (4.0 / 3.0) * 2.0 * A / N_FFT * np.cos(2.0 * np.pi * k * n / N_FFT)
    # skip edges where overlap is partial
    sl = slice(2 * HOP, -2 * HOP)
    np.testing.assert_allclose(out[sl], want[sl], atol=1e-3)


def test_istft_frame_mask_matches_unpadded(rng):
    """Bucketed decode: S_pad frames with mask == unpadded S_real frames on
    the first S_real*hop samples (streaming bucketing contract)."""
    S_real, S_pad = 9, 16
    re = rng.standard_normal((S_pad, N_FREQ)).astype(np.float32)
    im = rng.standard_normal((S_pad, N_FREQ)).astype(np.float32)
    mask = (np.arange(S_pad) < S_real).astype(np.float32)
    cos_b, sin_b, hann = make_synthesis_basis(N_FFT)
    args = (jnp.array(cos_b), jnp.array(sin_b), jnp.array(hann))
    full = np.asarray(istft(jnp.array(re[:S_real]), jnp.array(im[:S_real]), *args, HOP))
    padded = np.asarray(istft(jnp.array(re), jnp.array(im), *args, HOP,
                              frame_mask=jnp.array(mask)))
    np.testing.assert_allclose(padded[:S_real * HOP], full, atol=1e-5)


def test_spec_to_audio_head_semantics(rng):
    """mag clamp at 100 and cos/sin recombination (miocodec.cpp:735-737)."""
    S = 4
    log_mag = rng.standard_normal((S, N_FREQ)).astype(np.float32) + 6.0  # exp > 100 sometimes
    phase = rng.standard_normal((S, N_FREQ)).astype(np.float32)
    cos_b, sin_b, hann = make_synthesis_basis(N_FFT)
    args = (jnp.array(cos_b), jnp.array(sin_b), jnp.array(hann))
    got = np.asarray(spec_to_audio(jnp.array(log_mag), jnp.array(phase), *args, HOP))
    mag = np.clip(np.exp(log_mag), 0, 100)
    re = (mag * np.cos(phase)).astype(np.float32)
    im = (mag * np.sin(phase)).astype(np.float32)
    want = np.asarray(istft(jnp.array(re), jnp.array(im), *args, HOP))
    np.testing.assert_allclose(got, want, atol=1e-3)
