"""iSTFT / overlap-add vocoder as fused XLA ops.

TPU-native re-design of the reference vocoder
(`/root/reference/src/istft.cpp:43-107`): the reference runs a naive
O(n_fft * n_freq) scalar inverse real DFT per frame plus a scalar overlap-add
loop on the CPU.  Here the inverse DFT over all frames is ONE matmul against a
precomputed real/imag synthesis basis — [S, n_freq] @ [n_freq, n_fft] maps
straight onto the MXU — and the overlap-add is a static 4-way shifted-block
sum (win_length = 4 * hop for MioCodec), all inside a single jit.

Behavioral contract preserved exactly:
  * irfft formula with Hermitian symmetry: out[n] = (re[0] + re[nyq]*(-1)^n
    + 2*sum_k (re[k] cos - im[k] sin)) / n_fft   (`istft.cpp:52-65`)
  * Hann window   w[i] = 0.5*(1-cos(2*pi*i/win))  (`istft.cpp:29-31`)
  * window-sum (Hann^2) normalization with 1e-8 floor (`istft.cpp:95-99`)
  * edge trim of (win_length - hop)/2 per side    (`istft.cpp:101-107`)

Output length is exactly n_frames * hop_length samples.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def make_synthesis_basis(n_fft: int, win_length: int | None = None):
    """Precompute the inverse-rDFT bases and Hann window (host, once).

    Returns (cos_basis [n_freq, n_fft], sin_basis [n_freq, n_fft],
    hann [win_length]) as float32 numpy arrays.  time = re @ cos_basis +
    im @ sin_basis reproduces the reference irfft bit-for-bit in f32 math.
    """
    if win_length is None:
        win_length = n_fft
    n_freq = n_fft // 2 + 1
    n = np.arange(n_fft)[None, :].astype(np.float64)
    k = np.arange(n_freq)[:, None].astype(np.float64)
    ang = 2.0 * np.pi * k * n / n_fft
    coef = np.full((n_freq, 1), 2.0)
    coef[0, 0] = 1.0
    if n_fft % 2 == 0:
        coef[-1, 0] = 1.0
    cos_b = (coef * np.cos(ang) / n_fft).astype(np.float32)
    sin_b = (-coef * np.sin(ang) / n_fft).astype(np.float32)
    # DC and Nyquist rows are purely real (imag coefficient unused).
    sin_b[0, :] = 0.0
    if n_fft % 2 == 0:
        sin_b[-1, :] = 0.0
    i = np.arange(win_length).astype(np.float64)
    hann = (0.5 * (1.0 - np.cos(2.0 * np.pi * i / win_length))).astype(np.float32)
    return cos_b, sin_b, hann


@partial(jax.jit, static_argnames=("hop_length",))
def istft(spec_real: jax.Array, spec_imag: jax.Array,
          cos_basis: jax.Array, sin_basis: jax.Array, hann: jax.Array,
          hop_length: int, frame_mask: jax.Array | None = None) -> jax.Array:
    """Inverse STFT with Hann^2-normalized overlap-add and edge trim.

    spec_real/spec_imag: [S, n_freq] float32.
    frame_mask: optional [S] float32 (1 = real frame, 0 = padding); when
    given, padded frames contribute neither audio nor window-sum, so the
    first `n_real * hop` output samples equal an unpadded call — this is what
    lets the streaming engine decode in fixed-size buckets without XLA
    recompiles (SURVEY.md §7.6).

    Returns [S * hop_length] float32 audio.
    """
    S, n_freq = spec_real.shape
    n_fft = cos_basis.shape[1]
    win = hann.shape[0]
    assert win == n_fft, "MioCodec uses win_length == n_fft"
    assert win % hop_length == 0
    k_frames = win // hop_length            # 4 for MioCodec (392 / 98)
    n_pad = (win - hop_length) // 2         # 147
    n_out = (S - 1) * hop_length + win

    # Inverse real DFT for every frame in one MXU matmul.  HIGHEST precision:
    # on TPU the default dot precision drops f32 operands to bf16, which is
    # audible quantization on the synthesis basis; full-f32 costs 3 MXU
    # passes but this matmul is a tiny share of the decode budget.
    time = (jnp.dot(spec_real, cos_basis, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            + jnp.dot(spec_imag, sin_basis, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST))
    fw = time * hann[None, :]               # windowed frames [S, win]
    w2 = (hann * hann)[None, :]             # [1, win]
    if frame_mask is not None:
        fw = fw * frame_mask[:, None]
        w2 = jnp.broadcast_to(w2, (S, win)) * frame_mask[:, None]
    else:
        w2 = jnp.broadcast_to(w2, (S, win))

    # Overlap-add: sample t*hop + c*hop + j lands in output block (t + c).
    fw_blocks = fw.reshape(S, k_frames, hop_length)
    w2_blocks = w2.reshape(S, k_frames, hop_length)
    n_blocks = n_out // hop_length          # S + k_frames - 1
    audio = jnp.zeros((n_blocks, hop_length), jnp.float32)
    wsum = jnp.zeros((n_blocks, hop_length), jnp.float32)
    for c in range(k_frames):               # static, unrolled by trace
        audio = audio.at[c:c + S].add(fw_blocks[:, c, :])
        wsum = wsum.at[c:c + S].add(w2_blocks[:, c, :])

    audio = audio.reshape(-1)
    wsum = wsum.reshape(-1)
    audio = jnp.where(wsum > 1e-8, audio / jnp.where(wsum > 1e-8, wsum, 1.0), audio)
    return audio[n_pad:n_out - n_pad]       # exactly S * hop samples


@partial(jax.jit, static_argnames=("hop_length", "frames_per_code"))
def spec_to_audio_bucketed(log_mag: jax.Array, phase: jax.Array,
                           cos_basis: jax.Array, sin_basis: jax.Array,
                           hann: jax.Array, hop_length: int,
                           frames_per_code: int,
                           n_real_codes: jax.Array) -> jax.Array:
    """Head->audio for bucketed decode, fully inside one jit (the frame mask
    is built on device so no eager glue ops dispatch through the runtime).
    Only the first n_real_codes * frames_per_code * hop samples are valid."""
    S = log_mag.shape[0]
    frame_mask = (jnp.arange(S) < n_real_codes * frames_per_code).astype(jnp.float32)
    mag = jnp.clip(jnp.exp(log_mag), 0.0, 100.0)
    re = mag * jnp.cos(phase)
    im = mag * jnp.sin(phase)
    return istft(re, im, cos_basis, sin_basis, hann, hop_length, frame_mask)


def spec_to_audio(log_mag: jax.Array, phase: jax.Array,
                  cos_basis: jax.Array, sin_basis: jax.Array, hann: jax.Array,
                  hop_length: int, frame_mask: jax.Array | None = None) -> jax.Array:
    """Codec head output -> audio: mag = clamp(exp(log_mag), 0, 100);
    re = mag*cos(phase), im = mag*sin(phase) (`miocodec.cpp:735-737`), then
    iSTFT.  Lives in the same jit as the codec so the spectrogram never
    leaves HBM."""
    mag = jnp.clip(jnp.exp(log_mag), 0.0, 100.0)
    re = mag * jnp.cos(phase)
    im = mag * jnp.sin(phase)
    return istft(re, im, cos_basis, sin_basis, hann, hop_length, frame_mask)
