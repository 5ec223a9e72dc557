"""Waveform quality metrics for parity evaluation.

BASELINE.md defines quality parity as "spectral distance vs reference CPU
WAVs at identical code sequences (--skip-llm replay)".  This module supplies
that metric: log-spectral distance (LSD) over STFT magnitudes, plus the
sample-domain errors the reference's stream-compare reports.
"""

from __future__ import annotations

import numpy as np


def stft_mag(x: np.ndarray, n_fft: int = 1024, hop: int = 256) -> np.ndarray:
    """Magnitude STFT (Hann), [frames, n_fft//2+1]."""
    x = np.asarray(x, np.float64)
    if len(x) < n_fft:
        x = np.pad(x, (0, n_fft - len(x)))
    win = np.hanning(n_fft)
    n_frames = 1 + (len(x) - n_fft) // hop
    frames = np.stack([x[i * hop:i * hop + n_fft] * win for i in range(n_frames)])
    return np.abs(np.fft.rfft(frames, axis=-1))


def log_spectral_distance(a: np.ndarray, b: np.ndarray,
                          n_fft: int = 1024, hop: int = 256,
                          eps: float = 1e-8) -> float:
    """Mean log-spectral distance in dB between two waveforms (lower is
    better; < 1 dB is typically inaudible)."""
    n = min(len(a), len(b))
    sa = stft_mag(a[:n], n_fft, hop)
    sb = stft_mag(b[:n], n_fft, hop)
    m = min(len(sa), len(sb))
    la = 20.0 * np.log10(sa[:m] + eps)
    lb = 20.0 * np.log10(sb[:m] + eps)
    return float(np.mean(np.sqrt(np.mean((la - lb) ** 2, axis=-1))))


def waveform_errors(a: np.ndarray, b: np.ndarray) -> dict:
    """MAE / RMSE / max-abs over the common prefix
    (stream-compare.cpp:100-124 contract)."""
    n = min(len(a), len(b))
    d = np.asarray(a[:n], np.float64) - np.asarray(b[:n], np.float64)
    return {
        "mae": float(np.abs(d).mean()) if n else 0.0,
        "rmse": float(np.sqrt((d ** 2).mean())) if n else 0.0,
        "max_abs": float(np.abs(d).max()) if n else 0.0,
        "n": n,
    }


def best_lag_rmse(a: np.ndarray, b: np.ndarray, max_lag: int = 4096,
                  step: int = 16) -> tuple[int, float]:
    """Best alignment lag within ±max_lag by RMSE
    (stream-compare.cpp:126-156 contract)."""
    best_lag, best = 0, float("inf")
    for lag in range(-max_lag, max_lag + 1, step):
        if lag >= 0:
            x, y = a[lag:], b
        else:
            x, y = a, b[-lag:]
        m = min(len(x), len(y))
        if m < 1000:
            continue
        r = float(np.sqrt(np.mean((np.asarray(x[:m], np.float64)
                                   - np.asarray(y[:m], np.float64)) ** 2)))
        if r < best:
            best, best_lag = r, lag
    return best_lag, best
