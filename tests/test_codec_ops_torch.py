"""Authoritative per-op codec parity vs torch (CPU).

Round-1 verdict: every codec numeric check compared the JAX transcription
against a numpy reference written by the same author — a systematic
misreading of an OP'S SEMANTICS would pass all of them.  torch ships in
this image, and the upstream MioCodec is a torch model, so each building
block is checked here against torch's own implementation of that op
(conv1d / conv_transpose1d / group_norm / layer_norm / SDPA / rotary
pairs / istft).  Wiring order between ops stays covered by the stage taps
and ref_codec tests; these pin the op semantics themselves.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from miotts_tpu.models.codec import (  # noqa: E402
    _adaln_norm, _conv1d_same, _conv_transpose1d, _layer_norm,
    _local_attention, _masked_group_norm, _rope_interleaved, _snake,
    _swiglu,
)
from miotts_tpu.ops.istft import istft, make_synthesis_basis  # noqa: E402


@pytest.fixture(scope="module")
def gen():
    return np.random.default_rng(20260820)


def t32(x):
    return torch.tensor(np.asarray(x), dtype=torch.float32)


def test_conv1d_same_matches_torch(gen):
    T, cin, cout = 13, 8, 6
    x = gen.standard_normal((T, cin)).astype(np.float32)
    w = gen.standard_normal((cout, cin, 3)).astype(np.float32)
    b = gen.standard_normal(cout).astype(np.float32)
    ours = np.asarray(_conv1d_same(jnp.asarray(x), jnp.asarray(w),
                                   jnp.asarray(b), jnp.ones(T, jnp.float32)))
    want = F.conv1d(t32(x.T)[None], t32(w), t32(b), padding=1)[0].T.numpy()
    np.testing.assert_allclose(ours, want, atol=2e-5)


@pytest.mark.parametrize("stride,k", [(2, 2), (3, 7), (4, 8)])
def test_conv_transpose1d_matches_torch(gen, stride, k):
    T, cin, cout = 9, 6, 5
    x = gen.standard_normal((T, cin)).astype(np.float32)
    w = gen.standard_normal((cin, cout, k)).astype(np.float32)
    b = gen.standard_normal(cout).astype(np.float32)
    ours = np.asarray(_conv_transpose1d(jnp.asarray(x), jnp.asarray(w),
                                        jnp.asarray(b), stride,
                                        jnp.ones(T, jnp.float32)))
    want = F.conv_transpose1d(t32(x.T)[None], t32(w), t32(b),
                              stride=stride)[0].T.numpy()
    assert ours.shape == want.shape == ((T - 1) * stride + k, cout)
    np.testing.assert_allclose(ours, want, atol=2e-5)


def test_group_norm_matches_torch(gen):
    T, C, G = 17, 24, 8
    x = gen.standard_normal((T, C)).astype(np.float32)
    w = gen.standard_normal(C).astype(np.float32)
    b = gen.standard_normal(C).astype(np.float32)
    ours = np.asarray(_masked_group_norm(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), G, 1e-6,
        jnp.ones(T, jnp.float32)))
    # torch group_norm normalizes over (C/G, *spatial) per group: input
    # [N=1, C, T]; affine per channel
    want = F.group_norm(t32(x.T)[None], G, t32(w), t32(b),
                        eps=1e-6)[0].T.numpy()
    np.testing.assert_allclose(ours, want, atol=3e-5)


def test_layer_norm_matches_torch(gen):
    T, C = 11, 32
    x = gen.standard_normal((T, C)).astype(np.float32)
    w = gen.standard_normal(C).astype(np.float32)
    b = gen.standard_normal(C).astype(np.float32)
    ours = np.asarray(_layer_norm(jnp.asarray(x), jnp.asarray(w),
                                  jnp.asarray(b), 1e-5))
    want = F.layer_norm(t32(x), (C,), t32(w), t32(b), eps=1e-5).numpy()
    np.testing.assert_allclose(ours, want, atol=2e-5)


def test_adaln_norm_matches_torch(gen):
    """AdaLN: affine-free LayerNorm, then x*(1+scale)+shift
    (`miocodec.cpp:322-330`; upstream torch model does
    norm(x)*(1+scale)+shift with elementwise_affine=False)."""
    T, C = 7, 16
    x = gen.standard_normal((T, C)).astype(np.float32)
    shift = gen.standard_normal(C).astype(np.float32)
    scale = gen.standard_normal(C).astype(np.float32)
    ours = np.asarray(_adaln_norm(jnp.asarray(x), jnp.asarray(shift),
                                  jnp.asarray(scale), 1e-6))
    want = (F.layer_norm(t32(x), (C,), eps=1e-6)
            * (1.0 + t32(scale)) + t32(shift)).numpy()
    np.testing.assert_allclose(ours, want, atol=2e-5)


def test_rope_interleaved_matches_torch_complex(gen):
    """ggml NORMAL-mode RoPE == rotating ADJACENT value pairs by
    pos * theta^(-2i/d) — the upstream model's apply_rotary_emb via
    torch.view_as_complex (freqs_cis = polar(1, pos*inv_freq))."""
    T, H, d = 10, 3, 16
    theta = 10000.0
    x = gen.standard_normal((T, H, d)).astype(np.float32)
    pos = np.arange(T, dtype=np.int32)
    ours = np.asarray(_rope_interleaved(jnp.asarray(x), jnp.asarray(pos),
                                        theta))
    xt = t32(x).reshape(T, H, d // 2, 2)
    xc = torch.view_as_complex(xt)
    inv = theta ** (-torch.arange(0, d, 2, dtype=torch.float64) / d)
    ang = torch.arange(T, dtype=torch.float64)[:, None] * inv[None, :]
    freqs = torch.polar(torch.ones_like(ang), ang)[:, None, :]  # [T,1,d/2]
    want = torch.view_as_real(xc * freqs.to(torch.complex64))
    want = want.reshape(T, H, d).numpy()
    np.testing.assert_allclose(ours, want, atol=2e-5)


def test_attention_matches_torch_sdpa(gen):
    """Post-RoPE attention math (scale 1/sqrt(hd), additive mask, softmax,
    value mix) vs torch scaled_dot_product_attention with the same float
    mask.  The projections + RoPE feeding it are identity-checked above."""
    T, n_head, hd = 12, 4, 8
    dim = n_head * hd
    x = (gen.standard_normal((T, dim)) * 0.3).astype(np.float32)
    wq, wk, wv, wo = (gen.standard_normal((dim, dim)).astype(np.float32) * 0.2
                      for _ in range(4))
    pos = np.arange(T, dtype=np.int32)
    # banded additive mask like _band_mask_bias produces
    band = 3
    i = np.arange(T)
    mask = np.where(np.abs(i[:, None] - i[None, :]) <= band, 0.0,
                    -1e9).astype(np.float32)
    ours = np.asarray(_local_attention(
        jnp.asarray(x), jnp.asarray(wq), jnp.asarray(wk), jnp.asarray(wv),
        jnp.asarray(wo), jnp.asarray(pos), jnp.asarray(mask), n_head,
        10000.0))

    # torch path: same projections (F.linear, w is [out, in]), same
    # interleaved RoPE (checked against torch complex math above), then
    # torch SDPA + out-proj
    q = F.linear(t32(x), t32(wq)).reshape(T, n_head, hd)
    k = F.linear(t32(x), t32(wk)).reshape(T, n_head, hd)
    v = F.linear(t32(x), t32(wv)).reshape(T, n_head, hd)
    q = t32(np.asarray(_rope_interleaved(jnp.asarray(q.numpy()),
                                         jnp.asarray(pos), 10000.0)))
    k = t32(np.asarray(_rope_interleaved(jnp.asarray(k.numpy()),
                                         jnp.asarray(pos), 10000.0)))
    out = F.scaled_dot_product_attention(
        q.permute(1, 0, 2), k.permute(1, 0, 2), v.permute(1, 0, 2),
        attn_mask=t32(mask)[None])          # [H, T, hd]
    out = out.permute(1, 0, 2).reshape(T, dim)
    want = F.linear(out, t32(wo)).numpy()
    np.testing.assert_allclose(ours, want, atol=5e-5)


def test_swiglu_matches_torch(gen):
    T, C, Ff = 9, 12, 20
    x = gen.standard_normal((T, C)).astype(np.float32)
    wg = gen.standard_normal((Ff, C)).astype(np.float32)
    wu = gen.standard_normal((Ff, C)).astype(np.float32)
    wd = gen.standard_normal((C, Ff)).astype(np.float32)
    ours = np.asarray(_swiglu(jnp.asarray(x), jnp.asarray(wg),
                              jnp.asarray(wu), jnp.asarray(wd)))
    want = (F.silu(t32(x) @ t32(wg).T) * (t32(x) @ t32(wu).T)) @ t32(wd).T
    np.testing.assert_allclose(ours, want.numpy(), atol=3e-5)


def test_snake_matches_torch(gen):
    T, C = 8, 10
    x = gen.standard_normal((T, C)).astype(np.float32)
    la = (gen.standard_normal(C) * 0.3).astype(np.float32)
    lb = (gen.standard_normal(C) * 0.3).astype(np.float32)
    ours = np.asarray(_snake(jnp.asarray(x), jnp.asarray(la),
                             jnp.asarray(lb)))
    xt, a, b = t32(x), torch.exp(t32(la)), torch.exp(t32(lb))
    want = (xt + torch.sin(xt * a) ** 2 / b).numpy()
    np.testing.assert_allclose(ours, want, atol=2e-5)


def test_istft_matches_torch_istft(gen):
    """Vocoder OLA vs torch.istft: same Hann window, hop, window-sum
    normalization.  Edge handling differs by design (we trim
    (win-hop)/2 = reference istft.cpp:101-107; torch center=True trims
    n_fft//2), so the comparison aligns the two outputs and checks the
    interior."""
    n_fft, hop, S = 392, 98, 24
    cos_b, sin_b, hann = make_synthesis_basis(n_fft)
    re = (gen.standard_normal((S, n_fft // 2 + 1)) * 0.5).astype(np.float32)
    im = (gen.standard_normal((S, n_fft // 2 + 1)) * 0.5).astype(np.float32)
    im[:, 0] = 0.0
    im[:, -1] = 0.0
    ours = np.asarray(istft(jnp.asarray(re), jnp.asarray(im),
                            jnp.asarray(cos_b), jnp.asarray(sin_b),
                            jnp.asarray(hann), hop))
    assert ours.shape == (S * hop,)

    spec = torch.complex(t32(re), t32(im)).transpose(0, 1)  # [n_freq, S]
    want = torch.istft(spec, n_fft=n_fft, hop_length=hop, win_length=n_fft,
                       window=torch.hann_window(n_fft, periodic=True),
                       center=True, length=(S - 1) * hop).numpy()
    # our sample i sits at pre-trim offset i + (n_fft-hop)//2; torch's at
    # t + n_fft//2  ->  ours[i] == torch[i - hop//2]
    off = hop // 2
    a = ours[n_fft: S * hop - n_fft]
    b = want[n_fft - off: S * hop - n_fft - off]
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-4)
