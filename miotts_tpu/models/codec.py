"""MioCodec acoustic decoder — jitted JAX re-design of the reference network.

Network contract from `/root/reference/src/miocodec.cpp:519-745` (§3.4 of
SURVEY.md):

  codes i32[T] --token_embd LUT--> [T, 768]
  -> wave_prenet: 6 pre-norm transformer blocks (768 d, 12 h, SwiGLU 2048,
     interleaved RoPE theta=1e4, LOCAL attention window 65)  + LN + 768->512
  -> wave_upsample ConvTranspose1d(512->512, k=2, s=2): T -> S = 2T
  -> wave_prior: 2 ResNet blocks (GroupNorm(32)+SiLU+Conv1d k3 pad1) x2 + res
  -> wave_decoder: 8 AdaLN-Zero transformer blocks (512 d, 8 h, ff 1536,
     window 65), condition = SiLU(voice_emb 128) -> Linear -> shift/scale/gate
  -> final AdaLN norm (norm_cond 128 -> 1024 -> shift|scale)
  -> wave_post: 2 ResNet blocks
  -> wave_upsampler: per stage [ConvTranspose1d(stride=factor) ->
     side-trim (kernel-factor)/2 -> Snake -> ResNet], then Linear(128->512)
     -> out Snake
  -> istft_head Linear(512->394) -> log_mag | phase

Design differences from the reference (deliberate, TPU-first):
  * The reference rebuilds a ~65k-node ggml graph and re-uploads every weight
    on each decode call (`miocodec.cpp:558-563,782`); here the whole network
    is ONE jitted function, weights resident in HBM, compiled once per
    bucketed sequence length.
  * Per-layer weights are stacked and iterated with `lax.scan`, keeping
    compile time flat in depth.
  * All sequence-mixing ops take a validity mask so fixed-size length buckets
    decode exactly (attention key masking, masked GroupNorm statistics,
    zeroed conv inputs) — this is what makes streaming re-decode recompile-
    free (SURVEY.md §7.6).
  * The iSTFT head feeds the fused basis-matmul vocoder (ops/istft.py) inside
    the same jit, so text->PCM never leaves the device.
  * ggml casts conv kernels to f16 (`miocodec.cpp:382-386`); we keep f32.

Parameter tree layout (numpy-order shapes; Linear weights are [out, in]):
see `load_codec_params` below; GGUF tensor names match the reference model
files so real checkpoints load unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.istft import make_synthesis_basis, istft

# The reference's fixed 20-code parity vector, byte-for-byte
# (`/root/reference/tools/compare_codec.py:50-51`).  Cross-implementation
# stage dumps (tools/compare_codec.py, tools/debug_decoder.py) default to
# this so day-1 npz diffs against upstream dumps use identical inputs.
REFERENCE_TEST_CODES = [
    12287, 11619, 11774, 12223, 2490, 826, 2257, 1668, 1219, 2319,
    9994, 12683, 12745, 4215, 12478, 8800, 8696, 375, 1406, 12396,
]


@dataclass(frozen=True)
class CodecConfig:
    """Hyperparameters, read from GGUF KV with the reference defaults
    (`miocodec.cpp:448-481`)."""
    sample_rate: int = 44100
    n_fft: int = 392
    hop_length: int = 98
    samples_per_token: int = 1764
    head_out_dim: int = 394

    prenet_layers: int = 6
    prenet_dim: int = 768
    prenet_heads: int = 12
    prenet_ff: int = 2048
    prenet_window: int = 65

    decoder_layers: int = 8
    decoder_dim: int = 512
    decoder_heads: int = 8
    decoder_ff: int = 1536
    decoder_window: int = 65
    adaln_dim: int = 128

    resnet_blocks: int = 2
    resnet_groups: int = 32
    upsampler_stages: int = 2

    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    group_norm_eps: float = 1e-6

    up_factors: tuple[int, ...] = (3, 3)
    up_kernels: tuple[int, ...] = (7, 7)

    # bf16-input matmuls (Precision.DEFAULT) instead of exact f32
    # (Precision.HIGHEST) — ~3x matmul throughput on the MXU, ~1e-3
    # relative error.  Part of the static jit key, so both modes can
    # coexist in one process.  See `_set_fast` below.
    fast: bool = False

    @property
    def n_freq(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def total_upsample(self) -> int:
        """STFT frames per code: 2 (wave_upsample) x prod(up_factors)."""
        t = 2
        for f in self.up_factors:
            t *= f
        return t

    @classmethod
    def from_gguf(cls, reader) -> "CodecConfig":
        g = lambda k, d: int(reader.kv.get(k, d))
        gf = lambda k, d: float(reader.kv.get(k, d))
        n_up = g("miocodec.wave_upsampler_layers", 2)
        factors = (3,) * n_up
        kernels = (7,) * n_up
        # The reference stores factors/kernels as GGUF *tensors*
        # (`miocodec.cpp:476-481`).
        if reader.has_tensor("miocodec.wave_upsampler.factors"):
            factors = tuple(int(v) for v in np.asarray(
                reader.tensor_np("miocodec.wave_upsampler.factors")).reshape(-1)[:n_up])
        if reader.has_tensor("miocodec.wave_upsampler.kernel_sizes"):
            kernels = tuple(int(v) for v in np.asarray(
                reader.tensor_np("miocodec.wave_upsampler.kernel_sizes")).reshape(-1)[:n_up])
        return cls(
            sample_rate=g("miocodec.sample_rate", 44100),
            n_fft=g("miocodec.n_fft", 392),
            hop_length=g("miocodec.hop_length", 98),
            samples_per_token=g("miocodec.samples_per_token", 1764),
            head_out_dim=g("embedding_length_out", 394),
            prenet_layers=g("miocodec.prenet_layers", 6),
            prenet_dim=g("miocodec.prenet_dim", 768),
            prenet_heads=g("miocodec.prenet_heads", 12),
            prenet_ff=g("miocodec.prenet_ff", 2048),
            prenet_window=g("miocodec.prenet_window", 65),
            decoder_layers=g("miocodec.decoder_layers", 8),
            decoder_dim=g("miocodec.decoder_dim", 512),
            decoder_heads=g("miocodec.decoder_heads", 8),
            decoder_ff=g("miocodec.decoder_ff", 1536),
            decoder_window=g("miocodec.decoder_window", 65),
            adaln_dim=g("miocodec.decoder_adanorm_dim", 128),
            resnet_blocks=g("miocodec.resnet_blocks", 2),
            resnet_groups=g("miocodec.resnet_groups", 32),
            upsampler_stages=n_up,
            rope_theta=gf("miocodec.rope_theta", 10000.0),
            norm_eps=gf("miocodec.norm_eps", 1e-5),
            group_norm_eps=gf("miocodec.group_norm_eps", 1e-6),
            up_factors=factors,
            up_kernels=kernels,
        )


# ---------------------------------------------------------------------------
# Primitive ops (all take [T, features] activations, mask [T] validity)
# ---------------------------------------------------------------------------

# Exact mode (default) keeps every matmul in full f32 (3-pass MXU) for
# bit-level parity with the reference math; fast mode (CodecConfig.fast /
# EngineConfig.codec_fast / env MIOTTS_CODEC_FAST=1) drops to the TPU-native
# bf16-input matmul (~3x matmul throughput, ~1e-3 relative error — far below
# the codec's own quantization noise).  Parity tests always run exact mode.
#
# The mode is selected at TRACE time: `_set_fast` mutates the shared kwarg
# dict at the top of each forward (cfg is a static jit arg, so each fast
# setting traces its own executable; tracing is synchronous, so the flag
# can't leak across concurrently-used configs).  The iSTFT basis matmul
# (ops/istft.py) always stays HIGHEST — it is one cheap matmul and directly
# shapes the output waveform.
import os as _os

_DOT = dict(preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)


def _set_fast(fast: bool) -> None:
    fast = fast or bool(_os.environ.get("MIOTTS_CODEC_FAST"))
    _DOT["precision"] = (jax.lax.Precision.DEFAULT if fast
                         else jax.lax.Precision.HIGHEST)


def _linear(x, w, b=None):
    """y = x @ w.T + b with w [out, in] (GGUF Linear layout)."""
    y = jnp.dot(x, w.T, **_DOT)
    if b is not None:
        y = y + b
    return y


def _layer_norm(x, w, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    y = y * w
    if b is not None:
        y = y + b
    return y


def _rope_interleaved(x, pos, theta):
    """ggml NORMAL-mode RoPE (`miocodec.cpp:260-263`): rotate adjacent pairs
    (2i, 2i+1) with angle pos * theta^(-2i/d).  x: [T, H, d]."""
    d = x.shape[-1]
    inv_freq = theta ** (-jnp.arange(0, d, 2, dtype=jnp.float32) / d)  # [d/2]
    ang = pos[:, None].astype(jnp.float32) * inv_freq[None, :]          # [T, d/2]
    cos = jnp.cos(ang)[:, None, :]
    sin = jnp.sin(ang)[:, None, :]
    x2 = x.reshape(*x.shape[:-1], d // 2, 2)
    xe, xo = x2[..., 0], x2[..., 1]
    ye = xe * cos - xo * sin
    yo = xe * sin + xo * cos
    return jnp.stack([ye, yo], axis=-1).reshape(x.shape)


def _local_attention(x, wq, wk, wv, wo, pos, mask_bias, n_head, theta):
    """Multi-head attention with interleaved RoPE and an additive [T, T]
    mask (band + key-validity), the XLA form of `mha_rope`
    (`miocodec.cpp:245-286`)."""
    T, dim = x.shape
    hd = dim // n_head
    q = _linear(x, wq).reshape(T, n_head, hd)
    k = _linear(x, wk).reshape(T, n_head, hd)
    v = _linear(x, wv).reshape(T, n_head, hd)
    q = _rope_interleaved(q, pos, theta)
    k = _rope_interleaved(k, pos, theta)
    scores = jnp.einsum("qhd,khd->hqk", q, k, **_DOT) / np.sqrt(hd)
    scores = scores + mask_bias[None, :, :]
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hqk,khd->qhd", probs, v, **_DOT).reshape(T, dim)
    return _linear(out, wo)


def _swiglu(x, w_gate, w_up, w_down):
    """w_down(silu(w_gate x) * w_up x) (`miocodec.cpp:220-225`)."""
    return _linear(jax.nn.silu(_linear(x, w_gate)) * _linear(x, w_up), w_down)


def _adaln3(cond, w, b):
    """SiLU(cond) -> Linear -> (shift, scale, gate), split order per
    `miocodec.cpp:310-319`."""
    h = _linear(jax.nn.silu(cond), w, b)
    dim = h.shape[-1] // 3
    return h[..., :dim], h[..., dim:2 * dim], h[..., 2 * dim:]


def _adaln_norm(x, shift, scale, eps):
    """norm(x) * (1 + scale) + shift, norm without affine
    (`miocodec.cpp:322-330`)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return y * (1.0 + scale) + shift


def _masked_group_norm(x, w, b, n_groups, eps, mask):
    """GroupNorm over (seq, channels/group) per group with masked statistics.

    ggml computes stats over the full length (`miocodec.cpp:357-371`); with
    bucketed padding the stats must exclude padded positions to stay equal to
    an unpadded call.  x: [T, C], mask: [T] float."""
    T, C = x.shape
    g = x.reshape(T, n_groups, C // n_groups)
    m = mask[:, None, None]
    count = jnp.maximum(jnp.sum(mask), 1.0) * (C // n_groups)
    mu = jnp.sum(g * m, axis=(0, 2), keepdims=True) / count
    var = jnp.sum(jnp.square(g - mu) * m, axis=(0, 2), keepdims=True) / count
    y = ((g - mu) * jax.lax.rsqrt(var + eps)).reshape(T, C)
    return y * w + b


def _conv1d_same(x, w, b, mask):
    """Conv1d k=3, stride 1, pad 1 on [T, C] with torch weight [out, in, k].

    Padded positions are zeroed first so the pad region behaves exactly like
    the reference's zero boundary padding."""
    x = x * mask[:, None]
    y = jax.lax.conv_general_dilated(
        x[None], jnp.transpose(w, (2, 1, 0)),  # [k, in, out]
        window_strides=(1,), padding=[(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
        precision=_DOT["precision"],
    )[0]
    if b is not None:
        y = y + b
    return y


def _conv_transpose1d(x, w, b, stride, mask):
    """ConvTranspose1d on [T, C_in] with torch weight [in, out, k], VALID
    padding: out length (T-1)*stride + k (ggml_conv_transpose_1d semantics,
    `miocodec.cpp:624,685`)."""
    x = x * mask[:, None]
    k = w.shape[2]
    # y[p, co] = sum_{i,kk: i*stride+kk == p} x[i, ci] w[ci, co, kk]
    # == conv_general_dilated with lhs_dilation=stride, flipped kernel,
    #    padding (k-1, k-1).
    w_flip = jnp.flip(w, axis=2)                     # [in, out, k]
    y = jax.lax.conv_general_dilated(
        x[None], jnp.transpose(w_flip, (2, 0, 1)),   # [k, in, out]
        window_strides=(1,), padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
        precision=_DOT["precision"],
    )[0]
    if b is not None:
        y = y + b
    return y


def _snake(x, log_alpha, log_beta):
    """Snake activation x + sin^2(exp(a) x)/exp(b), channelwise log-scale
    parameters (`miocodec.cpp:407-420`)."""
    a = jnp.exp(log_alpha)
    b = jnp.exp(log_beta)
    s = jnp.sin(x * a)
    return x + s * s / b


def _resnet_block(x, p, n_groups, eps, mask):
    """GN -> SiLU -> Conv -> GN -> SiLU -> Conv + residual
    (`miocodec.cpp:388-405`)."""
    r = x
    x = _masked_group_norm(x, p["norm1_w"], p["norm1_b"], n_groups, eps, mask)
    x = jax.nn.silu(x)
    x = _conv1d_same(x, p["conv1_w"], p["conv1_b"], mask)
    x = _masked_group_norm(x, p["norm2_w"], p["norm2_b"], n_groups, eps, mask)
    x = jax.nn.silu(x)
    x = _conv1d_same(x, p["conv2_w"], p["conv2_b"], mask)
    return x + r


def _decoder_layer(x, p, cond, pos, bias, n_head, theta, eps):
    """One wave_decoder AdaLN-Zero layer (`miocodec.cpp:310-355`): the
    SINGLE definition used by both the scanned production forward and the
    sub-op bisection tool's prefix replay — so the debug tool can never
    silently validate against stale math."""
    sh, sc, g = _adaln3(cond, p["attn_cond_w"], p["attn_cond_b"])
    h = _adaln_norm(x, sh, sc, eps)
    h = _local_attention(h, p["wq"], p["wk"], p["wv"], p["wo"],
                         pos, bias, n_head, theta)
    x = x + h * g
    sh, sc, g = _adaln3(cond, p["ffn_cond_w"], p["ffn_cond_b"])
    h = _adaln_norm(x, sh, sc, eps)
    h = _swiglu(h, p["w_gate"], p["w_up"], p["w_down"])
    return x + h * g


def _band_mask_bias(T: int, window: int, mask: jax.Array) -> jax.Array:
    """Additive attention bias: 0 inside |i-j| <= window//2 AND j valid,
    else -inf (`fill_local_attn_mask`, `miocodec.cpp:233-242`, plus bucket
    key-validity)."""
    half = window // 2
    i = jnp.arange(T)
    band = jnp.abs(i[:, None] - i[None, :]) <= half
    valid = mask[None, :] > 0.5
    # -1e9 instead of -inf: a padded query row beyond the band of all real
    # keys would softmax over all -inf -> NaN, and NaN * 0-mask stays NaN.
    return jnp.where(band & valid, 0.0, -1e9)


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------

def _codec_forward(params: dict, codes: jax.Array, voice_emb: jax.Array,
                   cfg: CodecConfig, n_real: jax.Array | None,
                   tap=None):
    """Forward body shared by the jitted decode and the eager stage-debug
    path; `tap(name, x)` records intermediates when given (tools/
    debug_decoder.py — the counterpart of the reference's
    debug_decoder_substeps.py workflow, SURVEY.md §4.1)."""
    if tap is None:
        tap = lambda name, x: None
    _set_fast(cfg.fast)
    T = codes.shape[0]
    if n_real is None:
        n_real = jnp.array(T, jnp.int32)
    mask_t = (jnp.arange(T) < n_real).astype(jnp.float32)

    eps = cfg.norm_eps
    gn_eps = cfg.group_norm_eps

    # ---- 1. token embedding LUT (precomputed FSQ decode) ----
    x = params["token_embd"][codes]                    # [T, 768]
    tap("token_embd", x)

    # ---- 2. wave_prenet ----
    pos_t = jnp.arange(T, dtype=jnp.int32)
    bias_t = _band_mask_bias(T, cfg.prenet_window, mask_t)

    def prenet_layer(x, p):
        h = _layer_norm(x, p["attn_norm_w"], p["attn_norm_b"], eps)
        h = _local_attention(h, p["wq"], p["wk"], p["wv"], p["wo"],
                             pos_t, bias_t, cfg.prenet_heads, cfg.rope_theta)
        x = x + h
        h = _layer_norm(x, p["ffn_norm_w"], p["ffn_norm_b"], eps)
        h = _swiglu(h, p["w_gate"], p["w_up"], p["w_down"])
        return x + h, None

    x, _ = jax.lax.scan(prenet_layer, x, params["prenet_blocks"])
    tap("prenet", x)
    x = _layer_norm(x, params["prenet_norm_w"], params["prenet_norm_b"], eps)
    x = _linear(x, params["prenet_out_w"], params["prenet_out_b"])  # [T, 512]
    tap("prenet_out", x)

    # ---- 3. wave_upsample ConvTranspose1d(512->512, k=2, s=2) ----
    x = _conv_transpose1d(x, params["upsample_w"], params["upsample_b"], 2, mask_t)
    tap("upsample", x)
    S = 2 * T
    s_real = 2 * n_real
    mask_s = (jnp.arange(S) < s_real).astype(jnp.float32)

    # ---- 4. wave_prior ResNet blocks ----
    def prior_block(x, p):
        return _resnet_block(x, p, cfg.resnet_groups, gn_eps, mask_s), None
    x, _ = jax.lax.scan(prior_block, x, params["prior_blocks"])
    tap("prior", x)

    # ---- 5. wave_decoder AdaLN-Zero transformer ----
    pos_s = jnp.arange(S, dtype=jnp.int32)
    bias_s = _band_mask_bias(S, cfg.decoder_window, mask_s)

    def decoder_layer(x, p):
        return _decoder_layer(x, p, voice_emb, pos_s, bias_s,
                              cfg.decoder_heads, cfg.rope_theta, eps), None

    x, _ = jax.lax.scan(decoder_layer, x, params["decoder_blocks"])
    tap("decoder", x)

    # ---- 6. final AdaLN norm ----
    nc = _linear(jax.nn.silu(voice_emb), params["norm_cond_w"], params["norm_cond_b"])
    dd = cfg.decoder_dim
    x = _adaln_norm(x, nc[:dd], nc[dd:2 * dd], eps)
    tap("final_adaln", x)

    # ---- 7. wave_post ResNet blocks ----
    def post_block(x, p):
        return _resnet_block(x, p, cfg.resnet_groups, gn_eps, mask_s), None
    x, _ = jax.lax.scan(post_block, x, params["post_blocks"])
    tap("post", x)

    # ---- 8. wave_upsampler stages ----
    cur_real = s_real
    for stage in range(cfg.upsampler_stages):
        f = cfg.up_factors[stage]
        k = cfg.up_kernels[stage]
        trim = (k - f) // 2
        p = params["upsampler_stages"][stage]
        cur_mask = (jnp.arange(x.shape[0]) < cur_real).astype(jnp.float32)
        x = _conv_transpose1d(x, p["up_w"], p["up_b"], f, cur_mask)
        if trim > 0:
            x = x[trim:x.shape[0] - trim]
        cur_real = cur_real * f
        cur_mask = (jnp.arange(x.shape[0]) < cur_real).astype(jnp.float32)
        x = _snake(x, p["snake_a"], p["snake_b"])
        x = _resnet_block(x, p["resnet"], cfg.resnet_groups, gn_eps, cur_mask)
        tap(f"upsampler_{stage}", x)

    # out_proj + out_snake (transformer format, `miocodec.cpp:712-725`)
    x = _linear(x, params["upsampler_out_w"], params["upsampler_out_b"])
    x = _snake(x, params["upsampler_out_snake_a"], params["upsampler_out_snake_b"])
    tap("upsampler_out", x)

    # ---- 9. istft_head ----
    x = _linear(x, params["istft_head_w"], params["istft_head_b"])  # [S_final, 394]
    nf = cfg.n_freq
    log_mag = x[:, :nf]
    phase = x[:, nf:2 * nf]
    tap("log_mag", log_mag)
    tap("phase", phase)
    return log_mag, phase


@partial(jax.jit, static_argnames=("cfg",))
def codec_decode_spec(params: dict, codes: jax.Array, voice_emb: jax.Array,
                      cfg: CodecConfig, n_real: jax.Array | None = None):
    """codes i32[T], voice_emb f32[128] -> (log_mag, phase) [S_final, n_freq].

    `n_real` (scalar i32) marks how many leading codes are real; the rest are
    bucket padding whose influence is fully masked out.  None means all real.
    """
    return _codec_forward(params, codes, voice_emb, cfg, n_real)


def codec_decode_stages(params: dict, codes, voice_emb, cfg: CodecConfig):
    """Eager decode recording every stage's activations (debug/parity
    bisection, the reference's compare_codec.py:87-156 workflow).  Returns
    (stages OrderedDict[name -> np.ndarray], (log_mag, phase))."""
    from collections import OrderedDict
    stages = OrderedDict()

    def tap(name, x):
        stages[name] = np.asarray(x)

    out = _codec_forward(params, jnp.asarray(codes, jnp.int32),
                         jnp.asarray(voice_emb, jnp.float32), cfg, None, tap)
    return stages, out


def codec_decoder_layer_substeps(params: dict, codes, voice_emb,
                                 cfg: CodecConfig, layer: int = 0):
    """Sub-op bisection inside ONE wave_decoder AdaLN layer (the
    counterpart of `/root/reference/tools/debug_decoder_substeps.py:75-229`:
    STEP A cond-proj → B modulated norm → C QKV/RoPE/SDPA → D gated
    residual → E/F FFN cond+norm → G SwiGLU → H gated residual).

    Runs the network eagerly up to decoder layer `layer`, then expands that
    layer op by op, recording every intermediate.  Returns
    (substeps OrderedDict[name -> np.ndarray], max_abs_diff) where
    max_abs_diff cross-checks the manual expansion against the production
    `decoder_layer` math (the reference's "manual vs full" check)."""
    from collections import OrderedDict
    subs = OrderedDict()

    def tap(name, x):
        subs[name] = np.asarray(x)

    _set_fast(cfg.fast)
    codes = jnp.asarray(codes, jnp.int32)
    cond = jnp.asarray(voice_emb, jnp.float32)
    eps = cfg.norm_eps

    # ---- run eagerly up to the decoder input ----
    stages, _ = codec_decode_stages(params, codes, cond, cfg)
    x = jnp.asarray(stages["prior"])           # decoder input [S, dim]
    S = x.shape[0]
    mask_s = jnp.ones((S,), jnp.float32)
    pos_s = jnp.arange(S, dtype=jnp.int32)
    bias_s = _band_mask_bias(S, cfg.decoder_window, mask_s)

    def layer_step(x, p):
        return _decoder_layer(x, p, cond, pos_s, bias_s,
                              cfg.decoder_heads, cfg.rope_theta, eps)

    n_layers = jax.tree_util.tree_leaves(params["decoder_blocks"])[0].shape[0]
    if not 0 <= layer < n_layers:
        raise ValueError(f"layer {layer} out of range [0, {n_layers})")
    for i in range(layer):
        p_i = jax.tree.map(lambda a: a[i], params["decoder_blocks"])
        x = layer_step(x, p_i)
    p = jax.tree.map(lambda a: a[layer], params["decoder_blocks"])
    tap("layer_in", x)

    # ---- STEP A: attention AdaLN conditioning ----
    silu_cond = jax.nn.silu(cond)
    tap("silu_cond", silu_cond)
    cond_out = _linear(silu_cond, p["attn_cond_w"], p["attn_cond_b"])
    tap("attn_cond_out", cond_out)
    dim = cond_out.shape[-1] // 3
    sh, sc, g = (cond_out[..., :dim], cond_out[..., dim:2 * dim],
                 cond_out[..., 2 * dim:])
    tap("attn_shift", sh); tap("attn_scale", sc); tap("attn_gate", g)

    # ---- STEP B: AdaLN norm (affine-free LN, then modulate) ----
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    x_norm = (x - mu) * jax.lax.rsqrt(var + eps)
    tap("x_norm", x_norm)
    x_mod = x_norm * (1.0 + sc) + sh
    tap("x_modulated", x_mod)

    # ---- STEP C: self-attention, expanded ----
    n_head = cfg.decoder_heads
    hd = x.shape[-1] // n_head
    q = _linear(x_mod, p["wq"]).reshape(S, n_head, hd)
    k = _linear(x_mod, p["wk"]).reshape(S, n_head, hd)
    v = _linear(x_mod, p["wv"]).reshape(S, n_head, hd)
    tap("q_proj", q); tap("k_proj", k); tap("v_proj", v)
    q_r = _rope_interleaved(q, pos_s, cfg.rope_theta)
    k_r = _rope_interleaved(k, pos_s, cfg.rope_theta)
    tap("q_rope", q_r); tap("k_rope", k_r)
    scores = jnp.einsum("qhd,khd->hqk", q_r, k_r, **_DOT) / np.sqrt(hd)
    scores = scores + bias_s[None, :, :]
    tap("attn_scores", scores)
    probs = jax.nn.softmax(scores, axis=-1)
    tap("attn_probs", probs)
    ctx = jnp.einsum("hqk,khd->qhd", probs, v, **_DOT).reshape(S, -1)
    tap("attn_ctx", ctx)
    attn_out = _linear(ctx, p["wo"])
    tap("attn_out", attn_out)

    # ---- STEP D: gated attention residual ----
    gated_attn = attn_out * g
    tap("gated_attn", gated_attn)
    h = x + gated_attn
    tap("attn_residual", h)

    # ---- STEP E/F: FFN AdaLN conditioning + norm ----
    cond_out = _linear(silu_cond, p["ffn_cond_w"], p["ffn_cond_b"])
    tap("ffn_cond_out", cond_out)
    sh, sc, g = (cond_out[..., :dim], cond_out[..., dim:2 * dim],
                 cond_out[..., 2 * dim:])
    tap("ffn_shift", sh); tap("ffn_scale", sc); tap("ffn_gate", g)
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mu), axis=-1, keepdims=True)
    h_norm = (h - mu) * jax.lax.rsqrt(var + eps)
    tap("h_norm", h_norm)
    h_mod = h_norm * (1.0 + sc) + sh
    tap("h_modulated", h_mod)

    # ---- STEP G: SwiGLU ----
    gate_proj = _linear(h_mod, p["w_gate"])
    tap("ffn_gate_proj", gate_proj)
    up_proj = _linear(h_mod, p["w_up"])
    tap("ffn_up_proj", up_proj)
    silu_gate = jax.nn.silu(gate_proj)
    tap("ffn_silu_gate", silu_gate)
    gated = silu_gate * up_proj
    tap("ffn_gated", gated)
    ffn_out = _linear(gated, p["w_down"])
    tap("ffn_out", ffn_out)

    # ---- STEP H: gated FFN residual ----
    gated_ffn = ffn_out * g
    tap("gated_ffn", gated_ffn)
    out = h + gated_ffn
    tap("layer_out", out)

    # cross-check: manual expansion vs the production layer math
    full = layer_step(jnp.asarray(subs["layer_in"]), p)
    max_diff = float(jnp.max(jnp.abs(out - full)))
    return subs, max_diff


@partial(jax.jit, static_argnames=("cfg",))
def codec_decode_audio(params: dict, codes: jax.Array, voice_emb: jax.Array,
                       cfg: CodecConfig, n_real: jax.Array | None = None) -> jax.Array:
    """codes -> PCM audio [T * samples_per_token] in one jit (spectrogram
    never leaves HBM).  With bucketing, only the first
    n_real * samples_per_token samples are meaningful."""
    log_mag, phase = codec_decode_spec(params, codes, voice_emb, cfg, n_real)
    S_final = log_mag.shape[0]
    T = codes.shape[0]
    if n_real is None:
        frame_mask = None
    else:
        frames_per_code = cfg.total_upsample
        frame_mask = (jnp.arange(S_final) < n_real * frames_per_code).astype(jnp.float32)
    mag = jnp.clip(jnp.exp(log_mag), 0.0, 100.0)
    re = mag * jnp.cos(phase)
    im = mag * jnp.sin(phase)
    cos_b = params["istft_cos_basis"]
    sin_b = params["istft_sin_basis"]
    hann = params["istft_hann"]
    return istft(re, im, cos_b, sin_b, hann, cfg.hop_length, frame_mask)


# ---------------------------------------------------------------------------
# Weight loading
# ---------------------------------------------------------------------------

def _stack(dicts: list[dict]) -> dict:
    """Stack a list of same-structure dicts of arrays along a new leading
    axis (for lax.scan)."""
    out = {}
    for key in dicts[0]:
        out[key] = jnp.stack([d[key] for d in dicts])
    return out


def load_codec_params(reader, cfg: CodecConfig | None = None,
                      dtype=jnp.float32) -> tuple[dict, CodecConfig]:
    """Load codec weights from a GGUF reader into the stacked param tree.

    GGUF tensor names follow the reference model files
    (`miocodec.cpp:598-737`).
    """
    if cfg is None:
        cfg = CodecConfig.from_gguf(reader)

    def t(name):
        return jnp.asarray(reader.tensor_f32(name), dtype)

    params: dict = {}
    params["token_embd"] = t("token_embd")

    pre = []
    for i in range(cfg.prenet_layers):
        p = f"wave_prenet.blk.{i}."
        pre.append({
            "attn_norm_w": t(p + "attn_norm.weight"),
            "attn_norm_b": t(p + "attn_norm.bias"),
            "wq": t(p + "attn_q.weight"), "wk": t(p + "attn_k.weight"),
            "wv": t(p + "attn_v.weight"), "wo": t(p + "attn_output.weight"),
            "ffn_norm_w": t(p + "ffn_norm.weight"),
            "ffn_norm_b": t(p + "ffn_norm.bias"),
            "w_gate": t(p + "ffn_gate.weight"), "w_up": t(p + "ffn_up.weight"),
            "w_down": t(p + "ffn_down.weight"),
        })
    params["prenet_blocks"] = _stack(pre)
    params["prenet_norm_w"] = t("wave_prenet.norm.weight")
    params["prenet_norm_b"] = t("wave_prenet.norm.bias")
    params["prenet_out_w"] = t("wave_prenet.output.weight")
    params["prenet_out_b"] = t("wave_prenet.output.bias")

    params["upsample_w"] = t("wave_upsample.weight")
    params["upsample_b"] = t("wave_upsample.bias")

    def resnet(prefix):
        return {
            "norm1_w": t(prefix + "norm1.weight"), "norm1_b": t(prefix + "norm1.bias"),
            "conv1_w": t(prefix + "conv1.weight"), "conv1_b": t(prefix + "conv1.bias"),
            "norm2_w": t(prefix + "norm2.weight"), "norm2_b": t(prefix + "norm2.bias"),
            "conv2_w": t(prefix + "conv2.weight"), "conv2_b": t(prefix + "conv2.bias"),
        }

    params["prior_blocks"] = _stack(
        [resnet(f"wave_prior.{b}.") for b in range(cfg.resnet_blocks)])

    dec = []
    for i in range(cfg.decoder_layers):
        p = f"wave_decoder.blk.{i}."
        dec.append({
            "attn_cond_w": t(p + "attn_cond.weight"),
            "attn_cond_b": t(p + "attn_cond.bias"),
            "ffn_cond_w": t(p + "ffn_cond.weight"),
            "ffn_cond_b": t(p + "ffn_cond.bias"),
            "wq": t(p + "attn_q.weight"), "wk": t(p + "attn_k.weight"),
            "wv": t(p + "attn_v.weight"), "wo": t(p + "attn_output.weight"),
            "w_gate": t(p + "ffn_gate.weight"), "w_up": t(p + "ffn_up.weight"),
            "w_down": t(p + "ffn_down.weight"),
        })
    params["decoder_blocks"] = _stack(dec)
    params["norm_cond_w"] = t("wave_decoder.norm_cond.weight")
    params["norm_cond_b"] = t("wave_decoder.norm_cond.bias")

    params["post_blocks"] = _stack(
        [resnet(f"wave_post.{b}.") for b in range(cfg.resnet_blocks)])

    ups = []
    for s in range(cfg.upsampler_stages):
        ups.append({
            "up_w": t(f"wave_upsampler.up.{s}.weight"),
            "up_b": t(f"wave_upsampler.up.{s}.bias"),
            "snake_a": t(f"wave_upsampler.snake.{s}.alpha"),
            "snake_b": t(f"wave_upsampler.snake.{s}.beta"),
            "resnet": resnet(f"wave_upsampler.resblk.{s}."),
        })
    params["upsampler_stages"] = ups
    params["upsampler_out_w"] = t("wave_upsampler.out_proj.weight")
    params["upsampler_out_b"] = t("wave_upsampler.out_proj.bias")
    params["upsampler_out_snake_a"] = t("wave_upsampler.out_snake.alpha")
    params["upsampler_out_snake_b"] = t("wave_upsampler.out_snake.beta")

    params["istft_head_w"] = t("istft_head.out.weight")
    params["istft_head_b"] = t("istft_head.out.bias")

    cos_b, sin_b, hann = make_synthesis_basis(cfg.n_fft)
    params["istft_cos_basis"] = jnp.asarray(cos_b)
    params["istft_sin_basis"] = jnp.asarray(sin_b)
    params["istft_hann"] = jnp.asarray(hann)

    return params, cfg
