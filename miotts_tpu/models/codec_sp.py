"""Sequence-parallel MioCodec decode (shard_map over a mesh axis).

The codec's ops all have bounded or separable sequence coupling, which makes
the sequence dimension shardable with *exact* semantics (SURVEY.md §5
"long-context/sequence parallelism" — the reference's own trick is the local
window; here it becomes the distribution strategy):

  * local-window attention (|i-j| <= 32): ring halo exchange of 32
    positions of the *normed* inputs per layer (`lax.ppermute`), keys =
    [left-halo | local | right-halo], global positions for RoPE/banding;
  * k=3 convs: 1-position halos, VALID conv on the extended chunk;
  * ConvTranspose1d(stride f, kernel k): local VALID transpose produces a
    (k-f)-sample spill past the chunk edge; the spill is sent right and
    added to the neighbor's head, then each chunk slices its trim-shifted
    window — equal shard lengths, bit-equal to the global trim;
  * GroupNorm: masked statistics psum'ed over the axis;
  * iSTFT overlap-add: (win-hop) audio+window-sum spills sent right and
    added before normalization; edge trim is absorbed into the shifted
    window slice.

Everything runs under ONE `jax.shard_map`, so a T-code utterance decodes
across N devices at T/N sequence cost per device with no approximation.
Padding (`n_real`) is handled with global-position masks exactly like the
single-device path.

Constraints: T divisible by the axis size; per-device chunk >= the largest
halo (window//2 codes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .codec import (
    CodecConfig, _adaln3, _adaln_norm, _layer_norm, _linear,
    _rope_interleaved, _snake, _swiglu, _DOT,
)


def _ring_halos(x, halo: int, axis: str):
    """Exchange edge blocks with ring neighbors.  x: [C, D].
    Returns (left_halo [halo, D], right_halo [halo, D]) — the tail of the
    left neighbor and the head of the right neighbor.  Ends of the ring
    receive garbage, which callers mask by global position."""
    n = jax.lax.axis_size(axis)
    right_src = [(i, (i + 1) % n) for i in range(n)]   # send to the right
    left_src = [(i, (i - 1) % n) for i in range(n)]    # send to the left
    left_halo = jax.lax.ppermute(x[-halo:], axis, right_src)
    right_halo = jax.lax.ppermute(x[:halo], axis, left_src)
    return left_halo, right_halo


def _spill_right(spill, axis: str):
    """Send a tail spill block to the right neighbor (device 0 receives the
    last device's spill, which callers must zero)."""
    n = jax.lax.axis_size(axis)
    return jax.lax.ppermute(spill, axis, [(i, (i + 1) % n) for i in range(n)])


def _spill_left(spill, axis: str):
    """Send a head spill block to the left neighbor."""
    n = jax.lax.axis_size(axis)
    return jax.lax.ppermute(spill, axis, [(i, (i - 1) % n) for i in range(n)])


def _resolve_overlaps(raw, out_len: int, spill: int, axis: str):
    """Complete the partial sums in an overlap-add shard.

    `raw` covers global positions [g, g + out_len + spill); the head
    [0, spill) and the tail [out_len, out_len + spill) each hold PARTIAL
    sums whose complements live on the neighboring shards.  Exchange both
    ways and add, zeroing the ring wrap-around at the global ends."""
    if spill <= 0:
        return raw
    di = jax.lax.axis_index(axis)
    n = jax.lax.axis_size(axis)
    from_left = _spill_right(raw[out_len:], axis)     # left tail -> my head
    from_right = _spill_left(raw[:spill], axis)       # right head -> my tail
    from_left = jnp.where(di == 0, 0.0, from_left)
    from_right = jnp.where(di == n - 1, 0.0, from_right)
    raw = raw.at[:spill].add(from_left)
    raw = raw.at[out_len:].add(from_right)
    return raw


def _global_pos(chunk: int, axis: str):
    di = jax.lax.axis_index(axis)
    return di * chunk + jnp.arange(chunk), di


def _sp_attention(x, wq, wk, wv, wo, n_head, theta, window, n_real, axis):
    """Local-window attention on a sequence shard with halo keys."""
    C, dim = x.shape
    halo = window // 2
    hd = dim // n_head
    pos, di = _global_pos(C, axis)

    lh, rh = _ring_halos(x, halo, axis)
    ext = jnp.concatenate([lh, x, rh], axis=0)          # [C + 2*halo, D]
    kpos = pos[0] - halo + jnp.arange(C + 2 * halo)      # global key positions

    q = _linear(x, wq).reshape(C, n_head, hd)
    k = _linear(ext, wk).reshape(C + 2 * halo, n_head, hd)
    v = _linear(ext, wv).reshape(C + 2 * halo, n_head, hd)
    q = _rope_interleaved(q, pos, theta)
    k = _rope_interleaved(k, kpos, theta)

    scores = jnp.einsum("qhd,khd->hqk", q, k, **_DOT) / np.sqrt(hd)
    band = jnp.abs(pos[:, None] - kpos[None, :]) <= halo
    valid = (kpos[None, :] >= 0) & (kpos[None, :] < n_real)
    bias = jnp.where(band & valid, 0.0, -1e9)
    probs = jax.nn.softmax(scores + bias[None], axis=-1)
    out = jnp.einsum("hqk,khd->qhd", probs, v, **_DOT).reshape(C, dim)
    return _linear(out, wo)


def _sp_group_norm(x, w, b, n_groups, eps, mask, axis):
    """GroupNorm with cross-shard masked statistics (psum)."""
    C, ch = x.shape
    g = x.reshape(C, n_groups, ch // n_groups)
    m = mask[:, None, None]
    s1 = jax.lax.psum(jnp.sum(g * m, axis=(0, 2)), axis)          # [G]
    s2 = jax.lax.psum(jnp.sum(jnp.square(g) * m, axis=(0, 2)), axis)
    cnt = jax.lax.psum(jnp.sum(mask), axis) * (ch // n_groups)
    cnt = jnp.maximum(cnt, 1.0)
    mu = s1 / cnt
    var = s2 / cnt - jnp.square(mu)
    y = ((g - mu[None, :, None]) * jax.lax.rsqrt(var[None, :, None] + eps))
    return y.reshape(C, ch) * w + b


def _sp_conv1d_same(x, w, bias, mask, axis):
    """k=3 same conv on a shard: 1-position halos, VALID on the extended
    chunk.  Padded/ring-wrapped positions are zeroed by the mask, matching
    the reference's zero boundary."""
    C, ci = x.shape
    x = x * mask[:, None]
    lh, rh = _ring_halos(x, 1, axis)
    pos, di = _global_pos(C, axis)
    n = jax.lax.axis_size(axis)
    # ring ends: the wrap-around halos must be zero (global boundary)
    lh = jnp.where(di == 0, 0.0, lh)
    rh = jnp.where(di == n - 1, 0.0, rh)
    ext = jnp.concatenate([lh, x, rh], axis=0)          # [C+2, ci]
    y = jax.lax.conv_general_dilated(
        ext[None], jnp.transpose(w, (2, 1, 0)),
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)[0]
    if bias is not None:
        y = y + bias
    return y


def _sp_resnet_block(x, p, n_groups, eps, mask, axis):
    r = x
    x = _sp_group_norm(x, p["norm1_w"], p["norm1_b"], n_groups, eps, mask, axis)
    x = jax.nn.silu(x)
    x = _sp_conv1d_same(x, p["conv1_w"], p["conv1_b"], mask, axis)
    x = _sp_group_norm(x, p["norm2_w"], p["norm2_b"], n_groups, eps, mask, axis)
    x = jax.nn.silu(x)
    x = _sp_conv1d_same(x, p["conv2_w"], p["conv2_b"], mask, axis)
    return x + r


def _sp_conv_transpose(x, w, bias, stride, kernel, mask, axis):
    """ConvTranspose1d on a shard with spill-add and trim-shifted window.

    x: [C, ci] -> [C*stride, co], globally identical to VALID transpose on
    the concatenated sequence followed by (kernel-stride)/2 edge trim."""
    C, ci = x.shape
    x = x * mask[:, None]
    k = kernel
    spill = k - stride
    trim = spill // 2
    w_flip = jnp.flip(w, axis=2)
    raw = jax.lax.conv_general_dilated(
        x[None], jnp.transpose(w_flip, (2, 0, 1)),
        window_strides=(1,), padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)[0]        # [C*stride + spill, co]
    out_len = C * stride
    raw = _resolve_overlaps(raw, out_len, spill, axis)
    # device i's trimmed global window = raw local [trim, trim + out_len)
    y = jax.lax.dynamic_slice_in_dim(raw, trim, out_len, axis=0)
    if bias is not None:
        y = y + bias
    # NOTE on bias vs trim: the global formulation adds the bias to every
    # raw position then trims; slicing first and adding bias after is
    # identical on the kept region.
    return y


def _sp_istft(spec_re, spec_im, cos_b, sin_b, hann, hop, frame_mask, axis):
    """Overlap-add iSTFT on a frame shard with audio+wsum spill-add."""
    F, n_freq = spec_re.shape
    n_fft = cos_b.shape[1]
    win = hann.shape[0]
    kf = win // hop
    n_pad = (win - hop) // 2
    spill = win - hop                                   # samples past chunk

    time = (jnp.dot(spec_re, cos_b, **_DOT) + jnp.dot(spec_im, sin_b, **_DOT))
    fw = time * hann[None, :] * frame_mask[:, None]
    w2 = jnp.broadcast_to((hann * hann)[None, :], (F, win)) * frame_mask[:, None]

    out_len = F * hop
    raw_len = out_len + spill
    audio = jnp.zeros((raw_len,), jnp.float32)
    wsum = jnp.zeros((raw_len,), jnp.float32)
    # frame t occupies raw [t*hop, t*hop + win)
    fw_b = fw.reshape(F, kf, hop)
    w2_b = w2.reshape(F, kf, hop)
    audio_b = audio.reshape(-1, hop)
    wsum_b = wsum.reshape(-1, hop)
    for c in range(kf):
        audio_b = audio_b.at[c:c + F].add(fw_b[:, c, :])
        wsum_b = wsum_b.at[c:c + F].add(w2_b[:, c, :])
    audio = audio_b.reshape(-1)
    wsum = wsum_b.reshape(-1)

    audio = _resolve_overlaps(audio, out_len, spill, axis)
    wsum = _resolve_overlaps(wsum, out_len, spill, axis)

    audio = jnp.where(wsum > 1e-8, audio / jnp.where(wsum > 1e-8, wsum, 1.0),
                      audio)
    # trimmed global window = raw local [n_pad, n_pad + out_len)
    return jax.lax.dynamic_slice_in_dim(audio, n_pad, out_len, axis=0)


def _sp_forward(params, codes_local, voice_emb, n_real, cfg: CodecConfig,
                axis: str):
    """Per-shard codec forward (runs inside shard_map)."""
    from .codec import _set_fast
    _set_fast(cfg.fast)
    C = codes_local.shape[0]
    eps, gn_eps = cfg.norm_eps, cfg.group_norm_eps
    pos_t, di = _global_pos(C, axis)
    mask_t = (pos_t < n_real).astype(jnp.float32)

    x = params["token_embd"][codes_local]

    def prenet_layer(x, p):
        h = _layer_norm(x, p["attn_norm_w"], p["attn_norm_b"], eps)
        h = _sp_attention(h, p["wq"], p["wk"], p["wv"], p["wo"],
                          cfg.prenet_heads, cfg.rope_theta,
                          cfg.prenet_window, n_real, axis)
        x = x + h
        h = _layer_norm(x, p["ffn_norm_w"], p["ffn_norm_b"], eps)
        return x + _swiglu(h, p["w_gate"], p["w_up"], p["w_down"]), None

    x, _ = jax.lax.scan(prenet_layer, x, params["prenet_blocks"])
    x = _layer_norm(x, params["prenet_norm_w"], params["prenet_norm_b"], eps)
    x = _linear(x, params["prenet_out_w"], params["prenet_out_b"])

    x = _sp_conv_transpose(x, params["upsample_w"], params["upsample_b"],
                           2, 2, mask_t, axis)
    S = 2 * C
    s_real = 2 * n_real
    pos_s, _ = _global_pos(S, axis)
    mask_s = (pos_s < s_real).astype(jnp.float32)

    def prior_block(x, p):
        return _sp_resnet_block(x, p, cfg.resnet_groups, gn_eps, mask_s, axis), None
    x, _ = jax.lax.scan(prior_block, x, params["prior_blocks"])

    def decoder_layer(x, p):
        sh, sc, g = _adaln3(voice_emb, p["attn_cond_w"], p["attn_cond_b"])
        h = _adaln_norm(x, sh, sc, eps)
        h = _sp_attention(h, p["wq"], p["wk"], p["wv"], p["wo"],
                          cfg.decoder_heads, cfg.rope_theta,
                          cfg.decoder_window, s_real, axis)
        x = x + h * g
        sh, sc, g = _adaln3(voice_emb, p["ffn_cond_w"], p["ffn_cond_b"])
        h = _adaln_norm(x, sh, sc, eps)
        return x + _swiglu(h, p["w_gate"], p["w_up"], p["w_down"]) * g, None

    x, _ = jax.lax.scan(decoder_layer, x, params["decoder_blocks"])

    nc = _linear(jax.nn.silu(voice_emb), params["norm_cond_w"],
                 params["norm_cond_b"])
    dd = cfg.decoder_dim
    x = _adaln_norm(x, nc[:dd], nc[dd:2 * dd], eps)

    def post_block(x, p):
        return _sp_resnet_block(x, p, cfg.resnet_groups, gn_eps, mask_s, axis), None
    x, _ = jax.lax.scan(post_block, x, params["post_blocks"])

    cur_real = s_real
    for stage in range(cfg.upsampler_stages):
        f, k = cfg.up_factors[stage], cfg.up_kernels[stage]
        p = params["upsampler_stages"][stage]
        cur_pos, _ = _global_pos(x.shape[0], axis)
        cur_mask = (cur_pos < cur_real).astype(jnp.float32)
        x = _sp_conv_transpose(x, p["up_w"], p["up_b"], f, k, cur_mask, axis)
        cur_real = cur_real * f
        cur_pos, _ = _global_pos(x.shape[0], axis)
        cur_mask = (cur_pos < cur_real).astype(jnp.float32)
        x = _snake(x, p["snake_a"], p["snake_b"])
        x = _sp_resnet_block(x, p["resnet"], cfg.resnet_groups, gn_eps,
                             cur_mask, axis)

    x = _linear(x, params["upsampler_out_w"], params["upsampler_out_b"])
    x = _snake(x, params["upsampler_out_snake_a"],
               params["upsampler_out_snake_b"])
    x = _linear(x, params["istft_head_w"], params["istft_head_b"])
    nf = cfg.n_freq
    log_mag, phase = x[:, :nf], x[:, nf:2 * nf]

    frame_pos, _ = _global_pos(log_mag.shape[0], axis)
    frame_mask = (frame_pos < n_real * cfg.total_upsample).astype(jnp.float32)
    mag = jnp.clip(jnp.exp(log_mag), 0.0, 100.0)
    re = mag * jnp.cos(phase)
    im = mag * jnp.sin(phase)
    return _sp_istft(re, im, params["istft_cos_basis"],
                     params["istft_sin_basis"], params["istft_hann"],
                     cfg.hop_length, frame_mask, axis)


def codec_decode_audio_sp(params: dict, codes: jax.Array,
                          voice_emb: jax.Array, cfg: CodecConfig,
                          mesh: Mesh, axis: str = "model",
                          n_real: jax.Array | None = None) -> jax.Array:
    """Sequence-parallel decode: codes [T] (T divisible by the axis size,
    per-shard chunk >= window//2) -> audio [T * samples_per_token], exactly
    equal to the single-device `codec_decode_audio`."""
    T = codes.shape[0]
    n = mesh.shape[axis]
    assert T % n == 0, (T, n)
    assert T // n >= max(cfg.prenet_window, cfg.decoder_window) // 2, \
        "per-device chunk smaller than the attention halo"
    if n_real is None:
        n_real = jnp.asarray(T, jnp.int32)

    fn = jax.shard_map(
        partial(_sp_forward, cfg=cfg, axis=axis),
        mesh=mesh,
        in_specs=(P(), P(axis), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    with jax.set_mesh(mesh):
        return jax.jit(fn)(params, codes, voice_emb, n_real)
