"""Causal-LM decode engine: the TPU-native replacement for llama.cpp inference.

Covers the surface the reference consumes from llama.cpp
(`/root/reference/src/test-to-speech.cpp:94-199,430-614`): model load from
GGUF, prefill (batch decode with logits on the last position), single-token
decode against a KV cache, and on-device sampling.  Architecture config is
read from GGUF KVs (`{arch}.block_count` etc.); the llama/qwen2/qwen3 family
is supported (RMSNorm + SwiGLU + GQA + RoPE, with per-arch toggles for QKV
bias, QK-norm, and RoPE style).

TPU-first design (SURVEY.md §7.4):
  * Weights live in HBM as QTensors (planar int8 + group scales) and are
    dequantized inside the matmul kernel (ops/qmat.py) — never materialized
    in f32.
  * Prefill and decode are two jitted functions over static (batch, length)
    buckets; the reference instead created and destroyed a llama_context per
    request (`test-to-speech.cpp:108,197`).
  * The KV cache is a dense [L, B, H_kv, S_max, D] buffer passed
    functionally; positions are masked, so one compiled decode step serves
    any fill level.  Optional int8 KV with scales factored out of the
    attention dots (measured ~1.4x faster than bf16 at serving shapes).
  * Activations default to bf16 (MXU native); logits and sampling in f32.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.quants import is_quantized
from ..ops.qmat import QTensor, concat_qtensors, qdot, qtensor_from_raw


# Per-arch behavior toggles (llama.cpp build_* graph equivalents).
_ARCH_TABLE = {
    "llama": dict(rope_style="norm", qkv_bias=False, qk_norm=False),
    "qwen2": dict(rope_style="neox", qkv_bias=True, qk_norm=False),
    "qwen3": dict(rope_style="neox", qkv_bias=False, qk_norm=True),
    "mio": dict(rope_style="neox", qkv_bias=True, qk_norm=False),
    # LFM2: hybrid gated-short-conv / attention layers; attention layers use
    # per-head RMS q/k norms (before RoPE) and no biases.
    "lfm2": dict(rope_style="neox", qkv_bias=False, qk_norm=True),
}


@dataclass(frozen=True)
class LLMConfig:
    arch: str = "qwen2"
    n_layers: int = 24
    dim: int = 1024
    n_heads: int = 16
    n_kv_heads: int = 16
    head_dim: int = 64
    ff_dim: int = 2816
    n_vocab: int = 151936
    n_ctx: int = 2048
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6
    rope_style: str = "neox"        # "neox" (half-split) | "norm" (interleaved)
    qkv_bias: bool = False
    qk_norm: bool = False
    tie_embedding: bool = False
    # Hybrid (LFM2-style) layer plan: None = all attention; else a tuple of
    # "attn" / "conv" per layer (llama.cpp encodes this as a per-layer
    # head_count array with 0 for conv layers).
    layer_types: tuple[str, ...] | None = None
    conv_l_cache: int = 3
    conv_bias: bool = False

    @property
    def attn_layer_idx(self) -> tuple[int, ...]:
        if self.layer_types is None:
            return tuple(range(self.n_layers))
        return tuple(i for i, t in enumerate(self.layer_types) if t == "attn")

    @property
    def conv_layer_idx(self) -> tuple[int, ...]:
        if self.layer_types is None:
            return ()
        return tuple(i for i, t in enumerate(self.layer_types) if t == "conv")

    @classmethod
    def from_gguf(cls, reader) -> "LLMConfig":
        arch = str(reader.kv.get("general.architecture", "qwen2"))
        p = arch + "."
        g = lambda k, d: int(reader.kv.get(p + k, d))
        gf = lambda k, d: float(reader.kv.get(p + k, d))
        dim = g("embedding_length", 1024)
        # llama.cpp stores head_count per layer for hybrid archs (0 = conv
        # layer, LFM2 convention).
        hc = reader.kv.get(p + "attention.head_count", 16)
        layer_types = None
        if isinstance(hc, (list, tuple)):
            layer_types = tuple("attn" if int(h) > 0 else "conv" for h in hc)
            n_heads = max(int(h) for h in hc)
        else:
            n_heads = int(hc)
        kvc = reader.kv.get(p + "attention.head_count_kv", n_heads)
        n_kv = (max(int(h) for h in kvc) if isinstance(kvc, (list, tuple))
                else int(kvc))
        head_dim = g("attention.key_length", dim // n_heads)
        n_vocab = len(reader.kv.get("tokenizer.ggml.tokens", [])) or g("vocab_size", 32000)
        toggles = _ARCH_TABLE.get(arch, _ARCH_TABLE["qwen2"])
        tie = not reader.has_tensor("output.weight")
        return cls(
            arch=arch,
            n_layers=g("block_count", 24),
            dim=dim,
            n_heads=n_heads,
            n_kv_heads=n_kv,
            head_dim=head_dim,
            ff_dim=g("feed_forward_length", 4 * dim),
            n_vocab=n_vocab,
            n_ctx=g("context_length", 2048),
            rope_theta=gf("rope.freq_base", 10000.0),
            rms_eps=gf("attention.layer_norm_rms_epsilon", 1e-6),
            tie_embedding=tie,
            layer_types=layer_types,
            conv_l_cache=g("shortconv.l_cache", 3),
            **toggles,
        )


# ---------------------------------------------------------------------------
# Weight loading
# ---------------------------------------------------------------------------

def _load_matrix(reader, name: str, dtype) -> Any:
    """Load a 2-D weight: quantized formats stay packed as QTensor, float
    formats become dense arrays.

    MIOTTS_SCALE_BF16=1 stores group scales/mins in bf16 (~0.4% relative
    scale rounding, well under the quantization error) — for Q4 formats this
    cuts another ~25% of decode weight traffic."""
    import os
    info = reader.tensors[name]
    if is_quantized(info.ggml_type):
        rows, cols = info.shape  # numpy order [out, in]
        scale_dtype = (jnp.bfloat16 if os.environ.get("MIOTTS_SCALE_BF16")
                       else jnp.float32)
        return qtensor_from_raw(reader.tensor_raw(name), info.ggml_type,
                                rows, cols, scale_dtype=scale_dtype)
    return jnp.asarray(reader.tensor_f32(name), dtype)


def load_llm_params(reader, cfg: LLMConfig | None = None,
                    dtype=jnp.bfloat16, fuse: bool = True) -> tuple[dict, "LLMConfig"]:
    """Load LLM weights from GGUF.  llama.cpp tensor naming:
    token_embd.weight, blk.{i}.{attn_norm,attn_q,attn_k,attn_v,attn_output,
    attn_q_norm,attn_k_norm,ffn_norm,ffn_gate,ffn_up,ffn_down}.weight,
    output_norm.weight, output.weight (absent when tied).

    With `fuse` (default), q/k/v and gate/up projections are concatenated
    into single matmuls at load — 7 -> 4 weight matmuls per layer in the
    decode hot loop."""
    if cfg is None:
        cfg = LLMConfig.from_gguf(reader)

    def vec(name):
        return jnp.asarray(reader.tensor_f32(name), jnp.float32)

    params: dict = {
        # Embedding stays dense (gather); dequantized on host if quantized.
        "token_embd": jnp.asarray(
            reader.tensor_f32("token_embd.weight"), dtype),
        "output_norm": vec("output_norm.weight"),
    }
    if reader.has_tensor("output.weight"):
        params["output"] = _load_matrix(reader, "output.weight", dtype)

    if cfg.layer_types is not None:
        # Hybrid (LFM2): heterogeneous per-layer dicts, python-loop forward.
        layers = []
        for i in range(cfg.n_layers):
            p = f"blk.{i}."
            layer = {
                "attn_norm": vec(p + "attn_norm.weight"),   # operator_norm
                "ffn_norm": vec(p + "ffn_norm.weight"),
                "w_gate": _load_matrix(reader, p + "ffn_gate.weight", dtype),
                "w_up": _load_matrix(reader, p + "ffn_up.weight", dtype),
                "w_down": _load_matrix(reader, p + "ffn_down.weight", dtype),
            }
            if cfg.layer_types[i] == "attn":
                layer.update({
                    "wq": _load_matrix(reader, p + "attn_q.weight", dtype),
                    "wk": _load_matrix(reader, p + "attn_k.weight", dtype),
                    "wv": _load_matrix(reader, p + "attn_v.weight", dtype),
                    "wo": _load_matrix(reader, p + "attn_output.weight", dtype),
                    "q_norm": vec(p + "attn_q_norm.weight"),
                    "k_norm": vec(p + "attn_k_norm.weight"),
                })
            else:
                cw = reader.tensor_f32(p + "shortconv.conv.weight")
                layer["conv_w"] = jnp.asarray(
                    cw.reshape(cfg.dim, -1), jnp.float32)  # [dim, L]
                layer["in_proj"] = _load_matrix(
                    reader, p + "shortconv.in_proj.weight", dtype)
                layer["out_proj"] = _load_matrix(
                    reader, p + "shortconv.out_proj.weight", dtype)
                if reader.has_tensor(p + "shortconv.conv.bias"):
                    layer["conv_b"] = vec(p + "shortconv.conv.bias")
                if reader.has_tensor(p + "shortconv.in_proj.bias"):
                    layer["in_proj_b"] = vec(p + "shortconv.in_proj.bias")
                if reader.has_tensor(p + "shortconv.out_proj.bias"):
                    layer["out_proj_b"] = vec(p + "shortconv.out_proj.bias")
            if fuse:
                if cfg.layer_types[i] == "attn" and all(
                        isinstance(layer[k], type(layer["wq"]))
                        for k in ("wq", "wk", "wv")):
                    layer["wqkv"] = concat_qtensors(
                        [layer.pop("wq"), layer.pop("wk"), layer.pop("wv")])
                if all(isinstance(layer[k], type(layer["w_gate"]))
                       for k in ("w_gate", "w_up")):
                    layer["w_gateup"] = concat_qtensors(
                        [layer.pop("w_gate"), layer.pop("w_up")])
            layers.append(layer)
        params["layers"] = layers
        return params, cfg

    blocks = []
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        blk = {
            "attn_norm": vec(p + "attn_norm.weight"),
            "wq": _load_matrix(reader, p + "attn_q.weight", dtype),
            "wk": _load_matrix(reader, p + "attn_k.weight", dtype),
            "wv": _load_matrix(reader, p + "attn_v.weight", dtype),
            "wo": _load_matrix(reader, p + "attn_output.weight", dtype),
            "ffn_norm": vec(p + "ffn_norm.weight"),
            "w_gate": _load_matrix(reader, p + "ffn_gate.weight", dtype),
            "w_up": _load_matrix(reader, p + "ffn_up.weight", dtype),
            "w_down": _load_matrix(reader, p + "ffn_down.weight", dtype),
        }
        if cfg.qkv_bias:
            blk["bq"] = vec(p + "attn_q.bias")
            blk["bk"] = vec(p + "attn_k.bias")
            blk["bv"] = vec(p + "attn_v.bias")
        if cfg.qk_norm:
            blk["q_norm"] = vec(p + "attn_q_norm.weight")
            blk["k_norm"] = vec(p + "attn_k_norm.weight")
        if fuse:
            same_q = all(isinstance(blk[k], QTensor) for k in ("wq", "wk", "wv")) or \
                all(isinstance(blk[k], jax.Array) for k in ("wq", "wk", "wv"))
            if same_q:
                blk["wqkv"] = concat_qtensors([blk.pop("wq"), blk.pop("wk"),
                                               blk.pop("wv")])
                if cfg.qkv_bias:
                    blk["bqkv"] = jnp.concatenate(
                        [blk.pop("bq"), blk.pop("bk"), blk.pop("bv")])
            same_f = all(isinstance(blk[k], QTensor) for k in ("w_gate", "w_up")) or \
                all(isinstance(blk[k], jax.Array) for k in ("w_gate", "w_up"))
            if same_f:
                blk["w_gateup"] = concat_qtensors([blk.pop("w_gate"),
                                                   blk.pop("w_up")])
        blocks.append(blk)
    # Per-layer dicts, NOT lax.scan-stacked: feeding a Pallas kernel a
    # dynamic-slice of stacked weights forces XLA to materialize a copy of
    # every layer's weights every step (~2.5 ms/token at 2.6B,
    # benchmarks/bench_step.py `unrolled`); the unrolled layer loop reads
    # each layer's resident HBM buffer in place.
    params["blocks"] = blocks
    return params, cfg


# ---------------------------------------------------------------------------
# Model math
# ---------------------------------------------------------------------------

def _rms_norm(x, w, eps):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w.astype(x.dtype)


def _rope(x, pos, theta, style):
    """x: [B, S, H, D]; pos: [B, S].  'neox' rotates (i, i+D/2) pairs,
    'norm' rotates adjacent (2i, 2i+1) pairs (ggml rope modes)."""
    d = x.shape[-1]
    inv_freq = theta ** (-jnp.arange(0, d, 2, dtype=jnp.float32) / d)
    ang = pos[..., None].astype(jnp.float32) * inv_freq  # [B, S, d/2]
    cos = jnp.cos(ang)[:, :, None, :].astype(x.dtype)
    sin = jnp.sin(ang)[:, :, None, :].astype(x.dtype)
    if style == "neox":
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    x2 = x.reshape(*x.shape[:-1], d // 2, 2)
    xe, xo = x2[..., 0], x2[..., 1]
    return jnp.stack([xe * cos - xo * sin, xe * sin + xo * cos],
                     axis=-1).reshape(x.shape)


def init_kv_cache(cfg: LLMConfig, batch: int, max_len: int | None = None,
                  dtype=jnp.bfloat16, quantized: bool = False) -> dict:
    """Dense KV cache: k/v [L, B, H_kv, S, D] + fill counts [B].

    Layout is head-major with S on the sublane axis so the decode-attention
    kernel (ops/decode_attn.py) streams contiguous [S_t, D] tiles per
    (batch, kv-head) grid cell.

    With `quantized`, k/v are stored int8 with per-(token, head) f32 scales —
    an extension over the reference, which always keeps f16 KV
    (`test-to-speech.cpp` never sets type_k/type_v; SURVEY.md §2.2).  Halves
    (vs bf16) KV HBM traffic, the decode-attention bottleneck at depth.

    Hybrid archs (LFM2) get k/v sized to the attention layers only, plus a
    short-conv state ring `conv` [n_conv_layers, B, L_cache-1, dim]."""
    S = max_len or cfg.n_ctx
    n_attn = len(cfg.attn_layer_idx)
    conv_extra = {}
    if cfg.layer_types is not None:
        n_conv = len(cfg.conv_layer_idx)
        conv_extra["conv"] = jnp.zeros(
            (n_conv, batch, cfg.conv_l_cache - 1, cfg.dim), dtype)
        cache = {
            "k": jnp.zeros((n_attn, batch, cfg.n_kv_heads, S, cfg.head_dim),
                           jnp.int8 if quantized else dtype),
            "v": jnp.zeros((n_attn, batch, cfg.n_kv_heads, S, cfg.head_dim),
                           jnp.int8 if quantized else dtype),
            "fill": jnp.zeros((batch,), jnp.int32),
            **conv_extra,
        }
        if quantized:
            cache["k_scale"] = jnp.zeros((n_attn, batch, cfg.n_kv_heads, S), jnp.float32)
            cache["v_scale"] = jnp.zeros((n_attn, batch, cfg.n_kv_heads, S), jnp.float32)
        return cache
    shape = (cfg.n_layers, batch, cfg.n_kv_heads, S, cfg.head_dim)
    if quantized:
        sshape = shape[:-1]
        return {
            "k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "k_scale": jnp.zeros(sshape, jnp.float32),
            "v_scale": jnp.zeros(sshape, jnp.float32),
            "fill": jnp.zeros((batch,), jnp.int32),
        }
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        "fill": jnp.zeros((batch,), jnp.int32),
    }


def _kv_quantize(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-(.., head) symmetric int8 over the last axis:
    x [B, S, H, D] -> (int8 [B, S, H, D], scale [B, S, H])."""
    amax = jnp.max(jnp.abs(x), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _attend(q, k_cache, v_cache, fill, q_pos, k_scale=None, v_scale=None,
            k_cur=None, v_cur=None, k_buf=None, v_buf=None, buf_valid=None):
    """Causal attention against the cache.
    q: [B, S_q, H, D]; k/v_cache: [B, H_kv, S_max, D]; fill: [B] number of
    valid cache entries; q_pos: [B, S_q] absolute positions of the queries.
    k_scale/v_scale [B, H_kv, S_max] dequantize an int8 cache.

    Deferred-write decode (S_q == 1): `k_cur`/`v_cur` [B, 1, H_kv, D] carry
    the CURRENT token's key/value, which is NOT yet in the cache — the
    cache is read-only here and written once per step after the layer scan
    (see llm_forward).  Interleaving the write with this read inside the
    layer scan forced XLA to materialize full cache-slice copies every
    layer (~2 ms/token at 2.6B, benchmarks/bench_step.py); with the read
    kept pure, `fill` counts only PAST tokens and the current token rides
    as one extra softmax column.  Without k_cur the cache must already
    contain the current tokens and `fill` covers them (prefill path).

    The group scales of an int8 cache factor out of both dots, so the
    cache is never dequantized at [S, D] shape: they multiply the score /
    probability matrices instead (the current token stays unquantized —
    exact, and what the cache write stores is quantized separately).
    The opt-in Pallas kernel (ops/decode_attn.py, MIOTTS_ATTN_KERNEL=1)
    measured slower than this XLA path and is kept as the documented
    comparison point; it only serves the k_cur-less layout.

    Chunk-buffered batched decode: `k_buf`/`v_buf` [B, H_kv, W, D] carry
    the CHUNK's earlier tokens (written at a step-indexed column shared by
    every slot — a cheap dynamic_update_slice instead of a per-slot
    position scatter, which measured ~6.5 ms/token of pure scatter cost at
    batch 32 on 2.6B, benchmarks/bench_step.py no_kvwrite).  `buf_valid`
    [B, W] marks columns written by steps where the slot was active; all
    valid columns are past tokens of the same slot, so no extra causal
    test is needed.  Buffers stay unquantized even over an int8 cache
    (they are W columns — tiny) and are quantized once at the per-chunk
    merge.
    """
    from ..ops.decode_attn import (decode_attention,
                                   decode_attention_batched_supported,
                                   decode_attention_supported)

    B, S_q, H, D = q.shape
    H_kv, S_max = k_cache.shape[1], k_cache.shape[2]
    rep = H // H_kv

    if S_q == 1 and k_cur is None and \
            decode_attention_supported(q.shape, S_max):
        out = decode_attention(q[:, 0], k_cache, v_cache, fill, q_pos[:, 0],
                               k_scale, v_scale)
        return out.reshape(B, S_q, H * D).astype(
            jnp.float32 if q.dtype == jnp.float32 else jnp.bfloat16)

    if S_q == 1 and decode_attention_batched_supported(B, S_max):
        return _attend_bkernel(q, k_cache, v_cache, fill, q_pos, k_scale,
                               v_scale, k_cur, v_cur, k_buf, v_buf,
                               buf_valid)

    # XLA path.  The group scales factor out of both dots, so an int8
    # cache is never dequantized at [S, D] shape: they multiply the score
    # matrix instead.
    cdt = jnp.float32 if q.dtype == jnp.float32 else jnp.bfloat16
    qf = q.astype(cdt)
    kf = k_cache.astype(cdt)
    vf = v_cache.astype(cdt)
    qg = qf.reshape(B, S_q, H_kv, rep, D)
    scores = jnp.einsum("bqgrd,bgkd->bgrqk", qg, kf,
                        preferred_element_type=jnp.float32) / np.sqrt(D)
    if k_scale is not None:
        scores = scores * k_scale[:, :, None, None, :]
    key_pos = jnp.arange(S_max)
    # key valid: pos < fill AND pos <= query absolute position (causal)
    valid = (key_pos[None, None, :] <= q_pos[:, :, None]) & \
            (key_pos[None, None, :] < fill[:, None, None])
    scores = jnp.where(valid[:, None, None, :, :], scores, -1e9)
    W = 0
    s_buf = s_cur = None
    if k_buf is not None:
        # chunk buffer: W extra columns, masked by per-slot step validity
        W = k_buf.shape[2]
        s_buf = jnp.einsum("bqgrd,bgwd->bgrqw", qg, k_buf.astype(cdt),
                           preferred_element_type=jnp.float32) / np.sqrt(D)
        s_buf = jnp.where(buf_valid[:, None, None, None, :], s_buf, -1e9)
    if k_cur is not None:
        # current token: one extra column, always valid (self-attention)
        s_cur = jnp.einsum("bqgrd,bqgd->bgrq", qg, k_cur.astype(cdt),
                           preferred_element_type=jnp.float32) / np.sqrt(D)
    if os.environ.get("MIOTTS_ATTN_NOCAT") and (s_buf is not None
                                                or s_cur is not None):
        # No-concatenate merge (round 5, VERDICT r4 item 2 candidate): the
        # concat pads the softmax lane axis (S + W + 1, e.g. 277 -> 384
        # lanes) and can force the score tensor to materialize between the
        # QK and PV einsums; merging the three score sources flash-style
        # (shared max, exp, one normalizer) keeps every piece at its
        # natural width.  Bit-for-bit it is the same softmax up to
        # reduction order.  Opt-in (trace-time env) while TPU-measured.
        m = jnp.max(scores, axis=-1)
        if s_buf is not None:
            m = jnp.maximum(m, jnp.max(s_buf, axis=-1))
        if s_cur is not None:
            m = jnp.maximum(m, s_cur)
        p_main = jnp.exp(scores - m[..., None])
        l = jnp.sum(p_main, axis=-1)
        p_buf = p_cur = None
        if s_buf is not None:
            p_buf = jnp.exp(s_buf - m[..., None])
            l = l + jnp.sum(p_buf, axis=-1)
        if s_cur is not None:
            p_cur = jnp.exp(s_cur - m)
            l = l + p_cur
        if v_scale is not None:
            p_main = p_main * v_scale[:, :, None, None, :]
        out = jnp.einsum("bgrqk,bgkd->bqgrd", p_main.astype(cdt), vf,
                         preferred_element_type=jnp.float32)
        if p_buf is not None:
            out = out + jnp.einsum("bgrqw,bgwd->bqgrd", p_buf.astype(cdt),
                                   v_buf.astype(cdt),
                                   preferred_element_type=jnp.float32)
        if p_cur is not None:
            out = out + jnp.einsum("bgrq,bqgd->bqgrd", p_cur.astype(cdt),
                                   v_cur.astype(cdt),
                                   preferred_element_type=jnp.float32)
        # l [B, g, r, q] -> [B, q, g, r, 1] to normalize the merged sum
        out = out / jnp.transpose(l, (0, 3, 1, 2))[..., None]
        return out.reshape(B, S_q, H * D).astype(cdt)
    if s_buf is not None:
        scores = jnp.concatenate([scores, s_buf], axis=-1)
    if s_cur is not None:
        scores = jnp.concatenate([scores, s_cur[..., None]], axis=-1)
    probs = jax.nn.softmax(scores, axis=-1)  # [B, g, r, q, k(+W)(+1)]
    if k_cur is not None:
        p_cur = probs[..., -1]               # [B, g, r, q]
        probs = probs[..., :-1]
    p_buf = None
    if k_buf is not None:
        p_buf = probs[..., -W:]
        probs = probs[..., :-W]
    if v_scale is not None:
        probs = probs * v_scale[:, :, None, None, :]
    out = jnp.einsum("bgrqk,bgkd->bqgrd", probs.astype(cdt), vf,
                     preferred_element_type=jnp.float32)
    if p_buf is not None:
        out = out + jnp.einsum("bgrqw,bgwd->bqgrd", p_buf.astype(cdt),
                               v_buf.astype(cdt),
                               preferred_element_type=jnp.float32)
    if k_cur is not None:
        out = out + jnp.einsum("bgrq,bqgd->bqgrd", p_cur.astype(cdt),
                               v_cur.astype(cdt),
                               preferred_element_type=jnp.float32)
    return out.reshape(B, S_q, H * D).astype(cdt)


def _attend_bkernel(q, k_cache, v_cache, fill, q_pos, k_scale=None,
                    v_scale=None, k_cur=None, v_cur=None, k_buf=None,
                    v_buf=None, buf_valid=None, interpret: bool = False):
    """Serve-path attention through the batch-tiled Pallas kernel
    (ops/decode_attn.py decode_attention_batched, round 5 — the VERDICT r4
    item-2 lever): the BIG cache read runs in-kernel (int8 bytes feed the
    MXU directly when the cache is quantized); the chunk buffer and
    current-token columns — tiny — are scored in XLA and folded into the
    same softmax flash-style from the kernel's (acc, m, l) stats.
    Numerically the same softmax up to reduction order, except the int8
    path's documented ~1%-of-row-scale probability quantization.  Opt-in
    via MIOTTS_ATTN_BKERNEL=1 (gate: decode_attention_batched_supported).
    """
    from ..ops.decode_attn import decode_attention_batched

    B, S_q, H, D = q.shape
    H_kv, S_max = k_cache.shape[1], k_cache.shape[2]
    rep = H // H_kv
    cdt = jnp.float32 if q.dtype == jnp.float32 else jnp.bfloat16

    acc, m, l = decode_attention_batched(
        q[:, 0], k_cache, v_cache, fill, q_pos[:, 0], k_scale, v_scale,
        b_tile=int(os.environ.get("MIOTTS_ATTN_BTILE", "8")),
        return_stats=True, interpret=interpret)
    # [B, H, *] -> [B, g, r, *]
    acc = acc.reshape(B, H_kv, rep, D)
    m = m.reshape(B, H_kv, rep)
    l = l.reshape(B, H_kv, rep)

    qg = q.astype(cdt).reshape(B, S_q, H_kv, rep, D)
    s_buf = s_cur = None
    if k_buf is not None:
        s_buf = jnp.einsum("bqgrd,bgwd->bgrqw", qg, k_buf.astype(cdt),
                           preferred_element_type=jnp.float32)[:, :, :, 0]
        s_buf = s_buf / np.sqrt(D)                         # [B, g, r, W]
        s_buf = jnp.where(buf_valid[:, None, None, :], s_buf, -1e9)
    if k_cur is not None:
        s_cur = jnp.einsum("bqgrd,bqgd->bgrq", qg, k_cur.astype(cdt),
                           preferred_element_type=jnp.float32)[..., 0]
        s_cur = s_cur / np.sqrt(D)                         # [B, g, r]

    m_all = m
    if s_buf is not None:
        m_all = jnp.maximum(m_all, jnp.max(s_buf, axis=-1))
    if s_cur is not None:
        m_all = jnp.maximum(m_all, s_cur)
    alpha = jnp.exp(m - m_all)                             # [B, g, r]
    out = acc * alpha[..., None]
    l_all = l * alpha
    if s_buf is not None:
        p_buf = jnp.exp(s_buf - m_all[..., None])          # [B, g, r, W]
        l_all = l_all + jnp.sum(p_buf, axis=-1)
        out = out + jnp.einsum("bgrw,bgwd->bgrd", p_buf.astype(cdt),
                               v_buf.astype(cdt),
                               preferred_element_type=jnp.float32)
    if s_cur is not None:
        p_cur = jnp.exp(s_cur - m_all)                     # [B, g, r]
        l_all = l_all + p_cur
        out = out + p_cur[..., None] * v_cur[:, 0, :, None, :].astype(
            jnp.float32)
    out = out / jnp.maximum(l_all, 1e-20)[..., None]
    return out.reshape(B, S_q, H * D).astype(cdt)


def _block_forward(x, blk, lcache: dict, fill, pos, cfg: LLMConfig,
                   defer_write: bool = False, chunk_buf=None):
    """One transformer block.  x: [B, S, dim]; lcache: this layer's cache
    slices {k, v[, k_scale, v_scale]} with k/v [B, H_kv, S_max, D]; pos:
    [B, S] absolute positions.  Returns (x, new_lcache).

    With `defer_write` (decode, S == 1) the cache is READ-ONLY: attention
    takes the current token's k/v as an extra softmax column and the block
    returns {k, v[, k_scale, v_scale]} values for THIS token only
    ([B, H_kv, D] / [B, H_kv]), which llm_forward writes into the stacked
    cache in ONE post-scan update.  Interleaving per-layer cache writes
    with the attention read inside the layer scan cost ~2 ms/token at 2.6B
    in forced copies (benchmarks/bench_step.py)."""
    B, S, _ = x.shape
    H, H_kv, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    quantized = "k_scale" in lcache

    h = _rms_norm(x, blk["attn_norm"], cfg.rms_eps)
    qd_, kvd = H * D, H_kv * D
    if "wqkv" in blk:
        qkv = qdot(h, blk["wqkv"])
        if cfg.qkv_bias:
            qkv = qkv + blk["bqkv"].astype(qkv.dtype)
        q = qkv[..., :qd_]
        k = qkv[..., qd_:qd_ + kvd]
        v = qkv[..., qd_ + kvd:]
    else:
        q = qdot(h, blk["wq"])
        k = qdot(h, blk["wk"])
        v = qdot(h, blk["wv"])
        if cfg.qkv_bias:
            q = q + blk["bq"].astype(q.dtype)
            k = k + blk["bk"].astype(k.dtype)
            v = v + blk["bv"].astype(v.dtype)
    q = q.reshape(B, S, H, D)
    k = k.reshape(B, S, H_kv, D)
    v = v.reshape(B, S, H_kv, D)
    if cfg.qk_norm:
        q = _rms_norm(q, blk["q_norm"], cfg.rms_eps)
        k = _rms_norm(k, blk["k_norm"], cfg.rms_eps)
    q = _rope(q, pos, cfg.rope_theta, cfg.rope_style)
    k = _rope(k, pos, cfg.rope_theta, cfg.rope_style)

    if defer_write:
        # decode path: cache stays read-only; this token's k/v ride into
        # attention directly and out to the caller for the post-scan write
        if chunk_buf is not None:
            # chunk-buffered path: the caller keeps raw bf16 k/v in the
            # per-chunk buffer and quantizes once at the merge
            kv_out = {"k": k[:, 0], "v": v[:, 0]}
        elif quantized:
            kq, ks = _kv_quantize(k.astype(jnp.float32))
            vq, vs = _kv_quantize(v.astype(jnp.float32))
            kv_out = {"k": kq[:, 0], "v": vq[:, 0],
                      "k_scale": ks[:, 0], "v_scale": vs[:, 0]}
        else:
            kv_out = {"k": k[:, 0].astype(lcache["k"].dtype),
                      "v": v[:, 0].astype(lcache["v"].dtype)}
        k_buf = v_buf = buf_valid = None
        if chunk_buf is not None:
            k_buf, v_buf, buf_valid = chunk_buf
        attn = _attend(q, lcache["k"], lcache["v"], fill, pos,
                       lcache.get("k_scale"), lcache.get("v_scale"),
                       k_cur=k, v_cur=v,
                       k_buf=k_buf, v_buf=v_buf, buf_valid=buf_valid)
        x = x + qdot(attn.astype(x.dtype), blk["wo"])

        h = _rms_norm(x, blk["ffn_norm"], cfg.rms_eps)
        if "w_gateup" in blk:
            gu = qdot(h, blk["w_gateup"])
            ff = gu.shape[-1] // 2
            gate = jax.nn.silu(gu[..., :ff])
            up = gu[..., ff:]
        else:
            gate = jax.nn.silu(qdot(h, blk["w_gate"]))
            up = qdot(h, blk["w_up"])
        x = x + qdot((gate * up).astype(x.dtype), blk["w_down"])
        return x, kv_out

    # Write k/v into the cache at their absolute positions.  The cache is
    # head-major [B, H_kv, S_max, ...] while fresh k/v are query-major
    # [B, S, H_kv, ...].  For a single sequence the write is a
    # dynamic_update_slice of the transposed values; batched decode scatters
    # (advanced indices at dims 0 and 2 put the broadcast [B, S] dims first,
    # so the scatter consumes the query-major value directly).
    lcache = dict(lcache)

    def write(buf, val):
        val = val.astype(buf.dtype)
        if B == 1 and S == 1:
            vt = jnp.swapaxes(val, 1, 2)
            start = (jnp.int32(0), jnp.int32(0), pos[0, 0]) + \
                (0,) * (buf.ndim - 3)
            return jax.lax.dynamic_update_slice(buf, vt, start)
        b_idx = jnp.arange(B)[:, None] + jnp.zeros_like(pos)
        return buf.at[b_idx, :, pos].set(val)

    if quantized:
        kq, ks = _kv_quantize(k.astype(jnp.float32))
        vq, vs = _kv_quantize(v.astype(jnp.float32))
        lcache["k"] = write(lcache["k"], kq)
        lcache["v"] = write(lcache["v"], vq)
        lcache["k_scale"] = write(lcache["k_scale"], ks)
        lcache["v_scale"] = write(lcache["v_scale"], vs)
    else:
        lcache["k"] = write(lcache["k"], k)
        lcache["v"] = write(lcache["v"], v)
    new_fill = jnp.maximum(fill, pos[:, -1] + 1)

    attn = _attend(q, lcache["k"], lcache["v"], new_fill, pos,
                   lcache.get("k_scale"), lcache.get("v_scale"))
    x = x + qdot(attn.astype(x.dtype), blk["wo"])

    h = _rms_norm(x, blk["ffn_norm"], cfg.rms_eps)
    if "w_gateup" in blk:
        gu = qdot(h, blk["w_gateup"])
        ff = gu.shape[-1] // 2
        gate = jax.nn.silu(gu[..., :ff])
        up = gu[..., ff:]
    else:
        gate = jax.nn.silu(qdot(h, blk["w_gate"]))
        up = qdot(h, blk["w_up"])
    x = x + qdot((gate * up).astype(x.dtype), blk["w_down"])
    return x, lcache


def _conv_block_forward(x, layer, state, advance, cfg: LLMConfig):
    """LFM2 gated short-conv layer + FFN (HF Lfm2ShortConv semantics):
    h = operator_norm(x); (B, C, v) = split(in_proj(h)); Bv = B*v;
    causal depthwise conv over Bv with the cached L-1 previous values;
    y = out_proj(C * conv_out); x = x + y; then the SwiGLU FFN.

    state: [B, L-1, dim] — the last L-1 REAL Bv values; advance [B]: how
    many real tokens this call adds (prefill n_real, decode 1/0).  The new
    state is slice [a, a+L-1) of concat([state, Bv]) — exactly the old state
    when a == 0 (inactive slot), exactly the last L-1 real values otherwise.
    """
    Bsz, S, dim = x.shape
    L = cfg.conv_l_cache
    h = _rms_norm(x, layer["attn_norm"], cfg.rms_eps)
    bcx = qdot(h, layer["in_proj"])
    if "in_proj_b" in layer:
        bcx = bcx + layer["in_proj_b"].astype(bcx.dtype)
    b_, c_, v_ = jnp.split(bcx, 3, axis=-1)
    bv = b_ * v_                                     # [B, S, dim]

    ext = jnp.concatenate([state.astype(bv.dtype), bv], axis=1)  # [B, L-1+S, dim]
    # causal depthwise conv: out[t] = sum_i w[:, i] * ext[t + i], i in [0, L)
    conv_w = layer["conv_w"]                         # [dim, L]
    out = jnp.zeros_like(bv)
    for i in range(L):                               # L is tiny (3)
        out = out + ext[:, i:i + S, :] * conv_w[:, i].astype(bv.dtype)
    if "conv_b" in layer:
        out = out + layer["conv_b"].astype(out.dtype)

    y = c_ * out
    y = qdot(y, layer["out_proj"])
    if "out_proj_b" in layer:
        y = y + layer["out_proj_b"].astype(y.dtype)
    x = x + y

    new_state = jax.vmap(
        lambda e, a: jax.lax.dynamic_slice_in_dim(e, a, L - 1, axis=0)
    )(ext, advance.astype(jnp.int32))

    h = _rms_norm(x, layer["ffn_norm"], cfg.rms_eps)
    if "w_gateup" in layer:
        gu = qdot(h, layer["w_gateup"])
        gate = jax.nn.silu(gu[..., : gu.shape[-1] // 2])
        up = gu[..., gu.shape[-1] // 2:]
    else:
        gate = jax.nn.silu(qdot(h, layer["w_gate"]))
        up = qdot(h, layer["w_up"])
    x = x + qdot((gate * up).astype(x.dtype), layer["w_down"])
    return x, new_state.astype(state.dtype)


def _scatter_kv(buf, p, upd):
    """Batched-decode KV cache write: one position per slot.

    buf [L, B, H, S, ...]; p [B] per-slot positions; upd [B, L, H, ...]
    (advanced indices at dims 1 and 3 put the broadcast (B,) dim first, so
    the scatter consumes the slot-major update directly).  Factored out so
    benchmarks/bench_step.py can stub it and measure the scatter's cost."""
    b_idx = jnp.arange(upd.shape[0])
    return buf.at[:, b_idx, :, p].set(upd)


@partial(jax.jit, static_argnames=("cfg",))
def llm_forward(params: dict, tokens: jax.Array, pos: jax.Array,
                cache: dict, cfg: LLMConfig, advance: jax.Array | None = None):
    """Run the transformer over `tokens` [B, S] at absolute positions `pos`
    [B, S], updating the cache.  Returns (logits [B, S, V] f32, new_cache).

    Used for both prefill (S = padded prompt bucket) and decode (S = 1).
    Padding tokens must carry pos pointing at their would-be position; their
    cache writes are masked out by `fill` accounting at the caller level —
    see `llm_prefill`."""
    x = params["token_embd"][tokens]  # [B, S, dim]

    if "layers" in params:
        # Hybrid (LFM2) path: python loop over heterogeneous layers.
        B, S, _ = x.shape
        if advance is None:
            advance = jnp.full((B,), S, jnp.int32)
        new_cache = dict(cache)
        attn_i = 0
        conv_i = 0
        for li, layer_p in enumerate(params["layers"]):
            kind = cfg.layer_types[li] if cfg.layer_types else "attn"
            if kind == "attn":
                lcache = {"k": cache["k"][attn_i], "v": cache["v"][attn_i]}
                if "k_scale" in cache:
                    lcache["k_scale"] = cache["k_scale"][attn_i]
                    lcache["v_scale"] = cache["v_scale"][attn_i]
                x, lcache = _block_forward(x, layer_p, lcache,
                                           cache["fill"], pos, cfg)
                for key, val in lcache.items():
                    new_cache[key] = new_cache[key].at[attn_i].set(val)
                attn_i += 1
            else:
                x, st = _conv_block_forward(x, layer_p,
                                            cache["conv"][conv_i], advance, cfg)
                new_cache["conv"] = new_cache["conv"].at[conv_i].set(st)
                conv_i += 1
        new_layer_cache = {k: v for k, v in new_cache.items() if k != "fill"}
    else:
        # Dense path: UNROLLED python loop over per-layer weight dicts —
        # each layer's quantized weights are read by the Pallas matmuls
        # from their own resident HBM buffers.  (A lax.scan over stacked
        # weights dynamic-slices them per layer, which materializes a copy
        # of the whole layer before every kernel: ~2.5 ms/token at 2.6B,
        # benchmarks/bench_step.py.)
        B, S, _ = x.shape
        layer_cache = {k: v for k, v in cache.items() if k != "fill"}
        if S == 1:
            # Decode: the cache is READ-ONLY through all layers (attention
            # takes this token's k/v as an extra softmax column) and ONE
            # single-position update per cache field writes every layer's
            # new k/v at once — interleaving per-layer writes with the
            # attention read forces full cache-slice copies.
            kv_list = []
            for li, blk in enumerate(params["blocks"]):
                lcache = {key: buf[li] for key, buf in layer_cache.items()}
                x, kv = _block_forward(x, blk, lcache, cache["fill"],
                                       pos, cfg, defer_write=True)
                kv_list.append(kv)
            kvs = {key: jnp.stack([kv[key] for kv in kv_list])
                   for key in kv_list[0]}           # [L, B, H, D] / [L, B, H]
            new_layer_cache = {}
            if B == 1:
                p = pos[0, 0]
                for key, buf in layer_cache.items():
                    upd = kvs[key].astype(buf.dtype)
                    if key in ("k", "v"):       # [L, 1, H, D] -> at S=p
                        upd = upd[:, :, :, None, :]
                        start = (0, 0, 0, p, 0)
                    else:                        # scales [L, 1, H] -> at S=p
                        upd = upd[:, :, :, None]
                        start = (0, 0, 0, p)
                    new_layer_cache[key] = jax.lax.dynamic_update_slice(
                        buf, upd, start)
            else:
                # batched decode: per-row positions (parked rows write at
                # their parked pos, same semantics as the scatter write)
                p = pos[:, 0]
                for key, buf in layer_cache.items():
                    upd = jnp.swapaxes(kvs[key], 0, 1).astype(buf.dtype)
                    new_layer_cache[key] = _scatter_kv(buf, p, upd)
        else:
            # Prefill: per-layer write-into-slice (runs once per request)
            new_layer_cache = dict(layer_cache)
            for li, blk in enumerate(params["blocks"]):
                lcache = {key: buf[li] for key, buf in layer_cache.items()}
                x, lcache = _block_forward(x, blk, lcache, cache["fill"],
                                           pos, cfg)
                for key, val in lcache.items():
                    new_layer_cache[key] = \
                        new_layer_cache[key].at[li].set(val)
    new_fill = jnp.maximum(cache["fill"], pos[:, -1] + 1)

    x = _rms_norm(x, params["output_norm"], cfg.rms_eps)
    out_w = params.get("output", None)
    if out_w is None:
        logits = jax.lax.dot_general(
            x, params["token_embd"], (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        logits = qdot(x, out_w)
    new_cache = dict(new_layer_cache, fill=new_fill)
    return logits.astype(jnp.float32), new_cache


def llm_prefill(params, tokens, n_real, cache, cfg: LLMConfig):
    """Prefill a [B, S_bucket] prompt batch; `n_real` [B] gives the true
    prompt lengths (right-padding).  Returns (last_logits [B, V], cache).

    Padding positions are written to the cache but `fill` only advances to
    n_real, so they are never attended by later tokens."""
    B, S = tokens.shape
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    logits, cache = llm_forward(params, tokens, pos, cache, cfg,
                                advance=n_real.astype(jnp.int32))
    # fill must be a COPY of n_real: astype(same dtype) aliases, and a
    # caller later donating this cache (llm_generate_chunk*) would delete
    # the caller's own n_real buffer with it
    cache = dict(cache, fill=jnp.array(n_real, jnp.int32))
    last = jnp.take_along_axis(logits, (n_real - 1)[:, None, None], axis=1)[:, 0]
    return last, cache


def llm_decode_step(params, token, cache, cfg: LLMConfig):
    """One decode step.  token: [B] i32; positions come from cache fill.
    Returns (logits [B, V], cache)."""
    pos = cache["fill"][:, None]  # [B, 1]
    logits, cache = llm_forward(params, token[:, None], pos, cache, cfg)
    return logits[:, 0], cache


# ---------------------------------------------------------------------------
# Sampling (`llama_sampler_init_temp` + `_dist`, test-to-speech.cpp:127-130)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def llm_prefill_slots(params: dict, tokens: jax.Array, n_real: jax.Array,
                      cache: dict, slots: jax.Array, cfg: LLMConfig):
    """Prefill SEVERAL sequences into slots of a batched cache with ONE
    dispatch.  A burst of admissions (continuous-batching refill after a
    wave of completions) otherwise costs one program dispatch per slot —
    ~30 ms each on a relay-tunneled chip, the dominant admission cost.

    tokens: [A, S_bucket]; n_real: [A]; slots: [A] i32 (distinct).
    Returns (last_logits [A, V], cache)."""
    A, S = tokens.shape
    # fresh sub-cache: prefill rewrites positions [0, S) and fill masks the
    # rest, so the admitted slots' old contents never matter.  Attention
    # buffers are sized to the PROMPT bucket, not ctx_len — prefill only
    # touches [0, S), and a full-ctx zero sub-cache costs GBs of HBM
    # traffic per admission wave at high slot counts.
    def sub_leaf(k, v):
        if k == "conv":
            return jnp.zeros((v.shape[0], A) + v.shape[2:], v.dtype)
        return jnp.zeros(v.shape[:1] + (A,) + v.shape[2:3] + (S,)
                         + v.shape[4:], v.dtype)
    sub = {k: sub_leaf(k, v) for k, v in cache.items() if k != "fill"}
    sub["fill"] = jnp.zeros((A,), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(S), (A, S))
    logits, sub = llm_forward(params, tokens, pos, sub, cfg,
                              advance=n_real.astype(jnp.int32))

    def put(k):
        if k == "conv":
            return cache[k].at[:, slots].set(sub[k])
        return cache[k].at[:, slots, :, :S].set(sub[k])
    new_cache = {k: put(k) for k in cache if k != "fill"}
    new_cache["fill"] = cache["fill"].at[slots].set(n_real.astype(jnp.int32))
    last = jnp.take_along_axis(logits, (n_real - 1)[:, None, None],
                               axis=1)[:, 0]
    return last, new_cache


def _decode_core(params, tok, pos, cache, cfg: LLMConfig, chunk_buf=None,
                 conv_state=None, advance=None):
    """One decode step against a READ-ONLY attention cache.  tok [B]; pos
    [B, 1].  Returns (logits [B, V] f32, kvs, new_conv) where kvs stacks
    every attention layer's k/v for this token ([L_attn, B, H_kv, D]; raw
    bf16 when `chunk_buf` is given, else quantized to the cache's format)
    and new_conv is the updated [n_conv, B, L-1, dim] short-conv state
    (None for dense models).

    `chunk_buf` = (k_buf [L_attn, B, H, W, D], v_buf, valid [B, W]) carries
    the current chunk's earlier tokens (see _attend).  Hybrid (LFM2)
    models additionally thread `conv_state` + `advance` [B] (1 = the slot
    really advances) through their gated short-conv layers — conv state is
    tiny, so it rides the loop carry rather than a deferred buffer."""
    x = params["token_embd"][tok[:, None]]            # [B, 1, dim]
    layer_cache = {k: v for k, v in cache.items()
                   if k not in ("fill", "conv")}
    kv_list = []

    def attn_layer(x, blk, attn_i):
        lcache = {key: buf[attn_i] for key, buf in layer_cache.items()}
        lbuf = None
        if chunk_buf is not None:
            kb, vb, valid = chunk_buf
            lbuf = (kb[attn_i], vb[attn_i], valid)
        x, kv = _block_forward(x, blk, lcache, cache["fill"], pos, cfg,
                               defer_write=True, chunk_buf=lbuf)
        kv_list.append(kv)
        return x

    new_conv = None
    if "layers" in params:
        new_conv_list = []
        attn_i = conv_i = 0
        for li, layer_p in enumerate(params["layers"]):
            kind = cfg.layer_types[li] if cfg.layer_types else "attn"
            if kind == "attn":
                x = attn_layer(x, layer_p, attn_i)
                attn_i += 1
            else:
                x, st = _conv_block_forward(x, layer_p, conv_state[conv_i],
                                            advance, cfg)
                new_conv_list.append(st)
                conv_i += 1
        if new_conv_list:
            new_conv = jnp.stack(new_conv_list)
    else:
        for li, blk in enumerate(params["blocks"]):
            x = attn_layer(x, blk, li)
    kvs = {key: jnp.stack([kv[key] for kv in kv_list])
           for key in kv_list[0]}
    x = _rms_norm(x, params["output_norm"], cfg.rms_eps)
    out_w = params.get("output", None)
    if out_w is None:
        logits = jax.lax.dot_general(
            x, params["token_embd"], (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        logits = qdot(x, out_w)
    return logits[:, 0].astype(jnp.float32), kvs, new_conv


@partial(jax.jit, static_argnames=("cfg", "n_steps", "attn_len"),
         donate_argnames=("cache",))
def llm_generate_chunk_batched(params: dict, last_logits: jax.Array,
                               cache: dict, active: jax.Array,
                               key: jax.Array, temperature: jax.Array,
                               stop_ids: jax.Array, cfg: LLMConfig,
                               n_steps: int, attn_len: int = 0):
    """Batched on-device generation: up to n_steps tokens for every ACTIVE
    slot, with per-slot stop detection.  Slots that hit a stop token (or
    were inactive) record -1.

    Dense models use a CHUNK-BUFFERED cache protocol: the big cache is
    read-only through the whole chunk; each step's k/v land in a small
    [L, B, H, n_steps, D] buffer at a step-indexed column (the same column
    for every slot — a dynamic_update_slice, NOT a per-slot-position
    scatter, which measured ~6.5 ms/token of pure scatter cost at batch 32
    on 2.6B, benchmarks/bench_step.py no_kvwrite), and ONE per-slot scatter
    merges the buffer into the cache per chunk.  Because a slot that stops
    never resumes within a chunk, each slot's valid buffer columns are its
    first `adv` ones, holding positions fill0..fill0+adv-1 contiguously.

    Hybrid (LFM2) models buffer their attention layers the same way; the
    gated short-conv state is tiny ([n_conv, B, L-1, dim]) and rides the
    loop carry, written back once with the merge.

    `attn_len` (static; 0 = full): attention reads only
    the first attn_len cache positions — per-step KV traffic scales with
    the CURRENT context bucket instead of the allocated ctx_len.  The
    caller must guarantee every active slot's fill + n_steps <= attn_len;
    the merge still targets the full cache.  (An inactive slot whose old
    fill exceeds attn_len only yields garbage logits for that parked slot,
    which are never used.)

    `temperature` may be a scalar or per-slot [B]; `key` may be one PRNG
    key (shared, split once per step) or per-slot keys [B, 2].  Per-slot
    keys advance ONLY while their slot is active — a request seeded with
    PRNGKey(seed) consumes exactly one split per generated token, so its
    sample sequence is reproducible regardless of batch composition and
    matches the single-stream engine's per-token key discipline.

    last_logits: [B, V]; active: bool [B].
    Returns (buf [B, n_steps] i32, active [B], last_logits, cache, key)."""
    B = last_logits.shape[0]
    per_slot_key = key.ndim == 2
    buf0 = jnp.full((B, n_steps), -1, jnp.int32)

    hybrid = "conv" in cache
    Lc, _, H_kv, s_max, D = cache["k"].shape
    quantized = "k_scale" in cache
    if attn_len and attn_len < s_max:
        cache_view = {k: (v if k in ("fill", "conv")
                          else v[:, :, :, :attn_len])
                      for k, v in cache.items()}
    else:
        cache_view = cache
    bdt = jnp.bfloat16 if cache["k"].dtype != jnp.float32 else jnp.float32
    kbuf0 = jnp.zeros((Lc, B, H_kv, n_steps, D), bdt)
    vbuf0 = jnp.zeros((Lc, B, H_kv, n_steps, D), bdt)
    valid0 = jnp.zeros((B, n_steps), bool)
    adv0 = jnp.zeros((B,), jnp.int32)
    conv0 = cache["conv"] if hybrid else jnp.zeros((), jnp.float32)
    fill0 = cache["fill"]

    def cond(carry):
        i, active = carry[0], carry[1]
        return jnp.logical_and(i < n_steps, jnp.any(active))

    def body(carry):
        i, active, last, key, buf, kbuf, vbuf, valid, adv, conv = carry
        if per_slot_key:
            splits = jax.vmap(jax.random.split)(key)              # [B, 2, 2]
            sub = splits[:, 1]
            key = jnp.where(active[:, None], splits[:, 0], key)
        else:
            key, sub = jax.random.split(key)
        tok = sample_token(last, temperature, sub)                # [B]
        is_stop = jnp.any(tok[:, None] == stop_ids[None, :], axis=-1)
        active = jnp.logical_and(active, jnp.logical_not(is_stop))
        buf = buf.at[:, i].set(jnp.where(active, tok, -1))
        pos = jnp.where(active, fill0 + adv, s_max - 1)[:, None]
        adv_step = active.astype(jnp.int32)
        logits, kvs, new_conv = _decode_core(
            params, tok, pos, cache_view, cfg,
            chunk_buf=(kbuf, vbuf, valid),
            conv_state=conv if hybrid else None,
            advance=adv_step if hybrid else None)
        if hybrid:
            conv = new_conv.astype(conv.dtype)
        # write column i (same index for every slot -> no scatter); the
        # current token was already attended via k_cur, so the column only
        # becomes visible from step i+1 on
        kbuf = jax.lax.dynamic_update_slice(
            kbuf, kvs["k"][:, :, :, None, :].astype(bdt), (0, 0, 0, i, 0))
        vbuf = jax.lax.dynamic_update_slice(
            vbuf, kvs["v"][:, :, :, None, :].astype(bdt), (0, 0, 0, i, 0))
        valid = jax.lax.dynamic_update_slice(valid, active[:, None], (0, i))
        adv = adv + adv_step
        return i + 1, active, logits, key, buf, kbuf, vbuf, valid, adv, conv

    (i, active, last, key, buf, kbuf, vbuf, valid, adv,
     conv) = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), active, last_logits, key, buf0, kbuf0, vbuf0,
         valid0, adv0, conv0))

    # ONE merge scatter per chunk: slot b's column j targets position
    # fill0[b] + j while j < adv[b], else parks at s_max - 1 (invisible:
    # fill never covers it until the sequence itself reaches it, at which
    # point it is rewritten).
    j_idx = jnp.arange(n_steps)
    tpos = jnp.where(j_idx[None, :] < adv[:, None],
                     fill0[:, None] + j_idx[None, :], s_max - 1)   # [B, W]
    b_idx = jnp.arange(B)[:, None]                                 # [B, 1]
    new_cache = dict(cache)
    if quantized:
        kq, ks = _kv_quantize(kbuf.astype(jnp.float32))
        vq, vs = _kv_quantize(vbuf.astype(jnp.float32))
        updates = {"k": kq, "v": vq, "k_scale": ks, "v_scale": vs}
    else:
        updates = {"k": kbuf, "v": vbuf}
    for name, upd in updates.items():
        # upd [L, B, H, W(, D)] -> [B, W, L, H(, D)] to match the advanced
        # indices (b, tpos) at cache dims 1 and 3
        upd = jnp.moveaxis(jnp.moveaxis(upd, 1, 0), 3, 1)
        new_cache[name] = cache[name].at[:, b_idx, :, tpos].set(
            upd.astype(cache[name].dtype))
    if hybrid:
        new_cache["conv"] = conv
    new_cache["fill"] = fill0 + adv
    return buf, active, last, new_cache, key


@partial(jax.jit, static_argnames=("cfg", "n_steps"), donate_argnames=("cache",))
def llm_generate_chunk(params: dict, last_logits: jax.Array, cache: dict,
                       key: jax.Array, temperature: jax.Array,
                       stop_ids: jax.Array, cfg: LLMConfig, n_steps: int):
    """Generate up to `n_steps` tokens fully ON DEVICE (single sequence).

    The reference's llama.cpp loop round-trips to the host every token
    (`test-to-speech.cpp:164-192`); on TPU each dispatch costs an RPC, so the
    sample -> stop-check -> decode loop runs inside one jitted
    `lax.while_loop`, and the host receives a whole chunk of token ids at
    once.  The streaming engine calls this with n_steps =
    stream_check_interval, preserving the emit cadence.

    last_logits: [1, V] logits for the next sample.
    stop_ids: i32 [n_stop] token ids that terminate generation (eos,
    <|im_end|>); pad with -1.

    Returns (tokens [n_steps] i32 (-1 padded), n_generated, done,
    last_logits, cache, key).  The PRNG split order matches the host loop
    (`key, sub = split(key)` per token) so device and host generation are
    sample-for-sample identical at equal seeds.
    """
    buf0 = jnp.full((n_steps,), -1, jnp.int32)

    def cond(carry):
        i, done, _, _, _, _ = carry
        return jnp.logical_and(i < n_steps, jnp.logical_not(done))

    def body(carry):
        i, done, last, cache, key, buf = carry
        key, sub = jax.random.split(key)
        tok = sample_token(last, temperature, sub)          # [1]
        is_stop = jnp.any(tok[0] == stop_ids)
        buf = jnp.where(is_stop, buf, buf.at[i].set(tok[0]))

        def step(args):
            last, cache = args
            return llm_decode_step(params, tok, cache, cfg)

        last, cache = jax.lax.cond(is_stop, lambda a: a, step, (last, cache))
        i = jnp.where(is_stop, i, i + 1)
        return i, is_stop, last, cache, key, buf

    i, done, last, cache, key, buf = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.bool_(False), last_logits, cache,
                     key, buf0))
    return buf, i, done, last, cache, key


# ---------------------------------------------------------------------------
# Speculative decoding (beyond-reference: llama.cpp upstream ships this as
# examples/speculative; the reference itself is draft-less.  TPU framing: the
# M=1 decode GEMV is HBM-bound at ~2.5 ms/token floor for 2.6B-Q4_K and six
# kernel families failed to close the last 1.6x (benchmarks/RESULTS.md r4) —
# amortizing ONE target weight read over k+1 verified tokens is the
# structural fix, and the M=k+1 verify rides the same M-tiled MXU kernels
# as prefill.)
# ---------------------------------------------------------------------------

def _spec_probs(logits: jax.Array, temperature: jax.Array) -> jax.Array:
    """The sampling distribution `sample_token` draws from: softmax(l/T) for
    T > 0, one-hot argmax for T <= 0 (greedy).  logits [..., V] f32."""
    t = jnp.asarray(temperature, jnp.float32)
    p = jax.nn.softmax(logits / jnp.maximum(t, 1e-6), axis=-1)
    onehot = jax.nn.one_hot(jnp.argmax(logits, axis=-1), logits.shape[-1],
                            dtype=jnp.float32)
    return jnp.where(t > 0, p, onehot)


def spec_accept(key: jax.Array, draft_tokens: jax.Array,
                target_logits: jax.Array, draft_logits: jax.Array,
                temperature: jax.Array, force_p: jax.Array | None = None):
    """Speculative-sampling acceptance rule (Leviathan et al. 2023 /
    Chen et al. 2023), exact w.r.t. the target sampling distribution.

    draft_tokens [k] i32 drawn from p_d(i) = probs(draft_logits[i]);
    target_logits [k+1, V] — row i is the target dist that verifies
    draft_tokens[i], row k the bonus dist after all k drafts;
    Returns (n_accept, next_token): the emitted round is
    draft_tokens[:n_accept] + [next_token], where next_token is a residual
    resample max(p_t - p_d, 0) at the first rejection, or a bonus sample
    from target_logits[k] when all k drafts are accepted.  The standard
    correctness result: the emitted tokens are distributed exactly as
    token-by-token target sampling.  At temperature <= 0 both dists are
    one-hot, so acceptance degrades to `draft == target argmax` and the
    output equals greedy target decoding token-for-token (the parity test).
    """
    k = draft_tokens.shape[0]
    p_t = _spec_probs(target_logits[:k], temperature)        # [k, V]
    p_d = _spec_probs(draft_logits, temperature)             # [k, V]
    k_u, k_r = jax.random.split(key)
    u = jnp.asarray(jax.random.uniform(k_u, (k,)))
    idx = jnp.arange(k)
    ratio = p_t[idx, draft_tokens] / jnp.maximum(p_d[idx, draft_tokens],
                                                 1e-30)
    # PERF-HARNESS OVERRIDE (measurement only, VERDICT r4 item 1): with
    # MIOTTS_SPEC_FORCE_ACCEPT=p set (read by the ENGINE, passed down as
    # the runtime scalar `force_p`; NaN = disabled), the accept test
    # becomes a seeded Bernoulli(p) draw INDEPENDENT of the logits, so
    # the full streaming engine can be timed at a controlled acceptance
    # rate on synthetic weights (whose real draft/target agreement is ~0
    # by construction).  Output tokens are then NOT target-distributed —
    # never set outside a bench.  A runtime argument (not a baked
    # constant) so every p shares ONE compiled executable — remote
    # compiles cost tens of minutes on this relay.
    accept = u < ratio                                       # min(1,.) implicit
    if force_p is not None:
        accept = jnp.where(jnp.isnan(force_p), accept, u < force_p)
    n_accept = jnp.sum(jnp.cumprod(accept.astype(jnp.int32)))
    j = jnp.minimum(n_accept, k - 1)
    residual = jnp.maximum(p_t[j] - p_d[j], 0.0)
    rsum = jnp.sum(residual)
    residual = jnp.where(rsum > 0, residual / jnp.maximum(rsum, 1e-30),
                         p_t[j])
    bonus = _spec_probs(target_logits[k], temperature)
    dist = jnp.where(n_accept == k, bonus, residual)
    nxt = jax.random.categorical(k_r, jnp.log(jnp.maximum(dist, 1e-30)))
    return n_accept, nxt.astype(jnp.int32)


@partial(jax.jit, static_argnames=("cfg", "dcfg", "n_steps", "k_spec"),
         donate_argnames=("cache", "dcache"))
def llm_generate_chunk_spec(params: dict, dparams: dict, pending: jax.Array,
                            cache: dict, dcache: dict, key: jax.Array,
                            temperature: jax.Array, stop_ids: jax.Array,
                            cfg: LLMConfig, dcfg: LLMConfig,
                            n_steps: int, k_spec: int,
                            force_p: jax.Array | None = None):
    """Generate >= n_steps tokens on device with draft-model speculation.

    `pending` [1] i32: the newest sampled-but-not-yet-processed token (the
    caller has already emitted and stop-checked it).  Each round: the draft
    model extends pending with k_spec sampled tokens (plus one alignment
    step so its cache always covers every token the round may keep); ONE
    target forward over [pending, d_1..d_k] verifies all drafts and yields
    the bonus dist; `spec_accept` keeps a prefix and samples the corrective
    token; both caches roll back to the accepted prefix by fill (rejected
    positions are overwritten by the next round's writes, the same
    invisible-beyond-fill contract the chunked decode uses).

    Caches must be sized with >= k_spec + 1 headroom beyond the token
    budget.  PRNG: k_spec splits per round for drafting + one for
    acceptance — the sample stream intentionally differs from
    llm_generate_chunk (exact parity holds at temperature <= 0, where both
    are greedy target decoding).

    Greedy-parity caveat on real TPU hardware (measured round 4): the M=1
    decode GEMV evaluates its f32 dot at effectively-bf16 MXU precision
    (pallas-vs-XLA max-abs ~1% at M=1; exactly 0 at M=8/64), so the
    verify pass (M=k+1, full f32 emulation) can disagree with the plain
    M=1 path on NEAR-TIE argmaxes — the same class of divergence as
    llama.cpp CPU-vs-CUDA greedy runs.  On CPU (and anywhere the matmul
    paths agree) greedy parity is token-exact (tests/test_spec_decode.py);
    on random synthetic weights near-ties are dense and flips are common,
    on real speech-token checkpoints they are rare.  The output
    distribution remains exact w.r.t. the verify-path logits either way.

    Returns (buf [n_steps + k_spec + 1] i32 (-1 padded), n_generated, done,
    pending_out, cache, dcache, key, rounds, accepted): `accepted / (rounds
    * k_spec)` is the draft acceptance rate; emitted tokens per round =
    accepted/rounds + 1."""
    K = k_spec
    BUF = n_steps + K + 1
    buf0 = jnp.full((BUF,), -1, jnp.int32)

    def cond(c):
        cnt, done = c[0], c[1]
        return jnp.logical_and(cnt < n_steps, jnp.logical_not(done))

    def body(c):
        cnt, done, pending, cache, dcache, key, buf, rounds, accepted = c
        n = cache["fill"][0]
        # --- draft K tokens; then one alignment step so the draft cache
        # also covers d_K (needed when the whole round is accepted)
        d_toks, d_logits = [], []
        tok = pending
        for _ in range(K):
            lg, dcache = llm_forward(dparams, tok[:, None],
                                     dcache["fill"][:, None], dcache, dcfg)
            lg = lg[:, 0]                                    # [1, V]
            key, sub = jax.random.split(key)
            d = sample_token(lg, temperature, sub)           # [1]
            d_toks.append(d[0])
            d_logits.append(lg[0])
            tok = d
        _, dcache = llm_forward(dparams, tok[:, None],
                                dcache["fill"][:, None], dcache, dcfg)
        d_toks = jnp.stack(d_toks)                           # [K]
        d_logits = jnp.stack(d_logits)                       # [K, V]

        # --- ONE target forward verifies every draft (M = K+1 rides the
        # M-tiled prefill kernels; weights read once for the whole round)
        vtoks = jnp.concatenate([pending, d_toks])[None, :]  # [1, K+1]
        vpos = (n + jnp.arange(K + 1))[None, :]
        t_logits, cache = llm_forward(params, vtoks, vpos, cache, cfg)
        t_logits = t_logits[0]                               # [K+1, V]

        key, sub = jax.random.split(key)
        a, nxt = spec_accept(sub, d_toks, t_logits, d_logits, temperature,
                             force_p)

        # --- round outputs: d_1..d_a then the corrective/bonus token,
        # truncated at the first stop token (which itself is not emitted,
        # matching llm_generate_chunk)
        slots = jnp.arange(K + 1)
        out = jnp.where(slots < a, d_toks[jnp.minimum(slots, K - 1)],
                        jnp.where(slots == a, nxt, -1))
        is_stop = jnp.any(out[:, None] == stop_ids[None, :], axis=-1) \
            & (out >= 0)
        any_stop = jnp.any(is_stop)
        first_stop = jnp.argmax(is_stop)
        n_emit = jnp.where(any_stop, first_stop, a + 1)
        round_out = jnp.where(slots < n_emit, out, -1)
        buf = jax.lax.dynamic_update_slice(buf, round_out, (cnt,))

        # --- fill rollback: cache keeps [.., pending, d_1..d_kept); the
        # corrective token never entered either cache (it is the next
        # round's `pending`)
        kept = jnp.minimum(n_emit, a)
        fill_new = n + 1 + kept
        cache = dict(cache, fill=jnp.full_like(cache["fill"], fill_new))
        dcache = dict(dcache, fill=jnp.full_like(dcache["fill"], fill_new))
        pending = jnp.where(any_stop, pending, nxt[None])
        return (cnt + n_emit, any_stop, pending, cache, dcache, key, buf,
                rounds + 1, accepted + a)

    (cnt, done, pending, cache, dcache, key, buf, rounds,
     accepted) = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.bool_(False), pending, cache, dcache,
                     key, buf0, jnp.int32(0), jnp.int32(0)))
    buf = jnp.where(jnp.arange(BUF) < cnt, buf, -1)
    return buf, cnt, done, pending, cache, dcache, key, rounds, accepted


@jax.jit
def sample_token(logits: jax.Array, temperature: jax.Array,
                 key: jax.Array) -> jax.Array:
    """Temperature + categorical sampling on device; temperature <= 0 means
    greedy.  logits: [B, V] f32 -> [B] i32.  (The reference's sampler chain
    is exactly temp + seeded dist, test-to-speech.cpp:127-130.)

    `temperature` may be a scalar or per-row [B] (per-request sampling in
    batched serving); `key` may be one PRNG key (split across rows) or
    per-row keys [B, 2]."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    t = jnp.asarray(temperature, jnp.float32)
    scaled = logits / jnp.maximum(t[:, None] if t.ndim == 1 else t, 1e-6)
    k = jnp.asarray(key)
    if k.ndim == 2:
        # per-row keys: derive each row's sampling key exactly like the
        # single-key path does for its row 0 (split then take), so a
        # batched slot seeded with PRNGKey(s) samples the same tokens as a
        # single-stream run seeded with s
        keys = jax.vmap(lambda kk: jax.random.split(kk, 1)[0])(k)
    else:
        keys = jax.random.split(k, logits.shape[0])
    sampled = jax.vmap(lambda k, l: jax.random.categorical(k, l))(keys, scaled)
    return jnp.where(t > 0, sampled.astype(jnp.int32), greedy)


@partial(jax.jit, static_argnames=("top_k",))
def sample_token_filtered(logits: jax.Array, temperature: jax.Array,
                          key: jax.Array, top_k: int = 0,
                          top_p: jax.Array | None = None,
                          min_p: jax.Array | None = None) -> jax.Array:
    """Serving-grade sampler: temperature + optional top-k / nucleus (top-p)
    / min-p filtering, all on device (extends the reference's temp-only
    chain with llama.cpp's common sampler stages).  logits [B, V] -> [B].

    top_k: static int (0 = off); top_p in (0, 1]; min_p relative threshold.
    temperature / top_p / min_p may each be a scalar or a per-row [B] array.
    """
    temperature = jnp.asarray(temperature, jnp.float32)
    t_col = temperature[:, None] if temperature.ndim == 1 else temperature
    scaled = logits / jnp.maximum(t_col, 1e-6)

    if top_k and top_k > 0:
        kth = jnp.sort(scaled, axis=-1)[:, -top_k][:, None]
        scaled = jnp.where(scaled >= kth, scaled, -jnp.inf)

    if min_p is not None:
        # keep tokens with prob >= min_p * max_prob  <=>  logit >= max_logit
        # + log(min_p)
        min_p = jnp.asarray(min_p, jnp.float32)
        mp_col = min_p[:, None] if min_p.ndim == 1 else min_p
        mx = jnp.max(scaled, axis=-1, keepdims=True)
        scaled = jnp.where(scaled >= mx + jnp.log(jnp.maximum(mp_col, 1e-9)),
                           scaled, -jnp.inf)

    if top_p is not None:
        top_p = jnp.asarray(top_p, jnp.float32)
        tp_col = top_p[:, None] if top_p.ndim == 1 else top_p
        probs = jax.nn.softmax(scaled, axis=-1)
        order = jnp.argsort(-probs, axis=-1)
        sorted_p = jnp.take_along_axis(probs, order, axis=-1)
        csum = jnp.cumsum(sorted_p, axis=-1)
        # keep the smallest prefix with mass >= top_p (always keep rank 0)
        keep_sorted = (csum - sorted_p) < tp_col
        keep = jnp.zeros_like(keep_sorted).at[
            jnp.arange(probs.shape[0])[:, None], order].set(keep_sorted)
        scaled = jnp.where(keep, scaled, -jnp.inf)

    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    keys = jax.random.split(key, logits.shape[0])
    sampled = jax.vmap(lambda k, l: jax.random.categorical(k, l))(keys, scaled)
    return jnp.where(temperature > 0, sampled.astype(jnp.int32), greedy)
