#!/usr/bin/env python3
"""Independent PyTorch port of the MioCodec decode graph, written directly
from the C++ reference (`/root/reference/src/miocodec.cpp:519-745` and its
graph helpers `:205-420`) — NOT from the repo's JAX implementation or from
tests/ref_codec.py.

Purpose (VERDICT r3 item 6): the JAX codec's op *semantics* are pinned
against torch primitives (tests/test_codec_ops_torch.py), but the op-to-op
*wiring order* (AdaLN gate order, trim placement, upsampler stage order)
was until round 4 only cross-checked against the builder's own numpy
transcription of the same C++ reading — a shared misread would survive
both.  This file is a third implementation with real diversity: it follows
the C++ graph construction statement by statement, using torch ops, and is
diffed stage-by-stage against the JAX forward in
tests/test_codec_torch_graph.py.

Deliberate delta shared with the JAX port: conv kernels stay f32 (the C++
casts them to F16 only because ggml_conv_1d requires it,
`miocodec.cpp:382-386`; README "Known deltas").

Usage (tooling, e.g. against a real checkpoint on day 1):
    python tools/torch_codec_ref.py CODEC.gguf [--emb V.emb.gguf] \
        [--codes 1,2,3] [--out stages.npz]
then diff against `tools/debug_decoder.py --dump` npz stage dumps.
"""

from __future__ import annotations

import os
import sys
from collections import OrderedDict

import numpy as np
import torch
import torch.nn.functional as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _t(reader, name: str) -> torch.Tensor:
    """GGUF tensor -> torch f32 (numpy order = reversed ggml ne)."""
    return torch.from_numpy(np.ascontiguousarray(reader.tensor_f32(name)))


class TorchMioCodec:
    """Statement-by-statement torch transcription of miocodec_decode.

    Orientation convention: ggml's "transformer format" [ne0=dim, ne1=seq]
    is a row-major [seq, dim] array -> torch [seq, dim]; ggml's "conv
    format" [ne0=length, ne1=channels] -> torch [channels, length] (the
    native Conv1d layout).  `transpose2d` in the C++ is `.t()` here.
    """

    def __init__(self, reader):
        kv = reader.kv
        g = lambda key, d: int(kv.get(key, d))
        gf = lambda key, d: float(kv.get(key, d))
        # KV names + defaults per miocodec.cpp:448-474
        self.sample_rate = g("miocodec.sample_rate", 44100)
        self.n_fft = g("miocodec.n_fft", 392)
        self.hop_length = g("miocodec.hop_length", 98)
        self.n_freq = self.n_fft // 2 + 1
        self.samples_per_token = g("miocodec.samples_per_token", 1764)
        self.head_out_dim = g("embedding_length_out", 394)
        self.prenet_layers = g("miocodec.prenet_layers", 6)
        self.prenet_dim = g("miocodec.prenet_dim", 768)
        self.prenet_heads = g("miocodec.prenet_heads", 12)
        self.prenet_window = g("miocodec.prenet_window", 65)
        self.decoder_layers = g("miocodec.decoder_layers", 8)
        self.decoder_dim = g("miocodec.decoder_dim", 512)
        self.decoder_heads = g("miocodec.decoder_heads", 8)
        self.decoder_window = g("miocodec.decoder_window", 65)
        self.adaln_dim = g("miocodec.decoder_adanorm_dim", 128)
        self.resnet_blocks = g("miocodec.resnet_blocks", 2)
        self.resnet_groups = g("miocodec.resnet_groups", 32)
        self.upsampler_stages = g("miocodec.wave_upsampler_layers", 2)
        self.rope_theta = gf("miocodec.rope_theta", 10000.0)
        self.norm_eps = gf("miocodec.norm_eps", 1e-5)
        self.group_norm_eps = gf("miocodec.group_norm_eps", 1e-6)
        # upsampler factors/kernels live in GGUF *tensors* (miocodec.cpp:476-481)
        self.up_factors = [int(v) for v in
                           np.asarray(reader.tensor_np(
                               "miocodec.wave_upsampler.factors"))]
        self.up_kernels = [int(v) for v in
                           np.asarray(reader.tensor_np(
                               "miocodec.wave_upsampler.kernel_sizes"))]
        self.reader = reader
        self._cache: dict[str, torch.Tensor] = {}

    def W(self, name: str) -> torch.Tensor:
        if name not in self._cache:
            self._cache[name] = _t(self.reader, name)
        return self._cache[name]

    # ---- graph helpers, one per C++ static function ----

    def linear(self, x, w, b=None):
        """ggml_mul_mat(w, x) + b (miocodec.cpp:205-209): w numpy [out, in],
        x [seq, in] -> [seq, out]."""
        y = x @ w.t()
        return y if b is None else y + b

    def layer_norm(self, x, w, b, eps):
        """ggml_norm along the feature dim, then * w + b (:212-217)."""
        mu = x.mean(-1, keepdim=True)
        var = x.var(-1, unbiased=False, keepdim=True)
        y = (x - mu) / torch.sqrt(var + eps)
        y = y * w
        return y if b is None else y + b

    def swiglu_ffn(self, x, w_gate, w_up, w_down):
        """w_down(silu(gate(x)) * up(x)) (:220-225)."""
        return self.linear(F.silu(self.linear(x, w_gate))
                           * self.linear(x, w_up), w_down)

    def local_mask(self, seq_len, window):
        """fill_local_attn_mask (:233-242): 0 iff |i-j| <= window//2."""
        i = torch.arange(seq_len)[:, None]
        j = torch.arange(seq_len)[None, :]
        return torch.where((i - j).abs() <= window // 2,
                           torch.zeros(()), torch.full((), float("-inf")))

    def rope(self, x, pos, theta_base):
        """ggml_rope_ext mode 0 (:259-263): consecutive-pair rotation.
        x [seq, n_head, head_dim]."""
        hd = x.shape[-1]
        inv = theta_base ** (-torch.arange(0, hd, 2, dtype=torch.float64)
                             / hd).to(torch.float32)
        ang = pos[:, None].to(torch.float32) * inv[None, :]
        cos = torch.cos(ang)[:, None, :]
        sin = torch.sin(ang)[:, None, :]
        x0, x1 = x[..., 0::2], x[..., 1::2]
        out = torch.empty_like(x)
        out[..., 0::2] = x0 * cos - x1 * sin
        out[..., 1::2] = x0 * sin + x1 * cos
        return out

    def mha_rope(self, x, wq, wk, wv, wo, mask, pos, n_head, head_dim):
        """Multi-head attention with RoPE (:246-288).  x [seq, dim]."""
        seq_len, dim = x.shape
        q = self.linear(x, wq).view(seq_len, n_head, head_dim)
        k = self.linear(x, wk).view(seq_len, n_head, head_dim)
        v = self.linear(x, wv).view(seq_len, n_head, head_dim)
        q = self.rope(q, pos, self.rope_theta)
        k = self.rope(k, pos, self.rope_theta)
        # scores [head, seq_q, seq_k]; softmax along keys (:272-275)
        scores = torch.einsum("qhd,khd->hqk", q, k) / (head_dim ** 0.5)
        scores = scores + mask[None, :, :]
        probs = torch.softmax(scores, dim=-1)
        attn = torch.einsum("hqk,khd->qhd", probs, v).reshape(seq_len, dim)
        return self.linear(attn, wo)

    def prenet_layer(self, x, p, mask, pos):
        """Pre-norm transformer block (:291-307)."""
        h = self.layer_norm(x, self.W(p + "attn_norm.weight"),
                            self.W(p + "attn_norm.bias"), self.norm_eps)
        h = self.mha_rope(h, self.W(p + "attn_q.weight"),
                          self.W(p + "attn_k.weight"),
                          self.W(p + "attn_v.weight"),
                          self.W(p + "attn_output.weight"),
                          mask, pos, self.prenet_heads,
                          self.prenet_dim // self.prenet_heads)
        x = x + h
        h = self.layer_norm(x, self.W(p + "ffn_norm.weight"),
                            self.W(p + "ffn_norm.bias"), self.norm_eps)
        h = self.swiglu_ffn(h, self.W(p + "ffn_gate.weight"),
                            self.W(p + "ffn_up.weight"),
                            self.W(p + "ffn_down.weight"))
        return x + h

    def compute_adaln3(self, cond, w, b):
        """SiLU(cond) -> Linear -> split shift/scale/gate (:310-319)."""
        h = self.linear(F.silu(cond), w, b)
        dim = h.shape[-1] // 3
        return h[:dim], h[dim:2 * dim], h[2 * dim:]

    def adaln_norm(self, x, shift, scale, eps):
        """norm(x) * (1 + scale) + shift (:323-331); the C++ adds a ones
        tensor to scale — same thing."""
        mu = x.mean(-1, keepdim=True)
        var = x.var(-1, unbiased=False, keepdim=True)
        y = (x - mu) / torch.sqrt(var + eps)
        return y * (1.0 + scale) + shift

    def decoder_layer(self, x, cond, p, mask, pos):
        """AdaLN-Zero transformer block (:334-356): attn cond -> modulated
        norm -> attention -> gate -> residual; then the FFN half."""
        sh, sc, gt = self.compute_adaln3(cond, self.W(p + "attn_cond.weight"),
                                         self.W(p + "attn_cond.bias"))
        h = self.adaln_norm(x, sh, sc, self.norm_eps)
        h = self.mha_rope(h, self.W(p + "attn_q.weight"),
                          self.W(p + "attn_k.weight"),
                          self.W(p + "attn_v.weight"),
                          self.W(p + "attn_output.weight"),
                          mask, pos, self.decoder_heads,
                          self.decoder_dim // self.decoder_heads)
        x = x + h * gt
        sh, sc, gt = self.compute_adaln3(cond, self.W(p + "ffn_cond.weight"),
                                         self.W(p + "ffn_cond.bias"))
        h = self.adaln_norm(x, sh, sc, self.norm_eps)
        h = self.swiglu_ffn(h, self.W(p + "ffn_gate.weight"),
                            self.W(p + "ffn_up.weight"),
                            self.W(p + "ffn_down.weight"))
        return x + h * gt

    def conv_group_norm(self, x, w, b, groups, eps):
        """GroupNorm in conv format [C, L] (:360-374)."""
        y = F.group_norm(x.unsqueeze(0), groups, eps=eps).squeeze(0)
        return y * w[:, None] + b[:, None]

    def conv1d(self, x, w, b, pad):
        """ggml_conv_1d (f32 kernel; see module docstring).  x [C, L]."""
        return F.conv1d(x.unsqueeze(0), w, b, padding=pad).squeeze(0)

    def resnet_block(self, x, p, groups, eps):
        """GN -> SiLU -> Conv(k3,p1) -> GN -> SiLU -> Conv + residual
        (:388-404).  x [C, L]."""
        r = x
        x = self.conv_group_norm(x, self.W(p + "norm1.weight"),
                                 self.W(p + "norm1.bias"), groups, eps)
        x = self.conv1d(F.silu(x), self.W(p + "conv1.weight"),
                        self.W(p + "conv1.bias"), 1)
        x = self.conv_group_norm(x, self.W(p + "norm2.weight"),
                                 self.W(p + "norm2.bias"), groups, eps)
        x = self.conv1d(F.silu(x), self.W(p + "conv2.weight"),
                        self.W(p + "conv2.bias"), 1)
        return x + r

    def snake(self, x, log_alpha, log_beta):
        """snake(x) = x + sin^2(exp(alpha)*x)/exp(beta) (:409-420).
        x [C, L], params [C] (log space)."""
        a = torch.exp(log_alpha)[:, None]
        b = torch.exp(log_beta)[:, None]
        s = torch.sin(x * a)
        return x + s * s / b

    # ---- the full decode graph (miocodec.cpp:519-745) ----

    @torch.no_grad()
    def forward(self, codes, global_emb):
        """codes [T] int, global_emb [adaln_dim] -> (stages, (log_mag,
        phase)).  Stage arrays are [seq, features] numpy, named to match
        miotts_tpu.models.codec.codec_decode_stages."""
        stages = OrderedDict()

        def tap(name, x, conv_format=False):
            a = x.t() if conv_format else x
            stages[name] = a.detach().cpu().numpy().copy()

        codes = torch.as_tensor(codes, dtype=torch.long)
        g_emb = torch.as_tensor(np.asarray(global_emb, np.float32))
        T = codes.shape[0]
        S_dec = T * 2

        # ---- 1. token embedding lookup (:599-600) ----
        x = self.W("token_embd")[codes]                 # [T, 768]
        tap("token_embd", x)

        # ---- 2. wave_prenet (:604-618) ----
        pre_mask = self.local_mask(T, self.prenet_window)
        pos_pre = torch.arange(T)
        for i in range(self.prenet_layers):
            x = self.prenet_layer(x, f"wave_prenet.blk.{i}.", pre_mask,
                                  pos_pre)
        tap("prenet", x)
        x = self.layer_norm(x, self.W("wave_prenet.norm.weight"),
                            self.W("wave_prenet.norm.bias"), self.norm_eps)
        x = self.linear(x, self.W("wave_prenet.output.weight"),
                        self.W("wave_prenet.output.bias"))   # [T, 512]
        tap("prenet_out", x)

        # ---- 3. wave_upsample ConvTranspose1d(k=2, s=2) (:622-626) ----
        x = x.t()                                       # conv format [C, T]
        x = F.conv_transpose1d(x.unsqueeze(0),
                               self.W("wave_upsample.weight"),
                               self.W("wave_upsample.bias"),
                               stride=2).squeeze(0)     # [C, S_dec]
        tap("upsample", x, conv_format=True)

        # ---- 4. wave_prior ResNet blocks (:629-637) ----
        for b in range(self.resnet_blocks):
            x = self.resnet_block(x, f"wave_prior.{b}.",
                                  self.resnet_groups, self.group_norm_eps)
        tap("prior", x, conv_format=True)
        x = x.t()                                       # transformer format

        # ---- 5. wave_decoder AdaLN-Zero layers (:639-649) ----
        dec_mask = self.local_mask(S_dec, self.decoder_window)
        pos_dec = torch.arange(S_dec)
        for i in range(self.decoder_layers):
            x = self.decoder_layer(x, g_emb, f"wave_decoder.blk.{i}.",
                                   dec_mask, pos_dec)
        tap("decoder", x)

        # ---- 6. final AdaLN norm (:652-660) ----
        nc = self.linear(F.silu(g_emb), self.W("wave_decoder.norm_cond.weight"),
                         self.W("wave_decoder.norm_cond.bias"))
        dd = self.decoder_dim
        x = self.adaln_norm(x, nc[:dd], nc[dd:2 * dd], self.norm_eps)
        tap("final_adaln", x)

        # ---- 7. wave_post ResNet blocks (:663-672) ----
        x = x.t()                                       # conv format
        for b in range(self.resnet_blocks):
            x = self.resnet_block(x, f"wave_post.{b}.",
                                  self.resnet_groups, self.group_norm_eps)
        tap("post", x, conv_format=True)

        # ---- 8. wave_upsampler stages (:676-707) ----
        for stage in range(self.upsampler_stages):
            factor = self.up_factors[stage]
            kernel = self.up_kernels[stage]
            trim = (kernel - factor) // 2
            x = F.conv_transpose1d(
                x.unsqueeze(0), self.W(f"wave_upsampler.up.{stage}.weight"),
                self.W(f"wave_upsampler.up.{stage}.bias"),
                stride=factor).squeeze(0)
            if trim > 0:                                # side trim (:689-696)
                x = x[:, trim:x.shape[1] - trim]
            x = self.snake(x, self.W(f"wave_upsampler.snake.{stage}.alpha"),
                           self.W(f"wave_upsampler.snake.{stage}.beta"))
            x = self.resnet_block(x, f"wave_upsampler.resblk.{stage}.",
                                  self.resnet_groups, self.group_norm_eps)
            tap(f"upsampler_{stage}", x, conv_format=True)

        # out_proj + out_snake in transformer format (:712-725)
        x = x.t()
        x = self.linear(x, self.W("wave_upsampler.out_proj.weight"),
                        self.W("wave_upsampler.out_proj.bias"))
        # out_snake operates on [dim, seq] in the C++; feature dim matches
        # alpha — in [seq, dim] orientation that is the last axis
        a = torch.exp(self.W("wave_upsampler.out_snake.alpha"))
        b = torch.exp(self.W("wave_upsampler.out_snake.beta"))
        s = torch.sin(x * a)
        x = x + s * s / b
        tap("upsampler_out", x)

        # ---- 9. istft_head (:728-738) ----
        x = self.linear(x, self.W("istft_head.out.weight"),
                        self.W("istft_head.out.bias"))  # [S_final, 394]
        log_mag = x[:, : self.n_freq]
        phase = x[:, self.n_freq: 2 * self.n_freq]
        tap("log_mag", log_mag)
        tap("phase", phase)
        # spec_real/imag with the clamp(exp(log_mag), 0, 100) (:734-737)
        mag = torch.clamp(torch.exp(log_mag), 0.0, 100.0)
        stages["spec_real"] = (mag * torch.cos(phase)).numpy().copy()
        stages["spec_imag"] = (mag * torch.sin(phase)).numpy().copy()
        return stages, (stages["log_mag"], stages["phase"])


def main() -> int:
    import argparse
    from miotts_tpu.gguf import GGUFReader, load_voice_embedding
    from miotts_tpu.models.codec import REFERENCE_TEST_CODES

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("codec")
    ap.add_argument("--emb", help=".emb.gguf voice embedding")
    ap.add_argument("--codes", help="comma-separated codes "
                    "(default: the reference 20-code parity vector)")
    ap.add_argument("--out", default="torch_codec_stages.npz")
    args = ap.parse_args()

    codes = ([int(c) for c in args.codes.split(",")] if args.codes
             else list(REFERENCE_TEST_CODES))
    with GGUFReader(args.codec) as r:
        model = TorchMioCodec(r)
        emb = (load_voice_embedding(args.emb) if args.emb
               else np.zeros(model.adaln_dim, np.float32))
        stages, _ = model.forward(codes, emb)
    for name, a in stages.items():
        print(f"  {name:16s} {str(a.shape):18s} min={a.min():+.4f} "
              f"max={a.max():+.4f} mean={a.mean():+.5f}")
    np.savez(args.out, **stages)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
