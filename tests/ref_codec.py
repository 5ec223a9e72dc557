"""Independent numpy reference implementation of the MioCodec decode.

Written directly from the documented math of /root/reference/src/miocodec.cpp
(graph helpers at :205-420, graph at :554-745) with explicit loops /
different code paths than the JAX version, to cross-check the transcription
(SURVEY.md §4.1 strategy: fixed inputs, stage-wise parity).
"""

import numpy as np


def linear(x, w, b=None):
    y = x @ w.T
    if b is not None:
        y = y + b
    return y


def layer_norm(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    y = (x - mu) / np.sqrt(var + eps) * w
    if b is not None:
        y = y + b
    return y


def rope_interleaved(x, pos, theta):
    """x: [T, H, d]; rotate pairs (2i, 2i+1), angle pos*theta^(-2i/d)."""
    T, H, d = x.shape
    out = x.copy()
    for i in range(d // 2):
        ang = pos * (theta ** (-2.0 * i / d))
        c, s = np.cos(ang), np.sin(ang)
        a = x[:, :, 2 * i]
        b = x[:, :, 2 * i + 1]
        out[:, :, 2 * i] = a * c[:, None] - b * s[:, None]
        out[:, :, 2 * i + 1] = a * s[:, None] + b * c[:, None]
    return out


def attention(x, wq, wk, wv, wo, n_head, window, theta):
    T, dim = x.shape
    hd = dim // n_head
    pos = np.arange(T, dtype=np.float64)
    q = rope_interleaved(linear(x, wq).reshape(T, n_head, hd), pos, theta)
    k = rope_interleaved(linear(x, wk).reshape(T, n_head, hd), pos, theta)
    v = linear(x, wv).reshape(T, n_head, hd)
    half = window // 2
    out = np.zeros((T, n_head, hd))
    for h in range(n_head):
        scores = q[:, h] @ k[:, h].T / np.sqrt(hd)
        for i in range(T):
            for j in range(T):
                if abs(i - j) > half:
                    scores[i, j] = -np.inf
        e = np.exp(scores - scores.max(-1, keepdims=True))
        p = e / e.sum(-1, keepdims=True)
        out[:, h] = p @ v[:, h]
    return linear(out.reshape(T, dim), wo)


def swiglu(x, wg, wu, wd):
    g = linear(x, wg)
    g = g / (1.0 + np.exp(-g))  # silu
    return linear(g * linear(x, wu), wd)


def silu(x):
    return x / (1.0 + np.exp(-x))


def adaln3(cond, w, b):
    h = linear(silu(cond), w, b)
    d = h.shape[-1] // 3
    return h[:d], h[d:2 * d], h[2 * d:]


def adaln_norm(x, shift, scale, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * (1.0 + scale) + shift


def group_norm(x, w, b, n_groups, eps):
    """x: [T, C]; stats over (T, C/G) per group."""
    T, C = x.shape
    cg = C // n_groups
    y = np.empty_like(x)
    for g in range(n_groups):
        sl = slice(g * cg, (g + 1) * cg)
        v = x[:, sl]
        mu = v.mean()
        var = ((v - mu) ** 2).mean()
        y[:, sl] = (v - mu) / np.sqrt(var + eps)
    return y * w + b


def conv1d_same(x, w, b):
    """x: [T, C_in], w: [out, in, k=3], pad 1."""
    T, ci = x.shape
    co, _, k = w.shape
    pad = (k - 1) // 2
    xp = np.zeros((T + 2 * pad, ci))
    xp[pad:pad + T] = x
    y = np.zeros((T, co))
    for t in range(T):
        for kk in range(k):
            y[t] += xp[t + kk] @ w[:, :, kk].T
    if b is not None:
        y += b
    return y


def conv_transpose1d(x, w, b, stride):
    """x: [T, C_in], w: [in, out, k] (torch layout); out (T-1)*s + k."""
    T, ci = x.shape
    _, co, k = w.shape
    out_len = (T - 1) * stride + k
    y = np.zeros((out_len, co))
    for i in range(T):
        for kk in range(k):
            y[i * stride + kk] += x[i] @ w[:, :, kk]
    if b is not None:
        y += b
    return y


def snake(x, log_alpha, log_beta):
    a = np.exp(log_alpha)
    bb = np.exp(log_beta)
    return x + np.sin(x * a) ** 2 / bb


def resnet_block(x, p, n_groups, eps):
    r = x
    x = group_norm(x, p["norm1_w"], p["norm1_b"], n_groups, eps)
    x = silu(x)
    x = conv1d_same(x, p["conv1_w"], p["conv1_b"])
    x = group_norm(x, p["norm2_w"], p["norm2_b"], n_groups, eps)
    x = silu(x)
    x = conv1d_same(x, p["conv2_w"], p["conv2_b"])
    return x + r


def _block(params, stack_name, i):
    return {k: np.asarray(v[i], np.float64) for k, v in params[stack_name].items()}


def ref_codec_spec(params, codes, voice_emb, cfg):
    """Full decode to (log_mag, phase), float64 numpy."""
    P = {k: (np.asarray(v, np.float64) if not isinstance(v, (dict, list)) else v)
         for k, v in params.items()}
    x = P["token_embd"][np.asarray(codes)]
    emb = np.asarray(voice_emb, np.float64)

    for i in range(cfg.prenet_layers):
        p = _block(params, "prenet_blocks", i)
        h = layer_norm(x, p["attn_norm_w"], p["attn_norm_b"], cfg.norm_eps)
        h = attention(h, p["wq"], p["wk"], p["wv"], p["wo"],
                      cfg.prenet_heads, cfg.prenet_window, cfg.rope_theta)
        x = x + h
        h = layer_norm(x, p["ffn_norm_w"], p["ffn_norm_b"], cfg.norm_eps)
        x = x + swiglu(h, p["w_gate"], p["w_up"], p["w_down"])

    x = layer_norm(x, P["prenet_norm_w"], P["prenet_norm_b"], cfg.norm_eps)
    x = linear(x, P["prenet_out_w"], P["prenet_out_b"])

    x = conv_transpose1d(x, P["upsample_w"], P["upsample_b"], 2)

    for i in range(cfg.resnet_blocks):
        x = resnet_block(x, _block(params, "prior_blocks", i),
                         cfg.resnet_groups, cfg.group_norm_eps)

    for i in range(cfg.decoder_layers):
        p = _block(params, "decoder_blocks", i)
        sh, sc, g = adaln3(emb, p["attn_cond_w"], p["attn_cond_b"])
        h = adaln_norm(x, sh, sc, cfg.norm_eps)
        h = attention(h, p["wq"], p["wk"], p["wv"], p["wo"],
                      cfg.decoder_heads, cfg.decoder_window, cfg.rope_theta)
        x = x + h * g
        sh, sc, g = adaln3(emb, p["ffn_cond_w"], p["ffn_cond_b"])
        h = adaln_norm(x, sh, sc, cfg.norm_eps)
        x = x + swiglu(h, p["w_gate"], p["w_up"], p["w_down"]) * g

    nc = linear(silu(emb), np.asarray(params["norm_cond_w"], np.float64),
                np.asarray(params["norm_cond_b"], np.float64))
    dd = cfg.decoder_dim
    x = adaln_norm(x, nc[:dd], nc[dd:2 * dd], cfg.norm_eps)

    for i in range(cfg.resnet_blocks):
        x = resnet_block(x, _block(params, "post_blocks", i),
                         cfg.resnet_groups, cfg.group_norm_eps)

    for s in range(cfg.upsampler_stages):
        f, k = cfg.up_factors[s], cfg.up_kernels[s]
        trim = (k - f) // 2
        stage = params["upsampler_stages"][s]
        x = conv_transpose1d(x, np.asarray(stage["up_w"], np.float64),
                             np.asarray(stage["up_b"], np.float64), f)
        if trim > 0:
            x = x[trim:len(x) - trim]
        x = snake(x, np.asarray(stage["snake_a"], np.float64),
                  np.asarray(stage["snake_b"], np.float64))
        rp = {kk: np.asarray(vv, np.float64) for kk, vv in stage["resnet"].items()}
        x = resnet_block(x, rp, cfg.resnet_groups, cfg.group_norm_eps)

    x = linear(x, P["upsampler_out_w"], P["upsampler_out_b"])
    x = snake(x, P["upsampler_out_snake_a"], P["upsampler_out_snake_b"])
    x = linear(x, P["istft_head_w"], P["istft_head_b"])
    nf = cfg.n_freq
    return x[:, :nf], x[:, nf:2 * nf]
