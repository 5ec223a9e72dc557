"""Sharding layouts: tensor-parallel LLM weights + KV cache over a mesh.

GSPMD layout (SURVEY.md §7.7, the scaling-book recipe: pick a mesh, annotate
shardings, let XLA insert the collectives):

  * Attention: q/k/v projections sharded on the HEAD (output) dim over
    'model'; the output projection sharded on its INPUT dim, so per-layer
    attention is [column-parallel -> row-parallel] with ONE psum (all-reduce)
    at wo — the Megatron pattern, all over ICI.
  * FFN: gate/up column-parallel, down row-parallel — one psum per layer.
  * KV cache sharded over heads ('model') and batch ('data').
  * Embedding + norms replicated (tiny); logits matmul column-parallel over
    vocab.
  * Activations: batch over 'data', features replicated.

QTensor quantized weights shard exactly like dense ones: `values` [N, K] and
`scales` [N, K/g] take the same PartitionSpec (group axis divides K evenly
on every shard as long as K_shard % group == 0, which holds for all
supported head/ffn dims).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.llm import LLMConfig
from ..ops.qmat import QTensor

# PartitionSpecs for each per-layer block tensor ([out, in]; blocks are a
# LIST of per-layer dicts — see load_llm_params).
_BLOCK_SPECS = {
    "attn_norm": P(None),
    # Fused QKV / gate+up: the concatenated output dim mixes head groups, so
    # shard the CONTRACTION dim instead (row-parallel; GSPMD inserts the
    # psum on the partial products).
    "wqkv": P(None, "model"),
    "bqkv": P(None),
    "w_gateup": P(None, "model"),
    "wq": P("model", None),
    "wk": P("model", None),
    "wv": P("model", None),
    "wo": P(None, "model"),
    "bq": P("model"),
    "bk": P("model"),
    "bv": P("model"),
    "q_norm": P(None),
    "k_norm": P(None),
    "ffn_norm": P(None),
    "w_gate": P("model", None),
    "w_up": P("model", None),
    "w_down": P(None, "model"),
}

_TOP_SPECS = {
    "token_embd": P(None, None),
    "output_norm": P(None),
    "output": P("model", None),
}

# Per-layer specs for hybrid (LFM2) layers ([out, in] 2-D weights, no
# leading layer axis).  Short-conv: in_proj column-parallel, out_proj
# row-parallel (one psum), depthwise conv weight replicated (tiny).
_HYBRID_SPECS = {
    "attn_norm": P(None), "ffn_norm": P(None),
    "q_norm": P(None), "k_norm": P(None),
    "wq": P("model", None), "wk": P("model", None), "wv": P("model", None),
    "wo": P(None, "model"),
    "wqkv": P(None, "model"), "bqkv": P(None),
    "w_gate": P("model", None), "w_up": P("model", None),
    "w_down": P(None, "model"), "w_gateup": P(None, "model"),
    "in_proj": P("model", None), "in_proj_b": P("model"),
    "out_proj": P(None, "model"), "out_proj_b": P(None),
    "conv_w": P(None, None), "conv_b": P(None),
}


def _fits(shape, spec: P, mesh: Mesh) -> bool:
    for dim, ax in zip(shape, tuple(spec)):
        if ax is None:
            continue
        if dim % mesh.shape[ax] != 0:
            return False
    return True


def _apply_spec(tree, spec: P, mesh: Mesh):
    # Fall back to replication when a dim doesn't divide the mesh axis
    # (e.g. an odd vocab size on the 'model' axis).
    if isinstance(tree, QTensor):
        # QTensor stores values transposed ([.., K, N] for logical [N, K]);
        # swap the last two spec axes to match the storage orientation.
        axes = list(tuple(spec)) + [None] * max(0, tree.values.ndim - len(tuple(spec)))
        if len(axes) >= 2:
            axes[-1], axes[-2] = axes[-2], axes[-1]
        qspec = P(*axes)
        # Every component (values AND per-group scales/mins) must divide
        # evenly, else replicate the whole tensor.  The scales check also
        # guarantees each shard holds WHOLE quant groups along K — required
        # for dequant correctness, and for packed nibbles (two quants/byte,
        # group-split halves) it keeps shard boundaries off mid-group rows.
        ok = _fits(tree.values.shape, qspec, mesh) and _fits(tree.scales.shape, qspec, mesh)
        if tree.mins is not None:
            ok = ok and _fits(tree.mins.shape, qspec, mesh)
        if not ok:
            qspec = P()
        return QTensor(
            values=jax.device_put(tree.values, NamedSharding(mesh, qspec)),
            scales=jax.device_put(tree.scales, NamedSharding(mesh, qspec)),
            mins=None if tree.mins is None else jax.device_put(
                tree.mins, NamedSharding(mesh, qspec)),
            group=tree.group,
            n_out=tree.n_out,
            packed=tree.packed,
        )
    if not _fits(tree.shape, spec, mesh):
        spec = P()
    return jax.device_put(tree, NamedSharding(mesh, spec))


def shard_llm_params(params: dict, mesh: Mesh, cfg: LLMConfig) -> dict:
    """Place LLM params on the mesh with TP shardings."""
    out = {}
    for k, v in params.items():
        if k == "blocks":
            out[k] = [{bk: _apply_spec(bv, _BLOCK_SPECS[bk], mesh)
                       for bk, bv in blk.items()} for blk in v]
        elif k == "layers":  # hybrid (LFM2) per-layer dicts
            out[k] = [{lk: _apply_spec(lv, _HYBRID_SPECS.get(lk, P()), mesh)
                       for lk, lv in layer.items()} for layer in v]
        elif k in _TOP_SPECS:
            out[k] = _apply_spec(v, _TOP_SPECS[k], mesh)
        else:
            out[k] = _apply_spec(v, P(), mesh)
    return out


def kv_cache_sharding(mesh: Mesh) -> dict:
    """KV cache [L, B, H_kv, S, D]: batch over 'data', heads over 'model'."""
    return {
        "k": NamedSharding(mesh, P(None, "data", "model", None, None)),
        "v": NamedSharding(mesh, P(None, "data", "model", None, None)),
        "k_scale": NamedSharding(mesh, P(None, "data", "model", None)),
        "v_scale": NamedSharding(mesh, P(None, "data", "model", None)),
        "conv": NamedSharding(mesh, P(None, "data", None, None)),
        "fill": NamedSharding(mesh, P("data")),
    }


def shard_kv_cache(cache: dict, mesh: Mesh) -> dict:
    sh = kv_cache_sharding(mesh)
    out = {}
    for k, v in cache.items():
        spec = sh[k].spec
        if not _fits(v.shape, spec, mesh):
            # drop axes that don't divide (e.g. fewer KV heads than the
            # model axis) rather than failing
            spec = P(*[ax if ax is None or d % mesh.shape[ax] == 0 else None
                       for d, ax in zip(v.shape, tuple(spec))])
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (codec params, small tensors) across the mesh."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
