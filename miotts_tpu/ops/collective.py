"""Compute-overlapped collective matmuls (shard_map building blocks).

The default TP path lets GSPMD insert a bulk psum after each row-parallel
matmul (parallel/sharding.py); that serializes the whole matmul before the
whole all-reduce.  These shard_map kernels interleave the two instead — the
scaling-book recipe for hiding ICI latency behind MXU work: split the output
into one chunk per device and walk a ring, each step computing one local
partial chunk while the travelling accumulator moves one hop.  XLA overlaps
the `ppermute` with the next step's matmul, so for P devices the exposed
collective time drops from one full all-reduce to ~one chunk hop.

`ring_allreduce_dot` == dot + psum (bitwise-equal modulo f32 summation
order); `ring_reduce_scatter_dot` keeps the result sharded for a following
column-parallel layer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _ring_perm(axis: str):
    n = jax.lax.axis_size(axis)
    return [(i, (i + 1) % n) for i in range(n)]


def ring_reduce_scatter_dot(x: jax.Array, w_local: jax.Array, axis: str,
                            precision=None) -> jax.Array:
    """Row-parallel matmul with ring reduce-scatter.  Runs inside shard_map.

    x: [M, K_local] (this shard's slice of the contraction dim);
    w_local: [K_local, N] with N divisible by the axis size.
    Returns this device's fully-reduced output chunk [M, N // P]
    (device d owns columns [d*N/P, (d+1)*N/P)).
    """
    P = jax.lax.axis_size(axis)
    d = jax.lax.axis_index(axis)
    M = x.shape[0]
    N = w_local.shape[1]
    Nc = N // P
    perm = _ring_perm(axis)

    # Static unroll (P = axis size, known at trace time): chunk j visits
    # devices j+1, j+2, ..., j (mod P), accumulating every shard's partial;
    # the hop happens before each add so XLA can overlap it with the
    # previous step's matmul.
    acc = jnp.zeros((M, Nc), jnp.float32)
    for s in range(P):
        j = (d + P - 1 - s) % P
        w_cols = jax.lax.dynamic_slice_in_dim(w_local, j * Nc, Nc, axis=1)
        part = jnp.dot(x, w_cols, preferred_element_type=jnp.float32,
                       precision=precision)
        if s > 0:
            acc = jax.lax.ppermute(acc, axis, perm)
        acc = acc + part
    return acc


def ring_allreduce_dot(x: jax.Array, w_local: jax.Array, axis: str,
                       precision=None) -> jax.Array:
    """Row-parallel matmul with overlapped all-reduce: reduce-scatter ring
    followed by an all-gather.  Equivalent to
    `psum(x @ w_local)` over `axis`."""
    chunk = ring_reduce_scatter_dot(x, w_local, axis, precision)
    gathered = jax.lax.all_gather(chunk, axis, axis=0)  # [P, M, Nc]
    P, M, Nc = gathered.shape
    return jnp.transpose(gathered, (1, 0, 2)).reshape(M, P * Nc)
