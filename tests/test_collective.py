"""Overlapped ring-collective matmul: equivalence with dot + psum."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from miotts_tpu.ops.collective import ring_allreduce_dot, ring_reduce_scatter_dot
from miotts_tpu.parallel.mesh import make_mesh


def test_ring_allreduce_dot_matches_dense(rng):
    mesh = make_mesh(data=1, model=8)
    M, K, N = 4, 256, 64
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)

    def fn(x_l, w_l):
        return ring_allreduce_dot(x_l, w_l, "model")

    f = jax.shard_map(fn, mesh=mesh,
                      in_specs=(P(None, "model"), P("model", None)),
                      out_specs=P(), check_vma=False)
    with jax.set_mesh(mesh):
        got = np.asarray(jax.jit(f)(x, w))
    want = np.asarray(x) @ np.asarray(w)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ring_reduce_scatter_dot_chunks(rng):
    mesh = make_mesh(data=2, model=4)
    M, K, N = 2, 128, 32
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)

    def fn(x_l, w_l):
        return ring_reduce_scatter_dot(x_l, w_l, "model")

    # out_specs P(None, "model"): device d's [M, N/P] chunk is column-shard d
    f = jax.shard_map(fn, mesh=mesh,
                      in_specs=(P(None, "model"), P("model", None)),
                      out_specs=P(None, "model"), check_vma=False)
    with jax.set_mesh(mesh):
        got = np.asarray(jax.jit(f)(x, w))
    want = np.asarray(x) @ np.asarray(w)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ring_allreduce_matches_psum_reference(rng):
    """Directly compare against the unfused shard_map psum formulation."""
    mesh = make_mesh(data=1, model=8)
    M, K, N = 3, 512, 128
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)

    def ring(x_l, w_l):
        return ring_allreduce_dot(x_l, w_l, "model")

    def bulk(x_l, w_l):
        return jax.lax.psum(
            jnp.dot(x_l, w_l, preferred_element_type=jnp.float32), "model")

    specs = dict(in_specs=(P(None, "model"), P("model", None)), out_specs=P(),
                 check_vma=False)
    with jax.set_mesh(mesh):
        a = np.asarray(jax.jit(jax.shard_map(ring, mesh=mesh, **specs))(x, w))
        b = np.asarray(jax.jit(jax.shard_map(bulk, mesh=mesh, **specs))(x, w))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
