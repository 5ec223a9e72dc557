"""Worker process for the multi-host smoke test (spawned by
test_multihost.py).  Each process owns 4 virtual CPU devices; together they
form an 8-device (2 hosts x 4) mesh, and a psum must see all 8 devices."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def main():
    coord, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from miotts_tpu.parallel.mesh import init_distributed
    init_distributed(coordinator=coord, num_processes=n_proc, process_id=pid)

    assert jax.process_count() == n_proc, jax.process_count()
    devices = jax.devices()
    assert len(devices) == 4 * n_proc, len(devices)

    mesh = Mesh(np.array(devices).reshape(n_proc, 4), ("data", "model"))

    def body():
        return jax.lax.psum(jnp.ones(()), ("data", "model"))

    f = jax.shard_map(body, mesh=mesh, in_specs=(), out_specs=P())
    total = jax.jit(f)()
    # replicated scalar: every process sees the full device count
    val = float(np.asarray(total).reshape(-1)[0])
    print(f"RESULT {pid} {val}", flush=True)
    assert val == 4 * n_proc, val


if __name__ == "__main__":
    main()
