"""Device mesh construction and multi-host runtime init.

The reference is single-process/single-node with no parallelism
(SURVEY.md §2.3); this module supplies the TPU-native scale-out layer:
a named ('data', 'model') mesh for GSPMD/pjit — data parallelism multiplexes
concurrent utterances, model parallelism tensor-shards LLM weights + KV
heads over ICI — and `jax.distributed` initialization for multi-host pods
(ICI within a slice, DCN across hosts).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize the multi-host runtime (no-op for single process).

    On TPU pods the arguments come from the environment; on CPU test
    clusters pass them explicitly."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(data: int | None = None, model: int | None = None,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    Defaults: put all devices on 'model' (TP) for a single big model, or
    split as requested.  `data * model` must equal the device count."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None and model is None:
        data, model = 1, n
    elif data is None:
        data = n // model
    elif model is None:
        model = n // data
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))
