"""Multi-chip attention sharding: mesh construction + shard_map wrappers.

The reference is single-device (SURVEY.md section 2.6 absence table); this
layer is the TPU-native extension: a (data, model) mesh where the batch is
data-parallel and attention heads are tensor-parallel, with GQA co-location
(each group of q heads lands on the chip holding its kv head — zero
communication during attention). Sequence-parallel ring attention lives in
parallel/ring.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax

import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from tiny_flash_attention_tpu.ops.flash import flash_attention


def make_mesh(n_devices: Optional[int] = None,
              data: Optional[int] = None,
              model: Optional[int] = None,
              axis_names=("data", "model")) -> Mesh:
    """Builds a 2-D (data, model) mesh over the first n devices.

    Default split: model axis gets the largest power-of-two <= sqrt(n), the
    rest is data. Override with explicit data/model sizes.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if model is None:
        if data is not None:
            model = n_devices // data
        else:
            model = 1
            while model * 2 <= int(np.sqrt(n_devices)) * 2 and \
                    n_devices % (model * 2) == 0 and model * 2 <= n_devices:
                model *= 2
    if data is None:
        data = n_devices // model
    assert data * model == n_devices, (data, model, n_devices)
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names)


def sharded_flash_attention(mesh: Mesh, *, causal: bool = False,
                            sm_scale=None, config=None,
                            data_axis: str = "data",
                            model_axis: str = "model"):
    """Head-parallel + data-parallel flash attention via shard_map.

    Layout: batch on the data axis, q heads AND kv heads on the model axis
    (GQA co-location: q_heads % (kv_heads) == 0 and kv_heads % model == 0
    keeps each q-head group with its kv head — no collective during
    attention; only the later output projection all-reduces).
    """
    spec = P(data_axis, model_axis, None, None)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    def _attn(q, k, v):
        return flash_attention(q, k, v, causal=causal, sm_scale=sm_scale,
                               config=config)

    return jax.jit(_attn)
