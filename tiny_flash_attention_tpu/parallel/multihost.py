"""Multi-host bring-up: distributed init + hybrid ICI/DCN mesh construction.

The reference is single-process (SURVEY.md section 2.6: no comm library is
linked anywhere); this is the TPU-native extension for v5e-16-style
deployments: one JAX process per host, chips within a slice reached over
ICI, hosts over DCN. Design per the scaling playbook: put the
fast-collective axes (tensor/context parallel) on ICI and only
data-parallel / pipeline axes on DCN.

Failure policy (SURVEY.md section 5 failure-detection row): bring-up fails
FAST and LOUD — a misconfigured coordinator or a missing host must raise at
init, not hang into the first collective.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    timeout_s: int = 120,
) -> None:
    """Fail-fast wrapper over jax.distributed.initialize.

    With no arguments, relies on the TPU environment (metadata-based
    autodetection). No-op in single-process runs with no coordinator
    configured. Raises RuntimeError with the root cause on any init
    failure instead of letting the job hang.
    """
    configured = (coordinator_address
                  or os.environ.get("JAX_COORDINATOR_ADDRESS")
                  or os.environ.get("COORDINATOR_ADDRESS"))
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    autodetect = (len([w for w in workers.split(",") if w]) > 1
                  or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if not configured and not autodetect:
        return  # single-process run
    try:
        jax.distributed.initialize(
            coordinator_address=configured,
            num_processes=num_processes,
            process_id=process_id,
            initialization_timeout=timeout_s,
        )
    except Exception as e:  # noqa: BLE001 - converting to fail-fast
        raise RuntimeError(
            f"multi-host init failed (coordinator={configured!r}, "
            f"num_processes={num_processes}, process_id={process_id}): {e}"
        ) from e


def make_hybrid_mesh(
    ici_axes: Sequence[str] = ("model",),
    ici_shape: Optional[Sequence[int]] = None,
    dcn_axis: str = "data",
    axis_order: Optional[Sequence[str]] = None,
    num_slices: Optional[int] = None,
) -> Mesh:
    """Builds a mesh with `dcn_axis` across hosts/slices and `ici_axes`
    within a slice.

    Single-slice runs degrade to a plain mesh with dcn size 1, so code
    written against the hybrid layout runs unchanged on one host (and on
    the virtual CPU mesh in tests). `num_slices` overrides slice
    detection — on multi-PROCESS CPU runs (the DCN smoke harness) devices
    carry no slice_index, so pass jax.process_count() to put the dcn axis
    across processes.
    """
    devices = jax.devices()
    n = len(devices)
    if num_slices is None:
        num_slices = max(
            len({getattr(d, "slice_index", 0) for d in devices}), 1)
    per_slice = n // num_slices
    if ici_shape is None:
        ici_shape = [per_slice] + [1] * (len(ici_axes) - 1)
    ici_shape = list(ici_shape)
    assert int(np.prod(ici_shape)) == per_slice, (ici_shape, per_slice)
    assert len(ici_shape) == len(ici_axes), (ici_axes, ici_shape)

    arr = _hybrid_device_array(devices, ici_shape, num_slices)
    names = (dcn_axis,) + tuple(ici_axes)
    if axis_order is not None:
        perm = [names.index(a) for a in axis_order]
        arr = arr.transpose(perm)
        names = tuple(axis_order)
    return Mesh(arr, names)


def _hybrid_device_array(devices, ici_shape, num_slices: int):
    """Device array of shape [num_slices, *ici_shape].

    The leading axis walks DCN (slices); the rest walk ICI within a slice.
    create_hybrid_device_mesh wants mesh_shape and dcn_mesh_shape of EQUAL
    rank whose elementwise product is the result shape, so the ICI shape is
    passed with a leading 1 and the DCN shape as [num_slices, 1, ...] —
    giving [num_slices] + ici_shape, matching the (dcn_axis, *ici_axes)
    mesh names.
    """
    if num_slices > 1:
        if len({getattr(d, "slice_index", 0) for d in devices}) == num_slices:
            from jax.experimental import mesh_utils
            return mesh_utils.create_hybrid_device_mesh(
                mesh_shape=[1] + list(ici_shape),
                dcn_mesh_shape=[num_slices] + [1] * len(ici_shape),
                devices=devices,
            )
        # no slice topology (multi-process CPU smoke): one "slice" per
        # process, devices contiguous within each
        devs = sorted(devices, key=lambda d: (d.process_index, d.id))
        return np.asarray(devs).reshape([num_slices] + list(ici_shape))
    return np.asarray(devices).reshape([1] + list(ici_shape))
