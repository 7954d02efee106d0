"""Device-mesh construction helpers.

The reference has NO functioning distributed layer (SURVEY §2 P1-P3: the
"multi-GPU" flag only changes a print and DataLoader workers). This module is
the TPU-native replacement: a 2-axis `jax.sharding.Mesh`

* ``data`` — views (cameras) per step, classic data parallelism; gradients
  are psum'd across it,
* ``tile`` — horizontal bands of image tiles within a view; each device
  rasterizes its band (the compositing-dominated stage), bands are
  all-gathered only for the SSIM loss.

On real hardware the mesh should be laid out so `tile` (the chatty axis:
band all-gathers every step) rides ICI within a slice and `data` can span
DCN across hosts.
"""

from __future__ import annotations

import jax
import numpy as np

DATA_AXIS = "data"
TILE_AXIS = "tile"


def make_mesh(
    n_devices: int | None = None,
    data: int | None = None,
    tile: int | None = None,
    devices=None,
) -> jax.sharding.Mesh:
    """Build a ('data', 'tile') mesh over the available devices.

    With no explicit split, prefers putting devices on `data` (training
    throughput) and keeps `tile` = 1; pass tile=K for band parallelism.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if data is None and tile is None:
        data, tile = n_devices, 1
    elif data is None:
        assert n_devices % tile == 0, (n_devices, tile)
        data = n_devices // tile
    elif tile is None:
        assert n_devices % data == 0, (n_devices, data)
        tile = n_devices // data
    if data * tile != n_devices:
        raise ValueError(f"data*tile = {data}*{tile} != {n_devices} devices")
    dev_array = np.asarray(devices).reshape(data, tile)
    return jax.sharding.Mesh(dev_array, (DATA_AXIS, TILE_AXIS))


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Bring up the JAX distributed runtime for multi-host training.

    On Cloud TPU pods the arguments are auto-detected from the metadata
    server (`jax.distributed.initialize()` with no args); elsewhere pass
    them explicitly. Idempotent. Returns a summary of the global topology.

    Layout guidance (SURVEY §5.8): put `tile` (the chatty axis — a band
    all-gather every step) on ICI inside each slice and let `data` span DCN
    across hosts; `make_mesh` over `jax.devices()` after this call does so
    naturally because JAX orders devices host-major.
    """
    if num_processes is not None and num_processes > 1:
        # Explicit multi-process request: initialization failures and
        # topology mismatches are FATAL — degrading to single-process here
        # would silently train on 1/N of the pod.
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        got = jax.process_count()
        if got != num_processes:
            raise RuntimeError(
                f"requested {num_processes} processes but the distributed "
                f"runtime reports {got} — pod misconfiguration"
            )
    elif coordinator_address is None and num_processes is None:
        try:  # TPU pod auto-detection; a no-op single-process fallback
            jax.distributed.initialize()
        except Exception as e:
            import logging

            logging.getLogger(__name__).warning(
                "jax.distributed.initialize() auto-detection failed (%s); "
                "continuing SINGLE-PROCESS. Pass coordinator_address/"
                "num_processes/process_id explicitly on a pod.", e,
            )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
