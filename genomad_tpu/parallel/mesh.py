"""Device mesh and sharding helpers.

The pipeline uses a 2-D logical mesh:

  * ``data`` — batch/data parallelism: contig windows and ORF batches are
    split across this axis (replaces the reference's multiprocessing pools,
    genomad/prodigal.py:23-29 and TF batch streaming).
  * ``db``   — database-shard parallelism: the marker-profile database is
    partitioned across this axis; per-shard best hits merge with an
    allreduce-max (replaces MMseqs2 ``--splits`` serial chunking,
    genomad/mmseqs2.py:83-95).

On a single chip both axes have size 1 and every sharding collapses to a
no-op, so the same jitted programs run everywhere.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_db: int = 1, devices=None) -> Mesh:
    """Create a (data, db) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_db
    devices = np.asarray(devices[: n_data * n_db]).reshape(n_data, n_db)
    return Mesh(devices, axis_names=("data", "db"))


def balanced_factorization(n_devices: int) -> tuple[int, int]:
    """(n_data, n_db) for a production mesh: the largest power-of-two db
    axis not exceeding sqrt(2 * n_devices), remainder on data. db sharding
    bounds per-device DB memory; data carries query-batch parallelism —
    pair batches shard over BOTH axes (ops.protein_search), so any split
    balances compute and the choice only trades HBM footprint against
    per-shard staging overhead. 8 devices -> (2, 4); 4 -> (2, 2);
    2 -> (1, 2); 1 -> (1, 1)."""
    n_db = 1
    while n_db * 2 <= n_devices and (n_db * 2) ** 2 <= 2 * n_devices:
        n_db *= 2
    while n_devices % n_db:
        n_db //= 2
    return n_devices // n_db, n_db


def initialize_distributed() -> bool:
    """Multi-host entry point: call ``jax.distributed.initialize()`` when a
    coordinator is configured in the environment, making ``jax.devices()``
    global across hosts so the (data, db) mesh spans the pod — db shards
    ride ICI within a slice, the data axis crosses hosts over DCN
    (SURVEY §2.5). A no-op on a single host. Returns True when
    distributed mode was initialized.

    On TPU pods ``jax.distributed.initialize()`` auto-detects the cluster;
    for generic clusters (and the 2-process CPU smoke test) the explicit
    coordinates come from GENOMAD_TPU_COORDINATOR (host:port),
    GENOMAD_TPU_NUM_PROCESSES and GENOMAD_TPU_PROCESS_ID."""
    import os

    if not (
        os.environ.get("GENOMAD_TPU_MULTIHOST")
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
    ):
        return False
    kwargs = {}
    if os.environ.get("GENOMAD_TPU_COORDINATOR"):
        kwargs = dict(
            coordinator_address=os.environ["GENOMAD_TPU_COORDINATOR"],
            num_processes=int(os.environ["GENOMAD_TPU_NUM_PROCESSES"]),
            process_id=int(os.environ["GENOMAD_TPU_PROCESS_ID"]),
        )
    jax.distributed.initialize(**kwargs)
    return True


def put_global(arr, sharding):
    """``jax.device_put`` that also works when the sharding spans devices of
    OTHER processes (multi-host): every process holds the full host value
    and contributes just its addressable shards. Single-process shardings
    take the plain device_put fast path."""
    if all(
        d.process_index == jax.process_index() for d in sharding.device_set
    ):
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def db_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (profile) axis across the 'db' mesh axis."""
    return NamedSharding(mesh, P("db"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple
