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
