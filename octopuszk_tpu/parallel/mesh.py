"""Device mesh and sharding helpers.

The reference distributes work as index-keyed Spark RDD partitions
(Configuration.java:40-91, SparkUtils.numPartitions); the TPU-native
equivalent is a 1-D ``jax.sharding.Mesh`` over all chips with every field
vector / point batch sharded on its batch (last) axis.  Co-sharding by
index makes the reference's scalar⋈point joins a no-op (SURVEY.md §2).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "shard"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Limb tensors are [L, n]: shard the batch (last) axis."""
    return NamedSharding(mesh, P(None, AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_vector(mesh: Mesh, x):
    """Place uint32[L, n] with the batch axis sharded."""
    return jax.device_put(x, batch_sharding(mesh))


def shard_point_batch(mesh: Mesh, p):
    """Place a Jacobian point batch with every coord batch-sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda c: jax.device_put(c, sh), p)


def replicate_point(mesh: Mesh, p):
    return jax.tree_util.tree_map(
        lambda c: jax.device_put(c, replicated(mesh)), p)
