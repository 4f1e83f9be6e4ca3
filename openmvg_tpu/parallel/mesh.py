"""Device mesh helpers.

The reference has no multi-node story (OpenMP only, SURVEY §2.8); here the
scaling axis is a 1-D 'hosts' mesh: pair lists and observation tables are
partitioned across it, parameters replicated, reductions ride ICI psum.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis="hosts"):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_leading(mesh, axis="hosts"):
    return NamedSharding(mesh, P(axis))


def replicated(mesh):
    return NamedSharding(mesh, P())


def pad_to_multiple(a, m, fill=0):
    n = a.shape[0]
    k = (n + m - 1) // m * m
    if k == n:
        return a
    pad = np.full((k - n,) + a.shape[1:], fill, dtype=a.dtype)
    return np.concatenate([a, pad], axis=0)
