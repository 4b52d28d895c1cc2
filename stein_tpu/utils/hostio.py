"""Host <-> device reads that work on multi-controller meshes.

Outputs of a jit over a mesh spanning processes are not fully addressable;
np.asarray/float on them raise. Every host-read in the package goes
through these two helpers."""

import numpy as np


def host_array(x):
    """Full value of a (possibly cross-process-sharded) array on host.
    Replicated or sharded multi-controller arrays are assembled with a
    collective allgather — all processes must call this together."""
    if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
        from jax.experimental import multihost_utils
        x = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x)


def host_scalar(x):
    """Python float of a device scalar, including replicated
    multi-controller outputs (every process holds the value in its local
    shard — no collective needed)."""
    if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
        return float(np.asarray(x.addressable_shards[0].data))
    return float(x)
