"""Checkpoint / resume for the full sampler state.

The reference has no checkpointing (SURVEY.md §5): a crash loses all state.
Here the entire mutable state is the SVGDState pytree {particles, optimizer
moments, step count} plus the decayed learning rate inside the optimizer
state — saved as a flat .npz, restored sharding-aware by re-placing each
leaf with the sharding of a template state (so a multi-host run restores
straight back onto its mesh)."""

import numpy as np
import jax


def save_checkpoint(path, state):
    """Serialise a state pytree to ``path`` (npz format; the file lands at
    exactly ``path`` regardless of extension).

    Writes through a side-named temp file so np.savez's implicit '.npz'
    suffix can never clobber an unrelated ``path + '.npz'`` file, and the
    final rename is atomic."""
    import os
    from .hostio import host_array
    leaves, _ = jax.tree_util.tree_flatten(state)
    # The allgather inside host_array is collective: every process in a
    # multi-controller job must reach this point...
    arrays = {f"leaf_{i}": host_array(leaf) for i, leaf in enumerate(leaves)}
    # ...but only process 0 writes (on shared storage N racing writers of
    # the same path would be redundant at best).
    if jax.process_index() != 0:
        return
    tmp = str(path) + f".saving{os.getpid()}"
    np.savez(tmp, **arrays)             # np.savez writes tmp + '.npz'
    written = tmp if os.path.exists(tmp) else tmp + ".npz"
    os.replace(written, path)


def restore_checkpoint(path, like_state):
    """Restore a state pytree saved by save_checkpoint.

    ``like_state`` supplies the tree structure, dtypes, and shardings; each
    restored leaf is device_put with the corresponding template leaf's
    sharding, so restoring onto a mesh-sharded sampler lands the particles
    back on their shards."""
    data = np.load(path)
    like_leaves, treedef = jax.tree_util.tree_flatten(like_state)
    if len(data.files) != len(like_leaves):
        raise ValueError(
            f"checkpoint has {len(data.files)} leaves, template has "
            f"{len(like_leaves)}"
        )
    restored = []
    for i, like in enumerate(like_leaves):
        arr = data[f"leaf_{i}"]
        if arr.shape != like.shape:
            raise ValueError(
                f"leaf {i}: checkpoint shape {arr.shape} != template "
                f"shape {like.shape}"
            )
        arr = arr.astype(like.dtype)
        sharding = getattr(like, "sharding", None)
        if sharding is not None:
            # Multi-controller-safe placement (device_put cannot address
            # remote shards of a cross-process mesh).
            from ..parallel.sharded import _place_global
            restored.append(_place_global(arr, sharding))
        else:
            restored.append(jax.device_put(arr))
    return jax.tree_util.tree_unflatten(treedef, restored)
