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
    leaves, _ = jax.tree_util.tree_flatten(state)

    def to_host(leaf):
        if (hasattr(leaf, "is_fully_addressable")
                and not leaf.is_fully_addressable):
            # Multi-controller mesh: assemble the global value.
            from jax.experimental import multihost_utils
            leaf = multihost_utils.process_allgather(leaf, tiled=True)
        return np.asarray(leaf)

    arrays = {f"leaf_{i}": to_host(leaf) for i, leaf in enumerate(leaves)}
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
            restored.append(jax.device_put(arr, sharding))
        else:
            restored.append(jax.device_put(arr))
    return jax.tree_util.tree_unflatten(treedef, restored)
