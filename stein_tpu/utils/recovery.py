"""Crash recovery: periodically checkpointed training loop.

The reference's training is a bare for loop — a crash loses all state
(SURVEY.md §5, examples/logistic_regression/main.py:72-79). Here the full
sampler state checkpoints atomically every ``ckpt_every`` steps, and the
loop resumes from the last checkpoint on restart — the recovery story for
long single-host runs and for multi-host jobs that restart from a common
step (each host re-places leaves onto its mesh shards via the
sharding-aware restore)."""

import math
import os

import jax

from .checkpoint import save_checkpoint


def _atomic_save(path, state):
    tmp = path + ".tmp"
    save_checkpoint(tmp, state)   # lands at exactly tmp (checkpoint.py);
    if jax.process_index() == 0:  # only process 0 wrote (race-free guard)
        os.replace(tmp, path)


def train_with_recovery(sampler, n_iters, make_batches, ckpt_path,
                        ckpt_every=1000, on_checkpoint=None,
                        check_finite=True):
    """Drive ``sampler`` for ``n_iters`` total steps with periodic atomic
    checkpoints, resuming from ``ckpt_path`` if it exists.

    Parameters
    ----------
    make_batches : callable (start_step, k) -> batches pytree with leading
        [k] axis — the k minibatches for steps [start_step, start_step+k).
        Must be deterministic in start_step if bit-identical resume is
        desired.
    on_checkpoint : optional callable (step, aux) invoked after each saved
        chunk (metrics/eval hook).

    Returns the number of steps actually executed in this invocation.
    """
    import jax.numpy as jnp

    from .hostio import host_scalar

    # ckpt_path must be on storage visible to every process of a
    # multi-controller job (only process 0 writes; all read). The
    # resume decision is broadcast from process 0 so all processes take
    # the same branch even if filesystem visibility races.
    exists = os.path.exists(ckpt_path)
    if jax.process_count() > 1:
        import numpy as _np
        from jax.experimental import multihost_utils
        exists = bool(
            multihost_utils.broadcast_one_to_all(_np.asarray(exists))
        )
    if exists:
        sampler.restore(ckpt_path)
    executed = 0
    while (done := int(sampler.state.step)) < n_iters:
        k = min(ckpt_every, n_iters - done)
        aux = sampler.train_on_batches(make_batches(done, k))
        if check_finite:
            # Divergence detection (failure-detection subsystem,
            # SURVEY.md §5): refuse to overwrite the last good checkpoint
            # with non-finite state — restart resumes from it. The probe
            # is the POST-update particle sum (any NaN/Inf coordinate
            # makes it non-finite), not the pre-update phi norm, so
            # divergence on the chunk's final step is caught too.
            probe = host_scalar(jnp.sum(sampler.state.particles))
            if not (math.isfinite(probe)
                    and math.isfinite(host_scalar(aux["phi_norm"][-1]))):
                # r3 review: only claim a resumable checkpoint when one
                # was actually written (resumed run or >= 1 completed
                # chunk) — divergence in the FIRST chunk of a fresh run
                # has nothing to resume from, and pointing an operator
                # at a fictional file makes the restart silently replay
                # the same divergence as a brand-new run.
                ckpt_note = (
                    f"last good checkpoint at {ckpt_path} (step {done})"
                    if exists or executed > 0 else
                    f"no checkpoint was written yet ({ckpt_path} does "
                    "not exist — divergence in the first chunk of a "
                    "fresh run; fix the model/hyperparameters before "
                    "restarting)"
                )
                raise FloatingPointError(
                    f"SVGD diverged (non-finite state) in steps "
                    f"[{done}, {done + k}); {ckpt_note}"
                )
        _atomic_save(ckpt_path, sampler.state)
        executed += k
        if on_checkpoint is not None:
            on_checkpoint(int(sampler.state.step), aux)
    return executed
