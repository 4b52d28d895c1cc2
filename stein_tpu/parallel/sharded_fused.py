"""Mesh-capable fused SVGD step: the single-device fused tail
(ops/pallas_step.py) split at its collectives.

The r3 fused kernels collapsed the small-n step into ONE Pallas
invocation — but a kernel cannot contain mesh collectives, so they were
single-device only, locking pods out of exactly the dispatch-bound
small-n-per-shard regime where they pay (VERDICT r3 item #1). Measured
on a 1-device mesh (degenerate collectives, n=1000/p=128,
benchmarks/mesh_fused_probe.py): the warm mesh step costs 58.5 us (XLA)
/ 49.3 us (Pallas tile) vs 24.8 us for the single-device fused tail —
the gap this module recovers.

The split, per shard (all_gather comm, warm bisect median, RBF):

  XLA   : per-particle gradients (vmap(value_and_grad))
  coll 1: all_gather theta / grads (the kernel-tile column blocks)
  KERNEL: fused bracket pass — the median block's Gram IN-KERNEL
          (centered, bf16-class dot — the fused_gram numerics class)
          fused with the block range + all bracket endpoint counts
          (ops/pallas_median.fused_bracket_pass)
  coll 2: ONE pmax (range) + ONE batched psum (bracket counts)
  XLA   : quad-ary rounds over the emitted D_sub — one fused count
          kernel + one batched psum per round (shared _quad_rounds:
          the identical interval arithmetic as every other warm search)
  KERNEL: streaming RBF tile — D recomputed in-kernel from the SAME
          center, K never in HBM, regrouped single contraction
          (ops/pallas_svgd.pallas_svgd_both_ksum)
  coll 3: psum of the local ||phi||^2 partial (global clip,
          reference abstract_stein_sampler.py:125)
  XLA   : phi combine + clip scale + optimizer update (epilogue='xla',
          the measured default: the fused_epilogue kernel A/B'd a WASH
          here too — 44.6 vs 44.1 us on the 1-device mesh — XLA fuses
          the small-n tail as well as the large-n one; epilogue='fused'
          keeps the kernel as the documented switch).

Measured (1-device mesh, n=1000/p=128, benchmarks/mesh_fused_probe.py):
44.1 us vs 49.3 (best prior mesh config, Pallas tile) and 58.8 (mesh
default, XLA) — 11-25% off the mesh step; the remaining gap to the
single-device 24.8 us is the collective-adjacent structure a real mesh
must keep (attribution: ~3.5 us per quad-ary round chain, ~5 us in the
median block size, ~10 us XLA gradients).

Global-semantics anchors: the median counts psum over ALL n^2 entries'
representatives (compute_median.py:4-16 via the warm-bracket bound) and
the clip norm psums before any particle moves
(abstract_stein_sampler.py:125) — every shard agrees on med, h2, and
the clip scale bitwise.
"""

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.median import (
    DEFAULT_BRACKETS,
    _local_row_idx,
    sharded_bisect_median,
    sharded_warm_from_bracket,
    sharded_warm_from_grid,
)
from ..ops.pallas_median import (
    bracket_pass_fits,
    fused_bracket_grid_pass,
    fused_bracket_pass,
)
from ..ops.pallas_step import fused_epilogue
from ..ops.pallas_svgd import pallas_svgd_both_ksum
from ..ops.rbf import bandwidth_sq_from_median
from ..api import _make_grad_all
from .sharded import SVGDState, _state_specs


def make_sharded_fused_warm_step(log_p, unravel_fn, gd, n_particles,
                                 state, mesh, particle_axis="particles",
                                 max_phi_norm=10.0, remat=False,
                                 median_max_rows=512, median_passes=30,
                                 warm_passes=8, pallas_block=256,
                                 pallas_interpret=False,
                                 brackets=DEFAULT_BRACKETS,
                                 epilogue="xla", quadratic_form=None,
                                 median_collectives="grid",
                                 median_grid_g1=16,
                                 comm="all_gather", custom_grads=None):
    """Build (warm_step_fn, init_med_fn) — the same contract as
    parallel/sharded.make_sharded_warm_step — for the fused mesh step.
    f32 / RBF / all_gather / 1-D particle mesh only (api.py guards);
    numerics class: the in-kernel centered Gram feeds BOTH the median
    counts and the kernel tiles (the single-device fused_gram class,
    pinned statistically), so medians/trajectories match the XLA mesh
    step to that class, not bitwise.

    ``quadratic_form`` (optional; the fused_glm model hook — an
    explicit log_p(w) = -0.5 w^T A w + b^T w + const) changes the
    COMMUNICATION structure, not just the compute: gradients
    b - theta A are derivable from the GATHERED particle block by one
    [n, p] x [p, p] MXU dot, so the step gathers ONLY theta — HALF the
    all-gather bytes (the dominant ICI volume of the all-gather layout)
    — and drops the per-shard vmap-autodiff stage entirely. Per-
    particle log_p values come from the local rows' quadratics.

    ``median_collectives`` picks the warm search's collective structure:
    'grid' (default, r5) fuses the first refinement round into the
    bracket kernel's grid counts and derives the fallback range from the
    gathered block — TWO batched psums total (fused_bracket_grid_pass +
    sharded_warm_from_grid; same width/256 bound); 'rounds' keeps the r4
    chain (pmax + cnts psum + one psum per quad-ary round) as the
    documented A/B arm.

    ``comm='ring'`` (r5): NO [n, p] all_gather anywhere. The warm
    median circulates each shard's tiny [m_loc, p] subsample-row packet
    with ppermute — every rotation runs the SAME grid-bracket kernel on
    (visiting rows x local columns), counts are additive across
    rotations, and the per-shard D buffer ends up [m_global, n_loc]
    (the all-gather layout's [m_loc, n] transposed across shards: the
    identical global (row, col) multiset, so the identical
    compute_median.py:4-16 semantics). grid-only (the rounds chain
    would re-count the buffer per round for no benefit). The kernel
    tiles then circulate [n_loc, 2p] gt blocks (the r3 ring pass); with
    ``quadratic_form`` only theta circulates ([n_loc, p] — the GLM
    halving carries over: each shard recomputes the visiting block's
    gradients b - theta_blk A with one local MXU dot). The global clip
    (abstract_stein_sampler.py:125) psums exactly as in all-gather
    mode. Extra collectives vs all-gather: one [p] center psum + one
    scalar hi_bound pmax (the gathered block is not available to
    derive them from)."""
    axis = particle_axis
    n_dev = mesh.shape[axis]
    if n_particles % n_dev != 0:
        raise ValueError(
            f"n_particles={n_particles} must divide evenly over the "
            f"{n_dev}-way particle axis {axis!r}"
        )
    if epilogue not in ("fused", "xla"):
        raise ValueError(f"unknown epilogue mode: {epilogue!r}")
    if median_collectives not in ("grid", "rounds"):
        raise ValueError(
            f"unknown median_collectives mode: {median_collectives!r}"
        )
    if comm not in ("all_gather", "ring"):
        raise ValueError(f"unknown comm mode: {comm!r}")
    if comm == "ring" and median_collectives != "grid":
        raise ValueError(
            "comm='ring' fused_shard supports median_collectives='grid' "
            "only (the rounds chain would re-count the ring D buffer "
            "once per quad-ary round for strictly more collectives)"
        )
    n_loc = n_particles // n_dev
    p = state.particles.shape[1]
    # Mirror of _local_row_idx's m (that helper needs the runtime axis;
    # the gate needs the value at build time).
    m_loc = max(min(median_max_rows // n_dev, n_loc), 1)
    # Ring blocks are (visiting rows x LOCAL columns) — n_dev x smaller.
    n_cols_blk = n_loc if comm == "ring" else n_particles
    if not bracket_pass_fits(m_loc, n_cols_blk, p):
        raise ValueError(
            "step_impl='fused_shard': the fused bracket pass's "
            f"[{m_loc}, {n_cols_blk}] median block (+ operands) "
            "exceeds its VMEM gate; lower median_max_rows or use the "
            "unfused mesh step (step_impl='xla')"
        )

    # Per-shard gradient stage: vmap-autodiff, or the row-local
    # custom_grads hook (api.py guards meshes with a model axis).
    grad_all = _make_grad_all(log_p, unravel_fn, remat, custom_grads)

    def spmd_fused_step(carry, batch):
        state, med_prev = carry
        theta_loc = state.particles                      # [n_loc, p]
        if quadratic_form is not None:
            # GLM path: gather theta ONLY (half the collective bytes);
            # gradients b - theta A from the gathered block, one MXU
            # dot, replicated per shard. log_p values from the local
            # rows' quadratics (aux only).
            A_eff, b_eff, const = quadratic_form(batch)
            theta_all = jax.lax.all_gather(theta_loc, axis, tiled=True)
            G_all = jnp.matmul(theta_all, A_eff,
                               precision=jax.lax.Precision.HIGH)
            grads_all = b_eff.reshape(1, -1) - G_all
            n0 = jax.lax.axis_index(axis) * n_loc
            G_loc = jax.lax.dynamic_slice_in_dim(G_all, n0, n_loc, 0)
            log_p_vals = (
                jnp.sum(theta_loc * (b_eff.reshape(1, -1) - 0.5 * G_loc),
                        axis=1)
                + const
            )
        else:
            log_p_vals, grads_loc = grad_all(theta_loc, batch)
            theta_all = jax.lax.all_gather(theta_loc, axis, tiled=True)
            grads_all = jax.lax.all_gather(grads_loc, axis, tiled=True)
        # The ONE center anchoring every in-kernel Gram this step (the
        # bracket pass AND the tiles AND the combine): the global
        # particle mean, derived from the gathered block so every shard
        # computes the identical value (see pallas_svgd_both_ksum).
        center = jnp.mean(theta_all, axis=0, keepdims=True)

        idx, m_global = _local_row_idx(n_loc, axis, median_max_rows)
        if median_collectives == "grid":
            # Shard-identical fallback range bound from the gathered
            # block: D_ij = |a-b|^2 <= 4 max_i |x_i - center|^2 (exact
            # algebra; 1e-4 headroom covers the in-kernel bf16-class
            # Gram's excess) — no pmax needed.
            rsq_all = jnp.sum((theta_all - center) ** 2, axis=1)
            hi_bound = 4.0 * jnp.max(rsq_all) * 1.0001 + 1e-30
            D_sub, cnts = fused_bracket_grid_pass(
                theta_loc[idx], theta_all, med_prev, center, hi_bound,
                brackets=brackets, g1=median_grid_g1,
                interpret=pallas_interpret,
            )
            med = sharded_warm_from_grid(
                D_sub, med_prev, cnts, hi_bound, axis,
                total=m_global * n_particles, warm_passes=warm_passes,
                brackets=brackets, g1=median_grid_g1,
            )
        else:
            D_sub, mm, cnts = fused_bracket_pass(
                theta_loc[idx], theta_all, med_prev, center,
                brackets=brackets, interpret=pallas_interpret,
            )
            med = sharded_warm_from_bracket(
                D_sub, med_prev, mm, cnts, axis,
                total=m_global * n_particles, warm_passes=warm_passes,
                brackets=brackets,
            )
        h2 = bandwidth_sq_from_median(med, n_particles)

        ku, ksum = pallas_svgd_both_ksum(
            theta_loc, theta_all, grads_all, h2, center,
            block_i=pallas_block, block_j=pallas_block,
            interpret=pallas_interpret,
        )
        return _finish(state, theta_loc, ku, ksum, center, h2, med,
                       log_p_vals)

    def _finish(state, theta_loc, ku, ksum, center, h2, med, log_p_vals):
        """Shared tail of the all-gather and ring fused steps: phi
        combine, psum'd global clip (abstract_stein_sampler.py:125),
        optimizer update (fused or XLA epilogue), aux dict."""
        tc = theta_loc - center
        phi = (ku + ksum * tc / h2) / n_particles
        norm = jnp.sqrt(jax.lax.psum(jnp.sum(phi * phi), axis))
        if epilogue == "fused":
            new_theta, opt_state = fused_epilogue(
                ku, ksum, theta_loc, center, h2, norm, state.opt_state,
                gd, max_phi_norm=max_phi_norm, n_total=n_particles,
                interpret=pallas_interpret,
            )
        else:
            c = jnp.asarray(max_phi_norm, theta_loc.dtype)
            delta, opt_state = gd.update(
                state.opt_state, phi * (c / jnp.maximum(c, norm))
            )
            new_theta = theta_loc + delta
        new_state = SVGDState(new_theta, opt_state, state.step + 1)
        aux = {
            "phi_norm": norm,
            "log_p_mean": jax.lax.pmean(jnp.mean(log_p_vals), axis),
            "h2": h2,
            "median": med,
        }
        return (new_state, med), aux

    def spmd_fused_ring_step(carry, batch):
        state, med_prev = carry
        theta_loc = state.particles                      # [n_loc, p]
        perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]
        f32 = jnp.float32
        if quadratic_form is not None:
            A_eff, b_eff, const = quadratic_form(batch)
            b_row = b_eff.reshape(1, -1)
            G_loc = jnp.matmul(theta_loc, A_eff,
                               precision=jax.lax.Precision.HIGH)
            # No local gradient block here: the ring tile loop derives
            # each VISITING block's gradients from the quadratic
            # algebra per rotation (incl. rotation 0's own block) —
            # only theta circulates, the GLM comm halving.
            log_p_vals = (
                jnp.sum(theta_loc * (b_row - 0.5 * G_loc), axis=1)
                + const
            )
        else:
            log_p_vals, grads_loc = grad_all(theta_loc, batch)

        # The global center and the fallback-range bound cannot come
        # from a gathered block here: one tiny [p] psum + one scalar
        # pmax (same 4x max centered row-norm^2 algebra as the
        # all-gather grid arm).
        center = jax.lax.psum(
            jnp.sum(theta_loc.astype(f32), axis=0, keepdims=True), axis,
        ) / n_particles
        rsq_loc = jnp.sum((theta_loc - center) ** 2, axis=1)
        hi_bound = (4.0 * jax.lax.pmax(jnp.max(rsq_loc), axis) * 1.0001
                    + 1e-30)

        # Warm median, ring form: circulate each shard's [m_loc, p]
        # subsample-row packet; every rotation counts the SAME grid
        # edges on (visiting rows x local cols) — counts are additive —
        # and banks the D block so the g2 round needs no recompute. The
        # packet is tiny (m_loc ~ 16-64 rows), so the median adds
        # negligible ring bytes on top of the tile circulation.
        idx, m_global = _local_row_idx(n_loc, axis, median_max_rows)
        me = jax.lax.axis_index(axis)
        n_cnt = (len(brackets) + 1) * (median_grid_g1 + 1)

        def med_body(t, carry_m):
            D_buf, cnts_acc, rows = carry_m
            D_blk, cnts = fused_bracket_grid_pass(
                rows, theta_loc, med_prev, center, hi_bound,
                brackets=brackets, g1=median_grid_g1,
                interpret=pallas_interpret,
            )
            # Rotation t's packet originated at shard (me - t): bank its
            # block at that shard's slot (layout only matters for the g2
            # recount, which is order-invariant — but keep it stable).
            src = (me - t) % n_dev
            row0 = (src * idx.shape[0]).astype(jnp.int32)
            D_buf = jax.lax.dynamic_update_slice(
                D_buf, D_blk, (row0, jnp.zeros((), jnp.int32)))
            rows = jax.lax.ppermute(rows, axis, perm)
            return D_buf, cnts_acc + cnts, rows

        D_buf0 = jnp.zeros((m_global, n_loc), f32)
        cnts0 = jnp.zeros((n_cnt,), jnp.int32)
        D_buf, cnts_loc, _ = jax.lax.fori_loop(
            0, n_dev, med_body, (D_buf0, cnts0, theta_loc[idx]),
        )
        med = sharded_warm_from_grid(
            D_buf, med_prev, cnts_loc, hi_bound, axis,
            total=m_global * n_particles, warm_passes=warm_passes,
            brackets=brackets, g1=median_grid_g1,
        )
        h2 = bandwidth_sq_from_median(med, n_particles)

        # Kernel tiles, ring form (the r3 ring pass structure): with a
        # quadratic_form only theta circulates — each shard recomputes
        # the visiting block's gradients with one [n_loc, p] x [p, p]
        # dot (HALF the ring bytes); otherwise gt = [grads|theta]
        # circulates as one [n_loc, 2p] block.
        def tile(theta_blk, grads_blk, acc_ku, acc_ksum):
            t_ku, t_ksum = pallas_svgd_both_ksum(
                theta_loc, theta_blk, grads_blk, h2, center,
                block_i=pallas_block, block_j=pallas_block,
                interpret=pallas_interpret,
            )
            return acc_ku + t_ku, acc_ksum + t_ksum

        acc_ku0 = jnp.zeros((n_loc, p), f32)
        acc_ksum0 = jnp.zeros((n_loc, 1), f32)
        if quadratic_form is not None:
            def tile_body(i, carry_t):
                acc_ku, acc_ksum, theta_blk = carry_t
                grads_blk = b_row - jnp.matmul(
                    theta_blk, A_eff, precision=jax.lax.Precision.HIGH)
                acc_ku, acc_ksum = tile(theta_blk, grads_blk,
                                        acc_ku, acc_ksum)
                theta_blk = jax.lax.ppermute(theta_blk, axis, perm)
                return acc_ku, acc_ksum, theta_blk

            ku, ksum, _ = jax.lax.fori_loop(
                0, n_dev, tile_body, (acc_ku0, acc_ksum0, theta_loc),
            )
        else:
            gt0 = jnp.concatenate([grads_loc, theta_loc], axis=1)

            def tile_body(i, carry_t):
                acc_ku, acc_ksum, gt = carry_t
                acc_ku, acc_ksum = tile(gt[:, p:], gt[:, :p],
                                        acc_ku, acc_ksum)
                gt = jax.lax.ppermute(gt, axis, perm)
                return acc_ku, acc_ksum, gt

            ku, ksum, _ = jax.lax.fori_loop(
                0, n_dev, tile_body, (acc_ku0, acc_ksum0, gt0),
            )
        return _finish(state, theta_loc, ku, ksum, center, h2, med,
                       log_p_vals)

    state_specs = _state_specs(state, n_particles, axis)
    carry_specs = (state_specs, P())
    aux_specs = {"phi_norm": P(), "log_p_mean": P(), "h2": P(),
                 "median": P()}

    warm_step_fn = jax.shard_map(
        spmd_fused_ring_step if comm == "ring" else spmd_fused_step,
        mesh=mesh,
        in_specs=(carry_specs, P()),
        out_specs=(carry_specs, aux_specs),
        check_vma=False,
    )

    if comm == "ring":
        # Cold seed without a gather either (the r3 ring search — the
        # strided row block assembled by circulation, bitwise the same
        # counts as the all-gather seed).
        from ..ops.median import ring_bisect_median

        def init_spmd(theta_loc):
            return ring_bisect_median(
                theta_loc, axis, max_rows=median_max_rows,
                passes=median_passes,
            )
    else:
        def init_spmd(theta_loc):
            theta_all = jax.lax.all_gather(theta_loc, axis, tiled=True)
            return sharded_bisect_median(
                theta_loc, theta_all, axis,
                max_rows=median_max_rows, passes=median_passes,
            )

    init_med_fn = jax.jit(jax.shard_map(
        init_spmd, mesh=mesh, in_specs=P(axis, None), out_specs=P(),
        check_vma=False,
    ))
    return warm_step_fn, init_med_fn
