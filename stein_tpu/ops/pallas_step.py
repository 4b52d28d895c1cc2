"""Fully-fused small-n SVGD step tail: ONE Pallas kernel for
warm median -> K -> contractions -> clip -> optimizer.

At small n the step is dispatch-latency bound, not FLOP bound: the n=1000
profile (benchmarks/step_breakdown.py) is ~10 µs of gradients + ~8 µs of
Gram and then ~35 µs spread over a dozen sequential XLA kernels (median
counts, K, contraction, clip reductions, Adam) each costing a few µs of
launch/HBM latency for sub-µs of compute. This kernel keeps everything
after the gradients and the HIGHEST-precision Gram — which stay in XLA so
the deployed D numerics are identical to the XLA path — resident in VMEM
and collapses the tail into one invocation.

Semantics (reference citations in ops/rbf.py / ops/optimizers.py):
- warm median: bitwise-equal to ops/median._warm_search on the same
  strided row block (shared in-kernel helper, ops/pallas_median.py).
- K and phi: the streaming tile's exp2 form (ops/pallas_svgd.py) —
  matches the XLA path to matmul reduction order + the exp2 evaluation
  (~1e-7 relative).
- clip + optimizer: the optimizer's own ``gd.update`` pytree code is
  traced INSIDE the kernel (pure jnp elementwise math — Adam/Adagrad
  quirks included by construction), so the tail stays generic over the
  step rule.

VMEM budget: the kernel holds D and K ([n, n] f32 each) plus the [m, n]
median block and ~11 [n, p] terms (7 named in/out buffers + in-kernel
temporaries) — callers gate on ``fused_step_vmem_bytes`` against
FUSED_STEP_VMEM_BUDGET, which is calibrated to the largest shape measured
to compile (n=1024/p=128, the n=1k bench config).
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .median import DEFAULT_BRACKETS
from .pallas_median import warm_search_on_value

_LOG2E_HALF = -1.4426950408889634 / 2.0


# Gate for the fused tail, shared by the constructor guard and
# throughput_config via fused_step_fits. Calibrated empirically, not
# theoretically: it is fused_step_vmem_bytes(1024, 128, 512) — the
# largest shape MEASURED to compile and run on the deployed 16 MiB/core
# chip (the n=1k bench config; Mosaic's actual buffer reuse keeps real
# usage below the conservative estimate). Shapes whose estimate exceeds
# it are refused up front instead of failing in the remote Mosaic
# compile.
FUSED_STEP_VMEM_BUDGET = 16_252_928


def fused_step_vmem_bytes(n, p, m):
    """Rough live-buffer bound for the fused tail, used by callers to gate
    the option: D + K ([n, n] each), the median block (shares D's buffer
    when m >= n), and eleven [n, p] terms — the seven named in/out buffers
    (theta, grads, 2x Adam moments in, new_theta, 2x moments out) plus the
    in-kernel temporaries Mosaic cannot be assumed to alias away (attract,
    ktheta, phi / delta). The measured worst shape that compiles on the
    deployed 16 MiB/core chip is n=1024 / p=128 / m=512 (the n=1k bench
    config, 15.5 MiB under this estimate — the calibration point for
    FUSED_STEP_VMEM_BUDGET; benchmarks/fused_step_bench.py)."""
    m_extra = 0 if m >= n else m
    return 4 * (2 * n * n + m_extra * n + 11 * n * p)


def fused_step_fits(n, p, median_max_rows=512):
    """Whether the fused step tail fits VMEM for this problem size — the
    single predicate behind both the SVGDSampler guard and
    api.throughput_config."""
    m = min(median_max_rows, n)
    return fused_step_vmem_bytes(n, p, m) <= FUSED_STEP_VMEM_BUDGET


def _glm_grad(theta, A, b_row):
    """In-kernel gradients + mean log_p (minus const) of an explicit
    quadratic log-posterior log_p(w) = -0.5 w^T A w + b^T w + const:
    the gradients b - theta A are ONE [n, p] x [p, p] in-kernel dot
    (A symmetric) and the per-particle log_p values come from the shared
    product — sum_i [-0.5 theta_i.G_i + theta_i.b] as one full reduction
    (rank-1 intermediates avoided for Mosaic legalization)."""
    f32 = jnp.float32
    G = jnp.dot(theta, A, preferred_element_type=f32)
    grads = b_row - G
    logp_mean = jnp.sum(theta * (b_row - 0.5 * G)) / theta.shape[0]
    return grads, logp_mean


def _tail_kernel(*refs, meta, gd, max_phi_norm, k, rounds, brackets,
                 n_particles, model_grad=None):
    (n_scalar_in, n_array_in, treedef, scalar_pos, share_dsub,
     gram_in_kernel, n_model_ops) = meta
    # in refs: med, *opt_scalars,
    #          D, [Dsub]            (gram_in_kernel=False)  or
    #          [*model_operands,] [theta_sub]   (gram_in_kernel=True),
    #          theta, [grads,] *opt_arrays (grads absent when model_grad)
    # out refs: new_theta, *new_opt_arrays, *new_opt_scalars, stats
    idx = 0
    med_ref = refs[idx]; idx += 1
    scalar_in = refs[idx:idx + n_scalar_in]; idx += n_scalar_in
    if not gram_in_kernel:
        D_ref = refs[idx]; idx += 1
        if share_dsub:
            # The median block IS the full D (n <= max_rows): one copy.
            Dsub_ref = D_ref
        else:
            Dsub_ref = refs[idx]; idx += 1
    else:
        model_refs = refs[idx:idx + n_model_ops]; idx += n_model_ops
        if not share_dsub:
            theta_sub_ref = refs[idx]; idx += 1
    theta_ref = refs[idx]; idx += 1
    if model_grad is not None:
        grads = None
    else:
        grads_ref = refs[idx]; idx += 1
        grads = grads_ref[:]
    array_in = refs[idx:idx + n_array_in]; idx += n_array_in
    out_theta = refs[idx]; idx += 1
    out_arrays = refs[idx:idx + n_array_in]; idx += n_array_in
    out_scalars = refs[idx:idx + n_scalar_in]; idx += n_scalar_in
    stats_ref = refs[idx]

    theta = theta_ref[:]
    f32 = jnp.float32

    logp_mean = jnp.float32(0.0)
    if model_grad is not None:
        # In-kernel model stage (step_impl='fused_glm'/'fused_model'):
        # the model's per-particle gradients AND log_p values are
        # computed INSIDE the kernel from its staged operands (pure jnp
        # traced here, like the optimizer's update rule) — the whole
        # SVGD step is a single kernel. In-kernel dots run at bf16-class
        # input precision (benchmarks/sym_and_gram_bench.py); models
        # whose gradients need f32-faithful matmuls should stay on
        # step_impl='fused_gram' with XLA gradients.
        grads, logp_mean = model_grad(
            theta, *[r[:] for r in model_refs]
        )

    if gram_in_kernel:
        # D = r + r^T - 2 T T^T (abstract_kernel.py:33-35) on the
        # IN-KERNEL dot: measured ~177 TF/s vs XLA HIGHEST's 33, at
        # bf16-class input precision (~2e-3 rel on D — the precision
        # audit in benchmarks/sym_and_gram_bench.py; Mosaic truncates
        # dot inputs regardless of buffer dtype). This is the SAME
        # numerics class as the large-n streaming tile's in-kernel D
        # (ops/pallas_svgd.py), pinned by the statistical posterior
        # tests — it removes the XLA Gram stage AND D's HBM round-trip.
        # MEAN-CENTERED (D is translation-invariant, the bf16-class
        # error is not: it scales with ||theta||^2 — off-origin clouds
        # degraded to NaN uncentered; benchmarks/centering_probe.py).
        n = theta.shape[0]
        tc = theta - jnp.sum(theta, axis=0, keepdims=True) / n
        rsq = jnp.sum(tc * tc, axis=1, keepdims=True)
        D = (rsq + rsq.reshape(1, n)
             - 2.0 * jnp.dot(tc, tc.T,
                             preferred_element_type=f32))
        if share_dsub:
            Dsub = D
        else:
            # The strided-row median block, from the (XLA-gathered)
            # subsample rows — a second small dot instead of a strided
            # in-kernel load.
            tsub_c = theta_sub_ref[:] - jnp.sum(
                theta, axis=0, keepdims=True) / n
            rsq_sub = jnp.sum(tsub_c * tsub_c, axis=1, keepdims=True)
            Dsub = (rsq_sub + rsq.reshape(1, n)
                    - 2.0 * jnp.dot(tsub_c, tc.T,
                                    preferred_element_type=f32))
    else:
        tc = theta
        D = D_ref[:]
        Dsub = Dsub_ref[:]

    med = warm_search_on_value(
        Dsub, med_ref[0], k=k, rounds=rounds, brackets=brackets,
    )
    h2 = med / jnp.log(jnp.asarray(n_particles, f32))

    K = jnp.exp2(D * (_LOG2E_HALF / h2))
    # Regrouped single contraction (same sum, different grouping — see
    # ops/pallas_svgd._svgd_tile_kernel): K @ (grads - theta_c/h^2)
    # replaces the two dots K@grads and K@theta, halving the tail's
    # contraction MXU work. phi is exactly translation-invariant, so
    # the centered tc (= theta when the gram came from XLA) is valid in
    # both the contraction and the ksum term.
    ku = jnp.dot(K, grads - tc / h2, preferred_element_type=f32)
    ksum = jnp.sum(K, axis=1, keepdims=True)
    phi = (ku + ksum * tc / h2) / n_particles

    # Global norm clip (abstract_stein_sampler.py:125).
    norm = jnp.sqrt(jnp.sum(phi * phi))
    c = jnp.asarray(max_phi_norm, theta.dtype)
    phi = phi * (c / jnp.maximum(c, norm))

    # Rebuild the optimizer state pytree from the refs and run the step
    # rule's own (pure jnp) update inside the kernel.
    leaves = []
    si = iter(scalar_in)
    ai = iter(array_in)
    for is_scalar in scalar_pos:
        leaves.append(next(si)[0] if is_scalar else next(ai)[:])
    opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    # update_kernel (when provided) is the Mosaic-legal reformulation of
    # the step rule (e.g. Adam's float pow -> exp/log); identical math.
    update = getattr(gd, "update_kernel", gd.update)
    delta, new_state = update(opt_state, phi)

    out_theta[:] = theta + delta
    # The write-back below pairs new_state's leaves with the input state's
    # (scalar/array) layout positionally — a custom step rule returning a
    # different pytree structure would silently drop or misassign state
    # leaves. Fail loudly at trace time instead (Adam/Adagrad are fine).
    new_treedef = jax.tree_util.tree_structure(new_state)
    if new_treedef != treedef:
        raise ValueError(
            "fused step: gd.update returned an optimizer state with a "
            f"different pytree structure than its input ({new_treedef} "
            f"vs {treedef}); the fused tail requires a structure-"
            "preserving step rule"
        )
    new_leaves = jax.tree_util.tree_leaves(new_state)
    so = iter(out_scalars)
    ao = iter(out_arrays)
    for is_scalar, leaf in zip(scalar_pos, new_leaves):
        if is_scalar:
            next(so)[0] = leaf
        else:
            next(ao)[:] = leaf
    stats_ref[0] = med
    stats_ref[1] = norm
    stats_ref[2] = h2
    if model_grad is not None:
        stats_ref[3] = logp_mean


def _epilogue_kernel(*refs, meta, gd, max_phi_norm):
    """One row-block of the large-n step epilogue: phi combine -> clip
    scale -> optimizer update, in a single VMEM residency (see
    fused_epilogue)."""
    n_scalar_in, n_array_in, treedef, scalar_pos = meta
    idx = 0
    norm_ref = refs[idx]; idx += 1          # SMEM [1]: ||phi||_F
    h2_ref = refs[idx]; idx += 1            # SMEM [1]
    ntot_ref = refs[idx]; idx += 1          # SMEM [1]: n_total (f32)
    scalar_in = refs[idx:idx + n_scalar_in]; idx += n_scalar_in
    center_ref = refs[idx]; idx += 1        # VMEM [1, p] (constant block)
    ku_ref = refs[idx]; idx += 1
    ksum_ref = refs[idx]; idx += 1
    theta_ref = refs[idx]; idx += 1
    array_in = refs[idx:idx + n_array_in]; idx += n_array_in
    out_theta = refs[idx]; idx += 1
    out_arrays = refs[idx:idx + n_array_in]; idx += n_array_in
    out_scalars = refs[idx:idx + n_scalar_in]

    f32 = jnp.float32
    theta = theta_ref[:]
    tc = theta - center_ref[:]
    # phi combine — identical algebra (and op order) to
    # ops/pallas_svgd.pallas_svgd_phi_rect's XLA combine.
    phi = (ku_ref[:] + ksum_ref[:] * tc / h2_ref[0]) / ntot_ref[0]
    c = jnp.asarray(max_phi_norm, f32)
    phi = phi * (c / jnp.maximum(c, norm_ref[0]))

    leaves = []
    si = iter(scalar_in)
    ai = iter(array_in)
    for is_scalar in scalar_pos:
        leaves.append(next(si)[0] if is_scalar else next(ai)[:])
    opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    update = getattr(gd, "update_kernel", gd.update)
    delta, new_state = update(opt_state, phi)
    new_treedef = jax.tree_util.tree_structure(new_state)
    if new_treedef != treedef:
        raise ValueError(
            "fused epilogue: gd.update returned an optimizer state with "
            f"a different pytree structure than its input ({new_treedef} "
            f"vs {treedef}); a structure-preserving step rule is required"
        )
    out_theta[:] = theta + delta
    so = iter(out_scalars)
    ao = iter(out_arrays)
    for is_scalar, leaf in zip(scalar_pos,
                               jax.tree_util.tree_leaves(new_state)):
        if is_scalar:
            # Scalar state (e.g. Adam's count / decayed lr) evolves
            # identically in every row block; each block writes the same
            # value.
            next(so)[0] = leaf
        else:
            next(ao)[:] = leaf


def _epilogue_block_rows(n, p):
    """Row-block size for fused_epilogue: ~0.5 MiB per [rows, p] f32
    buffer (7 such buffers + double-buffered pipelining stays well under
    the 16 MiB/core VMEM), snapped to a multiple of 8 rows."""
    rows = max(8, min(n, (2 ** 19) // (4 * p)))
    return max(8, rows - rows % 8)


def fused_epilogue(ku, ksum, theta, center, h2, norm, opt_state, gd,
                   max_phi_norm=10.0, n_total=None, block_rows=None,
                   interpret=False):
    """Large-n step epilogue as ONE gridded Pallas kernel: the phi
    combine ``phi = (ku + ksum * (theta - center)/h^2) / n_total``
    (ops/pallas_svgd.pallas_svgd_phi_rect), the global-norm clip scale
    (reference abstract_stein_sampler.py:125; ``norm`` — computed by the
    caller in one fused XLA reduction over the same combine — rides in
    as a scalar), and the optimizer's own ``gd.update`` pytree rule
    traced in-kernel (ops/optimizers.py quirks included by
    construction), gridded over row blocks.

    MEASURED NEGATIVE on the deployed chip. Isolated (same-session,
    benchmarks/epilogue_stage_probe.py, n=10240/p=128): the XLA tail is
    18.3 us — XLA already fuses the combine/clip/Adam chain to the HBM
    floor — vs 21.5 us for this kernel. In the REAL sampler scan the
    epilogue step measured 657 vs 480 us (benchmarks/
    sampler_overhead_probe.py, 0.5 s slope numerators; an earlier
    "0.998x wash" A/B and the ~175 us "clip+Adam rest" attribution that
    motivated the kernel both had numerators below the tunnel's RTT
    variance — noise). The option stays in-tree: it is tested, it
    documents the floor, and on toolchains/chips where XLA does NOT
    fuse the tail it is the fix.

    Returns (new_theta, new_opt_state). f32-only, like the fused tails.
    """
    n, p = theta.shape
    if n_total is None:
        n_total = n
    for name, arr in (("ku", ku), ("ksum", ksum), ("theta", theta)):
        if arr.dtype != jnp.float32:
            raise TypeError(
                f"fused epilogue is f32-only (got {name}={arr.dtype})"
            )
    f32 = jnp.float32
    leaves, treedef = jax.tree_util.tree_flatten(opt_state)
    scalar_pos = tuple(jnp.ndim(leaf) == 0 for leaf in leaves)
    scalar_leaves = [l for l, s in zip(leaves, scalar_pos) if s]
    array_leaves = [l for l, s in zip(leaves, scalar_pos) if not s]
    for leaf in array_leaves:
        if leaf.shape != (n, p):
            raise ValueError(
                "fused epilogue supports optimizer states whose array "
                f"leaves are [n, p]; got {leaf.shape}"
            )

    br = block_rows or _epilogue_block_rows(n, p)
    n_pad = -(-n // br) * br
    pad = n_pad - n

    def _pad(x):
        return jnp.pad(x, ((0, pad), (0, 0))) if pad else x

    ku_p = _pad(ku)
    ksum_p = _pad(ksum)
    theta_p = _pad(theta)
    arrays_p = [_pad(l) for l in array_leaves]
    grid = (n_pad // br,)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    cblock = pl.BlockSpec((1, p), lambda i: (0, 0))
    rows = lambda w: pl.BlockSpec((br, w), lambda i: (i, 0))  # noqa: E731
    in_specs = (
        [smem] * (3 + len(scalar_leaves))
        + [cblock, rows(p), rows(1), rows(p)]
        + [rows(p)] * len(array_leaves)
    )
    out_specs = (
        [rows(p)] * (1 + len(array_leaves))
        + [smem] * len(scalar_leaves)
    )
    out_shape = (
        [jax.ShapeDtypeStruct((n_pad, p), f32)]
        + [jax.ShapeDtypeStruct((n_pad, p), l.dtype) for l in array_leaves]
        + [jax.ShapeDtypeStruct((1,), l.dtype) for l in scalar_leaves]
    )
    meta = (len(scalar_leaves), len(array_leaves), treedef, scalar_pos)
    kernel = functools.partial(
        _epilogue_kernel, meta=meta, gd=gd, max_phi_norm=max_phi_norm,
    )
    outs = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
    )(jnp.asarray(norm, f32).reshape(1),
      jnp.asarray(h2, f32).reshape(1),
      jnp.asarray(n_total, f32).reshape(1),
      *[l.reshape(1) for l in scalar_leaves],
      jnp.asarray(center, f32).reshape(1, p),
      ku_p, ksum_p, theta_p, *arrays_p)

    new_theta = outs[0][:n]
    new_arrays = [o[:n] for o in outs[1:1 + len(array_leaves)]]
    new_scalars = [o.reshape(()) for o in outs[1 + len(array_leaves):]]
    new_leaves = []
    si, ai = iter(new_scalars), iter(new_arrays)
    for is_scalar in scalar_pos:
        new_leaves.append(next(si) if is_scalar else next(ai))
    return new_theta, jax.tree_util.tree_unflatten(treedef, new_leaves)


@dataclasses.dataclass(frozen=True)
class InKernelModel:
    """A model's gradient stage packaged for execution INSIDE the fused
    step kernel (step_impl='fused_model'): the whole SVGD step — model
    gradients, warm median, K, contractions, clip, optimizer — becomes
    ONE Pallas kernel, the way step_impl='fused_glm' does it for
    explicit quadratics (which is this protocol's first instance,
    ``_glm_grad``).

    operands : tuple of f32 arrays, each ndim >= 2 (Mosaic VMEM layout),
        staged into VMEM as kernel inputs — e.g. a feature matrix, label
        row, parameter-layout masks. Computed per batch in XLA by the
        model's ``inkernel_model(batch)`` factory, so minibatch scans
        re-derive them each step.
    grad_fn : callable (theta [n, p] f32, *operand values) ->
        (grads [n, p], logp_mean scalar). Traced inside the kernel like
        the optimizer's update rule: pure jnp, Mosaic-legal ops only
        (dot / elementwise / full reductions; no gathers, no rank-1
        intermediates). ``logp_mean`` EXCLUDES ``const``. In-kernel dots
        run at bf16-class input precision regardless of dtype
        (benchmarks/sym_and_gram_bench.py) — models needing f32-faithful
        gradient matmuls should stay on step_impl='fused_gram'.
    const : scalar added to the returned mean log_p outside the kernel
        (the parameter-independent part of log_p).
    vmem_bytes : optional callable n_particles -> int estimating the
        operands' + grad_fn temporaries' VMEM bytes, used by the
        pre-compile budget gate; defaults to the operands' nbytes (i.e.
        temporaries unaccounted — provide it when grad_fn materialises
        [n, N]-class intermediates, like a logits matrix).
    """
    operands: tuple
    grad_fn: object
    const: float = 0.0
    vmem_bytes: object = None

    def extra_vmem(self, n):
        if self.vmem_bytes is not None:
            return int(self.vmem_bytes(n))
        return int(sum(op.size * op.dtype.itemsize
                       for op in self.operands))


def fused_warm_step_tail(theta, grads, D, D_sub, med_prev, opt_state, gd,
                         max_phi_norm=10.0, warm_passes=8,
                         brackets=DEFAULT_BRACKETS, interpret=False,
                         gram_in_kernel=False, theta_sub=None,
                         glm=None, model=None):
    """One-kernel step tail. Returns (new_theta, new_opt_state,
    (med, phi_norm, h2)).

    ``theta``/``grads`` are [n, p] f32; ``D`` the full [n, n]
    squared-distance matrix (computed in XLA at Precision.HIGHEST so the
    deployed D numerics match the XLA path exactly); ``D_sub`` its
    strided row block (ops/median.row_subsample_block policy); ``gd`` a
    frozen-dataclass step rule whose ``update`` is pure jnp.

    ``gram_in_kernel=True`` (step_impl='fused_gram'): pass D=D_sub=None
    and the kernel computes D itself from ``theta`` with the in-kernel
    f32 dot — ~5x the XLA HIGHEST Gram rate at the Pallas-tile numerics
    class (measured, benchmarks/bf16_operand_probe.py), and D never
    touches HBM. ``theta_sub`` must then be the strided subsample rows
    of theta (ops/median.row_subsample_block's row policy), or None when
    every row is kept (n <= max_rows).

    ``model=InKernelModel(...)`` (step_impl='fused_model'; requires
    gram_in_kernel and grads=None): the model's per-particle gradients
    and log_p values are computed INSIDE the kernel from its staged
    operands — the whole SVGD step is one kernel. Returns an extra
    stat: mean_i log_p_i minus ``model.const`` (add it outside).

    ``glm=(A_eff, b_eff)`` (step_impl='fused_glm') is the explicit-
    quadratic sugar for the same protocol: log_p(w) = -0.5 w^T A w +
    b^T w + c (the model's ``quadratic_form`` contract), gradients
    b - A w (see ``_glm_grad``).
    """
    n, p = theta.shape
    if glm is not None:
        if model is not None:
            raise ValueError("pass glm= or model=, not both")
        A_eff, b_eff = glm
        if A_eff.shape != (p, p):
            raise ValueError(f"A_eff shape {A_eff.shape} != ({p},{p})")
        f32_ = jnp.float32
        model = InKernelModel(
            operands=(A_eff.astype(f32_),
                      b_eff.astype(f32_).reshape(1, p)),
            grad_fn=_glm_grad,
        )
    if model is not None and not gram_in_kernel:
        raise ValueError("an in-kernel model requires gram_in_kernel=True")
    if gram_in_kernel:
        if D is not None or D_sub is not None:
            # A precomputed D would be silently discarded (the kernel
            # recomputes it with the in-kernel dot at the Pallas-tile
            # numerics class) — reject the inconsistent call instead of
            # quietly downgrading the caller's HIGHEST-precision D.
            raise ValueError(
                "gram_in_kernel=True computes D inside the kernel; pass "
                "D=None and D_sub=None (got a precomputed D — use "
                "gram_in_kernel=False to keep its numerics)"
            )
        share_dsub = theta_sub is None
        m = n if share_dsub else theta_sub.shape[0]
        grads_checked = () if model is not None else (("grads", grads),)
        checked = (("theta", theta),) + grads_checked + (
            () if share_dsub else (("theta_sub", theta_sub),)
        )
        if model is not None:
            for i, op in enumerate(model.operands):
                if op.ndim < 2:
                    raise ValueError(
                        f"in-kernel model operand {i} must be >=2-D for "
                        f"the Mosaic VMEM layout (got shape {op.shape}); "
                        "reshape rows/scalars to [1, k]"
                    )
                checked = checked + ((f"model operand {i}", op),)
            extra = model.extra_vmem(n)
            if (fused_step_vmem_bytes(n, p, m) + extra
                    > FUSED_STEP_VMEM_BUDGET):
                raise ValueError(
                    "fused_model: the in-kernel model's operands/"
                    f"temporaries (~{extra / 2**20:.1f} MiB) push the "
                    "fused step past the VMEM budget; shrink the data "
                    "batch or use step_impl='fused_gram' (XLA gradients)"
                )
    else:
        if theta_sub is not None:
            raise ValueError(
                "theta_sub is only consumed when gram_in_kernel=True; "
                "with a precomputed D pass its subsample as D_sub"
            )
        share_dsub = D_sub is D
        m = D_sub.shape[0]
        checked = (("theta", theta), ("grads", grads), ("D", D),
                   ("D_sub", D_sub))
    total = m * n
    if total >= 2 ** 31:
        raise ValueError("fused step: median block exceeds int32 counts")
    for name, arr in checked:
        if arr.dtype != jnp.float32:
            raise TypeError(
                f"fused step is f32-only (got {name}={arr.dtype})"
            )
    f32 = jnp.float32

    leaves, treedef = jax.tree_util.tree_flatten(opt_state)
    scalar_pos = tuple(jnp.ndim(leaf) == 0 for leaf in leaves)
    scalar_leaves = [l for l, s in zip(leaves, scalar_pos) if s]
    array_leaves = [l for l, s in zip(leaves, scalar_pos) if not s]
    for leaf in array_leaves:
        if leaf.shape != (n, p):
            raise ValueError(
                "fused step supports optimizer states whose array leaves "
                f"are [n, p]; got {leaf.shape}"
            )

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    if gram_in_kernel:
        mat_args = () if share_dsub else (theta_sub,)
        if model is not None:
            mat_args = tuple(model.operands) + mat_args
    else:
        # When the subsample policy kept every row (n <= max_rows), the
        # caller passes D itself as D_sub — stage it into VMEM once.
        mat_args = (D,) if share_dsub else (D, D_sub)
    grads_args = () if model is not None else (grads,)
    n_vmem_in = len(mat_args) + 1 + len(grads_args) + len(array_leaves)
    in_specs = [smem] * (1 + len(scalar_leaves)) + [vmem] * n_vmem_in
    n_stats = 4 if model is not None else 3
    out_specs = ([vmem] * (1 + len(array_leaves))
                 + [smem] * (len(scalar_leaves) + 1))
    out_shape = (
        [jax.ShapeDtypeStruct((n, p), f32)]
        + [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in array_leaves]
        + [jax.ShapeDtypeStruct((1,), l.dtype) for l in scalar_leaves]
        + [jax.ShapeDtypeStruct((n_stats,), f32)]
    )
    meta = (len(scalar_leaves), len(array_leaves), treedef, scalar_pos,
            share_dsub, gram_in_kernel,
            0 if model is None else len(model.operands))
    kernel = functools.partial(
        _tail_kernel, meta=meta, gd=gd, max_phi_norm=max_phi_norm,
        k=(total + 1) // 2, rounds=(warm_passes + 1) // 2,
        brackets=brackets, n_particles=n,
        model_grad=None if model is None else model.grad_fn,
    )
    outs = pl.pallas_call(
        kernel, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
    )(jnp.asarray(med_prev).astype(f32).reshape(1),
      *[l.reshape(1) for l in scalar_leaves],
      *mat_args, theta, *grads_args, *array_leaves)

    new_theta = outs[0]
    new_arrays = list(outs[1:1 + len(array_leaves)])
    new_scalars = [
        o.reshape(()) for o in
        outs[1 + len(array_leaves):1 + len(array_leaves)
             + len(scalar_leaves)]
    ]
    stats = outs[-1]
    new_leaves = []
    si, ai = iter(new_scalars), iter(new_arrays)
    for is_scalar in scalar_pos:
        new_leaves.append(next(si) if is_scalar else next(ai))
    new_opt = jax.tree_util.tree_unflatten(treedef, new_leaves)
    if model is not None:
        return new_theta, new_opt, (stats[0], stats[1], stats[2],
                                    stats[3])
    return new_theta, new_opt, (stats[0], stats[1], stats[2])


def _pblock_kernel(*refs, meta, gd, max_phi_norm, k, rounds, brackets,
                   n_particles, g_p):
    """One grid step of the p-BLOCKED fused tail (fused_warm_step_pblock).
    The 1-D grid runs three sequential phases of g_p steps each, tile
    index j = g % g_p:

      phase A (g in [0, g_p)):        D scratch += centered Gram p-tile
      phase C (g in [g_p, 2 g_p)):    at the first C step, finish D ->
                                      warm median -> K (overwriting the
                                      D scratch) -> row sums; then per
                                      tile ku_j = K @ u_j, phi_j into
                                      the phi scratch, norm^2 partial
      phase D (g in [2 g_p, 3 g_p)):  clip scale (norm now complete) +
                                      the optimizer's own update rule
                                      per tile; writes the outputs

    Mosaic TPU grids are sequential on a core, which is what makes the
    cross-phase scalar carries (median, h2, norm) sound; non-final
    output-buffer write-backs are garbage but every output's FINAL
    visit (phase D) writes the real values."""
    (n_scalar_in, n_array_in, treedef, scalar_pos) = meta
    idx = 0
    med_ref = refs[idx]; idx += 1
    scalar_in = refs[idx:idx + n_scalar_in]; idx += n_scalar_in
    theta_ref = refs[idx]; idx += 1          # [n, pt] tile
    grads_ref = refs[idx]; idx += 1          # [n, pt] tile
    center_ref = refs[idx]; idx += 1         # [1, pt] tile
    array_in = refs[idx:idx + n_array_in]; idx += n_array_in
    out_theta = refs[idx]; idx += 1
    out_arrays = refs[idx:idx + n_array_in]; idx += n_array_in
    out_scalars = refs[idx:idx + n_scalar_in]; idx += n_scalar_in
    stats_ref = refs[idx]; idx += 1
    d_scr = refs[idx]; idx += 1              # [n, n] VMEM scratch (D -> K)
    ksum_scr = refs[idx]; idx += 1           # [n, 1] VMEM scratch
    smem_scr = refs[idx]                     # [4] SMEM: med, h2, norm2, -

    g = pl.program_id(0)
    f32 = jnp.float32
    n = theta_ref.shape[0]
    pt = theta_ref.shape[1]
    j = g % g_p
    # Whole-[n, n] phases run in ROW CHUNKS: a single d_scr[:]-sized
    # expression materialises a second [n, n] temporary next to the
    # scratch, which measured a 17.3 MiB VMEM stack (1.3 over the
    # 16 MiB core) at n=1000 — chunking keeps the temporary to
    # [chunk, n] <= 2^19 B (chunk * n * 4 bytes; the r4 expression
    # divided the budget by 4*8 instead of multiplying rows by 4 B,
    # degenerating to chunk == n at exactly n=1000 — the shape the
    # chunking was built to fix).
    chunk = max(8, min(n, (2 ** 19) // (4 * max(n, 1)) // 8 * 8))
    n_chunks = -(-n // chunk)

    tc = theta_ref[:] - center_ref[:]

    @pl.when(g < g_p)
    def _phase_a():
        rsq = jnp.sum(tc * tc, axis=1, keepdims=True)
        for c0 in range(0, n, chunk):
            w = min(chunk, n - c0)
            rows = pl.ds(c0, w)
            d_tile = (rsq[c0:c0 + w] + rsq.reshape(1, n)
                      - 2.0 * jnp.dot(tc[c0:c0 + w], tc.T,
                                      preferred_element_type=f32))
            @pl.when(j == 0)
            def _(d_tile=d_tile, rows=rows):
                d_scr[rows, :] = d_tile

            @pl.when(j > 0)
            def _(d_tile=d_tile, rows=rows):
                d_scr[rows, :] += d_tile

    @pl.when(g == g_p)
    def _phase_b():
        med = warm_search_on_value(
            d_scr[:], med_ref[0], k=k, rounds=rounds, brackets=brackets,
        )
        h2 = med / jnp.log(jnp.asarray(n_particles, f32))
        for c0 in range(0, n, chunk):
            w = min(chunk, n - c0)
            rows = pl.ds(c0, w)
            Kc = jnp.exp2(d_scr[rows, :] * (_LOG2E_HALF / h2))
            d_scr[rows, :] = Kc
            ksum_scr[rows, :] = jnp.sum(Kc, axis=1, keepdims=True)
        smem_scr[0] = med
        smem_scr[1] = h2
        smem_scr[2] = 0.0

    def _phi_tile(h2):
        """This tile's phi, chunked over rows (K@u recomputed in phase D
        rather than stored: a [n, p_pad] phi scratch pushed the kernel's
        VMEM footprint 1.3 MiB past the 16 MiB core; the recompute is
        ~4 us of MXU work at the NN shape)."""
        u = grads_ref[:] - tc / h2
        parts = []
        for c0 in range(0, n, chunk):
            w = min(chunk, n - c0)
            rows = pl.ds(c0, w)
            ku = jnp.dot(d_scr[rows, :], u,
                         preferred_element_type=f32)
            parts.append(
                (ku + ksum_scr[rows, :] * tc[c0:c0 + w] / h2)
                / n_particles
            )
        return parts

    @pl.when((g >= g_p) & (g < 2 * g_p))
    def _phase_c():
        norm_part = jnp.float32(0.0)
        for phi in _phi_tile(smem_scr[1]):
            norm_part += jnp.sum(phi * phi)
        smem_scr[2] += norm_part

    @pl.when(g >= 2 * g_p)
    def _phase_d():
        norm = jnp.sqrt(smem_scr[2])
        c = jnp.asarray(max_phi_norm, f32)
        scale = c / jnp.maximum(c, norm)
        parts = _phi_tile(smem_scr[1])
        phi = parts[0] if len(parts) == 1 else jnp.concatenate(
            parts, axis=0
        )
        phi = phi * scale
        leaves = []
        si = iter(scalar_in)
        ai = iter(array_in)
        for is_scalar in scalar_pos:
            leaves.append(next(si)[0] if is_scalar else next(ai)[:])
        opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
        update = getattr(gd, "update_kernel", gd.update)
        delta, new_state = update(opt_state, phi)
        new_treedef = jax.tree_util.tree_structure(new_state)
        if new_treedef != treedef:
            raise ValueError(
                "fused pblock step: gd.update returned an optimizer "
                f"state with a different pytree structure ({new_treedef} "
                f"vs {treedef})"
            )
        out_theta[:] = theta_ref[:] + delta
        so = iter(out_scalars)
        ao = iter(out_arrays)
        for is_scalar, leaf in zip(scalar_pos,
                                   jax.tree_util.tree_leaves(new_state)):
            if is_scalar:
                next(so)[0] = leaf
            else:
                next(ao)[:] = leaf
        stats_ref[0] = smem_scr[0]
        stats_ref[1] = norm
        stats_ref[2] = smem_scr[1]


def pblock_step_fits(n, p, p_tile=128):
    """VMEM gate for the p-blocked fused tail: the [n, n] D/K scratch,
    the [n, p] phi scratch, and ~6 [n, p_tile] tile buffers within
    ~12 MiB."""
    return 4 * (n * n + n * p + 6 * n * p_tile) <= 12 * 2 ** 20


def fused_warm_step_pblock(theta, grads, med_prev, opt_state, gd,
                           max_phi_norm=10.0, warm_passes=8,
                           brackets=DEFAULT_BRACKETS, p_tile=128,
                           interpret=False):
    """The ENTIRE post-gradient SVGD step as ONE Pallas kernel for
    shapes whose [n, p] operands exceed the all-at-once tail's VMEM
    budget (fused_step_vmem_bytes counts ~11 n*p terms; the Bayesian-NN
    shape n=1000/p=303 was locked out): D and K stay VMEM-resident
    [n, n] scratches while theta/grads/optimizer-moment tiles STREAM
    through a sequential 3-phase grid (Gram accumulation over p-tiles ->
    median + K + per-tile contraction/phi/norm -> clip + in-kernel
    optimizer). Same numerics class as step_impl='fused_gram' (in-kernel
    centered Gram); the median counts run over ALL n^2 entries (the
    reference's exact semantics — no row subsample).

    Returns (new_theta, new_opt_state, (med, phi_norm, h2)). f32-only;
    requires a coordinatewise step rule (Adam/Adagrad are); gate shapes
    with ``pblock_step_fits``."""
    n, p = theta.shape
    f32 = jnp.float32
    for name, arr in (("theta", theta), ("grads", grads)):
        if arr.dtype != f32:
            raise TypeError(
                f"fused pblock step is f32-only (got {name}={arr.dtype})"
            )
    if n * n >= 2 ** 31:
        raise ValueError("fused pblock step: n^2 exceeds int32 counts")

    leaves, treedef = jax.tree_util.tree_flatten(opt_state)
    scalar_pos = tuple(jnp.ndim(leaf) == 0 for leaf in leaves)
    scalar_leaves = [l for l, s in zip(leaves, scalar_pos) if s]
    array_leaves = [l for l, s in zip(leaves, scalar_pos) if not s]
    for leaf in array_leaves:
        if leaf.shape != (n, p):
            raise ValueError(
                "fused pblock step supports optimizer states whose "
                f"array leaves are [n, p]; got {leaf.shape}"
            )

    pt = min(p_tile, p)
    p_pad = -(-p // pt) * pt
    pad = ((0, 0), (0, p_pad - p))

    def _pad(x):
        return jnp.pad(x, pad) if p_pad != p else x

    center = jnp.mean(theta, axis=0, keepdims=True)
    theta_p = _pad(theta)
    grads_p = _pad(grads)
    # Padded center columns are 0 and padded theta columns are 0, so
    # tc's padded columns vanish: they contribute nothing to D, phi,
    # or the norm.
    center_p = _pad(center)
    arrays_p = [_pad(l) for l in array_leaves]

    g_p = p_pad // pt
    grid = (3 * g_p,)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    tile = lambda w: pl.BlockSpec((n, w), lambda g: (0, g % g_p))  # noqa: E731
    ctile = pl.BlockSpec((1, pt), lambda g: (0, g % g_p))
    in_specs = (
        [smem] * (1 + len(scalar_leaves))
        + [tile(pt), tile(pt), ctile]
        + [tile(pt)] * len(array_leaves)
    )
    out_specs = (
        [tile(pt)] * (1 + len(array_leaves))
        + [smem] * (len(scalar_leaves) + 1)
    )
    out_shape = (
        [jax.ShapeDtypeStruct((n, p_pad), f32)]
        + [jax.ShapeDtypeStruct((n, p_pad), l.dtype)
           for l in array_leaves]
        + [jax.ShapeDtypeStruct((1,), l.dtype) for l in scalar_leaves]
        + [jax.ShapeDtypeStruct((3,), f32)]
    )
    meta = (len(scalar_leaves), len(array_leaves), treedef, scalar_pos)
    kernel = functools.partial(
        _pblock_kernel, meta=meta, gd=gd, max_phi_norm=max_phi_norm,
        k=(n * n + 1) // 2, rounds=(warm_passes + 1) // 2,
        brackets=brackets, n_particles=n, g_p=g_p,
    )
    outs = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((n, n), f32),
            pltpu.VMEM((n, 1), f32),
            pltpu.SMEM((4,), f32),
        ],
        interpret=interpret,
    )(jnp.asarray(med_prev).astype(f32).reshape(1),
      *[l.reshape(1) for l in scalar_leaves],
      theta_p, grads_p, center_p, *arrays_p)

    new_theta = outs[0][:, :p]
    new_arrays = [o[:, :p] for o in outs[1:1 + len(array_leaves)]]
    new_scalars = [
        o.reshape(()) for o in
        outs[1 + len(array_leaves):1 + len(array_leaves)
             + len(scalar_leaves)]
    ]
    stats = outs[-1]
    new_leaves = []
    si, ai = iter(new_scalars), iter(new_arrays)
    for is_scalar in scalar_pos:
        new_leaves.append(next(si) if is_scalar else next(ai))
    new_opt = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return new_theta, new_opt, (stats[0], stats[1], stats[2])
