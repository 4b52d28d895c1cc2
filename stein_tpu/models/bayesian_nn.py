"""Bayesian neural-network regression (1-hidden-layer ReLU MLP).

Same probabilistic model as the reference example
(examples/regression_neural_network/main.py:29-85): Gamma(1, 0.01) priors on
the weight precision lambda = exp(log_lambda) and noise precision
gamma = exp(log_gamma) (evaluated at the exp'd values with no Jacobian
correction, as the reference does), N(0, lambda^-1/2) priors on all weights
and biases, Gaussian likelihood with scale gamma^-1/2, the log-likelihood
rescaled by n_train/n_batch, and the whole log-posterior divided by n_train.
"""

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp

from .distributions import (
    normal_log_prob,
    gamma_log_prob,
    resolve_precision,
)

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


@dataclasses.dataclass(frozen=True)
class BayesianNNModel:
    n_feats: int
    n_hidden: int
    n_train: int
    n_batch: int
    prior_alpha: float = 1.0
    prior_beta: float = 0.01
    # "high" = f32-faithful gradients (default); "default" = the TPU's
    # native bf16-input rate (see distributions.resolve_precision).
    precision: str = "high"

    @property
    def _prec(self):
        return resolve_precision(self.precision)

    def template(self, dtype=jnp.float32):
        return {
            "log_lambda": jnp.zeros((), dtype),
            "log_gamma": jnp.zeros((), dtype),
            "w_1": jnp.zeros((self.n_feats, self.n_hidden), dtype),
            "b_1": jnp.zeros((self.n_hidden,), dtype),
            "w_2": jnp.zeros((self.n_hidden, 1), dtype),
            "b_2": jnp.zeros((), dtype),
        }

    def predict(self, params, batch):
        h = jnp.maximum(
            jnp.matmul(batch["X"], params["w_1"], precision=self._prec)
            + params["b_1"], 0.0,
        )
        return (jnp.matmul(h, params["w_2"], precision=self._prec)
                + params["b_2"])

    def log_p(self, params, batch):
        lam = jnp.exp(params["log_lambda"])
        gam = jnp.exp(params["log_gamma"])
        pred = self.predict(params, batch)
        log_l = jnp.sum(
            normal_log_prob(batch["y"], pred, 1.0 / jnp.sqrt(gam))
        )
        prior_scale = 1.0 / jnp.sqrt(lam)
        log_prior = (
            gamma_log_prob(lam, self.prior_alpha, self.prior_beta)
            + gamma_log_prob(gam, self.prior_alpha, self.prior_beta)
            + jnp.sum(normal_log_prob(params["w_1"], 0.0, prior_scale))
            + jnp.sum(normal_log_prob(params["w_2"], 0.0, prior_scale))
            + jnp.sum(normal_log_prob(params["b_1"], 0.0, prior_scale))
            + normal_log_prob(params["b_2"], 0.0, prior_scale)
        )
        scale = self.n_train / self.n_batch
        return (log_l * scale + log_prior) / self.n_train

    def pallas_grads(self, interpret=False):
        """Per-particle gradients + log_p values as ONE Pallas kernel —
        the `custom_grads=` hook (SVGDSampler) for the gradient stage
        that no fused step tail can ingest (per-particle MLP weight
        tensors; the InKernelModel boundary, docs/DESIGN.md).

        Why a kernel wins here: XLA's vmap-autodiff over this model is
        [n, n_batch, n_hidden]-class batched dot_generals with tiny
        contraction dims (n_feats=1, n_batch=20) — MXU-starved by
        construction and spread over many small HBM-bound kernels
        (~25 us of the ~90 us n=1000 step, benchmarks/nn_breakdown.py).
        The hand-derived backward is pure 2-D ELEMENTWISE math on
        [n, n_hidden] blocks (the observation and feature loops unroll —
        n_batch * n_feats static iterations), all VPU, no dots at all:
        full-f32 numerics, matching jax autodiff to fp reassociation
        (pinned by tests/test_models.py::
        test_pallas_grads_match_autodiff).

        Returns grad_all(theta [n, p] f32, batch) ->
        (logp_vals [n], grads [n, p]); use as
        ``SVGDSampler(custom_grads=model.pallas_grads(), ...)`` or let
        ``throughput_config(model=...)`` wire it. Gradient math
        reference: examples/regression_neural_network/main.py:29-85's
        graph under tf.gradients; here differentiated by hand (see
        _nn_grad_kernel)."""
        f, H = self.n_feats, self.n_hidden
        s = self.n_train / self.n_batch
        consts = dict(
            f=f, H=H, s=s, inv_nt=1.0 / self.n_train,
            alpha=self.prior_alpha, beta=self.prior_beta,
            n_weights=f * H + H + H + 1,
            lgamma_alpha=float(math.lgamma(self.prior_alpha)),
        )

        def grad_all(theta, batch, block_rows=512):
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu

            n = theta.shape[0]
            f32 = jnp.float32
            if theta.dtype != f32:
                raise TypeError(
                    f"pallas_grads is f32-only (got {theta.dtype})"
                )
            X = jnp.asarray(batch["X"], f32)
            y = jnp.asarray(batch["y"], f32).reshape(-1, 1)
            B = X.shape[0]
            # Ravel layout (keys sorted by jax dict flattening):
            # b_1 [H] | b_2 | log_gamma | log_lambda | w_1 [f*H] | w_2 [H]
            b1 = theta[:, :H]
            scal = theta[:, H:H + 3]                    # b2, lg, ll
            w1 = theta[:, H + 3:H + 3 + f * H]
            w2 = theta[:, H + 3 + f * H:]
            # Gridded over particle row blocks: every op is row-local
            # (per-row lane reductions), and one whole-n invocation with
            # the B x f loops unrolled builds a vector program large
            # enough to CRASH the Mosaic compiler above n~512 rows
            # (measured: 512 compiles, 768+ kills tpu_compile_helper).
            bn = min(block_rows, max(8, n))
            bn = max(8, bn - bn % 8)   # Mosaic: sublane dim % 8 == 0
            n_pad = -(-n // bn) * bn
            if n_pad != n:
                pad = ((0, n_pad - n), (0, 0))
                b1, scal, w1, w2 = (jnp.pad(a, pad)
                                    for a in (b1, scal, w1, w2))
            smem = pl.BlockSpec(memory_space=pltpu.SMEM)
            rows = lambda w: pl.BlockSpec((bn, w), lambda i: (i, 0))  # noqa: E731
            outs = pl.pallas_call(
                functools.partial(_nn_grad_kernel, B=B, **consts),
                grid=(n_pad // bn,),
                in_specs=[smem, smem, rows(H), rows(3), rows(f * H),
                          rows(H)],
                out_specs=[rows(H), rows(4), rows(f * H), rows(H)],
                out_shape=[
                    jax.ShapeDtypeStruct((n_pad, H), f32),     # db1
                    jax.ShapeDtypeStruct((n_pad, 4), f32),     # db2,dlg,dll,logp
                    jax.ShapeDtypeStruct((n_pad, f * H), f32),  # dw1
                    jax.ShapeDtypeStruct((n_pad, H), f32),     # dw2
                ],
                interpret=interpret,
            )(X, y, b1, scal, w1, w2)
            db1, dscal, dw1, dw2 = (o[:n] for o in outs)
            grads = jnp.concatenate(
                [db1, dscal[:, :3], dw1, dw2], axis=1
            )
            return dscal[:, 3], grads

        return grad_all


def _nn_grad_kernel(x_ref, y_ref, b1_ref, scal_ref, w1_ref, w2_ref,
                    db1_ref, dscal_ref, dw1_ref, dw2_ref, *,
                    B, f, H, s, inv_nt, alpha, beta, n_weights,
                    lgamma_alpha):
    """Hand-derived forward+backward of BayesianNNModel.log_p for all
    particles, unrolled over the (static) n_batch x n_feats loops —
    pure 2-D elementwise/broadcast/row-reduce ops (Mosaic-legal, no
    dots). See pallas_grads for the contract."""
    b1 = b1_ref[:]                       # [n, H]
    w1 = w1_ref[:]                       # [n, f*H]
    w2 = w2_ref[:]                       # [n, H]
    sc = scal_ref[:]                     # [n, 3]: b2, log_gamma, log_lambda
    b2 = sc[:, 0:1]
    lg = sc[:, 1:2]
    ll = sc[:, 2:3]
    gam = jnp.exp(lg)                    # [n, 1]
    lam = jnp.exp(ll)

    zH = jnp.zeros_like(b1)
    db1 = zH
    dw2 = zH
    dw1 = [zH] * f
    db2 = jnp.zeros_like(b2)
    sum_r2 = jnp.zeros_like(b2)
    for o in range(B):
        a = b1
        for j in range(f):
            a = a + x_ref[o, j] * w1[:, j * H:(j + 1) * H]
        h = jnp.maximum(a, 0.0)
        pred = jnp.sum(h * w2, axis=1, keepdims=True) + b2   # [n, 1]
        r = y_ref[o, 0] - pred                               # [n, 1]
        sum_r2 = sum_r2 + r * r
        gr = gam * r                                         # [n, 1]
        dw2 = dw2 + gr * h
        db2 = db2 + gr
        da = jnp.where(a > 0.0, gr * w2, 0.0)                # [n, H]
        db1 = db1 + da
        for j in range(f):
            dw1[j] = dw1[j] + x_ref[o, j] * da

    w_sq = (jnp.sum(w1 * w1, axis=1, keepdims=True)
            + jnp.sum(b1 * b1, axis=1, keepdims=True)
            + jnp.sum(w2 * w2, axis=1, keepdims=True)
            + b2 * b2)                                       # [n, 1]

    # Likelihood x n_train/n_batch rescale, minus the N(0, lambda^-1/2)
    # prior pull, all / n_train (log_p's own scaling).
    db1_ref[:] = (s * db1 - lam * b1) * inv_nt
    dw1_cat = dw1[0] if f == 1 else jnp.concatenate(dw1, axis=1)
    dw1_ref[:] = (s * dw1_cat - lam * w1) * inv_nt
    dw2_ref[:] = (s * dw2 - lam * w2) * inv_nt
    db2_t = (s * db2 - lam * b2) * inv_nt
    # d/d log_gamma: s * (-0.5 gam sum_r2 + 0.5 B) + (alpha-1) - beta*gam
    dlg = (s * (-0.5 * gam * sum_r2 + 0.5 * B)
           + (alpha - 1.0) - beta * gam) * inv_nt
    # d/d log_lambda: (alpha-1) - beta*lam + 0.5*P - 0.5*lam*w_sq
    dll = ((alpha - 1.0) - beta * lam
           + 0.5 * n_weights - 0.5 * lam * w_sq) * inv_nt

    log_l = -0.5 * gam * sum_r2 + B * (0.5 * lg - _HALF_LOG_2PI)
    g_lam = (alpha * math.log(beta) - lgamma_alpha
             + (alpha - 1.0) * ll - beta * lam)
    g_gam = (alpha * math.log(beta) - lgamma_alpha
             + (alpha - 1.0) * lg - beta * gam)
    prior_w = -0.5 * lam * w_sq + n_weights * (0.5 * ll - _HALF_LOG_2PI)
    logp = (s * log_l + g_lam + g_gam + prior_w) * inv_nt    # [n, 1]

    dscal_ref[:] = jnp.concatenate([db2_t, dlg, dll, logp], axis=1)
