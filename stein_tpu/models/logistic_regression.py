"""Hierarchical Bayesian logistic regression.

Same probabilistic model as the reference example
(examples/logistic_regression/main.py:23-49): Gamma(1, 0.01) prior on the
precision alpha = exp(log_alpha), N(0, alpha^-1/2) prior on the weights,
sigmoid cross-entropy likelihood rescaled by n_train/n_batch for
minibatching. As in the reference, the Gamma prior is evaluated at
alpha = exp(log_alpha) with no Jacobian correction for the log
reparameterisation — we reproduce that choice exactly.
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from .distributions import (
    normal_log_prob,
    gamma_log_prob,
    resolve_precision,
)


def sigmoid_cross_entropy_with_logits(labels, logits):
    """Matches tf.nn.sigmoid_cross_entropy_with_logits:
    max(x, 0) - x*z + log(1 + exp(-|x|))."""
    return (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


@dataclasses.dataclass(frozen=True)
class LogisticRegressionModel:
    n_feats: int
    n_train: int
    n_batch: int
    # "high" = f32-faithful gradients (default); "default" = the TPU's
    # native bf16-input rate (see distributions.resolve_precision).
    precision: str = "high"

    @property
    def _prec(self):
        return resolve_precision(self.precision)

    def template(self, dtype=jnp.float32):
        return {
            "w": jnp.zeros((self.n_feats, 1), dtype),
            "log_alpha": jnp.zeros((), dtype),
        }

    def logits(self, params, batch):
        return jnp.matmul(batch["X"], params["w"], precision=self._prec)

    def _ravel_layout(self):
        """Static column layout of the raveled [n, p] particle matrix
        (p = n_feats + 1): which column holds log_alpha and which hold
        the weights. Derived by raveling an index-keyed template through
        the SAME flattener the sampler uses (utils/ravel -> jax's
        sorted-key dict flattening, matching the reference's
        sort-variables-by-name layout, converters.py:40) so it can
        never drift from the unraveler."""
        d = self.n_feats
        template = {"w": np.zeros((d, 1)), "log_alpha": np.zeros(())}
        paths, _ = jax.tree_util.tree_flatten_with_path(template)
        la_col, w_cols, offset = None, None, 0
        # ravel_pytree concatenates leaves in tree_flatten order, so the
        # path walk below reproduces its column offsets exactly — in
        # pure Python (no traced ops; this runs inside the scanned step).
        for path, leaf in paths:
            size = int(np.size(leaf))
            if path[0].key == "log_alpha":
                la_col = offset
            else:
                w_cols = np.arange(offset, offset + size)
            offset += size
        return la_col, w_cols, offset

    def inkernel_model(self, batch):
        """The model packaged for step_impl='fused_model': gradients AND
        per-particle log_p values computed INSIDE the fused step kernel
        (ops/pallas_step.InKernelModel), so the whole SVGD step for this
        model — the reference's Covertype workload
        (examples/logistic_regression/main.py:23-49) — is ONE kernel.

        Exact algebra (same log_p as ``log_p`` above):
          grads_w  = scale * X^T (y - sigmoid(Xw)) - alpha * w
          grads_la = d/2 - alpha/2 ||w||^2 - 0.01 alpha
        with alpha = exp(log_alpha). The [n, N] logits / [n, p] backward
        products are in-kernel dots (bf16-class input precision — the
        fused tails' documented tolerance class; the sigmoid saturates,
        so gradient error stays in that class). Usage:

            sampler = SVGDSampler(..., step_impl='fused_model',
                                  inkernel_model=model.inkernel_model)
        """
        from ..ops.pallas_step import InKernelModel

        f32 = jnp.float32
        X = jnp.asarray(batch["X"], f32)
        y_row = jnp.asarray(batch["y"], f32).reshape(1, -1)
        n_obs = X.shape[0]
        d = self.n_feats
        la_col, w_cols, p = self._ravel_layout()
        # Feature matrix placed into the weights' raveled columns (the
        # log_alpha column stays zero, so theta @ X_pad^T is exactly
        # X w per particle); masks select the parameter blocks.
        X_pad = jnp.zeros((n_obs, p), f32).at[:, w_cols].set(X)
        w_mask = np.zeros((1, p), np.float32)
        w_mask[0, w_cols] = 1.0
        la_onehot = np.zeros((1, p), np.float32)
        la_onehot[0, la_col] = 1.0
        w_mask = jnp.asarray(w_mask)
        la_onehot = jnp.asarray(la_onehot)
        scale = float(self.n_train) / float(self.n_batch)

        def grad_fn(theta, X_pad, y_row, w_mask, la_onehot):
            n = theta.shape[0]
            la = jnp.sum(theta * la_onehot, axis=1, keepdims=True)
            alpha = jnp.exp(la)
            w = theta * w_mask
            logits = jnp.dot(theta, X_pad.T, preferred_element_type=f32)
            sig = 1.0 / (1.0 + jnp.exp(-logits))
            glik = jnp.dot(y_row - sig, X_pad,
                           preferred_element_type=f32)
            wsq = jnp.sum(w * w, axis=1, keepdims=True)
            g_la = 0.5 * d - 0.5 * alpha * wsq - 0.01 * alpha
            grads = scale * glik - alpha * w + la_onehot * g_la
            # Per-particle log_p minus const: -scale * sum_i sce_i +
            # d/2 log_alpha - alpha/2 ||w||^2 - 0.01 alpha
            # (sce as in sigmoid_cross_entropy_with_logits).
            sce = (jnp.maximum(logits, 0.0) - logits * y_row
                   + jnp.log1p(jnp.exp(-jnp.abs(logits))))
            logp = (-scale * jnp.sum(sce, axis=1, keepdims=True)
                    + 0.5 * d * la - 0.5 * alpha * wsq - 0.01 * alpha)
            return grads, jnp.sum(logp) / n

        # Parameter-independent log_p terms: the weight prior's
        # -d/2 log(2 pi) and the Gamma(1, 0.01) prior's 1 * log(0.01).
        const = -0.5 * d * np.log(2.0 * np.pi) + np.log(0.01)
        ops_bytes = 4 * (X_pad.size + y_row.size + 2 * p)
        return InKernelModel(
            operands=(X_pad, y_row, w_mask, la_onehot),
            grad_fn=grad_fn,
            const=const,
            # Conservative live-set estimate (r3 review): the [n, N]
            # elementwise chain (logits, exp, sigmoid, residual, the
            # sce abs/exp/log1p terms) is ~6 concurrent [n, N] buffers
            # if Mosaic materialises rather than fuses them, plus ~2
            # [n, p] temporaries (w, the grad combine). The gate exists
            # to turn opaque remote VMEM compile failures into a loud
            # ValueError — over-gating slightly is the safe direction.
            vmem_bytes=lambda n: (ops_bytes + 6 * 4 * n * n_obs
                                  + 2 * 4 * n * p),
        )

    def log_p(self, params, batch):
        w = params["w"]
        alpha = jnp.exp(params["log_alpha"])
        logits = jnp.matmul(batch["X"], w, precision=self._prec)
        log_l = -jnp.sum(
            sigmoid_cross_entropy_with_logits(batch["y"], logits)
        )
        w_prior = jnp.sum(
            normal_log_prob(w, 0.0, 1.0 / jnp.sqrt(alpha))
        )
        alpha_prior = gamma_log_prob(alpha, 1.0, 0.01)
        scale = self.n_train / self.n_batch
        return log_l * scale + w_prior + alpha_prior
