"""Bayesian linear regression model.

Same probabilistic model as the reference example
(examples/linear_regression/main.py:18-31): N(0,1) prior on the weights and a
unit-variance Gaussian likelihood,
  log_p = -0.5 * sum((Xw - y)^2) + sum log N(w; 0, 1),
expressed as a pure function of a parameter pytree instead of a TF graph.
"""

import dataclasses

import jax
import jax.numpy as jnp

from .distributions import normal_log_prob, resolve_precision

# Data matmuls run at HIGH (bf16_3x: ~f32-accurate products at 1/3 the
# default MXU rate) so per-particle gradients are f32-faithful on TPU —
# default precision truncates inputs to bf16 (~3 decimal digits on y_hat,
# amplified by the y - y_hat residual cancellation); the reference's TF1
# graph ran these at f32. HIGHEST (true 6-pass f32) is unnecessary here:
# the residual cancellation is ~10x, well within bf16_3x's ~2^-22 product
# accuracy (tests_tpu/test_tpu_fidelity.py). precision="default" is the
# throughput-first opt-in (see distributions.resolve_precision).


@dataclasses.dataclass(frozen=True)
class LinearRegressionModel:
    n_feats: int
    precision: str = "high"

    @property
    def _prec(self):
        return resolve_precision(self.precision)

    def template(self, dtype=jnp.float32):
        return {"w": jnp.zeros((self.n_feats, 1), dtype)}

    def predict(self, params, batch):
        return jnp.matmul(batch["X"], params["w"], precision=self._prec)

    def sufficient_batch(self, batch, dtype=jnp.float32):
        """Precompute the Gaussian model's sufficient statistics
        A = X^T X, b = X^T y, yty = y^T y once, so every SVGD step's
        per-particle likelihood costs O(p^2) instead of O(n_obs * p):
        -0.5 ||Xw - y||^2 = -0.5 (w^T A w - 2 b^T w + yty) exactly.
        The reference's own example re-multiplies the SAME full batch
        through the graph every one of its 500 iterations
        (examples/linear_regression/main.py:42-48) — for full-batch
        training this is pure algebra, not an approximation (the
        statistics are computed at HIGHEST precision so no f32 digits
        are lost in the reduction). Feed the returned dict to
        train_on_batch / run in place of {"X", "y"}; log_p dispatches
        on the keys."""
        X = jnp.asarray(batch["X"], dtype)
        y = jnp.asarray(batch["y"], dtype)
        hi = jax.lax.Precision.HIGHEST
        return {
            "A": jnp.matmul(X.T, X, precision=hi),
            "b": jnp.matmul(X.T, y, precision=hi),
            "yty": jnp.sum(y * y),
        }

    def quadratic_form(self, batch):
        """The Gaussian model's log-posterior as an explicit quadratic
        log_p(w) = -0.5 w^T A_eff w + b_eff^T w + const, with gradient
        b_eff - A_eff w — the contract behind the fully-fused GLM step
        (SVGDSampler(step_impl='fused_glm', quadratic_form=...)), which
        computes per-particle gradients INSIDE the step kernel as one
        [n, p] x [p, p] dot. Exact algebra: A_eff = X^T X + I (likelihood
        + N(0,1) prior), b_eff = X^T y. Accepts either batch form; feed
        it the sufficient_batch dict so the statistics are not
        recomputed every step."""
        if "A" in batch:
            A, b, yty = batch["A"], batch["b"], batch["yty"]
        else:
            s = self.sufficient_batch(batch, batch["X"].dtype)
            A, b, yty = s["A"], s["b"], s["yty"]
        p = A.shape[0]
        A_eff = A + jnp.eye(p, dtype=A.dtype)
        const = -0.5 * yty - 0.5 * p * jnp.log(2.0 * jnp.pi)
        return A_eff, b.reshape(p), const

    def log_p(self, params, batch):
        w = params["w"]
        if "A" in batch:
            Aw = jnp.matmul(batch["A"], w, precision=self._prec)
            log_l = -0.5 * (
                jnp.sum(w * Aw) - 2.0 * jnp.sum(batch["b"] * w)
                + batch["yty"]
            )
        else:
            y_hat = jnp.matmul(batch["X"], w, precision=self._prec)
            log_l = -0.5 * jnp.sum(jnp.square(y_hat - batch["y"]))
        log_prior = jnp.sum(normal_log_prob(w, 0.0, 1.0))
        return log_l + log_prior
