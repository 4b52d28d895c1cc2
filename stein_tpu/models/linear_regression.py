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

from .distributions import normal_log_prob

# Data matmuls run at HIGH (bf16_3x: ~f32-accurate products at 1/3 the
# default MXU rate) so per-particle gradients are f32-faithful on TPU —
# default precision truncates inputs to bf16 (~3 decimal digits on y_hat,
# amplified by the y - y_hat residual cancellation); the reference's TF1
# graph ran these at f32. HIGHEST (true 6-pass f32) is unnecessary here:
# the residual cancellation is ~10x, well within bf16_3x's ~2^-22 product
# accuracy (tests_tpu/test_tpu_fidelity.py).
_HI = jax.lax.Precision.HIGH


@dataclasses.dataclass(frozen=True)
class LinearRegressionModel:
    n_feats: int

    def template(self, dtype=jnp.float32):
        return {"w": jnp.zeros((self.n_feats, 1), dtype)}

    def predict(self, params, batch):
        return jnp.matmul(batch["X"], params["w"], precision=_HI)

    def log_p(self, params, batch):
        w = params["w"]
        y_hat = jnp.matmul(batch["X"], w, precision=_HI)
        log_l = -0.5 * jnp.sum(jnp.square(y_hat - batch["y"]))
        log_prior = jnp.sum(normal_log_prob(w, 0.0, 1.0))
        return log_l + log_prior
