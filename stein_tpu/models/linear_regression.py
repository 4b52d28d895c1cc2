"""Bayesian linear regression model.

Same probabilistic model as the reference example
(examples/linear_regression/main.py:18-31): N(0,1) prior on the weights and a
unit-variance Gaussian likelihood,
  log_p = -0.5 * sum((Xw - y)^2) + sum log N(w; 0, 1),
expressed as a pure function of a parameter pytree instead of a TF graph.
"""

import dataclasses

import jax.numpy as jnp

from .distributions import normal_log_prob


@dataclasses.dataclass(frozen=True)
class LinearRegressionModel:
    n_feats: int

    def template(self, dtype=jnp.float32):
        return {"w": jnp.zeros((self.n_feats, 1), dtype)}

    def predict(self, params, batch):
        return batch["X"] @ params["w"]

    def log_p(self, params, batch):
        w = params["w"]
        y_hat = batch["X"] @ w
        log_l = -0.5 * jnp.sum(jnp.square(y_hat - batch["y"]))
        log_prior = jnp.sum(normal_log_prob(w, 0.0, 1.0))
        return log_l + log_prior
