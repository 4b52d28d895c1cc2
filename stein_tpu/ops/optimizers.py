"""Pure-functional step rules matching the reference optimizers exactly.

The reference's optimizers (stein/optimizers/) mutate Python attributes on
host; here each rule is a pure (state, phi) -> (step, state) function whose
state is a pytree carried through the jitted SVGD step — scan-compatible,
checkpointable, and shardable along the particle axis.

Reproduced quirks (see SURVEY.md §2 #6/#7):

- Adam (adam_gradient_descent.py:41-58): first-iteration moments initialise to
  mu=phi, nu=phi^2 (not zero) while bias correction is *still* applied; the
  learning rate decays multiplicatively after every step.
- Adagrad (adagrad_gradient_descent.py:34-44): RMSProp-style decayed
  squared-gradient history with first-iteration hist=phi^2, epsilon 1e-6, and
  — unlike Adam — no learning-rate decay applied inside update.
"""

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp


class AdamState(NamedTuple):
    mu: jnp.ndarray          # [n, p] first moment
    nu: jnp.ndarray          # [n, p] second moment
    count: jnp.ndarray       # scalar int32, completed steps
    learning_rate: jnp.ndarray  # scalar, decayed multiplicatively


class AdagradState(NamedTuple):
    hist: jnp.ndarray        # [n, p] decayed squared-gradient history
    count: jnp.ndarray       # scalar int32
    learning_rate: jnp.ndarray  # scalar (never decayed — reference quirk)


@dataclasses.dataclass(frozen=True)
class Adam:
    """Adam step rule (reference: adam_gradient_descent.py:15-58)."""

    learning_rate: float = 1e-3
    decay: float = 1.0
    beta_1: float = 0.9
    beta_2: float = 0.999

    def init(self, shape, dtype):
        return AdamState(
            mu=jnp.zeros(shape, dtype),
            nu=jnp.zeros(shape, dtype),
            count=jnp.zeros((), jnp.int32),
            learning_rate=jnp.asarray(self.learning_rate, dtype),
        )

    def update(self, state, phi):
        dtype = phi.dtype
        b1 = jnp.asarray(self.beta_1, dtype)
        b2 = jnp.asarray(self.beta_2, dtype)
        first = state.count == 0
        mu = jnp.where(first, phi, b1 * state.mu + (1.0 - b1) * phi)
        nu = jnp.where(first, phi ** 2, b2 * state.nu + (1.0 - b2) * phi ** 2)
        t = state.count + 1
        tf_ = t.astype(dtype)
        mup = mu / (1.0 - b1 ** tf_)
        nup = nu / (1.0 - b2 ** tf_)
        step = mup / (1e-8 + jnp.sqrt(nup)) * state.learning_rate
        new_lr = state.learning_rate * jnp.asarray(self.decay, dtype)
        return step, AdamState(mu, nu, t, new_lr)

    def update_kernel(self, state, phi):
        """``update`` reformulated for Pallas kernels: Mosaic cannot
        legalize the float pow (math.powf) in the bias corrections, so
        b**t is computed as exp(t*log(b)) — identical math, ~1 ulp
        different rounding. The XLA ``update`` stays byte-for-byte as the
        oracle-pinned reference semantics; the fused step tail
        (ops/pallas_step.py) has a tolerance-based trajectory contract,
        where 1 ulp is far inside the matmul-order noise."""
        dtype = phi.dtype
        b1 = jnp.asarray(self.beta_1, dtype)
        b2 = jnp.asarray(self.beta_2, dtype)
        first = state.count == 0
        mu = jnp.where(first, phi, b1 * state.mu + (1.0 - b1) * phi)
        nu = jnp.where(first, phi ** 2, b2 * state.nu + (1.0 - b2) * phi ** 2)
        t = state.count + 1
        tf_ = t.astype(dtype)
        mup = mu / (1.0 - jnp.exp(tf_ * jnp.log(b1)))
        nup = nu / (1.0 - jnp.exp(tf_ * jnp.log(b2)))
        step = mup / (1e-8 + jnp.sqrt(nup)) * state.learning_rate
        new_lr = state.learning_rate * jnp.asarray(self.decay, dtype)
        return step, AdamState(mu, nu, t, new_lr)


@dataclasses.dataclass(frozen=True)
class Adagrad:
    """RMSProp-style rule (reference: adagrad_gradient_descent.py:13-44)."""

    learning_rate: float = 1e-3
    decay: float = 1.0   # accepted for API parity; never applied (reference quirk)
    alpha: float = 0.9

    def init(self, shape, dtype):
        return AdagradState(
            hist=jnp.zeros(shape, dtype),
            count=jnp.zeros((), jnp.int32),
            learning_rate=jnp.asarray(self.learning_rate, dtype),
        )

    def update(self, state, phi):
        dtype = phi.dtype
        a = jnp.asarray(self.alpha, dtype)
        first = state.count == 0
        hist = jnp.where(first, phi ** 2, a * state.hist + (1.0 - a) * phi ** 2)
        step = phi / (1e-6 + jnp.sqrt(hist)) * state.learning_rate
        return step, AdagradState(hist, state.count + 1, state.learning_rate)


# Reference-compatible aliases (stein/optimizers/__init__.py:1-2).
AdamGradientDescent = Adam
AdagradGradientDescent = Adagrad
