"""Log-density helpers matching tf.contrib.distributions semantics.

The reference builds priors/likelihoods from TF 1.12's Normal and Gamma
distributions (examples/*/main.py). These are the closed-form log-probs those
classes computed, as pure jnp functions.
"""

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln


def resolve_precision(name):
    """Model data-matmul precision by name. "high" (bf16_3x,
    ~f32-accurate products — the default; the reference's TF1 graph ran
    f32) keeps per-particle gradients f32-faithful (~1e-5 phi class).
    "default" (1-pass bf16 inputs, the TPU's native matmul rate) lands
    gradients in a ~6e-4 phi class (measured, benchmarks/RESULTS.md r2)
    — INSIDE the ~2e-3 tolerance class the production fused/Pallas
    kernels already accept, so it is a consistent opt-in for
    throughput-first runs (posterior statistics pinned in tests_tpu).
    "highest" is the 6-pass true-f32 tier (never needed here)."""
    return {
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
        "highest": jax.lax.Precision.HIGHEST,
    }[name]


def normal_log_prob(x, loc, scale):
    """log N(x; loc, scale). Matches tf.distributions.Normal.log_prob."""
    z = (x - loc) / scale
    return -0.5 * z * z - jnp.log(scale) - 0.5 * jnp.log(2.0 * jnp.pi)


def gamma_log_prob(x, concentration, rate):
    """log Gamma(x; concentration alpha, rate beta).

    Matches tf.distributions.Gamma.log_prob:
    alpha*log(beta) - lgamma(alpha) + (alpha-1)*log(x) - beta*x.
    """
    concentration = jnp.asarray(concentration, x.dtype)
    rate = jnp.asarray(rate, x.dtype)
    return (
        concentration * jnp.log(rate)
        - gammaln(concentration)
        + (concentration - 1.0) * jnp.log(x)
        - rate * x
    )
