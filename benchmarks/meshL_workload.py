"""The large-n mesh workload builder, shared by bench.py's meshL rows
and benchmarks/mesh_grid_probe.py so the driver-captured bench numbers
and the probe that justifies their tuning can never drift apart
(r5 review finding: the two had verbatim copies).

Shape: n=8192 particles, p=64 Bayesian linear regression with
sufficient statistics — p=64 keeps the fused bracket kernel inside its
VMEM gate at 64 global median rows (RESULTS.md r4 row).
"""

import numpy as np


N_PARTICLES = 8192
P64 = 64


def make_meshL_sampler(mesh, n_obs=1000, **kw):
    """Build (sampler, batch): the n=8192/p=64 fused_shard workload on
    ``mesh``. ``kw`` overrides/extends the sampler options (the probe's
    median_collectives / comm arms)."""
    import jax.numpy as jnp

    from stein_tpu import Adam, SVGDSampler
    from stein_tpu.models import LinearRegressionModel

    rng = np.random.default_rng(2)
    Xl = rng.normal(size=(n_obs, P64))
    yl = Xl @ rng.normal(size=(P64, 1)) + rng.normal(
        size=(n_obs, 1)) * 0.3
    th0 = rng.normal(size=(N_PARTICLES, P64)) * 0.01
    model = LinearRegressionModel(P64)
    batch = model.sufficient_batch(
        {"X": jnp.asarray(Xl, jnp.float32),
         "y": jnp.asarray(yl, jnp.float32)})
    sampler = SVGDSampler(
        n_particles=N_PARTICLES, log_p=model.log_p,
        param_template=model.template(), gd=Adam(learning_rate=1e-1),
        theta=jnp.asarray(th0, jnp.float32), mesh=mesh,
        step_impl="fused_shard", pallas_block=1024,
        median="bisect", median_passes=16, warm_median=True,
        warm_passes=6, median_max_rows=64,
        quadratic_form=model.quadratic_form, **kw,
    )
    return sampler, batch
