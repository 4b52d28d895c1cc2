"""Reference-compatible import paths and converter semantics."""

import numpy as np
import jax.numpy as jnp


def test_reference_import_paths():
    from stein_tpu.samplers import SteinSampler
    from stein_tpu.optimizers import (
        AdamGradientDescent, AdagradGradientDescent,
    )
    from stein_tpu.kernels import SquaredExponentialKernel
    from stein_tpu.utilities import (
        convert_dictionary_to_array, convert_array_to_dictionary,
        compute_median,
    )
    assert SteinSampler is not None
    assert AdamGradientDescent(learning_rate=0.1).learning_rate == 0.1
    assert AdagradGradientDescent().alpha == 0.9
    assert SquaredExponentialKernel() is not None
    assert callable(convert_dictionary_to_array)
    assert callable(convert_array_to_dictionary)
    assert callable(compute_median)


def test_converters_roundtrip_sorted_layout():
    from stein_tpu.utilities import (
        convert_dictionary_to_array, convert_array_to_dictionary,
    )
    rng = np.random.default_rng(0)
    n = 5
    d = {
        "b_weights": rng.normal(size=(n, 2, 3)),
        "a_bias": rng.normal(size=(n, 4)),
        "c_scalar": rng.normal(size=(n,)),
    }
    arr, idx = convert_dictionary_to_array(d)
    assert arr.shape == (n, 6 + 4 + 1)
    # Sorted-key layout (reference converters.py:40): a_bias first.
    assert idx["a_bias"] == (0, 4)
    assert idx["b_weights"] == (4, 10)
    assert idx["c_scalar"] == (10, 11)
    np.testing.assert_allclose(
        np.asarray(arr[:, 0:4]), d["a_bias"]
    )
    back = convert_array_to_dictionary(
        arr, idx, {"a_bias": (4,), "b_weights": (2, 3), "c_scalar": ()}
    )
    for k in d:
        np.testing.assert_allclose(np.asarray(back[k]), d[k])


def test_compute_median_alias():
    from stein_tpu.utilities import compute_median
    x = jnp.asarray([3.0, 1.0, 2.0, 10.0])
    assert float(compute_median(x)) == 2.5


def test_save_restore_without_npz_suffix(tmp_path):
    import jax, numpy as np
    from stein_tpu import SVGDSampler, Adam
    from stein_tpu.models import LinearRegressionModel
    rng = np.random.default_rng(0)
    X = rng.normal(size=(20, 2)); y = X @ rng.normal(size=(2, 1))
    model = LinearRegressionModel(2)
    batch = {"X": jnp.asarray(X), "y": jnp.asarray(y)}
    s = SVGDSampler(8, model.log_p, model.template(jnp.float64),
                    Adam(learning_rate=1e-1), key=jax.random.PRNGKey(0),
                    dtype=jnp.float64)
    s.train_on_batch(batch)
    path = str(tmp_path / "ckpt")       # no extension
    s.save(path)
    import os
    assert os.path.exists(path)
    s.restore(path)
    assert int(s.state.step) == 1


def test_donate_false_keeps_state_references():
    import jax, numpy as np
    from stein_tpu import SVGDSampler, Adam
    from stein_tpu.models import LinearRegressionModel
    rng = np.random.default_rng(1)
    X = rng.normal(size=(20, 2)); y = X @ rng.normal(size=(2, 1))
    model = LinearRegressionModel(2)
    batch = {"X": jnp.asarray(X), "y": jnp.asarray(y)}
    s = SVGDSampler(8, model.log_p, model.template(jnp.float64),
                    Adam(learning_rate=1e-1), key=jax.random.PRNGKey(0),
                    dtype=jnp.float64, donate=False)
    p0 = s.state.particles
    s.run(batch, 3)
    s.train_on_batches({"X": jnp.asarray(X)[None], "y": jnp.asarray(y)[None]})
    np.asarray(p0)  # must still be alive — donation was opted out


def test_option_guards():
    import pytest, jax
    from stein_tpu import SVGDSampler, Adam, InverseMultiquadricKernel
    from stein_tpu.models import LinearRegressionModel
    from stein_tpu.parallel import particle_mesh
    model = LinearRegressionModel(2)
    common = dict(n_particles=8, log_p=model.log_p,
                  param_template=model.template(jnp.float64),
                  gd=Adam(), dtype=jnp.float64)
    # pallas + exact median would materialise the n^2 matrix: refuse.
    with pytest.raises(ValueError):
        SVGDSampler(kernel_impl="pallas", median="exact", **common)
    mesh = particle_mesh(jax.devices()[:1])
    # Both 1-D and 2-D meshes honour custom kernels since r2 (generic
    # weights tile; equality tests in test_sharded.py / test_sharded2d.py).
    # A 2-D mesh still refuses median modes its tiled path cannot honour.
    import numpy as _np
    from jax.sharding import Mesh
    mesh2d = Mesh(_np.asarray(jax.devices()[:1]).reshape(1, 1),
                  ("particles", "model"))
    with pytest.raises(ValueError, match="2-D sharded median"):
        SVGDSampler(mesh=mesh2d, model_axis="model", median="subsample",
                    kernel=InverseMultiquadricKernel(), **common)
    with pytest.raises(ValueError):
        SVGDSampler(mesh=mesh, kernel_impl="pallas", **common)


import jax as _jax
import pytest as _pytest


@_pytest.mark.skipif(_jax.device_count() < 8, reason="needs 8 fake devices")
def test_mesh_remat_matches_plain():
    import jax, numpy as np
    from stein_tpu import SVGDSampler, Adam
    from stein_tpu.models import LinearRegressionModel
    from stein_tpu.parallel import particle_mesh
    rng = np.random.default_rng(2)
    X = rng.normal(size=(20, 2)); y = X @ rng.normal(size=(2, 1))
    model = LinearRegressionModel(2)
    batch = {"X": jnp.asarray(X), "y": jnp.asarray(y)}
    mesh = particle_mesh(jax.devices()[:8])
    theta0 = jnp.asarray(rng.normal(size=(16, 2)) * 0.01)
    def make(remat):
        return SVGDSampler(16, model.log_p, model.template(jnp.float64),
                           Adam(learning_rate=1e-1), theta=theta0,
                           dtype=jnp.float64, mesh=mesh, remat=remat)
    a, b = make(False), make(True)
    for _ in range(3):
        a.train_on_batch(batch)
        b.train_on_batch(batch)
    np.testing.assert_array_equal(a.samples, b.samples)
