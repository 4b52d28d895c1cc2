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
