"""TPU fidelity tests: run on the REAL accelerator (no platform forcing,
unlike tests/conftest.py which pins CPU+x64).

Run on a TPU machine:  python -m pytest tests_tpu/ -q
On a CPU-only machine every test skips.

Note (axon platform): TPU process startup costs ~100 s; batch this suite
with other TPU work where possible.
"""

from stein_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
