"""Smoke tests: every example script runs end-to-end (tiny configs, CPU)."""

import runpy
import sys

import pytest


EXAMPLES = [
    ("examples/linear_regression.py", ["--n-iters", "120"]),
    ("examples/linear_regression.py",
     ["--n-iters", "60", "--plot", "/tmp/linreg_test_plot.png"]),
    ("examples/logistic_regression.py",
     ["--n-iters", "40", "--n-particles", "8", "--n-prog", "20",
      "--n-data", "500"]),
    ("examples/regression_neural_network.py",
     ["--n-iters", "40", "--n-particles", "4", "--n-hidden", "8",
      "--n-prog", "20"]),
    ("examples/production_run.py",
     ["--n-iters", "40", "--n-particles", "8", "--n-batch", "16",
      "--ckpt-every", "20", "--ckpt", "{tmp}/prod.ckpt"]),
    ("examples/large_particle.py",
     ["--n-particles", "64", "--n-feats", "4", "--n-obs", "50",
      "--n-iters", "21", "--chunk", "10", "--kernel-impl", "xla"]),
]


@pytest.mark.parametrize("script,args", EXAMPLES,
                         ids=[f"{i}-{e[0].split(chr(47))[-1]}" for i, e in enumerate(EXAMPLES)])
def test_example_runs(script, args, capsys, monkeypatch, tmp_path):
    if "--plot" in args:
        pytest.importorskip("matplotlib")
    args = [a.format(tmp=tmp_path) if "{tmp}" in a else a for a in args]
    monkeypatch.setattr(sys, "argv", [script] + args)
    runpy.run_path(script, run_name="__main__")
    out = capsys.readouterr().out
    assert ("Time elapsed" in out or "steps/s" in out or "posterior" in out
            or "KSD" in out)
