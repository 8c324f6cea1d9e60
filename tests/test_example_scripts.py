"""The examples/*.py scripts run end-to-end (subprocess smoke, tiny
shapes) — the executable counterparts of the reference's example drivers,
tested like the notebooks are."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, args):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script),
         "--platform", "cpu"] + args,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=480,
    )
    assert res.returncode == 0, (res.stdout[-2000:], res.stderr[-2000:])
    return res.stdout


def test_mnist_build_and_evaluate_script():
    out = _run("mnist_build_and_evaluate.py",
               ["--batch_size", "8", "--n_eval", "16", "--n_steps", "2"])
    assert "acc" in out.lower()


def test_cifar10_build_and_evaluate_script():
    out = _run("cifar10_build_and_evaluate.py",
               ["--in_planes", "8", "--batch_size", "8", "--n_eval", "16",
                "--n_steps", "2"])
    # all four regimes evaluated
    for label in ("standalone", "switch", "solver ens", "model ensembling"):
        assert label in out, out[-600:]


def test_learn_solver_coefficient_script():
    out = _run("learn_solver_coefficient.py", ["--steps", "10"])
    assert "u" in out.lower()
