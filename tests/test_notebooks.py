"""Execute the demo notebooks end to end (NB_SMOKE=1: tiny shapes, CPU
mesh) so examples/*.ipynb are tested artifacts like the reference's
executed notebooks (examples/cifar10/Evaluate the model.ipynb)."""
import json
import os
import subprocess
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")

pytest.importorskip("nbclient")


@pytest.mark.parametrize("name", ["mnist_demo", "cifar10_demo"])
def test_notebook_executes(name, tmp_path):
    src = os.path.abspath(os.path.join(EXAMPLES, f"{name}.ipynb"))
    out = tmp_path / f"{name}_executed.ipynb"
    env = dict(os.environ)
    env["NB_SMOKE"] = "1"
    # the kernel is a fresh process: it needs the repo importable and must
    # NOT inherit a forced single-device XLA_FLAGS from the test process
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.abspath(os.path.join(EXAMPLES, ".."))]
        + ([env["PYTHONPATH"]] if "PYTHONPATH" in env else [])
    )
    env.pop("XLA_FLAGS", None)
    res = subprocess.run(
        [
            sys.executable, "-m", "jupyter", "nbconvert",
            "--to", "notebook", "--execute",
            "--ExecutePreprocessor.timeout=600",
            "--output", str(out),
            src,
        ],
        cwd=EXAMPLES,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert res.returncode == 0, f"nbconvert failed:\n{res.stderr[-3000:]}"

    executed = json.loads(out.read_text())
    code_cells = [c for c in executed["cells"] if c["cell_type"] == "code"]
    assert code_cells, "no code cells executed"
    for c in code_cells:
        for o in c.get("outputs", []):
            assert o.get("output_type") != "error", o
        assert c.get("execution_count") is not None
