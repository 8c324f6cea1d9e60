"""Reference-format accuracy tables: roundtrip ours, read the reference's
real shipped artifacts (examples/cifar10/checkpoints/accuracy/*.pkl)."""
import glob
import os

import pytest

from neural_ode_metasolver_tpu.training import (
    load_accuracy_table,
    save_accuracy_table,
)

REF_DIR = "/root/reference/examples/cifar10/checkpoints/accuracy"


def test_roundtrip(tmp_path):
    path = str(tmp_path / "table.pkl")
    accs = [[0.5, 0.6, 0.7], [0.55, 0.65, 0.75]]
    steps = [1, 2, 8]
    save_accuracy_table(path, accs, steps)
    d = load_accuracy_table(path)
    assert d["accs"] == accs
    assert d["steps_arr"] == steps
    assert os.path.exists(path + ".csv")
    with open(path + ".csv") as f:
        header = f.readline().strip().split(",")
    assert header == ["model", "steps_1", "steps_2", "steps_8"]


def test_misaligned_rows_rejected(tmp_path):
    with pytest.raises(ValueError):
        save_accuracy_table(str(tmp_path / "x.pkl"), [[0.5, 0.6]], [1])


def test_not_a_table_rejected(tmp_path):
    import pickle

    p = tmp_path / "junk.pkl"
    p.write_bytes(pickle.dumps({"foo": 1}))
    with pytest.raises(ValueError):
        load_accuracy_table(str(p))


@pytest.mark.skipif(not os.path.isdir(REF_DIR),
                    reason="reference artifacts not available")
def test_reads_all_reference_tables():
    """Every accuracy table the reference ships loads cleanly and has the
    published shape (steps_arr sweep starting at 1, accs in [0, 1])."""
    paths = sorted(glob.glob(os.path.join(REF_DIR, "*.pkl")))
    assert len(paths) >= 6
    for p in paths:
        d = load_accuracy_table(p)
        assert d["steps_arr"][0] == 1
        assert d["steps_arr"] == sorted(d["steps_arr"])
        for row in d["accs"]:
            assert all(0.0 <= a <= 1.0 for a in row)
