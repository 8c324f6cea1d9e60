"""MNIST boundary-decay LR schedule cross-validated against the reference's
OWN `learning_rate_with_decay` (sopa/src/models/odenet_mnist/utils.py:7-18).

tests/test_training.py checks our schedule against hand-computed values and
torch's CyclicLR; this runs the reference function itself over a dense
iteration range (boundaries inclusive/exclusive behavior, the
lr0 * batch_size / batch_denom scaling, and the trailing everything-after
bucket) and asserts pointwise equality.
"""
import os
import sys

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT), reason="reference not available"
)

from neural_ode_metasolver_tpu.training.schedules import (  # noqa: E402
    learning_rate_with_decay,
)


def _ref_schedule(**kw):
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from sopa.src.models.odenet_mnist.utils import (
        learning_rate_with_decay as ref_fn,
    )

    return ref_fn(**kw)


@pytest.mark.parametrize(
    "batch_size,batch_denom,bpe,boundaries,decays,lr0",
    [
        # the reference CLI's shipped config (runner.py:137-139)
        (128, 128, 469, [60, 100, 140], [1, 0.1, 0.01, 0.001], 0.1),
        # batch scaling exercised (lr0 * bs / denom) + uneven boundaries
        (256, 128, 100, [1, 3, 7], [1.0, 0.5, 0.25, 0.125], 0.05),
        (32, 256, 7, [2, 5, 9], [1.0, 0.3, 0.09, 0.027], 1.0),
    ],
)
def test_boundary_decay_schedule_parity(
    batch_size, batch_denom, bpe, boundaries, decays, lr0
):
    ref = _ref_schedule(
        batch_size=batch_size,
        batch_denom=batch_denom,
        batches_per_epoch=bpe,
        boundary_epochs=boundaries,
        decay_rates=decays,
        lr0=lr0,
    )
    ours = learning_rate_with_decay(
        lr0=lr0,
        batch_size=batch_size,
        batches_per_epoch=bpe,
        batch_denom=batch_denom,
        boundary_epochs=boundaries,
        decay_rates=decays,
    )
    # dense coverage across every boundary, including the exact boundary
    # iterations (reference: itr < b strict, so itr == b*bpe decays)
    last = boundaries[-1] * bpe + 2 * bpe
    itrs = sorted(
        set(range(0, last, max(bpe // 3, 1)))
        | {b * bpe + d for b in boundaries for d in (-1, 0, 1)}
    )
    for itr in itrs:
        np.testing.assert_allclose(
            float(ref(itr)),
            float(ours(itr)),
            rtol=1e-6,
            err_msg=f"itr={itr}",
        )
