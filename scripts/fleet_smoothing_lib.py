"""Shared fleet path for the digits smoothing campaign drivers.

`digits_smoothing_experiment.py` and `digits_smoothing_best_iterate.py`
train their (regime x seed) arms sequentially — exactly the reference's
seed-replication-as-separate-processes pattern (reference README.md:48,59).
This module gives both drivers one `--fleet` implementation on top of
`training/fleet.py`: all seeds of one regime advance as a single jitted
vmapped program, one device dispatch per step, chunked so arbitrarily
large seed lists fit memory while every chunk reuses ONE compilation.

CRN pairing is preserved exactly: both regime arms consume the identical
per-seed key chains (key(seed) -> init split -> per-batch splits) and the
identical per-epoch batch orders (seed*977+epoch), so member i of the
standalone fleet and member i of the smoothing fleet share init, batch
order, and attack draws — the train step splits its key as (noise,
attack, attack-fwd, fwd, data) whether or not the noise subkey is
consumed (training/train.py:222).

Numerics: a fleet campaign is its own stream (batch-grouped-conv
lowering — training/fleet.py:21-28); rows from here must not be mixed
with stored sequential rows, only analyzed as fresh pre-registered
campaigns.  The paired CRN design is unaffected: both arms of a pair run
under the same lowering.

Eval-key chain: the fleet's post-training chain is offset ONE split from
the sequential drivers' (they split once — k_adv; this path burns a
clean-eval split first, so its k_adv is the second split; see the
final-iterate block below).  Frozen as-is mid-campaign (round 4, seeds
1000-1447): every fleet row shares the offset, both CRN arms consume
identical chains, so pairing is exact — but fleet robust endpoints are
not key-position-identical to sequential re-runs of the same seed, which
the "own stream" rule above already forbids comparing anyway.

Endpoints: with `track_best=True` this reproduces the best-iterate
protocol — after every epoch the whole-test-set clean accuracy is
evaluated per member in the same dispatch and the argmax-by-clean
(params, model_state) snapshot is kept ON DEVICE (a vmapped jnp.where
over the stacked pytree; strict >, earliest best wins ties) — the
reference's model_best selection rule (train_validate.py:150-162).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from neural_ode_metasolver_tpu.data import batch_iterator
from neural_ode_metasolver_tpu.training import (
    create_fleet_state,
    fleet_keys,
    make_fleet_eval_step,
    make_fleet_train_step,
)


def _split_fleet(keys):
    """Vmapped (carry, sub) = split(key) — the fleet twin of the
    sequential scripts' ``key, sub = jax.random.split(key)`` chain."""
    pairs = jax.vmap(jax.random.split)(keys)
    return pairs[:, 0], pairs[:, 1]


def run_fleet_regime(
    regime,
    model,
    tx,
    solvers,
    opts,
    attack_cfg,
    noise_cfg,
    train_ds,
    test_ds,
    seeds,
    nepochs,
    *,
    eval_attack_cfg,
    batch=128,
    batch_seed_stride=977,
    track_best=False,
    chunk_size=None,
    log=print,
):
    """Train + evaluate one regime's whole seed list as fleet chunks.

    Returns one row dict per seed: ``{regime, seed, clean_acc,
    robust_acc}`` plus, when ``track_best``, ``{final_clean,
    final_robust, best_epoch}`` with clean_acc/robust_acc being the
    best-iterate endpoints (the sequential best-iterate driver's FIELDS).
    """
    chunk_size = min(chunk_size or len(seeds), len(seeds))
    fstep = make_fleet_train_step(model, tx, solvers, opts,
                                  attack_cfg=attack_cfg,
                                  noise_cfg=noise_cfg)
    clean_fn = make_fleet_eval_step(model, solvers, opts)
    pgd_fn = make_fleet_eval_step(model, solvers, opts,
                                  attack_cfg=eval_attack_cfg)

    n_test = len(test_ds)
    xt = jnp.asarray(test_ds.images)
    yt = jnp.asarray(test_ds.labels)
    xts = jnp.broadcast_to(xt[None], (chunk_size,) + xt.shape)
    yts = jnp.broadcast_to(yt[None], (chunk_size,) + yt.shape)
    # clean eval consumes no randomness at train=False; the kernel still
    # takes a key argument, so pass a fixed one (NOT drawn from the
    # member chains — keeps the training chain identical to the
    # sequential scripts', which evaluate clean keylessly)
    k_unused = fleet_keys([0] * chunk_size)

    if track_best:

        @jax.jit
        def track(best, params, state, epoch):
            acc = clean_fn(params, state, xts, yts, k_unused) / n_test
            improved = acc > best[0]

            def take(new, old):
                b = improved.reshape(improved.shape
                                     + (1,) * (new.ndim - 1))
                return jnp.where(b, new, old)

            return (jnp.where(improved, acc, best[0]),
                    jnp.where(improved, epoch, best[1]),
                    jax.tree.map(take, params, best[2]),
                    jax.tree.map(take, state, best[3]))

    rows = []
    for lo in range(0, len(seeds), chunk_size):
        chunk = list(seeds[lo:lo + chunk_size])
        n_real = len(chunk)
        # pad the tail chunk to chunk_size so every chunk reuses the same
        # compiled program (padding members re-run the first seeds; their
        # rows are dropped)
        while len(chunk) < chunk_size:
            chunk.append(chunk[0])
        S = chunk_size
        t0 = time.time()

        carry, inits = _split_fleet(fleet_keys(chunk))
        fts = create_fleet_state(model, tx, inits)
        if track_best:
            # copies: the fleet train step DONATES fts, so best[] must
            # never alias buffers a step call will consume
            copy = lambda t: jax.tree.map(
                lambda a: jnp.array(a, copy=True), t)
            best = (jnp.full((S,), -1.0, jnp.float32),
                    jnp.full((S,), -1, jnp.int32),
                    copy(fts.params), copy(fts.model_state))

        for epoch in range(nepochs):
            iters = [
                batch_iterator(train_ds, batch,
                               seed=s * batch_seed_stride + epoch,
                               crop_padding=4)
                for s in chunk
            ]
            for batches in zip(*iters):
                x = jnp.asarray(np.stack([b[0] for b in batches]))
                y = jnp.asarray(np.stack([b[1] for b in batches]))
                carry, subs = _split_fleet(carry)
                fts, _ = fstep(fts, x, y, subs)
            if track_best:
                best = track(best, fts.params, fts.model_state,
                             jnp.int32(epoch))

        # final-iterate endpoints.  NOTE: this first split is burnt —
        # clean eval consumes no randomness (k_unused below) — so k_adv
        # is the SECOND post-training split, one position past the
        # sequential drivers' chain (module docstring, "Eval-key chain").
        # Do not remove it: the round-4 campaign chunks are keyed this
        # way and all fleet rows must share one chain layout.
        carry, _k_burnt = _split_fleet(carry)
        final_clean = np.asarray(
            clean_fn(fts.params, fts.model_state, xts, yts, k_unused)
        ) / n_test
        carry, k_adv = _split_fleet(carry)
        final_robust = np.asarray(
            pgd_fn(fts.params, fts.model_state, xts, yts, k_adv)
        ) / n_test

        if track_best:
            carry, k_adv_best = _split_fleet(carry)
            best_clean = np.asarray(best[0])
            best_epoch = np.asarray(best[1])
            best_robust = np.asarray(
                pgd_fn(best[2], best[3], xts, yts, k_adv_best)
            ) / n_test

        for i in range(n_real):
            if track_best:
                row = {"regime": regime, "seed": chunk[i],
                       "clean_acc": float(best_clean[i]),
                       "robust_acc": float(best_robust[i]),
                       "final_clean": float(final_clean[i]),
                       "final_robust": float(final_robust[i]),
                       "best_epoch": int(best_epoch[i])}
                log(f"{regime:10s} seed={chunk[i]} "
                    f"best@{row['best_epoch']:02d} "
                    f"clean={row['clean_acc']:.4f} "
                    f"pgd={row['robust_acc']:.4f} "
                    f"(final clean={row['final_clean']:.4f} "
                    f"pgd={row['final_robust']:.4f})")
            else:
                row = {"regime": regime, "seed": chunk[i],
                       "clean_acc": float(final_clean[i]),
                       "robust_acc": float(final_robust[i])}
                log(f"{regime:10s} seed={chunk[i]} "
                    f"clean={row['clean_acc']:.4f} "
                    f"pgd={row['robust_acc']:.4f}")
            rows.append(row)
        log(f"[fleet] {regime} chunk {lo // chunk_size + 1}/"
            f"{(len(seeds) + chunk_size - 1) // chunk_size} "
            f"(S={S}, {n_real} real) in {time.time() - t0:.1f}s")
    return rows
