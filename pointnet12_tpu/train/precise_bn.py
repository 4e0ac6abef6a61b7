"""Precise BatchNorm: replace EMA running statistics with exact activation
statistics measured over training batches.

Why: with bf16 activations, per-batch BN statistics drift/oscillate faster
than the momentum-0.9 EMA can track, and eval-mode quality collapses while
train-mode (batch-stat) quality is fine — measured in round 1: synthetic-seg
eval mIoU 0.18 (bf16 EMA) vs 0.65 (bf16 batch stats) vs 0.47 (fp32 EMA).
Recomputing the statistics exactly over a handful of batches ("precise BN",
the standard production fix) removes the EMA lag entirely, for bf16 and
fp32 alike.

Mechanism: flax BN under ``mutable=["batch_stats"]`` updates
``new = m*old + (1-m)*batch``, so the batch statistic is recoverable as
``batch = (new - m*old) / (1-m)`` without touching the module. Across B
batches the exact pooled moments are

    mean = avg_b(mean_b)
    var  = avg_b(var_b + mean_b^2) - mean^2     (law of total variance)

Reference has no analog (torch BN EMA only); this is a TPU-native quality
subsystem motivated by bf16 training (SURVEY.md §7 "BatchNorm parity").
"""

from typing import Optional

import jax
import jax.numpy as jnp

from pointnet12_tpu.nn.mlp import BN_MOMENTUM


def _recover_batch_stats(new_bs, old_bs, momentum=BN_MOMENTUM):
    return jax.tree.map(
        lambda new, old: (new - momentum * old) / (1.0 - momentum),
        new_bs,
        old_bs,
    )


def _is_var_path(path) -> bool:
    last = path[-1]
    key = getattr(last, "key", getattr(last, "name", str(last)))
    return str(key) == "var"


def recompute_batch_stats(
    state,
    feeder,
    num_batches: int,
    rng: Optional[jax.Array] = None,
    mesh=None,
):
    """Return a copy of ``state`` whose batch_stats are exact pooled
    statistics over up to ``num_batches`` batches from ``feeder``.

    Runs train-mode forwards (batch statistics active) without updating
    params. Deterministic FPS (eval convention); dropout keyed by ``rng``
    but irrelevant to the statistics of layers before it.

    With ``mesh`` (the training CLI's data-parallel mesh), the stats pass
    uses the SAME shardings as the train step — batch sharded over the
    ``data`` axis, params/stats replicated — so mesh-replicated state and
    host batches mix without an implicit reshard (the per-batch statistics
    are whole-batch moments; XLA inserts the cross-shard reductions).
    """
    rng = jax.random.PRNGKey(0) if rng is None else rng

    def stats_fn(params, batch_stats, points):
        _, mut = state.apply_fn(
            {"params": params, "batch_stats": batch_stats},
            points,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        return _recover_batch_stats(mut["batch_stats"], batch_stats)

    if mesh is None:
        stats_of = jax.jit(stats_fn)
        put_points = jnp.asarray
    else:
        from pointnet12_tpu.parallel import mesh as mesh_lib

        repl = mesh_lib.replicated(mesh)
        data = mesh_lib.batch_sharding(mesh)
        stats_of = jax.jit(
            stats_fn, in_shardings=(repl, repl, data), out_shardings=repl
        )

        def put_points(x):
            return jax.device_put(jnp.asarray(x), data)

    sum_mean = None  # accumulates mean_b (for "mean") and var_b + mean_b^2 (for "var")
    n = 0
    # stat_batches does not advance the feeder's epoch counter, so the
    # training shuffle/augmentation stream is unaffected by this pass.
    batches = (
        feeder.stat_batches(num_batches)
        if hasattr(feeder, "stat_batches")
        else feeder
    )
    for batch in batches:
        if n >= num_batches:
            break
        bstats = stats_of(
            state.params, state.batch_stats, put_points(batch["points"])
        )
        if mesh is not None:
            from pointnet12_tpu.parallel.mesh import cpu_mesh_sync

            cpu_mesh_sync(mesh, bstats)
        # for var leaves accumulate var_b + mean_b^2 (sibling mean lives at
        # the same subtree under key "mean")
        def acc_leaf(path, leaf):
            if _is_var_path(path):
                sub = bstats
                for p in path[:-1]:
                    sub = sub[getattr(p, "key", getattr(p, "name", None))]
                return leaf + sub["mean"] ** 2
            return leaf

        contrib = jax.tree_util.tree_map_with_path(acc_leaf, bstats)
        sum_mean = (
            contrib
            if sum_mean is None
            else jax.tree.map(jnp.add, sum_mean, contrib)
        )
        n += 1
    if n == 0:
        return state

    avg = jax.tree.map(lambda x: x / n, sum_mean)

    # var = avg(var_b + mean_b^2) - mean^2
    def finish_leaf(path, leaf):
        if _is_var_path(path):
            sub = avg
            for p in path[:-1]:
                sub = sub[getattr(p, "key", getattr(p, "name", None))]
            return jnp.maximum(leaf - sub["mean"] ** 2, 0.0)
        return leaf

    pooled = jax.tree_util.tree_map_with_path(finish_leaf, avg)
    return state.replace(batch_stats=pooled)
