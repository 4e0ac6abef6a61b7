"""Unit, property, and torch-oracle parity tests for the L1 point ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pointnet12_tpu import ops
from tests.torch_ref import ops_torch

B, N, S, K = 2, 512, 128, 16
RADIUS = 0.25


@pytest.fixture(scope="module")
def clouds():
    rng = np.random.RandomState(42)
    return rng.uniform(size=(B, N, 3)).astype(np.float32)


def boundary_mask(xyz, new_xyz, radius, tol=1e-5):
    """True where a query has ANY point within tol of the radius boundary.

    Different-but-correct implementations may legitimately disagree there
    (fp summation order); parity asserts are restricted to non-boundary rows.
    """
    d2 = np.sum(
        (new_xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2, axis=-1
    )
    return np.any(np.abs(d2 - radius**2) < tol, axis=-1)  # (B, S)


# ---------------------------------------------------------------- distance


def test_square_distance_matches_torch(clouds):
    dst = clouds[:, :100]
    got = ops.square_distance(jnp.asarray(clouds), jnp.asarray(dst))
    want = ops_torch.square_distance(
        torch.from_numpy(clouds), torch.from_numpy(dst)
    ).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_square_distance_diagonal_zero(clouds):
    d = np.asarray(
        ops.square_distance(jnp.asarray(clouds), jnp.asarray(clouds))
    )
    diag = d[:, np.arange(N), np.arange(N)]
    np.testing.assert_allclose(diag, 0.0, atol=1e-4)


# ------------------------------------------------------------------ gather


def test_index_points_2d_and_3d(clouds):
    rng = np.random.RandomState(0)
    idx2 = rng.randint(0, N, size=(B, S)).astype(np.int32)
    idx3 = rng.randint(0, N, size=(B, S, K)).astype(np.int32)
    for idx in (idx2, idx3):
        got = np.asarray(ops.index_points(jnp.asarray(clouds), jnp.asarray(idx)))
        want = ops_torch.index_points(
            torch.from_numpy(clouds), torch.from_numpy(idx).long()
        ).numpy()
        np.testing.assert_array_equal(got, want)


# --------------------------------------------------------------------- FPS


def test_fps_matches_torch(clouds):
    got = np.asarray(
        ops.farthest_point_sample(jnp.asarray(clouds), S, impl="jnp")
    )
    want = ops_torch.farthest_point_sample(
        torch.from_numpy(clouds), S, start=0
    ).numpy()
    np.testing.assert_array_equal(got, want)


def test_fps_indices_unique(clouds):
    idx = np.asarray(
        ops.farthest_point_sample(jnp.asarray(clouds), S, impl="jnp")
    )
    for b in range(B):
        assert len(np.unique(idx[b])) == S


def test_fps_greedy_min_distance_property(clouds):
    """Each picked point maximizes the min-distance to all previous picks."""
    idx = np.asarray(
        ops.farthest_point_sample(jnp.asarray(clouds), 32, impl="jnp")
    )
    for b in range(B):
        picked = clouds[b, idx[b]]
        for i in range(1, 32):
            d_all = np.min(
                np.sum((clouds[b][:, None] - picked[None, :i]) ** 2, -1),
                axis=-1,
            )  # min dist of every point to the prefix
            chosen = d_all[idx[b, i]]
            assert chosen >= d_all.max() - 1e-5


def test_fps_random_start_varies(clouds):
    k1 = jax.random.PRNGKey(1)
    k2 = jax.random.PRNGKey(2)
    i1 = np.asarray(
        ops.farthest_point_sample(jnp.asarray(clouds), 32, key=k1, impl="jnp")
    )
    i2 = np.asarray(
        ops.farthest_point_sample(jnp.asarray(clouds), 32, key=k2, impl="jnp")
    )
    assert not np.array_equal(i1, i2)


# -------------------------------------------------------------- ball query


def test_ballquery_matches_torch(clouds):
    new_xyz = clouds[:, :S]
    got = np.asarray(
        ops.query_ball_point(
            RADIUS, K, jnp.asarray(clouds), jnp.asarray(new_xyz), impl="jnp"
        )
    )
    want = ops_torch.query_ball_point(
        RADIUS, K, torch.from_numpy(clouds), torch.from_numpy(new_xyz)
    ).numpy()
    ok = ~boundary_mask(clouds, new_xyz, RADIUS)
    assert ok.mean() > 0.5  # sanity: comparison is not vacuous
    np.testing.assert_array_equal(got[ok], want[ok])


def test_ballquery_semantics(clouds):
    """First-K-by-index, ascending, padded with the first in-radius index."""
    new_xyz = clouds[:, :S]
    idx = np.asarray(
        ops.query_ball_point(
            RADIUS, K, jnp.asarray(clouds), jnp.asarray(new_xyz), impl="jnp"
        )
    )
    d2 = np.sum((new_xyz[:, :, None, :] - clouds[:, None, :, :]) ** 2, -1)
    in_radius = d2 <= RADIUS**2
    for b in range(B):
        for s in range(0, S, 17):
            true_first_k = np.where(in_radius[b, s])[0][:K]
            got = idx[b, s]
            n_valid = len(true_first_k)
            # allow boundary flips: only check when no boundary ambiguity
            if np.any(np.abs(d2[b, s] - RADIUS**2) < 1e-5):
                continue
            np.testing.assert_array_equal(got[:n_valid], true_first_k)
            if n_valid < K:  # padding slots duplicate the first index
                assert np.all(got[n_valid:] == true_first_k[0])


# ----------------------------------------------------------- interpolation


def test_three_interpolate_matches_torch(clouds):
    coarse_xyz = clouds[:, :64]
    rng = np.random.RandomState(1)
    coarse_feats = rng.randn(B, 64, 32).astype(np.float32)
    dists, idx = ops.three_nn(jnp.asarray(clouds), jnp.asarray(coarse_xyz))
    got = np.asarray(
        ops.three_interpolate(jnp.asarray(coarse_feats), idx, dists)
    )
    want = ops_torch.three_nn_interpolate(
        torch.from_numpy(clouds),
        torch.from_numpy(coarse_xyz),
        torch.from_numpy(coarse_feats),
    ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_three_interpolate_exact_at_coarse_points(clouds):
    """A fine point coinciding with a coarse point gets ~that feature."""
    coarse_xyz = clouds[:, :64]
    rng = np.random.RandomState(1)
    coarse_feats = rng.randn(B, 64, 8).astype(np.float32)
    dists, idx = ops.three_nn(jnp.asarray(coarse_xyz), jnp.asarray(coarse_xyz))
    out = np.asarray(
        ops.three_interpolate(jnp.asarray(coarse_feats), idx, dists)
    )
    np.testing.assert_allclose(out, coarse_feats, atol=1e-3)


# ---------------------------------------------------------------- grouping


def test_sample_and_group_shapes(clouds):
    feats = jnp.ones((B, N, 7))
    new_xyz, grouped = ops.sample_and_group(
        S, RADIUS, K, jnp.asarray(clouds), feats, impl="jnp"
    )
    assert new_xyz.shape == (B, S, 3)
    assert grouped.shape == (B, S, K, 10)


def test_sample_and_group_local_frame(clouds):
    """Grouped xyz are center-relative and inside the ball radius."""
    new_xyz, grouped = ops.sample_and_group(
        S, RADIUS, K, jnp.asarray(clouds), None, impl="jnp"
    )
    d2 = np.asarray(jnp.sum(grouped**2, -1))
    assert d2.max() <= RADIUS**2 + 1e-4


def test_sample_and_group_all(clouds):
    feats = jnp.ones((B, N, 5))
    new_xyz, grouped = ops.sample_and_group_all(jnp.asarray(clouds), feats)
    assert new_xyz.shape == (B, 1, 3)
    assert grouped.shape == (B, 1, N, 8)
    np.testing.assert_array_equal(np.asarray(new_xyz), 0.0)


def test_ballquery_auto_dispatch_table():
    """The impl="auto" routing policy (ops/ballquery.py crossover table):
    bitmask from N=1024 (incl. chunked-packing shapes above 4096), dense
    below / for shapes the bitmask kernel rejects, grid only for aligned
    N >= 8192."""
    from pointnet12_tpu.ops.ballquery import _bitmask_ok, _route

    assert _route(256, 64) == "pallas"       # below bitmask floor
    assert _route(1024, 256) == "bitmask"    # SA2
    assert _route(4096, 1024) == "bitmask"   # SA1 flagship
    assert _route(6144, 512) == "bitmask"    # chunked packing (6144 % 2048)
    assert _route(8192, 1024) == "grid"      # aligned large N
    assert _route(8192, 100) == "bitmask"    # grid alignment fails -> chunked
    assert _route(4112, 512) == "pallas"     # 4112 = 16*257: no chunk divisor
    assert _bitmask_ok(4112) is False
