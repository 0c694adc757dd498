import numpy as np
import pytest

from my_lidar_graph_slam_v2_tpu.core import pose as P
from my_lidar_graph_slam_v2_tpu.grid import values as gv


def rand_pose(rng, n=None):
    shape = (3,) if n is None else (n, 3)
    p = rng.uniform(-5, 5, size=shape)
    p[..., 2] = rng.uniform(-np.pi, np.pi, size=shape[:-1])
    return p


class TestPose:
    def test_compound_inverse_roundtrip(self):
        rng = np.random.default_rng(0)
        a, b = rand_pose(rng, 64), rand_pose(rng, 64)
        rel = P.inverse_compound(a, b)
        b2 = P.compound(a, rel)
        np.testing.assert_allclose(b2, b, atol=1e-12)

    def test_move_backward(self):
        rng = np.random.default_rng(1)
        a, d = rand_pose(rng, 64), rand_pose(rng, 64)
        end = P.compound(a, d)
        a2 = P.move_backward(end, d)
        np.testing.assert_allclose(a2, a, atol=1e-12)

    def test_normalize_angle(self):
        vals = np.array([0.0, np.pi, -np.pi, 3 * np.pi, -3 * np.pi, 7.0, -7.0])
        out = P.normalize_angle(vals)
        assert np.all(out <= np.pi) and np.all(out >= -np.pi)
        np.testing.assert_allclose(np.cos(out), np.cos(vals), atol=1e-12)
        np.testing.assert_allclose(np.sin(out), np.sin(vals), atol=1e-12)

    def test_covariance_roundtrip(self):
        rng = np.random.default_rng(2)
        pose = rand_pose(rng)
        m = rng.normal(size=(3, 3))
        cov = m @ m.T
        local = P.covariance_world_to_local(pose, cov)
        world = P.covariance_local_to_world(pose, local)
        np.testing.assert_allclose(world, cov, atol=1e-12)

    def test_jax_matches_numpy(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        a, b = rand_pose(rng, 16), rand_pose(rng, 16)
        np.testing.assert_allclose(
            np.asarray(P.compound(jnp.asarray(a), jnp.asarray(b))),
            P.compound(a, b),
            atol=1e-5,
        )


class TestValues:
    def test_codec_roundtrip(self):
        vals = np.arange(0, 65536, dtype=np.uint32).astype(np.uint16)
        probs = gv.value_to_prob(vals)
        assert probs[0] == 0.0
        assert probs[1] == pytest.approx(gv.PROB_MIN)
        assert probs[-1] == pytest.approx(gv.PROB_MAX)
        # Round trip may lose 1 LSB to float truncation, exactly as the
        # C++ codec's implicit double->u16 conversion does.
        back = gv.prob_to_value(probs[1:])
        assert np.max(np.abs(back.astype(int) - vals[1:].astype(int))) <= 1

    def test_logodds_roundtrip(self):
        vals = np.array([0, 1, 1000, 32768, 65535], dtype=np.uint16)
        lo, obs = gv.value_to_logodds(vals)
        v2 = gv.logodds_to_value(lo, obs)
        assert v2[0] == 0
        np.testing.assert_allclose(
            v2[1:].astype(int), vals[1:].astype(int), atol=1
        )

    def test_bayes_update_matches_reference_rule(self):
        # unknown + odds_hit -> p_hit exactly
        from my_lidar_graph_slam_v2_tpu.utils import oracle

        odds_hit = gv.prob_to_odds(0.62)
        v = oracle.update_odds_u16(0, odds_hit)
        assert gv.value_to_prob(v) == pytest.approx(0.62, abs=1e-4)
        # two hits: OddsToProb(odds^2)
        v2 = oracle.update_odds_u16(v, odds_hit)
        expect = gv.odds_to_prob(odds_hit * odds_hit)
        assert gv.value_to_prob(v2) == pytest.approx(expect, abs=1e-4)


def test_grid_counted_matches_sequential_oracle():
    """GridCounted (grid/counted.py): batched scatter updates reproduce
    the reference's sequential per-cell hit/count semantics
    (grid_counted.cpp:286-305: counts += 1, hits += hit, p = hits/counts,
    u16 via the shared codec with 0 = unknown)."""
    import jax.numpy as jnp

    from my_lidar_graph_slam_v2_tpu.grid import values as gv
    from my_lidar_graph_slam_v2_tpu.grid.counted import GridCounted

    rng = np.random.default_rng(3)
    rows = cols = 16
    g = GridCounted(rows, cols)
    N = 400
    rr = rng.integers(-2, rows + 2, N)   # includes out-of-raster entries
    cc = rng.integers(-2, cols + 2, N)
    hh = rng.random(N) > 0.4
    vv = rng.random(N) > 0.1

    # sequential oracle
    hits = np.zeros((rows, cols), np.int64)
    counts = np.zeros((rows, cols), np.int64)
    for r, c, h, v in zip(rr, cc, hh, vv):
        if v and 0 <= r < rows and 0 <= c < cols:
            counts[r, c] += 1
            hits[r, c] += bool(h)

    # batched update in two chunks (accumulation across calls)
    half = N // 2
    g.update(rr[:half], cc[:half], hh[:half], vv[:half])
    g.update(rr[half:], cc[half:], hh[half:], vv[half:])

    np.testing.assert_array_equal(np.asarray(g.counts), counts)
    np.testing.assert_array_equal(np.asarray(g.hits), hits)

    # probability and u16 codec
    p = np.where(counts > 0, hits / np.maximum(counts, 1), 0.0)
    np.testing.assert_allclose(np.asarray(g.prob()), p, atol=1e-6)
    v16 = np.asarray(g.values_u16())
    assert v16[counts == 0].sum() == 0  # unknown -> 0
    known = counts > 0
    expect = np.clip(
        np.round(
            gv.VALUE_MIN
            + (p - gv.PROB_MIN)
            * (gv.VALUE_MAX - gv.VALUE_MIN)
            / (gv.PROB_MAX - gv.PROB_MIN)
        ),
        gv.VALUE_MIN, gv.VALUE_MAX,
    )
    np.testing.assert_allclose(v16[known], expect[known], atol=1)
    # u8 view = value >> 8
    np.testing.assert_array_equal(
        np.asarray(g.values_u8()), (v16 >> 8).astype(np.uint8)
    )
