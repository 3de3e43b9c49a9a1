"""Segment pooling: jnp vs Pallas (interpret mode on CPU) vs numpy oracle."""
import jax
import jax.numpy as jnp
import numpy as np

from openess_tpu.ops.segment_pool import segment_mean_pool, segment_mean_pool_pallas


def np_pool(feats, seg_ids, S, eps=1e-6):
    B, H, W, D = feats.shape
    ids = (seg_ids + np.arange(B)[:, None, None] * S).reshape(-1)
    f = feats.reshape(-1, D).astype(np.float64)
    sums = np.zeros((B * S, D))
    counts = np.zeros(B * S)
    np.add.at(sums, ids, f)
    np.add.at(counts, ids, 1)
    return (sums / (counts[:, None] + eps)).astype(np.float32), counts


def test_segment_mean_pool_matches_numpy(rng):
    B, H, W, D, S = 2, 17, 23, 32, 20
    feats = rng.normal(size=(B, H, W, D)).astype(np.float32)
    seg = rng.integers(0, S, size=(B, H, W)).astype(np.int32)
    means, counts = segment_mean_pool(feats, seg, segments_per_image=S)
    ref_means, ref_counts = np_pool(feats, seg, S)
    np.testing.assert_allclose(np.asarray(means), ref_means, atol=1e-5)
    np.testing.assert_allclose(np.asarray(counts), ref_counts, atol=0)


def test_segment_mean_pool_empty_segments_are_zero(rng):
    B, H, W, D, S = 1, 8, 8, 4, 50  # only ids 0..3 used -> 46 empty
    feats = rng.normal(size=(B, H, W, D)).astype(np.float32)
    seg = rng.integers(0, 4, size=(B, H, W)).astype(np.int32)
    means, counts = segment_mean_pool(feats, seg, segments_per_image=S)
    assert np.all(np.asarray(counts)[4:] == 0)
    np.testing.assert_allclose(np.asarray(means)[4:], 0.0, atol=0)


def test_pallas_pool_matches_jnp(rng):
    B, H, W, D, S = 2, 30, 40, 128, 100
    feats = rng.normal(size=(B, H, W, D)).astype(np.float32)
    seg = rng.integers(0, S, size=(B, H, W)).astype(np.int32)
    ref_means, ref_counts = segment_mean_pool(feats, seg, segments_per_image=S)

    # fast path: bf16 MXU multiplicands -> bf16-level agreement
    means, counts = segment_mean_pool_pallas(
        feats, seg, segments_per_image=S, chunk=512
    )
    np.testing.assert_allclose(np.asarray(counts), np.asarray(ref_counts), atol=0)
    np.testing.assert_allclose(
        np.asarray(means), np.asarray(ref_means), atol=5e-2, rtol=2e-2
    )

    # exact path
    means_hi, _ = segment_mean_pool_pallas(
        feats, seg, segments_per_image=S, chunk=512,
        precision=jax.lax.Precision.HIGHEST,
    )
    np.testing.assert_allclose(
        np.asarray(means_hi), np.asarray(ref_means), atol=1e-4
    )


def test_pallas_pool_gradients_match_jnp(rng):
    """Custom VJP (gather) must match autodiff through segment_sum."""
    import jax.numpy as jnp
    from openess_tpu.losses import nce_loss

    B, H, W, D, S = 1, 16, 24, 32, 10
    feats = rng.normal(size=(B, H, W, D)).astype(np.float32)
    feats2 = rng.normal(size=(B, H, W, D)).astype(np.float32)
    seg = rng.integers(0, S, size=(B, H, W)).astype(np.int32)

    def loss_jnp(f):
        k, _ = segment_mean_pool(f, seg, segments_per_image=S)
        q, _ = segment_mean_pool(jnp.asarray(feats2), seg, segments_per_image=S)
        return nce_loss(k, q)

    def loss_pallas(f):
        k, _ = segment_mean_pool_pallas(
            f, seg, segments_per_image=S, precision=jax.lax.Precision.HIGHEST
        )
        q, _ = segment_mean_pool_pallas(
            jnp.asarray(feats2), seg, segments_per_image=S,
            precision=jax.lax.Precision.HIGHEST,
        )
        return nce_loss(k, q)

    g1 = jax.grad(loss_jnp)(jnp.asarray(feats))
    g2 = jax.grad(loss_pallas)(jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_pixel_order_hwb_matches_bhw():
    """hwb pixel enumeration (the conv-layout bitcast path used by the
    train steps) must produce the same means/counts and the same feature
    gradients as the row-major default — segment sums are pixel-order
    invariant."""
    rng = np.random.default_rng(11)
    B, H, W, D, S = 2, 12, 17, 8, 30
    feats = rng.normal(size=(B, H, W, D)).astype(np.float32)
    seg = rng.integers(0, S, size=(B, H, W)).astype(np.int32)

    for fn in (segment_mean_pool, segment_mean_pool_pallas):
        kw = (
            {"precision": jax.lax.Precision.HIGHEST}
            if fn is segment_mean_pool_pallas
            else {}
        )
        m0, c0 = fn(jnp.asarray(feats), seg, segments_per_image=S, **kw)
        m1, c1 = fn(
            jnp.asarray(feats), seg, segments_per_image=S,
            pixel_order="hwb", **kw
        )
        np.testing.assert_allclose(np.asarray(m0), np.asarray(m1), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))

    def loss(f, order):
        k, _ = segment_mean_pool_pallas(
            f, seg, segments_per_image=S, pixel_order=order,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.sum(k * k)

    g0 = jax.grad(lambda f: loss(f, "bhw"))(jnp.asarray(feats))
    g1 = jax.grad(lambda f: loss(f, "hwb"))(jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-5)
