"""Resize ops vs torch F.interpolate oracles (both align conventions)."""
import numpy as np
import torch
import torch.nn.functional as F
import pytest

from openess_tpu.ops.resize import resize_bilinear, resize_nearest, upsample2x_nearest


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize("sizes", [((28, 40), (440, 640)), ((55, 80), (28, 40)), ((7, 9), (7, 9))])
def test_bilinear_matches_torch(rng, align, sizes):
    (h, w), (oh, ow) = sizes
    x = rng.normal(size=(2, h, w, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(x, out_h=oh, out_w=ow, align_corners=align))
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(oh, ow),
        mode="bilinear", align_corners=align,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize("sizes", [((28, 40), (440, 640)), ((55, 80), (28, 40)), ((13, 9), (26, 36))])
def test_bilinear_grad_matches_torch(rng, align, sizes):
    """The custom VJP (dense separable transpose) vs torch autograd."""
    import jax
    import jax.numpy as jnp

    (h, w), (oh, ow) = sizes
    x = rng.normal(size=(2, h, w, 3)).astype(np.float32)
    g = rng.normal(size=(2, oh, ow, 3)).astype(np.float32)

    def f(xx):
        y = resize_bilinear(xx, out_h=oh, out_w=ow, align_corners=align)
        return jnp.sum(y * jnp.asarray(g))

    ours = np.asarray(jax.grad(f)(jnp.asarray(x)))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2).requires_grad_(True)
    yt = F.interpolate(xt, size=(oh, ow), mode="bilinear", align_corners=align)
    yt.backward(torch.from_numpy(g).permute(0, 3, 1, 2))
    ref = xt.grad.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)


def test_upsample2x_nearest_matches_torch(rng):
    x = rng.normal(size=(2, 13, 17, 4)).astype(np.float32)
    ours = np.asarray(upsample2x_nearest(x))
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2, mode="nearest"
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_nearest_resize_matches_torch(rng):
    x = rng.normal(size=(1, 10, 14, 2)).astype(np.float32)
    ours = np.asarray(resize_nearest(x, out_h=25, out_w=7))
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(25, 7), mode="nearest"
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(ours, ref)
