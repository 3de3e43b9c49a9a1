"""MSDeformAttn equivalence vs a torch grid_sample oracle — the
``ops/test.py`` pattern from the reference (check_forward_equal_with_pytorch)."""
import numpy as np
import torch
import torch.nn.functional as F

from openess_tpu.ops.ms_deform_attn import ms_deform_attn


def torch_oracle(value, shapes, locs, weights):
    """Re-derivation of ms_deform_attn_core_pytorch (grid_sample fallback)."""
    b, _, h, d = value.shape
    _, lq, _, levels, p, _ = locs.shape
    splits = [hh * ww for hh, ww in shapes]
    value_list = torch.from_numpy(value).split(splits, dim=1)
    sampling_grids = 2 * torch.from_numpy(locs) - 1
    out = []
    for li, (hh, ww) in enumerate(shapes):
        v = value_list[li].flatten(2).transpose(1, 2).reshape(b * h, d, hh, ww)
        grid = sampling_grids[:, :, :, li].transpose(1, 2).flatten(0, 1)  # [b*h, lq, p, 2]
        sampled = F.grid_sample(
            v, grid, mode="bilinear", padding_mode="zeros", align_corners=False
        )  # [b*h, d, lq, p]
        out.append(sampled)
    w = torch.from_numpy(weights).transpose(1, 2).reshape(b * h, 1, lq, levels * p)
    res = (torch.stack(out, dim=-2).flatten(-2) * w).sum(-1)
    return res.view(b, h * d, lq).transpose(1, 2).contiguous().numpy()


def test_ms_deform_attn_matches_torch(rng):
    b, h, d, lq, p = 2, 4, 8, 30, 3
    shapes = ((6, 9), (3, 5))
    l_in = sum(hh * ww for hh, ww in shapes)
    value = rng.normal(size=(b, l_in, h, d)).astype(np.float32)
    # locations partially out of range to exercise zero padding
    locs = rng.uniform(-0.2, 1.2, size=(b, lq, h, len(shapes), p, 2)).astype(np.float32)
    weights = rng.random((b, lq, h, len(shapes), p)).astype(np.float32)
    weights /= weights.sum(axis=(-2, -1), keepdims=True)

    ours = np.asarray(ms_deform_attn(value, shapes, locs, weights))
    ref = torch_oracle(value, shapes, locs, weights)
    assert ours.shape == (b, lq, h * d)
    np.testing.assert_allclose(ours, ref, atol=1e-5)
