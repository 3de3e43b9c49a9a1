"""Model-stack tests: shapes, torch-oracle parity for custom layers, scan
equivalence of the recurrent reconstructor."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from openess_tpu.models import (
    ConvLSTMCell,
    DeepLabV3TextSeg,
    DilationFeatureExtractor,
    E2VIDReconstructor,
    SemSegE2VID,
    UNetRecurrent,
)
from openess_tpu.models.e2vid import ConvTranspose2dTorch


def test_conv_transpose_matches_torch(rng):
    """ConvTranspose2dTorch == torch ConvTranspose2d(k5, s2, p2, op1)."""
    x = rng.normal(size=(2, 9, 11, 6)).astype(np.float32)
    m = ConvTranspose2dTorch(features=4, kernel_size=5, padding=2, output_padding=1)
    params = m.init(jax.random.key(0), x)
    w = np.asarray(params["params"]["kernel"])  # [kh, kw, out, in]
    b = np.asarray(params["params"]["bias"])

    tm = tnn.ConvTranspose2d(6, 4, 5, stride=2, padding=2, output_padding=1)
    with torch.no_grad():
        # torch layout [in, out, kh, kw]
        tm.weight.copy_(torch.from_numpy(w.transpose(3, 2, 0, 1)))
        tm.bias.copy_(torch.from_numpy(b))
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()

    ours = np.asarray(m.apply(params, x))
    assert ours.shape == (2, 18, 22, 4)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_convlstm_matches_torch_oracle(rng):
    """ConvLSTMCell == the reference cell (submodules.py:175-214) re-derived
    in torch with shared weights."""
    B, H, W, Cin, Ch = 2, 8, 10, 6, 5
    x = rng.normal(size=(B, H, W, Cin)).astype(np.float32)
    h0 = rng.normal(size=(B, H, W, Ch)).astype(np.float32)
    c0 = rng.normal(size=(B, H, W, Ch)).astype(np.float32)

    cell = ConvLSTMCell(hidden=Ch, kernel_size=3)
    params = cell.init(jax.random.key(0), x, (h0, c0))
    kw = np.asarray(params["params"]["gates"]["kernel"])  # [3,3,in+h,4h]
    kb = np.asarray(params["params"]["gates"]["bias"])

    gates = tnn.Conv2d(Cin + Ch, 4 * Ch, 3, padding=1)
    with torch.no_grad():
        gates.weight.copy_(torch.from_numpy(kw.transpose(3, 2, 0, 1)))
        gates.bias.copy_(torch.from_numpy(kb))
        stacked = torch.cat(
            [torch.from_numpy(x).permute(0, 3, 1, 2),
             torch.from_numpy(h0).permute(0, 3, 1, 2)], 1)
        g = gates(stacked)
        i, f, o, gg = g.chunk(4, 1)
        cell_t = torch.sigmoid(f) * torch.from_numpy(c0).permute(0, 3, 1, 2) \
            + torch.sigmoid(i) * torch.tanh(gg)
        hid_t = torch.sigmoid(o) * torch.tanh(cell_t)

    # f32-exact convs for the oracle comparison (XLA CPU default precision
    # introduces ~1e-3 bf16-like error on some conv shapes)
    with jax.default_matmul_precision("highest"):
        hid, (h1, c1) = cell.apply(params, x, (h0, c0))
    np.testing.assert_allclose(
        np.asarray(h1), hid_t.permute(0, 2, 3, 1).numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(c1), cell_t.permute(0, 2, 3, 1).numpy(), atol=1e-4)


def test_unet_recurrent_shapes(rng):
    B, H, W = 1, 64, 80
    x = rng.normal(size=(B, H, W, 5)).astype(np.float32)
    m = UNetRecurrent()
    params = m.init(jax.random.key(0), x, None)
    img, states, latent = m.apply(params, x, None)
    assert img.shape == (B, H, W, 1)
    assert latent["1"].shape == (B, H, W, 32)
    assert latent["2"].shape == (B, H // 2, W // 2, 64)
    assert latent["4"].shape == (B, H // 4, W // 4, 128)
    assert latent["8"].shape == (B, H // 8, W // 8, 256)
    assert len(states) == 3


def test_reconstructor_scan_equals_python_loop(rng):
    """The scanned T-window recurrence must equal sequential single-window
    application (the reference's Python loop)."""
    B, T, H, W = 1, 4, 32, 40
    windows = rng.normal(size=(B, T, H, W, 5)).astype(np.float32)
    # make some entries exactly zero to exercise nonzero-normalization
    windows[windows < 0.3] = 0.0

    recon = E2VIDReconstructor()
    params = recon.init(jax.random.key(0), windows)
    imgs, final_latent = recon.apply(params, windows)
    assert imgs.shape == (B, T, H, W, 1)

    # python-loop oracle using the same underlying UNet params
    from openess_tpu.models.e2vid import normalize_event_window
    unet = UNetRecurrent()
    unet_params = {"params": params["params"]["step"]["unet"]}
    states = None
    for ti in range(T):
        win = normalize_event_window(jnp.asarray(windows[:, ti]))
        img, states, latent = unet.apply(unet_params, win, states)
    np.testing.assert_allclose(
        np.asarray(imgs[:, -1]), np.asarray(img), atol=1e-5)
    for k in ("2", "4", "8"):
        np.testing.assert_allclose(
            np.asarray(final_latent[k]), np.asarray(latent[k]), atol=1e-5)


def test_reconstructor_latent_only_matches_full(rng):
    """latent_only (the training configuration) must produce the exact same
    final latent pyramid as the full decode run — the decode path (resblocks,
    decoders, pred) is strictly downstream of the latent — and must accept a
    FULL param tree (e.g. converted released E2VID weights) with the unused
    decoder subtrees simply ignored."""
    B, T, H, W = 1, 3, 32, 40
    windows = rng.normal(size=(B, T, H, W, 5)).astype(np.float32)
    windows[windows < 0.3] = 0.0

    full = E2VIDReconstructor()
    params = full.init(jax.random.key(0), windows)  # full tree incl. decoders
    imgs, lat_full = full.apply(params, windows)
    assert imgs is not None

    lat_model = E2VIDReconstructor(latent_only=True)
    imgs2, lat = lat_model.apply(params, windows)
    assert imgs2 is None
    for k in ("1", "2", "4", "8"):
        np.testing.assert_array_equal(np.asarray(lat[k]), np.asarray(lat_full[k]))

    # latent_only init must not create the decode-path params
    p2 = lat_model.init(jax.random.key(0), windows)["params"]["step"]["unet"]
    assert not any(k.startswith(("resblocks", "decoders", "pred")) for k in p2)


def test_semseg_e2vid_shapes(rng):
    B, H, W, C = 2, 64, 80, 11
    latent = {
        "2": jnp.asarray(rng.normal(size=(B, H // 2, W // 2, 64)), jnp.float32),
        "4": jnp.asarray(rng.normal(size=(B, H // 4, W // 4, 128)), jnp.float32),
        "8": jnp.asarray(rng.normal(size=(B, H // 8, W // 8, 256)), jnp.float32),
    }
    text = jnp.asarray(rng.normal(size=(C, 512)), jnp.float32)
    m = SemSegE2VID(num_classes=C)
    params = m.init(jax.random.key(0), latent, text)
    logits, feat = m.apply(params, latent, text)
    assert logits.shape == (B, H, W, C)
    assert feat.shape == (B, H, W, 256)


def test_deeplab_student_shapes(rng):
    B, H, W, C = 1, 64, 96, 11
    x = jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.float32)
    text = jnp.asarray(rng.normal(size=(C, 512)), jnp.float32)
    m = DeepLabV3TextSeg(num_classes=C, output_stride=16)
    params = m.init(jax.random.key(0), x, text)
    logits, feats = m.apply(params, x, text)
    assert logits.shape == (B, H, W, C)
    assert feats.shape == (B, H, W, 256)


def test_teacher_shapes_and_normalization(rng):
    B, H, W = 1, 64, 64
    x = jnp.asarray(rng.uniform(size=(B, H, W, 3)), jnp.float32)
    m = DilationFeatureExtractor()
    params = m.init(jax.random.key(0), x)
    feat = m.apply(params, x)
    assert feat.shape == (B, H, W, 256)
    norms = np.linalg.norm(np.asarray(feat), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_unet_on_reflect_padded_nonmultiple_size():
    """The generic reconstruction tool pads arbitrary sensor sizes to the
    next multiple of 2^num_encoders (CropParameters parity) — the classic
    e2vid 240x180 resolution must flow through the UNet after padding and
    crop back exactly (it crashes unpadded: 180/8 is fractional)."""
    import math

    import jax
    import jax.numpy as jnp

    from openess_tpu.models.e2vid import UNetRecurrent

    H, W = 180, 240
    Hc = math.ceil(H / 8) * 8  # 184
    Wc = math.ceil(W / 8) * 8  # 240
    pt = math.ceil(0.5 * (Hc - H)); pb = Hc - H - pt
    pl_ = math.ceil(0.5 * (Wc - W)); pr = Wc - W - pl_
    unet = UNetRecurrent()
    win = jnp.zeros((1, H, W, 5))
    padded = jnp.pad(win, ((0, 0), (pt, pb), (pl_, pr), (0, 0)), mode="reflect")
    assert padded.shape == (1, Hc, Wc, 5)
    img_shape = jax.eval_shape(
        lambda v, x: unet.apply(v, x, None),
        jax.eval_shape(unet.init, jax.random.key(0), padded), padded,
    )[0]
    assert img_shape.shape == (1, Hc, Wc, 1)
    cy, cx = Hc // 2, Wc // 2
    iy0, ix0 = cy - H // 2, cx - W // 2
    assert (iy0 + H <= Hc) and (ix0 + W <= Wc)


def test_reconstructor_s2d_matches_standard(rng):
    """The space-to-depth head/enc0 rewrite is exact: same params, same
    imgs + latent pyramid (f32 round-off only), for planar and NHWC inputs
    and with the decode path on."""
    B, T, H, W = 1, 3, 32, 40
    nhwc = rng.normal(size=(B, T, H, W, 5)).astype(np.float32)
    nhwc[np.abs(nhwc) < 0.3] = 0.0
    planar = np.moveaxis(nhwc, -1, 2)

    std = E2VIDReconstructor()
    params = std.init(jax.random.key(0), nhwc)
    imgs_ref, lat_ref = std.apply(params, nhwc)

    for planar_input, x in ((False, nhwc), (True, planar)):
        m = E2VIDReconstructor(planar_input=planar_input, s2d=True)
        imgs, lat = m.apply(params, x)
        np.testing.assert_allclose(
            np.asarray(imgs), np.asarray(imgs_ref), atol=2e-5
        )
        for k in ("1", "2", "4", "8"):
            np.testing.assert_allclose(
                np.asarray(lat[k]), np.asarray(lat_ref[k]), atol=2e-5,
                err_msg=k,
            )
        # same param tree in both modes (checkpoint compatibility)
        p2 = m.init(jax.random.key(0), x)
        assert jax.tree_util.tree_structure(p2) == jax.tree_util.tree_structure(params)


def test_streaming_step_matches_scan(rng):
    """E2VIDStreamingStep (the serving form: one window per call, carried
    state) must reproduce the scanned reconstructor exactly — same param
    tree, same per-window images, same final latent."""
    from openess_tpu.models.e2vid import (
        E2VIDStreamingStep,
        initial_stream_state,
    )

    B, T, H, W = 1, 4, 32, 40
    windows = rng.normal(size=(B, T, 5, H, W)).astype(np.float32)  # planar
    windows[windows < 0.3] = 0.0

    recon = E2VIDReconstructor(planar_input=True)
    params = recon.init(jax.random.key(0), windows)
    imgs, final_latent = recon.apply(params, windows)

    stream = E2VIDStreamingStep()
    states = initial_stream_state(B, H, W)
    for ti in range(T):
        states, latent, img = stream.apply(
            params, states, jnp.asarray(windows[:, ti])
        )
        np.testing.assert_allclose(
            np.asarray(imgs[:, ti]), np.asarray(img), atol=1e-5
        )
    for k in ("1", "2", "4", "8"):
        np.testing.assert_allclose(
            np.asarray(final_latent[k]), np.asarray(latent[k]), atol=1e-5
        )


def test_teacher_fold_bn_matches_standard(rng):
    """fold_bn is exact: same params/batch_stats (incl. non-trivial running
    stats), same features up to f32 round-off, identical variable tree
    (checkpoint compatibility)."""
    B, H, W = 1, 32, 32
    x = jnp.asarray(rng.uniform(size=(B, H, W, 3)), jnp.float32)
    std = DilationFeatureExtractor(output_stride=8)
    variables = std.init(jax.random.key(0), x)

    # trivial init stats (mean=0, var=1) would hide mean/var fold bugs —
    # randomize them like a converted torchvision checkpoint's
    def perturb(path, leaf):
        keys = "/".join(str(getattr(p, "key", "")) for p in path)
        r = np.random.default_rng(abs(hash(keys)) % 2**32)
        if keys.endswith("mean"):
            return jnp.asarray(r.normal(0, 0.5, leaf.shape), leaf.dtype)
        if keys.endswith("var"):
            return jnp.asarray(r.uniform(0.2, 2.0, leaf.shape), leaf.dtype)
        if keys.endswith("scale") or keys.endswith("bias"):
            return jnp.asarray(r.normal(1.0, 0.3, leaf.shape), leaf.dtype)
        return leaf

    variables = jax.tree_util.tree_map_with_path(perturb, dict(variables))
    ref = std.apply(variables, x)

    folded = DilationFeatureExtractor(output_stride=8, fold_bn=True)
    out = folded.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    v2 = folded.init(jax.random.key(0), x)
    assert jax.tree_util.tree_structure(dict(v2)) == jax.tree_util.tree_structure(
        variables
    )
    shapes = lambda t: jax.tree_util.tree_map(lambda l: l.shape, t)
    assert shapes(dict(v2)) == shapes(variables)


def test_deeplab_fold_bn_matches_standard_eval(rng):
    """Backbone BN folding at eval is exact and checkpoint-compatible; in
    train mode the fold_bn model runs the standard batch-stat path."""
    from openess_tpu.models import DeepLabV3TextSeg

    B, H, W, C = 1, 32, 32, 6
    x = jnp.asarray(rng.uniform(size=(B, H, W, 3)), jnp.float32)
    text = jnp.asarray(rng.normal(size=(C, 512)), jnp.float32)
    std = DeepLabV3TextSeg(num_classes=C)
    variables = std.init(jax.random.key(0), x, text)

    def perturb(path, leaf):
        keys = "/".join(str(getattr(p, "key", "")) for p in path)
        r = np.random.default_rng(abs(hash(keys)) % 2**32)
        if keys.endswith("mean"):
            return jnp.asarray(r.normal(0, 0.5, leaf.shape), leaf.dtype)
        if keys.endswith("var"):
            return jnp.asarray(r.uniform(0.2, 2.0, leaf.shape), leaf.dtype)
        return leaf

    variables = jax.tree_util.tree_map_with_path(perturb, dict(variables))
    logits_ref, feats_ref = std.apply(variables, x, text)

    folded = DeepLabV3TextSeg(num_classes=C, fold_bn=True)
    logits, feats = folded.apply(variables, x, text)
    # f32 round-off only: logits reach ~1e2 magnitude, so pair a loose
    # atol with a tight rtol
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(logits_ref), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(feats), np.asarray(feats_ref), rtol=1e-5, atol=1e-4
    )
    v2 = folded.init(jax.random.key(0), x, text)
    assert jax.tree_util.tree_structure(dict(v2)) == jax.tree_util.tree_structure(
        variables
    )

    # train mode: standard batch-stat path, batch_stats still mutable
    (lt, _), mut = folded.apply(
        variables, x, text, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(1)},
    )
    assert "batch_stats" in mut and np.isfinite(np.asarray(lt)).all()
