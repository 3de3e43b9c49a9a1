"""SLIC + viz utilities sanity tests."""
import numpy as np

from openess_tpu.utils.slic import _rgb_to_lab, slic
from openess_tpu.utils.viz import colorize_semseg, event_image


def test_rgb_to_lab_known_values():
    # white -> L=100, a~0, b~0; black -> 0
    lab = _rgb_to_lab(np.array([[[1.0, 1.0, 1.0], [0.0, 0.0, 0.0]]]))
    np.testing.assert_allclose(lab[0, 0], [100, 0, 0], atol=0.2)
    np.testing.assert_allclose(lab[0, 1], [0, 0, 0], atol=0.2)
    # pure red (sRGB) ~ L=53.2, a=80.1, b=67.2
    lab_r = _rgb_to_lab(np.array([[[1.0, 0.0, 0.0]]]))
    np.testing.assert_allclose(lab_r[0, 0], [53.24, 80.09, 67.2], atol=0.5)


def test_slic_segments_quadrant_image(rng):
    # 4 flat color quadrants: superpixels must not straddle color boundaries
    img = np.zeros((64, 64, 3), np.float32)
    img[:32, :32] = [1, 0, 0]
    img[:32, 32:] = [0, 1, 0]
    img[32:, :32] = [0, 0, 1]
    img[32:, 32:] = [1, 1, 0]
    seg = slic(img, n_segments=16, compactness=6, sigma=0)
    assert seg.shape == (64, 64)
    assert seg.min() == 0
    n = seg.max() + 1
    assert 4 <= n <= 40
    # each superpixel should be color-pure
    for ci in range(n):
        m = seg == ci
        colors = img[m]
        assert (colors == colors[0]).all(), f"segment {ci} straddles colors"


def test_slic_labels_contiguous_and_connected(rng):
    img = rng.random((40, 60, 3)).astype(np.float32)
    seg = slic(img, n_segments=20, compactness=6, sigma=2)
    ids = np.unique(seg)
    np.testing.assert_array_equal(ids, np.arange(len(ids)))
    from scipy import ndimage

    for ci in ids:
        _, n = ndimage.label(seg == ci)
        assert n == 1, f"segment {ci} disconnected"


def test_colorize_semseg():
    cmap = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
    lab = np.array([[0, 1], [255, 0]])
    out = colorize_semseg(lab, cmap, ignore_label=255)
    np.testing.assert_array_equal(out[0, 0], [255, 0, 0])
    np.testing.assert_array_equal(out[0, 1], [0, 255, 0])
    np.testing.assert_array_equal(out[1, 0], [0, 0, 0])


def test_event_image_shapes(rng):
    ev = rng.normal(size=(5, 16, 20)).astype(np.float32)
    img = event_image(ev)
    assert img.shape == (16, 20, 3) and img.dtype == np.uint8


def test_profiling_timers():
    """utils/profiling.py: section timers accumulate like the reference's
    e2vid/utils/timers.py global-dict pattern; StepTimer reports a rate."""
    import time

    from openess_tpu.utils.profiling import (
        StepTimer,
        Timer,
        reset_timers,
        timer_summary,
    )

    reset_timers()
    for _ in range(3):
        with Timer("unit_sec"):
            time.sleep(0.01)
    summ = timer_summary()
    assert summ["unit_sec"]["calls"] == 3
    assert 0.02 <= summ["unit_sec"]["total_s"] < 5.0
    reset_timers()
    assert "unit_sec" not in timer_summary()

    st = StepTimer(window=4)
    for _ in range(5):
        time.sleep(0.005)
        st.tick()
    assert st.steps_per_sec() > 0


def test_profiling_trace_writes_artifacts(tmp_path):
    """trace() wraps jax.profiler and leaves a TensorBoard-loadable trace."""
    import jax
    import jax.numpy as jnp

    from openess_tpu.utils.profiling import trace

    with trace(str(tmp_path)):
        jnp.sum(jnp.ones((8, 8))).block_until_ready()
    files = list(tmp_path.rglob("*"))
    assert any(f.is_file() for f in files), files
