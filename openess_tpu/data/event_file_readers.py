"""Generic event-file readers for the offline reconstruction tier.

Reference: ``e2vid/utils/event_readers.py`` — windows a ``.txt``/``.zip``
event stream (whitespace columns ``t x y pol``, one header line) into either
fixed-count or fixed-duration chunks, feeding ``run_reconstruction.py``.
Same contracts here: each window is an ``[N, 4]`` float64 array of
``(t, x, y, pol)`` rows.
"""
from __future__ import annotations

import zipfile
from os.path import splitext
from typing import Iterator

import numpy as np


def _open_text(path: str):
    if splitext(path)[1] == ".zip":
        zf = zipfile.ZipFile(path)
        names = zf.namelist()
        assert len(names) == 1, names
        return zf.open(names[0], "r")
    return open(path, "rb")


def fixed_size_event_windows(
    path: str, num_events: int = 10_000, start_index: int = 0
) -> Iterator[np.ndarray]:
    """Non-overlapping windows of ``num_events`` events
    (event_readers.py:8-29); the trailing partial chunk is emitted, matching
    pandas' chunk iterator (the reference's reader)."""
    import pandas as pd

    it = pd.read_csv(
        path, sep=r"\s+", header=None, names=["t", "x", "y", "pol"],
        dtype={"t": np.float64, "x": np.int16, "y": np.int16,
               "pol": np.int16},
        engine="c", skiprows=start_index + 1, chunksize=num_events,
    )
    for chunk in it:
        yield chunk.values.astype(np.float64)


def fixed_duration_event_windows(
    path: str, duration_ms: float = 50.0, start_index: int = 0
) -> Iterator[np.ndarray]:
    """Non-overlapping windows of fixed duration, exactly the reference's
    semantics (event_readers.py:71-85): each event is appended BEFORE the
    duration check, so the boundary event closes — and is included in — the
    emitted window; ``last_stamp`` then jumps to that event's time. Trailing
    events that never exceed the duration are dropped (as in the
    reference)."""
    dur_s = duration_ms / 1000.0
    f = _open_text(path)
    try:
        for _ in range(1 + start_index):
            f.readline()
        window, last_stamp = [], None
        for line in f:
            t, x, y, pol = line.split()
            t = float(t)
            window.append((t, float(x), float(y), float(pol)))
            if last_stamp is None:
                last_stamp = t
            if t > last_stamp + dur_s:
                last_stamp = t
                out = np.array(window, np.float64)
                window = []
                yield out
    finally:
        f.close()
