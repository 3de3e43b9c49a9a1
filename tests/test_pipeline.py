"""PrefetchLoader: ordering, determinism across worker counts, error
propagation, drop_last semantics."""
import numpy as np
import pytest

from openess_tpu.data.pipeline import PrefetchLoader


class ToyDataset:
    def __init__(self, n=23, fail_at=None, delay_odd=False):
        self.n = n
        self.fail_at = fail_at
        self.delay_odd = delay_odd

    def __len__(self):
        return self.n

    def get_batch(self, indices):
        import time

        if self.fail_at is not None and self.fail_at in list(indices):
            raise ValueError("boom")
        if self.delay_odd and int(indices[0]) % 2 == 1:
            time.sleep(0.02)  # odd-leading batches finish late
        return {"idx": np.asarray(indices)}


@pytest.mark.parametrize("num_workers", [1, 4])
def test_order_deterministic_across_workers(num_workers):
    ds = ToyDataset(n=23, delay_odd=True)
    loader = PrefetchLoader(
        ds, 4, shuffle=True, rng=np.random.default_rng(7),
        num_workers=num_workers,
    )
    got = [b["idx"] for b in loader]
    ref = [
        b["idx"]
        for b in PrefetchLoader(
            ds, 4, shuffle=True, rng=np.random.default_rng(7), num_workers=1
        )
    ]
    assert len(got) == len(loader) == 5  # drop_last: 23 // 4
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a, b)


def test_error_propagates():
    ds = ToyDataset(n=16, fail_at=5)
    loader = PrefetchLoader(
        ds, 4, shuffle=False, num_workers=3,
    )
    with pytest.raises(ValueError, match="boom"):
        list(loader)


def test_drop_last_false():
    ds = ToyDataset(n=10)
    loader = PrefetchLoader(ds, 4, shuffle=False, drop_last=False, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[-1]["idx"].size == 2
