"""Orbax checkpoint round-trips: full resume, model-only, partial transfer."""
import jax
import jax.numpy as jnp
import numpy as np

from openess_tpu.training import checkpoint as ckpt
from openess_tpu.training.steps import TrainState


def make_state(rng, seed_val=0.0, opt_count=7):
    params = {
        "model_recon": {
            "backbone": {"kernel": jnp.asarray(rng.normal(size=(3, 3, 4, 8)), jnp.float32)},
            "classifier": {"bias": jnp.full((8,), seed_val, jnp.float32)},
        }
    }
    batch_stats = {"model_recon": {"bn": {"mean": jnp.zeros((8,))}}}
    opt_state = {"count": jnp.asarray(opt_count, jnp.int32)}
    return TrainState(
        step=jnp.asarray(42, jnp.int32),
        params=params, batch_stats=batch_stats, opt_state=opt_state,
    )


def assert_tree_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_full_checkpoint_roundtrip(tmp_path, rng):
    state = make_state(rng, opt_count=7)
    ckpt.save_checkpoint(str(tmp_path / "ck"), state, epoch=3)
    fresh = make_state(np.random.default_rng(9), seed_val=99.0, opt_count=0)
    restored, step = ckpt.restore_checkpoint(str(tmp_path / "ck"), fresh)
    assert step == 3
    assert int(restored.step) == 42
    assert_tree_equal(restored.params, state.params)
    # default matches the reference (base_trainer_ov.py:36 load_optimizer=
    # False): the optimizer keeps its fresh init
    assert int(restored.opt_state["count"]) == 0
    # opt-in exact continuation restores the saved optimizer state
    restored2, _ = ckpt.restore_checkpoint(
        str(tmp_path / "ck"), fresh, restore_optimizer=True
    )
    assert int(restored2.opt_state["count"]) == 7


def test_model_only_roundtrip(tmp_path, rng):
    state = make_state(rng)
    ckpt.save_model_only(str(tmp_path), state.params, state.batch_stats, epoch=5)
    fresh = make_state(np.random.default_rng(3), seed_val=-1.0)
    params, stats = ckpt.load_model_only(
        str(tmp_path / "epoch_5"), fresh.params, fresh.batch_stats
    )
    assert_tree_equal(params, state.params)
    assert_tree_equal(stats, state.batch_stats)


def test_partial_transfer_shape_filtering(tmp_path, rng):
    state = make_state(rng)
    ckpt.save_model_only(str(tmp_path), state.params, state.batch_stats, epoch=0)

    # fresh model with a different-shaped classifier (e.g. new class count)
    fresh = make_state(np.random.default_rng(5), seed_val=123.0)
    fresh_params = jax.tree.map(lambda x: x, fresh.params)
    fresh_params["model_recon"]["classifier"]["bias"] = jnp.full((11,), 5.0)
    loaded, _ = ckpt.load_pretrained_params(
        str(tmp_path / "epoch_0"), fresh_params, fresh.batch_stats
    )
    # matching shapes load...
    assert_tree_equal(
        loaded["model_recon"]["backbone"], state.params["model_recon"]["backbone"]
    )
    # ...mismatched shapes keep the fresh init (saver.py:73-96 semantics)
    np.testing.assert_array_equal(
        np.asarray(loaded["model_recon"]["classifier"]["bias"]),
        np.full((11,), 5.0, np.float32),
    )


def test_partial_transfer_exclusions(tmp_path, rng):
    state = make_state(rng)
    ckpt.save_model_only(str(tmp_path), state.params, state.batch_stats, epoch=0)
    fresh = make_state(np.random.default_rng(5), seed_val=77.0)
    loaded, _ = ckpt.load_pretrained_params(
        str(tmp_path / "epoch_0"), fresh.params, fresh.batch_stats,
        exclude_substrings=("classifier",),
    )
    np.testing.assert_array_equal(
        np.asarray(loaded["model_recon"]["classifier"]["bias"]),
        np.full((8,), 77.0, np.float32),
    )


def test_restore_tolerates_superset_checkpoint(tmp_path, rng):
    """A checkpoint saved with a SUPERSET param tree (e.g. the pre-latent_only
    E2VID build that still carried the frozen decoder subtrees) must restore
    into the smaller current target: extra on-disk subtrees are dropped,
    matching leaves load exactly, missing target leaves raise."""
    full = make_state(rng, opt_count=7)
    full.params["model_recon"]["decoders_0"] = {
        "kernel": jnp.asarray(rng.normal(size=(5, 5, 2, 4)), jnp.float32)
    }
    ckpt.save_checkpoint(str(tmp_path / "ck"), full, epoch=2)

    slim = make_state(np.random.default_rng(9), seed_val=99.0, opt_count=0)
    restored, step = ckpt.restore_checkpoint(str(tmp_path / "ck"), slim)
    assert step == 2 and int(restored.step) == 42
    assert "decoders_0" not in restored.params["model_recon"]
    np.testing.assert_array_equal(
        np.asarray(restored.params["model_recon"]["backbone"]["kernel"]),
        np.asarray(full.params["model_recon"]["backbone"]["kernel"]),
    )
    # restore_optimizer needs the exact structure -> clear error, not garbage
    import pytest

    with pytest.raises(ValueError, match="restore_optimizer"):
        ckpt.restore_checkpoint(
            str(tmp_path / "ck"), slim, restore_optimizer=True
        )

    # model-only flavor: same tolerance
    ckpt.save_model_only(str(tmp_path), full.params, full.batch_stats, epoch=1)
    p, bs = ckpt.load_model_only(
        str(tmp_path / "epoch_1"), slim.params, slim.batch_stats
    )
    assert "decoders_0" not in p["model_recon"]
    np.testing.assert_array_equal(
        np.asarray(p["model_recon"]["classifier"]["bias"]),
        np.asarray(full.params["model_recon"]["classifier"]["bias"]),
    )

    # the reverse (checkpoint MISSING a target leaf) must fail loudly
    slim2 = make_state(np.random.default_rng(3))
    slim2.params["model_recon"]["extra_head"] = {
        "kernel": jnp.zeros((1, 1, 2, 2), jnp.float32)
    }
    with pytest.raises(Exception):
        ckpt.restore_checkpoint(str(tmp_path / "ck"), slim2)
