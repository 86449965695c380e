"""Checkpointing of pipeline intermediates."""
import numpy as np
import jax.numpy as jnp

from pygpa_tpu import io as gio


def test_npz_roundtrip(tmp_path):
    path = str(tmp_path / "ckpt.npz")
    phases = jnp.asarray(np.random.default_rng(0).normal(size=(3, 16, 16)))
    ks = np.array([[0.1, 0.0], [0.05, 0.08], [-0.05, 0.08]])
    gio.save_checkpoint(path, phases=phases, kvecs=ks)
    out = gio.load_checkpoint(path)
    assert set(out) == {"phases", "kvecs"}
    assert np.allclose(out["phases"], np.asarray(phases))
    assert np.allclose(out["kvecs"], ks)
    dev = gio.load_checkpoint(path, device_put=True)
    assert hasattr(dev["phases"], "devices")


def test_orbax_roundtrip(tmp_path):
    import pytest
    pytest.importorskip("orbax.checkpoint")
    tree = {"u": np.random.default_rng(1).normal(
                size=(2, 16, 16)).astype(np.float32),
            "kvecs": np.array([[0.1, 0.0], [0.05, 0.08]],
                              dtype=np.float32)}
    path = str(tmp_path / "orbax_ckpt")
    gio.save_checkpoint_orbax(path, tree)
    out = gio.restore_checkpoint_orbax(path)
    assert set(out) == set(tree)
    for k in tree:
        assert np.allclose(np.asarray(out[k]), tree[k])
