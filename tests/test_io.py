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
