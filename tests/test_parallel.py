"""Multi-device sharding logic on the virtual 8-device CPU mesh:
the sharded WFR sweep and the batch-sharded pipeline must equal their
single-device counterparts."""
import numpy as np
import jax
import jax.numpy as jnp

from pygpa_tpu.lattices import hexlattice_gen, generate_ks
from pygpa_tpu.ops.wfr import wfr_sweep
from pygpa_tpu.parallel import (make_mesh, wfr_sweep_sharded,
                                extract_displacement_field_batch)
from pygpa_tpu import gpa


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def _small():
    r_k = 0.12
    img = np.array(hexlattice_gen(r_k, 9.0, order=1, size=96,
                                  dtype=np.float64))
    ks = np.array(generate_ks(r_k, 9.0))[:3]
    return img - img.mean(), ks


def test_sharded_wfr_matches_single():
    img, ks = _small()
    k = ks[0]
    kw = np.linalg.norm(ks, axis=1).mean() / 2.5
    kstep = kw / 3
    wxs = np.arange(k[0] - kw, k[0] + kw, kstep)
    wys = np.arange(k[1] - kw, k[1] + kw, kstep)
    wx, wy = np.meshgrid(wxs, wys, indexing="ij")
    wlist = np.stack([wx.ravel(), wy.ravel()], -1)
    sigma = 8
    mesh = make_mesh(8, ("batch",))
    single = wfr_sweep(jnp.asarray(img), wlist, k, sigma, with_grad=True)
    shard = wfr_sweep_sharded(jnp.asarray(img), wlist, k, sigma,
                              mesh=mesh, with_grad=True)
    assert np.allclose(np.array(shard["lockin"]),
                       np.array(single["lockin"]), atol=1e-10)
    assert np.allclose(np.array(shard["w"]), np.array(single["w"]))
    assert np.allclose(np.array(shard["grad"]),
                       np.array(single["grad"]), atol=1e-10)


def test_batch_sharded_pipeline():
    img, ks = _small()
    batch = np.stack([img, np.roll(img, 5, axis=0),
                      np.roll(img, -3, axis=1), img[::-1],
                      img, np.roll(img, 2, axis=0),
                      np.roll(img, 1, axis=1), img])
    mesh = make_mesh(8, ("batch",))
    us = np.array(extract_displacement_field_batch(batch, ks, mesh=mesh))
    assert us.shape == (8, 2) + img.shape
    u_single = np.array(gpa.extract_displacement_field(batch[1], ks))
    assert np.allclose(us[1], u_single, atol=1e-8)
