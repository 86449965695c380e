"""Primary-k extraction: hypothesis sweep mirroring
/root/reference/tests/test_geometric_phase_analysis.py:44-58."""
import numpy as np
from hypothesis import assume, given, settings, strategies as st

from pygpa_tpu.lattices import generate_ks, hexlattice_gen
import pygpa_tpu.gpa as gpa


@settings(deadline=None, max_examples=40)
@given(theta=st.floats(0.0, 60.0),
       psi=st.floats(-90.0, 90.0),
       kappa=st.floats(1.0 + 1e-7, 2, exclude_min=True),
       r_k=st.floats(0.03, 0.24))
def test_extract_primary_ks(r_k, theta, psi, kappa):
    size = 128
    ori_ks = np.asarray(generate_ks(r_k, theta, kappa=kappa, psi=psi))[:-1]
    # peaks inside the default pix_norm_range (>2 px from DC) only:
    # strong anisotropy can push |k| under the detector's lower cutoff
    # (the reference test has the same latent corner case)
    assume(np.linalg.norm(ori_ks, axis=1).min() * size > 3.0)
    original = np.asarray(hexlattice_gen(r_k, theta, order=1, size=size,
                                         kappa=kappa, psi=psi,
                                         dtype=np.float64))
    ext_ks, _ = gpa.extract_primary_ks(original, DoG=False)
    abs_diffs = np.linalg.norm(ext_ks[None] - ori_ks[:, None],
                               axis=-1).min(axis=0)
    assert np.all(abs_diffs < 1.5 / size)


def test_select_closest_to_triangle():
    ks = np.asarray(generate_ks(0.1, 10.0))[:3]
    noise = np.array([[0.3, 0.31], [0.02, 0.33]])
    sel = gpa.select_closest_to_triangle(np.concatenate([ks, noise]))
    d = np.linalg.norm(sel[:, None] - ks[None], axis=-1).min(axis=1)
    assert np.allclose(d, 0)


def test_smallest_sum():
    ks = np.asarray(generate_ks(0.1, 10.0))[:3]
    assert np.linalg.norm(gpa.smallest_sum(ks)) < 1e-12
    assert np.isnan(gpa.smallest_sum(ks[:2]))


def test_subpixel_and_refine_ks(testset_gaussian):
    """Sub-bin peak refinement + iterate_GPA k-refinement recover the
    true ks far beyond the FFT grid resolution, and the refined ks fix
    the displacement-field ramp of grid-limited ks."""
    import jax.numpy as jnp
    original, deformed, noise, ori_ks = testset_gaussian
    size = original.shape[0]
    pks, _ = gpa.extract_primary_ks(original, DoG=False, subpixel=True)
    d_sub = np.linalg.norm(np.concatenate([pks, -pks])[None]
                           - ori_ks[:3][:, None], axis=-1).min(axis=1)
    assert np.all(d_sub < 0.5 / size)
    # refine to sub-grid accuracy on the deformed image
    signs = np.sign(np.einsum("kc,kc->k",
                              gpa.select_closest_to_triangle(pks),
                              ori_ks[:3]))
    pks3 = gpa.select_closest_to_triangle(pks) * signs[:, None]
    refined = gpa.refine_ks(jnp.asarray(original), pks3)
    d_ref = np.linalg.norm(refined - ori_ks[:3], axis=-1)
    assert np.all(d_ref < 0.15 / size)
