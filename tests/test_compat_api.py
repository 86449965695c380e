"""pyGPA API-compatibility surface: the reference's import paths and
function names must resolve and work (SURVEY.md §2 component
inventory)."""
import numpy as np
import jax.numpy as jnp


def test_reference_import_paths():
    import pygpa_tpu.geometric_phase_analysis as GPA
    import pygpa_tpu.phase_unwrap as pu
    import pygpa_tpu.property_extract as pe
    import pygpa_tpu.unit_cell_averaging as uc
    from pygpa_tpu.mathtools import wrapToPi, periodic_average  # noqa
    import pygpa_tpu.tpugpa as tg

    for name in ["GPA", "optGPA", "vecGPA", "wfr", "wfr2", "wfr3",
                 "wfr4", "optwfr2", "wfr2_only_lockin",
                 "wfr2_only_lockin_vec", "wfr2_grad", "wfr2_grad_opt",
                 "wfr2_grad_vec", "generate_klists", "iterate_GPA",
                 "reconstruct_u_inv", "reconstruct_u_inv_from_phases",
                 "myweighed_lstsq", "fit_delta_k", "invert_u",
                 "invert_u_overlap", "undistort_image",
                 "extract_displacement_field", "gaussian_deconvolve",
                 "extract_primary_ks", "select_closest_to_triangle",
                 "smallest_sum", "remove_negative_duplicates",
                 "average_lattice_vector", "calc_diff_from_isotropic",
                 "ratio2angle", "f2angle", "wff", "prep_image"]:
        assert callable(getattr(GPA, name)), name
    for name in ["phase_unwrap", "phase_unwrap_prediff",
                 "phase_unwrap_ref", "phase_unwrap_ref_prediff",
                 "solvePoisson", "solvePoisson_precomped",
                 "precomp_Poissonscaling", "applyQ", "_wrapToPi"]:
        assert callable(getattr(pu, name)), name
    for name in ["u2J", "u2Jac", "phases2J", "phases2Jac",
                 "phasegradient2J", "phasegradient2Jac", "kvecs2J",
                 "kvecs2Jac", "props_from_Jac", "phys_props_from_Jac",
                 "props_from_J", "props_from_J_old",
                 "calc_props_from_phasegradient", "calc_props_from_phases",
                 "calc_eps_from_phasegradient", "Jac_2_Jac_diff",
                 "J_2_J_diff", "u_moire_2_u_diff",
                 "Jac_diff_from_phasegradient",
                 "calc_props_from_phasegradient2", "calc_props_from_kvecs4",
                 "calc_moire_props_from_kvecs",
                 "moire_props_from_phasegradient", "moire_props_from_Jac",
                 "get_initial_props", "get_ref_prop_dict", "calc_abcd",
                 "double_strain_decomp", "twist_matrix",
                 "moire_amplitudes", "Kerelsky", "Kerelsky_plus",
                 "Kerelsky_Jac", "Kerelsky_J", "iterate_J_leastsq",
                 "Jac_fit_diff", "moire_props_from_Jac_2_Kerelsky"]:
        assert callable(getattr(pe, name)), name
    for name in ["forward_transform", "backward_transform", "cart_in_uc",
                 "float_overlap", "calc_ucell_parameters",
                 "unit_cell_average", "expand_unitcell",
                 "add_to_position"]:
        assert callable(getattr(uc, name)), name
    for name in ["tpuGPA", "cuGPA", "wfr2_grad_opt", "wfr2_grad_single",
                 "wfr2_only_lockin", "wfr2_only_grad"]:
        assert callable(getattr(tg, name)), name


def test_wfr_func_plugin_seam():
    """The reference's accelerator-plugin seam: inject the tpugpa
    sweep into the pipeline via wfr_func (tests/test_cuGPA.py:49)."""
    import pygpa_tpu.geometric_phase_analysis as GPA
    import pygpa_tpu.tpugpa as tg
    from pygpa_tpu.lattices import hexlattice_gen, generate_ks

    img = np.array(hexlattice_gen(0.12, 9.0, order=1, size=96,
                                  dtype=np.float64))
    ks = np.array(generate_ks(0.12, 9.0))[:3]
    u_plugin = np.array(GPA.extract_displacement_field(
        img, ks, wfr_func=tg.wfr2_grad_opt))
    u_native = np.array(GPA.extract_displacement_field(img, ks))
    assert np.allclose(u_plugin, u_native, atol=1e-10)


def test_tpugpa_single_precision():
    import pygpa_tpu.tpugpa as tg
    from pygpa_tpu.lattices import hexlattice_gen

    img = np.array(hexlattice_gen(0.12, 9.0, order=1, size=64,
                                  dtype=np.float64))
    g = tg.wfr2_grad_single(img, 6, 0.1, 0.02, 0.03, 0.01)
    assert np.asarray(g["lockin"]).dtype == np.complex64
    assert np.asarray(g["grad"]).dtype == np.float32


def test_unwrap_iteration_telemetry():
    from pygpa_tpu.solvers.unwrap import phase_unwrap
    rng = np.random.default_rng(0)
    psi = rng.uniform(-np.pi, np.pi, size=(32, 32))
    phi, k = phase_unwrap(jnp.asarray(psi),
                          jnp.ones((32, 32)), kmax=7,
                          return_iters=True)
    assert 1 <= int(k) <= 7


def test_prep_image():
    import pygpa_tpu.geometric_phase_analysis as GPA
    from pygpa_tpu.lattices import hexlattice_gen
    img = np.array(hexlattice_gen(0.1, 3.0, order=1, size=128,
                                  dtype=np.float64)) + 10
    prepped, xx, yy = GPA.prep_image(img)
    assert np.asarray(prepped).shape == img.shape
    assert abs(float(np.asarray(prepped).mean())) < 1e-8
