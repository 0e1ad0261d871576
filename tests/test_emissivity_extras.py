"""Reference-deactivated emissivity channels (volume2d.f:253-339,
448-570) kept as diagnostics: thermal cyclotron and the
pair-annihilation vdsigma spectrum."""
import numpy as np

from compton2d_tpu.physics.emissivity_extras import (
    annihilation_spectrum,
    cyclotron,
    eloss_cy,
    vdsigma,
)


def test_cyclotron_harmonic_lines_and_plasma_cutoff():
    B = 1.0e7   # strong field so harmonics land in the keV-ish grid
    n_e = 1.0e10
    tea = 50.0
    e_ph = np.geomspace(1e-8, 1e-3, 400)
    j_cy, kap_cy = cyclotron(e_ph, tea, n_e, B)
    j_cy, kap_cy = j_cy[0], kap_cy[0] if j_cy.ndim > 1 else (j_cy, kap_cy)
    assert j_cy.shape == e_ph.shape
    assert np.all(j_cy >= 0.0) and np.all(np.isfinite(j_cy))
    assert np.all(kap_cy >= 0.0)
    # fundamental at E_1 = 4.14e-18 * 2.8e6 * B keV (volume2d.f:269-271)
    e1 = 4.14e-18 * 2.8e6 * B
    assert j_cy.max() > 0.0
    peak = e_ph[np.argmax(j_cy)]
    # emission concentrated within the first n harmonics or the MNY tail
    assert peak > 0.3 * e1
    # plasma cutoff: no emission below nu_p = 9e3 sqrt(n_e)
    e_p = 9.0e3 * np.sqrt(n_e) / 2.41487e17
    assert np.all(j_cy[e_ph < 0.9 * e_p] == 0.0)
    el = eloss_cy(e_ph, j_cy)
    assert np.isfinite(el) and el >= 0.0


def test_vdsigma_kinematic_bounds():
    ge, gp = 2.0, 3.0
    be = np.sqrt(1 - 1 / ge**2)
    bp = np.sqrt(1 - 1 / gp**2)
    eps_u = 0.5 * (gp * (1 + bp) + ge * (1 + be))
    eps_l = 0.5 * (gp * (1 - bp) + ge * (1 - be))
    # outside the kinematic range: exactly zero (volume2d.f:462-466)
    assert vdsigma(eps_l * 0.5, ge, gp) == 0.0
    assert vdsigma(eps_u * 1.5, ge, gp) == 0.0
    # inside: positive and finite
    mid = np.sqrt(eps_l * eps_u)
    v = vdsigma(mid, ge, gp)
    assert v > 0.0 and np.isfinite(v)
    # sub-pair-threshold electrons: zero
    assert vdsigma(1.0, 1.0, 1.0) == 0.0


def test_annihilation_spectrum_line_near_511():
    """Cold-ish pairs annihilate into a line around m_e c^2."""
    num_nt = 60
    gnt = 0.2 / 1.1 * 1.1 ** (np.arange(num_nt) - 1.0)
    # concentrate both populations at low gamma
    f_nt = np.zeros((1, num_nt))
    f_nt[0, :6] = 1.0
    f_nt[0] /= np.sum(f_nt[0, :-1] * np.diff(gnt))
    n_pos = np.zeros((1, num_nt))
    n_pos[0, :6] = 1e8
    e_ph = np.geomspace(1.0, 1e4, 200)
    j_pa = annihilation_spectrum(e_ph, gnt, f_nt, n_pos, np.array([1e10]))
    j = j_pa[0]
    assert np.all(np.isfinite(j)) and np.all(j >= 0.0)
    assert j.max() > 0.0
    peak = e_ph[np.argmax(j)]
    assert 300.0 < peak < 1500.0
    # no positrons -> no annihilation radiation
    j0 = annihilation_spectrum(
        e_ph, gnt, f_nt, np.zeros_like(n_pos), np.array([1e10])
    )
    assert np.all(j0 == 0.0)
