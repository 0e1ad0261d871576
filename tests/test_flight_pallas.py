"""Pallas flight-megakernel unit tests (interpret mode on the CPU
mesh). The compiled-Mosaic path is gated separately on the real chip by
``tools/pallas_e2e.py`` — the pallas-on vs pallas-off end-to-end
physics comparison whose result bench.py embeds in every BENCH JSON
snapshot (``pallas_e2e``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compton2d_tpu.transport import flight_pallas as fpk


def _mkphotons(n, nz, nr, seed=0, kap=0.5, sig=1.0, dcen=5.0):
    rng = np.random.default_rng(seed)
    phi = rng.uniform(0, 2 * np.pi, n)
    sk = np.empty((n, nz * nr * 2), np.float32)
    sk[:, 0::2] = sig
    sk[:, 1::2] = kap
    return dict(
        e=jnp.asarray(rng.uniform(1.0, 10.0, n), jnp.float32),
        w=jnp.ones(n, jnp.float32),
        w0=jnp.ones(n, jnp.float32),
        r=jnp.asarray(rng.uniform(0.1, 0.9, n), jnp.float32),
        z=jnp.asarray(rng.uniform(0.1, 0.9, n), jnp.float32),
        mu=jnp.asarray(rng.uniform(-1, 1, n), jnp.float32),
        cphi=jnp.asarray(np.cos(phi), jnp.float32),
        sphi=jnp.asarray(np.sin(phi), jnp.float32),
        dcen=jnp.full(n, dcen, jnp.float32),
        jz=jnp.asarray(rng.integers(0, nz, n), jnp.int32),
        kr=jnp.asarray(rng.integers(0, nr, n), jnp.int32),
        alive=jnp.ones(n, bool),
        sk=jnp.asarray(sk),
        r_edges=jnp.asarray(np.linspace(0, 1, nr + 1), jnp.float32),
        z_edges=jnp.asarray(np.linspace(0, 1, nz + 1), jnp.float32),
        seeds=jnp.arange(n // fpk.TILE, dtype=jnp.int32),
    )


def _run(p, nz, nr, **kw):
    kw.setdefault("max_iters", 32)
    return fpk.flight_rounds(
        p["e"], p["w"], p["w0"], p["r"], p["z"], p["mu"], p["cphi"],
        p["sphi"], p["dcen"], p["jz"], p["kr"], p["alive"], p["sk"],
        p["r_edges"], p["z_edges"], p["seeds"],
        nz=nz, nr=nr, pair_switch=False, weight_floor=1e-10,
        interpret=True, **kw,
    )


def test_kernel_energy_bookkeeping():
    """Within the kernel, weight is only moved to edep (absorption) or
    ekill (floor kill); frozen lanes keep theirs: sum(w_in) =
    sum(w_out) + sum(edep) + ekill exactly (f32 rounding)."""
    nz, nr = 3, 2
    p = _mkphotons(fpk.TILE * 2, nz, nr)
    out = _run(p, nz, nr)
    w_out = np.asarray(out[0])
    tall = np.asarray(out[12])
    total = w_out.sum() + tall[0].sum() + tall[2].sum()
    np.testing.assert_allclose(total, float(p["w"].sum()), rtol=2e-5)


def test_kernel_deterministic():
    nz, nr = 3, 2
    p = _mkphotons(fpk.TILE, nz, nr, seed=4)
    o1 = _run(p, nz, nr)
    o2 = _run(p, nz, nr)
    for a, b in zip(o1, o2):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_kernel_pure_streaming_census():
    """kap=0, sigma tiny -> every photon free-streams its full census
    distance: straight-line z advance for the vertical component, flag
    stays NONE, dcen -> 0 (unless it leaks through a boundary)."""
    nz, nr = 2, 2
    n = fpk.TILE
    p = _mkphotons(n, nz, nr, kap=0.0, sig=1e-25, dcen=0.3)
    # vertical-ish photons near the middle so most stay in-domain
    p["mu"] = jnp.full(n, 0.2, jnp.float32)
    p["z"] = jnp.full(n, 0.4, jnp.float32)
    p["r"] = jnp.full(n, 0.3, jnp.float32)
    out = _run(p, nz, nr)
    z_n = np.asarray(out[2])
    dcen_n = np.asarray(out[5])
    flag = np.asarray(out[9])
    stayed = flag == fpk.FLAG_NONE
    assert stayed.mean() > 0.5
    np.testing.assert_allclose(dcen_n[stayed], 0.0, atol=1e-6)
    np.testing.assert_allclose(
        z_n[stayed], 0.4 + 0.2 * 0.3, rtol=1e-5
    )
    # no energy deposited with kap=0
    assert np.asarray(out[12])[0].sum() < 1e-6


def test_kernel_thick_zone_scatter_freeze():
    """Optically thick, absorption-free medium: every lane should
    freeze wanting a scatter almost immediately."""
    nz, nr = 2, 2
    p = _mkphotons(fpk.TILE, nz, nr, kap=0.0, sig=500.0, dcen=10.0)
    out = _run(p, nz, nr, max_iters=4)
    flag = np.asarray(out[9])
    assert (flag == fpk.FLAG_SCATTER).mean() > 0.95
