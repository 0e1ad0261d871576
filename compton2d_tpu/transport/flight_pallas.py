"""Pallas TPU megakernel for the photon free-flight loop (plan M4).

The reference's inner hot loop (``/root/reference/src/imctrk2d.f:140-526``
— optical-depth draw, sigma lookup, cylindrical geometry, event select,
continuous absorption + tallies, zone hop / census / weight kill) is
fused into one Pallas kernel that keeps the photon SoA, the per-photon
opacity rows, and the per-zone tally accumulators resident in VMEM for
the whole multi-iteration flight. The XLA while_loop version
(``tracking._flight_phase``) pays per-iteration kernel-launch plus HBM
round-trips of the full SoA plus slow table gathers; here each photon
tile loops on-chip until every lane is frozen.

Division of labor (hybrid design):

- kernel: free flight until a *non-local* event — per-lane iterations of
  {tau draw (pltpu PRNG), sigma/kappa/kgg select from precomputed
  per-zone rows, distance-to-boundary, event select, attenuation with
  edep/prdep accumulation into VMEM scratch, weight-floor kill, move +
  azimuth update, in-domain zone hop}; lanes freeze with a flag when
  they reach census (dcen=0), want a Compton scatter, or cross out of
  the domain (leak);
- outer XLA loop (``tracking.transport_step`` in pallas mode): handles
  the frozen events — scatter sampling (``transport.scatter``),
  boundary physics/event records (``tracking._leak``) — then re-enters
  the kernel. Rounds ~ max scatter count per photon, so the expensive
  full-width lock-step iterations all happen on-chip.

Opacity lookup strategy: sigma/kappa/kgg depend on (zone, E); E is
constant during free flight, so the (n, nzr) rows are gathered *once
per round* in XLA (2 row-gathers) and the in-kernel per-iteration
lookup is a static unrolled select over the <= MAX_ZONES zones — no
per-lane dynamic VMEM gather (which Mosaic does not vectorize).

The kernel path requires nz*nr <= MAX_ZONES (reference max grid is
99x99; beyond the cap the XLA path is used - the select-sum cost grows
linearly with nzr).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from compton2d_tpu import constants as cn

MAX_ZONES = 128
SUB = 8          # sublanes per tile
LANE = 128       # lanes per tile
TILE = SUB * LANE

# frozen-lane flags (kernel output)
FLAG_NONE = 0     # census reached / dead
FLAG_SCATTER = 1  # wants a Compton scatter (outer loop)
FLAG_LEAK = 2     # crossed out of the domain (outer loop: _leak)

_CLAMP = 0.99999999


def _hash_u32(x):
    """Stateless 32-bit finalizer hash (splitmix-style)."""
    x = (x ^ (x >> jnp.uint32(16))) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> jnp.uint32(15))) * jnp.uint32(0x846CA68B)
    return x ^ (x >> jnp.uint32(16))


def _u01(shape, *, interpret, seed, it, draw):
    """Uniform [0,1) (24-bit mantissa). Compiled mode uses the on-core
    PRNG; interpret mode (CPU debugging — prng_seed has no CPU rule)
    uses a stateless counter hash keyed on (seed, iteration, draw,
    lane)."""
    if not interpret:
        # prng_random_bits yields int32 on TPU: bitcast before the
        # logical shift (an arithmetic shift would produce negative
        # "uniforms" -> log(neg) = NaN in the tau draw)
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    else:
        lane = (
            jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
            * jnp.uint32(shape[1])
            + jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
        )
        ctr = (
            seed.astype(jnp.uint32)
            + it.astype(jnp.uint32) * jnp.uint32(2654435761)
            + jnp.uint32(draw * 40503)
        )
        bits = _hash_u32(ctr ^ (lane * jnp.uint32(2246822519)))
    # uint32 -> f32 has no Mosaic cast; the >>8 result fits int32
    return (
        (bits >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32)
        * jnp.float32(2.0**-24)
    )


def _flight_kernel(
    # scalar prefetch
    seed_ref,                 # (n_tiles,) int32
    # VMEM inputs
    e_ref, w_ref, w0_ref, r_ref, z_ref, mu_ref, cphi_ref, sphi_ref,
    dcen_ref, jz_ref, kr_ref, alive_ref,
    sk_ref,                   # (C, SUB, LANE) per-photon per-zone rows
    # SMEM inputs
    redges_ref,               # (1, nr+1)
    zedges_ref,               # (1, nz+1)
    # VMEM outputs
    w_o, r_o, z_o, cphi_o, sphi_o, dcen_o, jz_o, kr_o, alive_o,
    flag_o, jn_o, kn_o,
    tally_o,                  # (4, nzr_pad, LANE): edep, prdep, ekill,
                              # pair_abs (rows 1+ of ch 2/3 unused)
    *,
    nz: int, nr: int, pair_switch: bool, weight_floor: float,
    max_iters: int, nzr_pad: int, interpret: bool = False,
):
    my_seed = seed_ref[pl.program_id(0)]
    if not interpret:
        pltpu.prng_seed(my_seed)
    nzr = nz * nr
    f32 = jnp.float32

    def body(carry):
        (it, w, r, z, cphi, sphi, dcen, jz, kr, alive, flag,
         jn, kn, ed_scr, pr_scr, ekill, pairabs) = carry
        e = e_ref[0]
        mu = mu_ref[0]
        w0 = w0_ref[0]
        act = (alive == 1) & (dcen > 0.0) & (flag == FLAG_NONE)
        zid = jz * nr + kr

        # --- 1. opacity select + optical depth draw ------------------
        sig = jnp.zeros((SUB, LANE), f32)
        kap = jnp.zeros((SUB, LANE), f32)
        kgg = jnp.zeros((SUB, LANE), f32)
        nch = 3 if pair_switch else 2
        for q in range(nzr):
            m = zid == q
            sig = jnp.where(m, sk_ref[0, nch * q], sig)
            kap = jnp.where(m, sk_ref[0, nch * q + 1], kap)
            if pair_switch:
                kgg = jnp.where(m, sk_ref[0, nch * q + 2], kgg)
        sig = jnp.maximum(sig, 1e-30)
        u_tau = 1e-12 + _u01((SUB, LANE), interpret=interpret, seed=my_seed, it=it, draw=0) * (1.0 - 1e-12)
        dcol = -jnp.log(u_tau) / sig

        # --- 2. geometry (imctrk2d.f:228-360) ------------------------
        r_in = jnp.zeros((SUB, LANE), f32)
        r_out = jnp.zeros((SUB, LANE), f32)
        for k in range(nr):
            m = kr == k
            r_in = jnp.where(m, redges_ref[0, k], r_in)
            r_out = jnp.where(m, redges_ref[0, k + 1], r_out)
        z_bot = jnp.zeros((SUB, LANE), f32)
        z_top = jnp.zeros((SUB, LANE), f32)
        for j in range(nz):
            m = jz == j
            z_bot = jnp.where(m, zedges_ref[0, j], z_bot)
            z_top = jnp.where(m, zedges_ref[0, j + 1], z_top)

        eta = jnp.clip(cphi, -_CLAMP, _CLAMP)
        mu_c = jnp.clip(mu, -_CLAMP, _CLAMP)
        sin_mu = jnp.sqrt(1.0 - mu_c * mu_c)
        disp = eta * r
        psq = (r * sphi) ** 2
        inward = (eta < 0.0) & (psq < r_in * r_in)
        inout = jnp.where(inward, -1.0, 1.0)
        rbnd_shell = jnp.where(inward, r_in, r_out)
        dpbsq = jnp.maximum(rbnd_shell * rbnd_shell - psq, 1e-6)
        disbr = jnp.maximum(inout * jnp.sqrt(dpbsq) - disp, 0.0)
        trldb_r = disbr / jnp.maximum(sin_mu, 1e-12)
        z_r = z + mu_c * trldb_r
        hits_top = z_r > z_top
        hits_bot = z_r < z_bot
        zbnd_z = jnp.where(hits_top, z_top, z_bot)
        f_z = jnp.maximum(
            (zbnd_z - z) * sin_mu
            / jnp.where(jnp.abs(mu_c) > 1e-12, mu_c, 1e-12),
            0.0,
        )
        r_z = jnp.sqrt(
            jnp.maximum(r * r + f_z * f_z + 2.0 * r * f_z * eta, 0.0)
        )
        trldb_z = jnp.sqrt(f_z * f_z + (zbnd_z - z) ** 2)
        hits_zplane = hits_top | hits_bot
        trldb = jnp.where(hits_zplane, trldb_z, trldb_r)
        g_jnew = jnp.where(
            hits_top, jz + 1, jnp.where(hits_bot, jz - 1, jz)
        )
        g_knew = jnp.where(
            hits_zplane, kr, kr + inout.astype(jnp.int32)
        )
        g_rbnd = jnp.where(hits_zplane, r_z, rbnd_shell)
        g_zbnd = jnp.where(hits_zplane, zbnd_z, z_r)

        # --- 3. event select (imctrk2d.f:216-379) --------------------
        trld = jnp.minimum(dcen, dcol)
        ikind = jnp.where(dcen <= dcol, 2, 3)
        hit_bnd = trldb < trld
        trld = jnp.where(hit_bnd, trldb, trld)
        ikind = jnp.where(hit_bnd, 1, ikind)

        # --- 4. continuous absorption (imctrk2d.f:382-462) -----------
        sigabs = jnp.maximum(kap + kgg, 1e-30)
        xabs = sigabs * trld
        ewnew = jnp.where(xabs < 100.0, w * jnp.exp(-xabs), 0.0)
        deleabs = jnp.maximum(w - ewnew, 0.0)
        if pair_switch:
            frac_heat = jnp.where(e > 47.0, kap / sigabs, 1.0)
            # gamma-gamma-absorbed energy above 47 keV becomes pairs,
            # not heat: tally so the photon-side audit closes
            pairabs = pairabs + jnp.where(
                act, deleabs * (1.0 - frac_heat), 0.0
            )
        else:
            frac_heat = jnp.ones((SUB, LANE), f32)
        edep_add = jnp.where(act, deleabs * frac_heat, 0.0)
        u_s = 1e-7 + _u01((SUB, LANE), interpret=interpret, seed=my_seed, it=it, draw=1) * (1.0 - 1e-7)
        tiny_abs = xabs <= 1e-5
        # expm1/log1p have no Mosaic lowering; the exp/log forms lose
        # precision only for xabs ~ 1e-5, which the tiny_abs midpoint
        # branch covers
        frac = jnp.clip((1.0 - jnp.exp(-xabs)) * u_s, 0.0, 0.999999)
        sstar = jnp.where(
            tiny_abs, 0.5 * trld,
            -jnp.log(jnp.maximum(1.0 - frac, 1e-7)) / sigabs,
        )
        denom = jnp.sqrt(
            jnp.maximum(r * r + 2.0 * mu * r * sstar + sstar * sstar,
                        1e-20)
        )
        wmustar = jnp.where(tiny_abs, mu, (mu * r + sstar) / denom)
        prdep_add = jnp.where(
            act, deleabs * wmustar * jnp.float32(cn.C_LIGHT), 0.0
        )
        # per-zone accumulation without scatter (no Mosaic lowering):
        # concatenate the masked per-zone sublane-sums into row order
        def zone_rows(vals):
            rows = [
                jnp.sum(
                    jnp.where(zid == q, vals, 0.0), axis=0,
                    keepdims=True,
                )
                for q in range(nzr)
            ]
            if nzr_pad > nzr:
                rows.append(
                    jnp.zeros((nzr_pad - nzr, LANE), jnp.float32)
                )
            return jnp.concatenate(rows, axis=0)

        ed_scr = ed_scr + zone_rows(edep_add)
        pr_scr = pr_scr + zone_rows(prdep_add)

        # --- weight floor kill (imctrk2d.f:465) ----------------------
        killed = act & (ewnew <= jnp.float32(weight_floor) * w0)
        ekill = ekill + jnp.where(killed, ewnew, 0.0)

        # --- 5. move -------------------------------------------------
        on_bnd = act & (ikind == 1)
        f_h = trld * jnp.sqrt(jnp.maximum(1.0 - mu * mu, 0.0))
        r_free = jnp.sqrt(
            jnp.maximum(f_h * f_h + r * r + 2.0 * f_h * r * cphi, 0.0)
        )
        rnew = jnp.where(on_bnd, g_rbnd, r_free)
        znew = jnp.where(on_bnd, g_zbnd, z + trld * mu)
        rs = jnp.maximum(rnew, 1e-20)
        cphi_n = jnp.clip((f_h + cphi * r) / rs, -1.0, 1.0)
        sphi_n = jnp.clip(sphi * r / rs, -1.0, 1.0)
        nrm = jnp.sqrt(jnp.maximum(cphi_n**2 + sphi_n**2, 1e-12))
        cphi_n, sphi_n = cphi_n / nrm, sphi_n / nrm

        upd = act & ~killed
        w = jnp.where(act, jnp.where(killed, 0.0, ewnew), w)
        r = jnp.where(upd, rnew, r)
        z = jnp.where(upd, znew, z)
        cphi = jnp.where(upd, cphi_n, cphi)
        sphi = jnp.where(upd, sphi_n, sphi)
        dcen = jnp.where(upd, dcen - trld, dcen)
        alive = jnp.where(killed, 0, alive)

        # --- 6. event execution --------------------------------------
        cross = upd & (ikind == 1)
        in_dom = (
            (g_jnew >= 0) & (g_jnew < nz) & (g_knew >= 0) & (g_knew < nr)
        )
        jz = jnp.where(cross & in_dom, g_jnew, jz)
        kr = jnp.where(cross & in_dom, g_knew, kr)
        leak = cross & ~in_dom
        flag = jnp.where(leak, FLAG_LEAK, flag)
        jn = jnp.where(leak, g_jnew, jn)
        kn = jnp.where(leak, g_knew, kn)
        want_sct = upd & (ikind == 3)
        flag = jnp.where(want_sct, FLAG_SCATTER, flag)

        return (it + 1, w, r, z, cphi, sphi, dcen, jz, kr, alive,
                flag, jn, kn, ed_scr, pr_scr, ekill, pairabs)

    def cond(carry):
        it, w, r, z, cphi, sphi, dcen, jz, kr, alive, flag = carry[:11]
        act = (alive == 1) & (dcen > 0.0) & (flag == FLAG_NONE)
        return (it < max_iters) & jnp.any(act)

    init = (
        jnp.int32(0), w_ref[0], r_ref[0], z_ref[0], cphi_ref[0],
        sphi_ref[0], dcen_ref[0], jz_ref[0], kr_ref[0], alive_ref[0],
        jnp.zeros((SUB, LANE), jnp.int32),
        jz_ref[0], kr_ref[0],
        jnp.zeros((nzr_pad, LANE), jnp.float32),
        jnp.zeros((nzr_pad, LANE), jnp.float32),
        jnp.zeros((SUB, LANE), jnp.float32),
        jnp.zeros((SUB, LANE), jnp.float32),
    )
    (_, w, r, z, cphi, sphi, dcen, jz, kr, alive, flag, jn, kn,
     ed_scr, pr_scr, ekill, pairabs) = jax.lax.while_loop(
         cond, body, init
     )

    w_o[0] = w
    r_o[0] = r
    z_o[0] = z
    cphi_o[0] = cphi
    sphi_o[0] = sphi
    dcen_o[0] = dcen
    jz_o[0] = jz
    kr_o[0] = kr
    alive_o[0] = alive
    flag_o[0] = flag
    jn_o[0] = jn
    kn_o[0] = kn
    tally_o[0, 0] = ed_scr
    tally_o[0, 1] = pr_scr

    def _scalar_rows(v):
        return jnp.concatenate(
            [
                jnp.sum(v, axis=0, keepdims=True),
                jnp.zeros((nzr_pad - 1, LANE), jnp.float32),
            ],
            axis=0,
        )

    tally_o[0, 2] = _scalar_rows(ekill)
    tally_o[0, 3] = _scalar_rows(pairabs)


def _tile(x, n_tiles):
    return x.reshape(n_tiles, SUB, LANE)


@functools.partial(
    jax.jit,
    static_argnames=(
        "nz", "nr", "pair_switch", "weight_floor", "max_iters",
        "interpret",
    ),
)
def flight_rounds(
    e, w, w0, r, z, mu, cphi, sphi, dcen, jz, kr, alive,
    sk,                       # (n, C) per-photon per-zone opacity rows
    r_edges, z_edges, seeds,
    *,
    nz: int, nr: int, pair_switch: bool, weight_floor: float,
    max_iters: int, interpret: bool = False,
) -> Tuple:
    """One kernel round over all photon tiles. Returns the updated SoA
    plus per-lane flags and the (4, nzr) [edep, prdep, ekill-partial,
    pair_abs-partial] tallies."""
    n = e.shape[0]
    assert n % TILE == 0, f"n_slots={n} must be a multiple of {TILE}"
    n_tiles = n // TILE
    nzr = nz * nr
    assert nzr <= MAX_ZONES
    nzr_pad = max(8, -(-nzr // 8) * 8)
    nch = 3 if pair_switch else 2

    sk_t = sk.reshape(n_tiles, SUB, LANE, nzr * nch).transpose(0, 3, 1, 2)

    f_in = [
        _tile(a.astype(jnp.float32), n_tiles)
        for a in (e, w, w0, r, z, mu, cphi, sphi, dcen)
    ]
    i_in = [
        _tile(a.astype(jnp.int32), n_tiles)
        for a in (jz, kr, alive.astype(jnp.int32))
    ]

    vspec = pl.BlockSpec(
        (1, SUB, LANE), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
    )
    skspec = pl.BlockSpec(
        (1, nzr * nch, SUB, LANE), lambda i, *_: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    smem_r = pl.BlockSpec(
        (1, r_edges.shape[0]), lambda i, *_: (0, 0), memory_space=pltpu.SMEM
    )
    smem_z = pl.BlockSpec(
        (1, z_edges.shape[0]), lambda i, *_: (0, 0), memory_space=pltpu.SMEM
    )
    tspec = pl.BlockSpec(
        (1, 4, nzr_pad, LANE), lambda i, *_: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )

    out_shape = (
        [jax.ShapeDtypeStruct((n_tiles, SUB, LANE), jnp.float32)] * 6
        + [jax.ShapeDtypeStruct((n_tiles, SUB, LANE), jnp.int32)] * 6
        + [jax.ShapeDtypeStruct((n_tiles, 4, nzr_pad, LANE), jnp.float32)]
    )
    out_specs = [vspec] * 12 + [tspec]

    kern = functools.partial(
        _flight_kernel,
        nz=nz, nr=nr, pair_switch=pair_switch,
        weight_floor=weight_floor, max_iters=max_iters,
        nzr_pad=nzr_pad, interpret=interpret,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[vspec] * 9 + [vspec] * 3 + [skspec, smem_r, smem_z],
        out_specs=tuple(out_specs),
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(
        seeds, *f_in, *i_in, sk_t,
        r_edges.astype(jnp.float32).reshape(1, -1),
        z_edges.astype(jnp.float32).reshape(1, -1),
    )
    (w_n, r_n, z_n, cphi_n, sphi_n, dcen_n, jz_n, kr_n, alive_n,
     flag, jn, kn, tl) = outs
    flat = lambda a: a.reshape(n)
    # (n_tiles, 4, nzr_pad, LANE) -> (4, nzr): sum tiles + lanes
    tall = jnp.sum(tl, axis=(0, 3))[:, :nzr]
    return (
        flat(w_n), flat(r_n), flat(z_n), flat(cphi_n), flat(sphi_n),
        flat(dcen_n), flat(jz_n), flat(kr_n), flat(alive_n) == 1,
        flat(flag), flat(jn), flat(kn), tall,
    )


def _twohot_interp(e, table, log0, dlog):
    """Log-linear interpolation of (n_bins, K) ``table`` at per-photon
    energies via a two-hot weight matrix on the MXU: (n, n_bins) @
    (n_bins, K). A per-photon row *gather* here costs ~10 ns/element on
    TPU (the round-2 volume_em lesson) — 0.3 s/round at bench shapes;
    the matmul is < 1 ms."""
    n = e.shape[0]
    n_bins = table.shape[0]
    x = (jnp.log(jnp.maximum(e, 1e-30)) - log0) / dlog
    x = jnp.clip(x, 0.0, n_bins - 1.000001)
    i0 = jnp.floor(x).astype(jnp.int32)
    f = (x - i0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, n_bins), 1)
    wmat = (
        jnp.where(cols == i0[:, None], (1.0 - f)[:, None], 0.0)
        + jnp.where(cols == i0[:, None] + 1, f[:, None], 0.0)
    )
    return jnp.dot(wmat, table, preferred_element_type=jnp.float32)


def precompute_opacity_rows(
    e, opac_zone, kgg_zone, e_ph_log0, e_ph_dlog, e_gg_log0, e_gg_dlog,
    pair_switch: bool,
):
    """Per-photon per-zone opacity rows: (n, nzr*nch), zone-major
    channels [sigma, kappa(, kgg)]. E is fixed during free flight, so
    these rows are valid for a whole kernel round."""
    n = e.shape[0]
    nzr, n_vol = opac_zone.shape[0], opac_zone.shape[1]
    # (nzr, n_vol, 2) -> (n_vol, nzr*2) interpolation target
    tab = opac_zone.transpose(1, 0, 2).reshape(n_vol, nzr * 2)
    sk = _twohot_interp(e, tab, e_ph_log0, e_ph_dlog).reshape(
        n, nzr, 2
    )
    if not pair_switch:
        return sk.reshape(n, nzr * 2)
    kv = _twohot_interp(e, kgg_zone.T, e_gg_log0, e_gg_dlog)
    # below-grid extrapolation (tracking.py kgg scale-down)
    e0 = jnp.exp(e_gg_log0).astype(jnp.float32)
    kv = jnp.where(
        (e > e0)[:, None], kv, kv * (e / e0)[:, None]
    )
    return jnp.concatenate(
        [sk, kv[:, :, None]], axis=-1
    ).reshape(n, nzr * 3)
