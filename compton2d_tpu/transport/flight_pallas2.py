"""Pallas TPU flight megakernel v2: whole-step tracking with the
Compton scatter sampler inlined.

v1 (``flight_pallas.py``) froze every lane at each Compton collision
and returned to XLA for the scatter sample — ~5.3 kernel re-entries
per step, each paying ~10 ms of XLA launch overhead plus a full-width
per-photon opacity-row precompute (the round-3 roofline showed
tracking overhead-bound at 2.7 % of HBM peak). v2 keeps the photon in
VMEM through its *entire* step:

- the reference's flight loop (``/root/reference/src/imctrk2d.f:140-526``:
  optical-depth draw, sigma/kappa/kgg lookup, cylindrical geometry,
  event select, continuous absorption + per-zone tallies, weight kill,
  zone hop);
- the reference's scatter sampler (``src/compb_2d.f``: electron draw
  from the zone CDF, relativistic flux-factor angle, Klein-Nishina
  acceptance, sz-rejection, boost back, azimuth rotation, weight
  update ew *= E'/E) as a per-lane state machine:
  FLY -> SCT_A (electron+angle joint rejection) -> SCT_B
  (sz-rejection + finish) -> FLY;

so a kernel entry only ends at census / leak / straggler cutoff.
Boundary physics (escape records, reflection, ``tracking._leak``)
still freezes lanes to XLA — escapes are terminal and reflections are
rare, so rounds/step drop to ~1-2.

Table lookups replace v1's per-photon precomputed rows and O(nzr)
select chains: the per-zone tables live in VMEM in a ``(rows, 128)``
layout (rows = zone-major groups of 128 table columns) and a per-lane
2D lookup ``T[row[s,l], col[s,l]]`` is an 8-row broadcast +
``tpu.dynamic_gather`` lane shuffle per 8-row chunk, swept only over
the chunks spanned by the tile's current [min(zid), max(zid)] range.
Cost scales with the tile's zone *spread* (photons are emitted
zone-coherently), not the grid size — raising the kernel zone cap
from v1's 128 to MAX_ZONES = 1024 (a 32x32 grid; VMEM table budget
~8 MB). Larger grids fall back to the XLA loop. Grid edges are
lane-gathered from broadcast rows, so nz, nr <= 127 each (the
reference caps at 99, general.pa:10-12).

The electron inverse-CDF draw is exact and O(1)-expected via a guide
table (Chen's cutpoint method): guide[z, j] = #(cdf[z] < u_j) on a
composite 512-cell u-grid (linear below 0.5, log-spaced in 1-u above,
so nonthermal tail strata stay resolved); the drawn bin is
idx = lo + #(cdf[z, m] < u, m in [lo, hi)) counted SCAN_S bins per
iteration — the same count the XLA ``_draw_from_cdf`` computes over
all bins, just bracketed by the guide.

e_ic / n_esp (the per-electron-bin scatter diagnostics,
imctrk2d.f:649-679) cannot be scatter-added per-lane in Mosaic, so
each lane keeps a K_LOG-deep (i_gam, d_e) event log, histogrammed by
one XLA one-hot matmul per round; events beyond K_LOG lose only the
diagnostic attribution (sct_cnt records the overflow) — the energy
itself stays exactly tallied in edep / e_scatter.

Per-zone edep/prdep accumulate in a VMEM scratch (chunk-swept masked
sublane reductions — no Mosaic scatter needed) and are summed into
one shared revisited output block across the grid, so the tally HBM
traffic is O(zones), not O(tiles x zones).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from compton2d_tpu import constants as cn

MAX_ZONES = 1024
MAX_EDGE = 127    # nr, nz each <= 127 (reference cap 99, general.pa)
SUB = 8
LANE = 128
TILE = SUB * LANE

# windowed-table mode (grids beyond MAX_ZONES, up to 127x127 = the
# reference's 99x99 ceiling): tables stay in HBM; each tile gets a
# 2*WIN_Z-zone window (two WIN_Z-aligned blocks, prefetch-indexed by
# the tile's min zone) pipelined into VMEM by Pallas and copied to one
# contiguous scratch, so every sweep runs on window-local zone ids.
# Lanes that walk outside their tile's window freeze with FLAG_WINDOW
# and resume next outer round under a recomputed window. Zone-sorted
# slots (driver zone_sort prepass) keep tile spreads within a window.
WIN_Z = 128

K_LOG = 8         # per-lane scatter-event log depth
SCAN_S = 4        # CDF bins counted per SCT_A iteration
GUIDE_G = 512     # electron-CDF guide cells

# frozen-lane flags (kernel output)
FLAG_NONE = 0
FLAG_SCATTER = 1  # only when inline_scatter=False (strat-split mode)
FLAG_LEAK = 2
FLAG_WINDOW = 3   # windowed mode: lane walked out of the tile's
                  # table window; retried next outer round

# per-lane scatter-machine modes
MODE_FLY = 0
MODE_SCT_A = 1    # electron + angle joint rejection (compb_2d.f:36-93)
MODE_SCT_B = 2    # sz rejection + finish (compb_2d.f:96-239)

_CLAMP = 0.99999999
_CLAMP_S = 0.9999999   # the scatter sampler's clamp (compb_2d.f)
_INV_LN2 = 1.4426950408889634


def _cdiv(a, b):
    return -(-a // b)


def _hash_u32(x):
    x = (x ^ (x >> jnp.uint32(16))) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> jnp.uint32(15))) * jnp.uint32(0x846CA68B)
    return x ^ (x >> jnp.uint32(16))


def _u01(shape, *, interpret, seed, it, draw):
    """Uniform [0,1) (24-bit mantissa); on-core PRNG compiled, counter
    hash in interpret mode (prng_seed has no CPU rule)."""
    if not interpret:
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
    return (
        (bits >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32)
        * jnp.float32(2.0**-24)
    )


def _gather_lane(rows, col):
    """rows (SUB, LANE) -> rows[s, col[s,l]] per lane (Mosaic
    tpu.dynamic_gather: a single-tile lane shuffle)."""
    return jnp.take_along_axis(
        rows, col, axis=1, mode="promise_in_bounds"
    )


def _sweep(t_ref, pairs, g_lo, g_hi, init=None):
    """Chunked per-lane 2D table lookup: for each ``(row, col)`` pair
    of (SUB, LANE) i32 index arrays, returns ``T[row, col]``
    element-wise. Sweeps 8-row chunks g in [g_lo, g_hi) of ``t_ref``
    (R, 128); per chunk each of the 8 rows is broadcast and
    lane-gathered, selected where ``row`` matches. Rows outside the
    swept range return ``init`` (default 0)."""
    n = len(pairs)
    if init is None:
        init = [jnp.zeros((SUB, LANE), jnp.float32)] * n

    def body(g, accs):
        base = g * 8
        chunk = t_ref[pl.ds(base, 8), :]
        out = []
        for (row, col), acc in zip(pairs, accs):
            v = acc
            for j in range(8):
                rowj = jnp.broadcast_to(
                    chunk[j : j + 1, :], (SUB, LANE)
                )
                gj = _gather_lane(rowj, col)
                v = jnp.where(row == base + j, gj, v)
            out.append(v)
        return out

    return jax.lax.fori_loop(g_lo, g_hi, body, list(init))


def _guide_cell(u):
    """Composite 512-cell guide index for electron-CDF u: linear below
    0.5 (cells 0..255), log-spaced in (1-u) above (256..511, ~10 cells
    per octave down to 1-u = 2^-26 < the PRNG's 2^-24 resolution)."""
    G = GUIDE_G
    j_lin = jnp.floor(u * jnp.float32(G)).astype(jnp.int32)
    neg_l2 = -jnp.log(jnp.maximum(1.0 - u, 1e-9)) * jnp.float32(
        _INV_LN2
    )
    j_log = jnp.int32(G // 2) + jnp.floor(
        (neg_l2 - 1.0) * jnp.float32((G // 2) / 25.0)
    ).astype(jnp.int32)
    j = jnp.where(u < 0.5, j_lin, j_log)
    return jnp.clip(j, 0, G - 1)


def guide_u_edges() -> np.ndarray:
    """The (G,) u values at guide-cell lower edges (host-side; must
    match ``_guide_cell``)."""
    G = GUIDE_G
    j = np.arange(G)
    lin = j / G
    log = 1.0 - 2.0 ** -(1.0 + (j - G // 2) * 25.0 / (G // 2))
    return np.where(j <= G // 2, lin, log).astype(np.float32)


class KernelTables(NamedTuple):
    """Per-step device tables in the kernel (rows, 128) layout."""

    opac_t: jnp.ndarray     # (nzr*rpz, 128) [sig rows, kap rows, kgg]
    cdf_t: jnp.ndarray      # (nzr*cg_nt, 128) electron CDF
    guide_t: jnp.ndarray    # (nzr*cg_gd, 128) i32 guide lo-counts
    gm1_t: jnp.ndarray      # (cg_nt, 128) bin-midpoint gamma-1
    redges_t: jnp.ndarray   # (SUB, 128) broadcast r edges
    zedges_t: jnp.ndarray   # (SUB, 128) broadcast z edges
    scal: jnp.ndarray       # (1, 8) f32 [e_ph_log0, e_ph_dlog,
                            #   e_gg_log0, e_gg_dlog, e_gg0, 0, 0, 0]


class KernelDims(NamedTuple):
    nzr: int
    n_vol: int
    n_gg: int
    num_nt: int
    cg_ph: int     # 128-col groups of the padded e_ph grid
    cg_gg: int
    cg_nt: int
    cg_gd: int
    rpz: int       # opacity rows per zone = 2*cg_ph + cg_gg


def build_kernel_tables(
    opac_zone: jnp.ndarray,   # (nzr, n_vol, 2) [sigma, kappa]
    kgg_zone: jnp.ndarray,    # (nzr, n_gg)
    cdf_nt: jnp.ndarray,      # (nzr, num_nt)
    gnt: jnp.ndarray,         # (num_nt,) gamma-1 grid
    r_edges, z_edges,
    e_ph_log0, e_ph_dlog, e_gg_log0, e_gg_dlog,
    win_z: int = 0,
) -> Tuple[KernelTables, KernelDims]:
    """Repack the per-step zone tables into the kernel layout (cheap
    XLA pads/reshapes, once per step). ``win_z > 0`` (windowed-table
    mode) pads the zone axis to a multiple of win_z PLUS one extra
    window so block index base+1 is always valid."""
    nzr, n_vol = opac_zone.shape[0], opac_zone.shape[1]
    if win_z:
        nz_pad = (_cdiv(nzr, win_z) + 1) * win_z

        def zpad(x):
            return jnp.pad(x, [(0, nz_pad - nzr)] + [(0, 0)] * (x.ndim - 1))

        opac_zone = zpad(opac_zone)
        kgg_zone = zpad(kgg_zone)
        # pad CDF rows with 2.0 so padded zones never count (cdf < u)
        cdf_nt = jnp.concatenate(
            [
                cdf_nt,
                jnp.full(
                    (nz_pad - nzr, cdf_nt.shape[1]), 2.0, cdf_nt.dtype
                ),
            ],
            axis=0,
        )
        nzr = nz_pad
    n_gg = kgg_zone.shape[1]
    num_nt = cdf_nt.shape[1]
    cg_ph = _cdiv(n_vol, LANE)
    cg_gg = _cdiv(n_gg, LANE)
    cg_nt = _cdiv(num_nt, LANE)
    cg_gd = GUIDE_G // LANE
    rpz = 2 * cg_ph + cg_gg

    def padlane(x, to):
        return jnp.pad(x, [(0, 0), (0, to * LANE - x.shape[1])])

    def padrows(t):
        # the chunk sweep reads 8-row slices: pad the row count
        r = t.shape[0]
        return jnp.pad(t, [(0, _cdiv(r, 8) * 8 - r), (0, 0)])

    sig = padlane(opac_zone[:, :, 0], cg_ph).reshape(nzr, cg_ph, LANE)
    kap = padlane(opac_zone[:, :, 1], cg_ph).reshape(nzr, cg_ph, LANE)
    kgg = padlane(kgg_zone, cg_gg).reshape(nzr, cg_gg, LANE)
    opac_t = padrows(
        jnp.concatenate([sig, kap, kgg], axis=1).reshape(
            nzr * rpz, LANE
        ).astype(jnp.float32)
    )

    # CDF pad value 2.0: padded bins never count as (cdf < u)
    cdf_t = padrows(jnp.pad(
        cdf_nt.astype(jnp.float32),
        [(0, 0), (0, cg_nt * LANE - num_nt)], constant_values=2.0,
    ).reshape(nzr * cg_nt, LANE))

    # guide: lo_j = #(cdf[z] < u_edge(j)); hi_j = lo_{j+1} is looked
    # up at cell j+1 (clamped to num_nt at the top cell). Computed as
    # a broadcast compare-count — vmap(searchsorted) lowers to a
    # gather while-loop that cost ~2.6 ms/step on v5e at bench shapes
    u_edges = jnp.asarray(guide_u_edges(), dtype=jnp.float32)
    guide = jnp.sum(
        (
            cdf_nt.astype(jnp.float32)[:, :, None]
            < u_edges[None, None, :]
        ).astype(jnp.int32),
        axis=1,
    )
    guide_t = padrows(guide.reshape(nzr * cg_gd, LANE))

    gm1_mid = jnp.sqrt(gnt[1:] * gnt[:-1]).astype(jnp.float32)
    gm1_t = jnp.pad(
        gm1_mid, (0, cg_nt * LANE - (num_nt - 1))
    ).reshape(cg_nt, LANE)

    def mk_edge(e):
        row = jnp.zeros((LANE,), jnp.float32).at[: e.shape[0]].set(
            e.astype(jnp.float32)
        )
        return jnp.broadcast_to(row[None, :], (SUB, LANE))

    scal = jnp.stack(
        [
            jnp.asarray(e_ph_log0, jnp.float32),
            jnp.asarray(e_ph_dlog, jnp.float32),
            jnp.asarray(e_gg_log0, jnp.float32),
            jnp.asarray(e_gg_dlog, jnp.float32),
            jnp.exp(jnp.asarray(e_gg_log0, jnp.float32)),
            jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32),
        ]
    ).reshape(1, 8)

    dims = KernelDims(
        nzr=nzr, n_vol=n_vol, n_gg=n_gg, num_nt=num_nt,
        cg_ph=cg_ph, cg_gg=cg_gg, cg_nt=cg_nt, cg_gd=cg_gd, rpz=rpz,
    )
    return (
        KernelTables(
            opac_t=opac_t, cdf_t=cdf_t, guide_t=guide_t, gm1_t=gm1_t,
            redges_t=mk_edge(r_edges), zedges_t=mk_edge(z_edges),
            scal=scal,
        ),
        dims,
    )


def _flight_kernel_v2(
    # scalar prefetch
    seed_ref,                  # (n_tiles,) int32
    *refs,
    dims: KernelDims, nz: int, nr: int, pair_switch: bool,
    inline_scatter: bool, weight_floor: float, max_iters: int,
    max_tries: int, interpret: bool = False, win_z: int = 0,
):
    """``win_z == 0``: tables are full shared VMEM blocks (refs =
    in..., out..., ed_scr, pr_scr). ``win_z > 0`` (windowed mode):
    a second prefetch array carries the per-tile window block index;
    each table arrives as TWO win_z-zone blocks (base, base+1) that
    are copied into one contiguous scratch, and all zone addressing
    inside the loop becomes window-local. Out-of-window lanes freeze
    with FLAG_WINDOW. The per-zone tally is a per-tile window block
    recombined by the caller."""
    if win_z:
        (base_ref,
         e_ref, w_ref, w0_ref, r_ref, z_ref, mu_ref, cphi_ref,
         sphi_ref, dcen_ref, jz_ref, kr_ref, alive_ref,
         opac_a, opac_b, cdf_a, cdf_b, guide_a, guide_b,
         gm1_ref, redges_ref, zedges_ref, scal_ref,
         e_o, w_o, r_o, z_o, mu_o, cphi_o, sphi_o, dcen_o,
         jz_o, kr_o, alive_o, mode_o, flag_o, jn_o, kn_o,
         it_o, ekill_o, esct_o, epair_o, cnt_o,
         tally_o, iglog_o, delog_o,
         opac_w, cdf_w, guide_w, ed_scr, pr_scr) = refs
    else:
        (e_ref, w_ref, w0_ref, r_ref, z_ref, mu_ref, cphi_ref,
         sphi_ref, dcen_ref, jz_ref, kr_ref, alive_ref,
         opac_ref, cdf_ref, guide_ref, gm1_ref, redges_ref,
         zedges_ref, scal_ref,
         e_o, w_o, r_o, z_o, mu_o, cphi_o, sphi_o, dcen_o,
         jz_o, kr_o, alive_o, mode_o, flag_o, jn_o, kn_o,
         it_o, ekill_o, esct_o, epair_o, cnt_o,
         tally_o, iglog_o, delog_o,
         ed_scr, pr_scr) = refs
    my_seed = seed_ref[pl.program_id(0)]
    if not interpret:
        pltpu.prng_seed(my_seed)
    f32 = jnp.float32
    i32 = jnp.int32
    nzr8 = ed_scr.shape[0]

    if win_z:
        # contiguous 2*win_z-zone window: sweeps/lookups then use
        # window-local zone ids against these scratches (VMEM->VMEM
        # copies, ~us per tile)
        half_o = opac_a.shape[0]
        opac_w[pl.ds(0, half_o), :] = opac_a[...]
        opac_w[pl.ds(half_o, half_o), :] = opac_b[...]
        half_c = cdf_a.shape[0]
        cdf_w[pl.ds(0, half_c), :] = cdf_a[...]
        cdf_w[pl.ds(half_c, half_c), :] = cdf_b[...]
        half_g = guide_a.shape[0]
        guide_w[pl.ds(0, half_g), :] = guide_a[...]
        guide_w[pl.ds(half_g, half_g), :] = guide_b[...]
        opac_ref, cdf_ref, guide_ref = opac_w, cdf_w, guide_w
        win0_z = base_ref[pl.program_id(0)] * win_z
        nzr_dom = 2 * win_z
    else:
        win0_z = None
        nzr_dom = dims.nzr

    ed_scr[...] = jnp.zeros((nzr8, LANE), f32)
    pr_scr[...] = jnp.zeros((nzr8, LANE), f32)
    for k in range(K_LOG):
        iglog_o[0, k] = jnp.full((SUB, LANE), -1, i32)
        delog_o[0, k] = jnp.zeros((SUB, LANE), f32)

    e_ph_log0 = scal_ref[0, 0]
    e_ph_dlog = scal_ref[0, 1]
    e_gg_log0 = scal_ref[0, 2]
    e_gg_dlog = scal_ref[0, 3]
    e_gg0 = scal_ref[0, 4]

    def rnd(it, draw):
        return _u01(
            (SUB, LANE), interpret=interpret, seed=my_seed, it=it,
            draw=draw,
        )

    def body(carry):
        (it, e, w, r, z, mu, cphi, sphi, dcen, jz, kr, alive, flag,
         jn, kn, mode, scan_idx, scan_hi, scan_cnt, u_e, tries,
         gma, omg, znue, igam, sct_cnt, ekill, esct, epair) = carry

        w0 = w0_ref[0]
        live = (alive == 1) & (flag == FLAG_NONE)
        fly = live & (mode == MODE_FLY) & (dcen > 0.0)
        zid = jz * nr + kr
        if win_z:
            # window-local zone id; lanes that walked out of the
            # tile's 2*win_z window freeze and retry next round
            lz = zid - win0_z
            oow = fly & ((lz < 0) | (lz >= 2 * win_z))
            flag = jnp.where(oow, FLAG_WINDOW, flag)
            live = live & ~oow
            fly = fly & ~oow
            zid = jnp.clip(lz, 0, 2 * win_z - 1)
        in_a = live & (mode == MODE_SCT_A)
        in_b = live & (mode == MODE_SCT_B)
        any_live = fly | in_a | in_b

        # active-zone chunk bounds for the table sweeps
        z_min = jnp.min(jnp.where(any_live, zid, nzr_dom - 1))
        z_max = jnp.max(jnp.where(any_live, zid, 0))
        z_max = jnp.maximum(z_max, z_min)

        # ---- per-lane energy bins (E constant between scatters) -----
        x_ph = (jnp.log(jnp.maximum(e, 1e-30)) - e_ph_log0) / e_ph_dlog
        x_ph = jnp.clip(x_ph, 0.0, f32(dims.n_vol - 1.000001))
        i_ph = jnp.floor(x_ph).astype(i32)
        f_ph = x_ph - i_ph.astype(f32)

        # ---- opacity lookups (one sweep over this tile's zones) -----
        base_o = zid * dims.rpz
        pairs = [
            (base_o + (i_ph >> 7), i_ph & 127),
            (base_o + ((i_ph + 1) >> 7), (i_ph + 1) & 127),
            (base_o + dims.cg_ph + (i_ph >> 7), i_ph & 127),
            (base_o + dims.cg_ph + ((i_ph + 1) >> 7), (i_ph + 1) & 127),
        ]
        if pair_switch:
            x_gg = (
                jnp.log(jnp.maximum(e, 1e-30)) - e_gg_log0
            ) / e_gg_dlog
            x_gg = jnp.clip(x_gg, 0.0, f32(dims.n_gg - 1.000001))
            i_gg = jnp.floor(x_gg).astype(i32)
            f_gg = x_gg - i_gg.astype(f32)
            pairs += [
                (base_o + 2 * dims.cg_ph + (i_gg >> 7), i_gg & 127),
                (
                    base_o + 2 * dims.cg_ph + ((i_gg + 1) >> 7),
                    (i_gg + 1) & 127,
                ),
            ]
        g_lo = (z_min * dims.rpz) // 8
        g_hi = (z_max * dims.rpz + dims.rpz + 7) // 8
        vals = _sweep(opac_ref, pairs, g_lo, g_hi)
        sig = jnp.maximum(
            vals[0] * (1.0 - f_ph) + vals[1] * f_ph, 1e-30
        )
        kap = vals[2] * (1.0 - f_ph) + vals[3] * f_ph
        if pair_switch:
            kgg = vals[4] * (1.0 - f_gg) + vals[5] * f_gg
            # below-grid extrapolation (tracking.py kgg scale-down)
            kgg = jnp.where(e > e_gg0, kgg, kgg * e / e_gg0)
        else:
            kgg = jnp.zeros((SUB, LANE), f32)

        # ---- FLIGHT: tau draw + geometry + event select -------------
        u_tau = 1e-12 + rnd(it, 0) * (1.0 - 1e-12)
        dcol = -jnp.log(u_tau) / sig

        kr_c = jnp.clip(kr, 0, nr - 1)
        jz_c = jnp.clip(jz, 0, nz - 1)
        r_in = _gather_lane(redges_ref[...], kr_c)
        r_out = _gather_lane(redges_ref[...], kr_c + 1)
        z_bot = _gather_lane(zedges_ref[...], jz_c)
        z_top = _gather_lane(zedges_ref[...], jz_c + 1)

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
        g_knew = jnp.where(hits_zplane, kr, kr + inout.astype(i32))
        g_rbnd = jnp.where(hits_zplane, r_z, rbnd_shell)
        g_zbnd = jnp.where(hits_zplane, zbnd_z, z_r)

        trld = jnp.minimum(dcen, dcol)
        ikind = jnp.where(dcen <= dcol, 2, 3)
        hit_bnd = trldb < trld
        trld = jnp.where(hit_bnd, trldb, trld)
        ikind = jnp.where(hit_bnd, 1, ikind)

        # ---- continuous absorption (imctrk2d.f:382-462) -------------
        sigabs = jnp.maximum(kap + kgg, 1e-30)
        xabs = sigabs * trld
        ewnew = jnp.where(xabs < 100.0, w * jnp.exp(-xabs), 0.0)
        deleabs = jnp.maximum(w - ewnew, 0.0)
        if pair_switch:
            frac_heat = jnp.where(e > 47.0, kap / sigabs, 1.0)
        else:
            frac_heat = jnp.ones((SUB, LANE), f32)
        edep_add = jnp.where(fly, deleabs * frac_heat, 0.0)
        epair = epair + jnp.where(
            fly, deleabs * (1.0 - frac_heat), 0.0
        )
        u_s = 1e-7 + rnd(it, 1) * (1.0 - 1e-7)
        tiny_abs = xabs <= 1e-5
        # expm1/log1p have no Mosaic lowering; tiny_abs covers the
        # cancellation region
        frac = jnp.clip((1.0 - jnp.exp(-xabs)) * u_s, 0.0, 0.999999)
        sstar = jnp.where(
            tiny_abs, 0.5 * trld,
            -jnp.log(jnp.maximum(1.0 - frac, 1e-7)) / sigabs,
        )
        denom = jnp.sqrt(
            jnp.maximum(
                r * r + 2.0 * mu * r * sstar + sstar * sstar, 1e-20
            )
        )
        wmustar = jnp.where(tiny_abs, mu, (mu * r + sstar) / denom)
        prdep_add = jnp.where(
            fly, deleabs * wmustar * f32(cn.C_LIGHT), 0.0
        )

        killed = fly & (ewnew <= f32(weight_floor) * w0)
        ekill = ekill + jnp.where(killed, ewnew, 0.0)

        # ---- move ---------------------------------------------------
        on_bnd = fly & (ikind == 1)
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

        upd = fly & ~killed
        w = jnp.where(fly, jnp.where(killed, 0.0, ewnew), w)
        r = jnp.where(upd, rnew, r)
        z = jnp.where(upd, znew, z)
        cphi = jnp.where(upd, cphi_n, cphi)
        sphi = jnp.where(upd, sphi_n, sphi)
        dcen = jnp.where(upd, dcen - trld, dcen)
        alive = jnp.where(killed, 0, alive)

        # ---- flight events ------------------------------------------
        cross = upd & (ikind == 1)
        in_dom = (
            (g_jnew >= 0) & (g_jnew < nz)
            & (g_knew >= 0) & (g_knew < nr)
        )
        jz = jnp.where(cross & in_dom, g_jnew, jz)
        kr = jnp.where(cross & in_dom, g_knew, kr)
        leak = cross & ~in_dom
        flag = jnp.where(leak, FLAG_LEAK, flag)
        jn = jnp.where(leak, g_jnew, jn)
        kn = jnp.where(leak, g_knew, kn)
        collide = upd & (ikind == 3)
        if inline_scatter:
            # enter the scatter machine (fresh draw next iteration)
            mode = jnp.where(collide, MODE_SCT_A, mode)
            scan_idx = jnp.where(collide, -1, scan_idx)
            tries = jnp.where(collide, 0, tries)
        else:
            flag = jnp.where(collide, FLAG_SCATTER, flag)

        d_e = jnp.zeros((SUB, LANE), f32)
        if inline_scatter:
            # ---- SCT_A: electron draw + angle + KN acceptance -------
            # (compb_2d.f:36-93 / scatter._sample_electron_and_angle)
            fresh = in_a & (scan_idx < 0)
            u_draw = 1e-7 + rnd(it, 2) * (1.0 - 2e-7)
            u_e = jnp.where(fresh, u_draw, u_e)
            cell = _guide_cell(u_e)
            base_g = zid * dims.cg_gd
            gpairs = [
                (base_g + (cell >> 7), cell & 127),
                (base_g + ((cell + 1) >> 7), (cell + 1) & 127),
            ]
            gg_lo = (z_min * dims.cg_gd) // 8
            gg_hi = (z_max * dims.cg_gd + dims.cg_gd + 7) // 8
            glo_v, ghi_v = _sweep(
                guide_ref, gpairs, gg_lo, gg_hi,
                init=[jnp.zeros((SUB, LANE), i32)] * 2,
            )
            lo_cnt = glo_v
            hi_cnt = jnp.where(
                cell >= GUIDE_G - 1, dims.num_nt, ghi_v
            )
            scan_idx = jnp.where(fresh, lo_cnt, scan_idx)
            scan_cnt = jnp.where(fresh, lo_cnt, scan_cnt)
            scan_hi = jnp.where(fresh, hi_cnt, scan_hi)

            # count up to SCAN_S CDF bins this iteration (the exact
            # bracketed version of the XLA full count)
            base_c = zid * dims.cg_nt
            cpairs = []
            for s in range(SCAN_S):
                m = jnp.clip(
                    scan_idx + s, 0, dims.cg_nt * LANE - 1
                )
                cpairs.append((base_c + (m >> 7), m & 127))
            cc_lo = (z_min * dims.cg_nt) // 8
            cc_hi = (z_max * dims.cg_nt + dims.cg_nt + 7) // 8
            cvals = _sweep(cdf_ref, cpairs, cc_lo, cc_hi)
            for s in range(SCAN_S):
                mvalid = in_a & (scan_idx + s < scan_hi)
                scan_cnt = scan_cnt + jnp.where(
                    mvalid & (cvals[s] < u_e), 1, 0
                )
            scan_idx = jnp.where(in_a, scan_idx + SCAN_S, scan_idx)
            resolved = in_a & (scan_idx >= scan_hi)

            idx = jnp.clip(scan_cnt, 1, dims.num_nt - 1)
            mid = idx - 1
            gm1 = jnp.zeros((SUB, LANE), f32)
            for c in range(dims.cg_nt):
                gm1 = jnp.where(
                    (mid >> 7) == c,
                    _gather_lane(
                        jnp.broadcast_to(
                            gm1_ref[c : c + 1, :], (SUB, LANE)
                        ),
                        mid & 127,
                    ),
                    gm1,
                )
            gma_new = gm1 + 1.0
            beta_new = jnp.sqrt(
                jnp.maximum(1.0 - 1.0 / (gma_new * gma_new), 0.0)
            )

            # angle + relativistic flux factor (compb_2d.f:58-68)
            om = 2.0 * rnd(it, 3) - 1.0
            om = jnp.clip(om, -_CLAMP_S, _CLAMP_S)
            tl_u = rnd(it, 4)
            om = jnp.clip(
                jnp.where(tl_u > 0.5 * (1.0 - beta_new * om), -om, om),
                -_CLAMP_S, _CLAMP_S,
            )
            znu = e / f32(cn.EMASS_KEV)
            zn = (1.0 - beta_new * om) * znu * gma_new
            # KN total-sigma ratio (compb_2d.f:77-87); series to
            # z = 0.15 — the closed form cancels to O(z^3) and
            # amplifies the (approximate) hardware log error by
            # ~1/z^2 (see scatter._kn_ratio_f32)
            zs_ = jnp.maximum(zn, 1e-6)
            ser = 1.0 - zn * (2.0 - zn * (5.2 - zn * (13.3 - zn * (
                32.685714 - zn * (77.714286 - zn * 124.825397)
            ))))
            z3 = zs_ * zs_ * zs_
            betz_ = 1.0 + 2.0 * zs_
            gamz = zs_ * (zs_ - 2.0) - 2.0
            full = 0.375 * (
                4.0 * zs_ + 2.0 * z3 * (1.0 + zs_) / (betz_ * betz_)
                + gamz * jnp.log(betz_)
            ) / z3
            xknot = jnp.where(zn <= 0.15, ser, full)
            u_acc = rnd(it, 5)
            ok = (zn >= 1e-10) & (u_acc <= xknot)
            tries = jnp.where(resolved, tries + 1, tries)
            # Estimator choice at rejection-loop exhaustion: the LAST
            # CANDIDATE is force-accepted (the XLA sampler instead
            # falls back to a cold at-rest electron, scatter.py
            # _sample_electron_and_angle init). Exhaustion probability
            # is (1 - <p_accept>)^max_tries; <p_accept> is O(0.1-0.5)
            # for the flux-factor x KN joint on realistic populations,
            # so at the production max_scatter_tries = 64 the event is
            # ~1e-3 or rarer and the bias is below MC noise — measured
            # by tests/test_scatter.py::
            # test_forced_acceptance_bias_below_mc_noise, which
            # compares accepted-electron moments at max_tries=64 vs an
            # effectively unbounded loop.
            accept = resolved & (ok | (tries >= max_tries))
            reject = resolved & ~accept

            gma = jnp.where(accept, gma_new, gma)
            omg = jnp.where(accept, om, omg)
            znue = jnp.where(accept, jnp.maximum(zn, 1e-10), znue)
            igam = jnp.where(accept, idx, igam)
            mode = jnp.where(accept, MODE_SCT_B, mode)
            scan_idx = jnp.where(reject, -1, scan_idx)  # redraw

            # ---- SCT_B: sz rejection + finish (compb_2d.f:96-239) ---
            betz_b = 1.0 + 2.0 * znue
            phat = betz_b + 1.0 / betz_b
            u1 = rnd(it, 6)
            sz = (1.0 + 2.0 * znue * u1) / betz_b
            games_t = (
                1.0 + (1.0 - 1.0 / jnp.maximum(sz, 1e-7)) / znue
            )
            ok_g = games_t * games_t <= 1.0
            tr_b = games_t * games_t - 1.0 + sz + 1.0 / sz
            u2 = rnd(it, 7)
            finish = in_b & ok_g & (u2 * phat <= tr_b)

            beta_f = jnp.sqrt(
                jnp.maximum(1.0 - 1.0 / (gma * gma), 0.0)
            )
            znues = znue * sz
            a1 = jnp.float32(np.pi) * (2.0 * rnd(it, 8) - 1.0)
            cazes = jnp.cos(a1)
            omege = jnp.clip(
                (omg - beta_f) / (1.0 - beta_f * omg),
                -_CLAMP_S, _CLAMP_S,
            )
            games = jnp.clip(games_t, -_CLAMP_S, _CLAMP_S)
            omeges = games * omege + cazes * jnp.sqrt(
                jnp.maximum(
                    (1.0 - omege * omege) * (1.0 - games * games), 0.0
                )
            )
            omeges = jnp.clip(omeges, -_CLAMP_S, _CLAMP_S)
            znu_b = e / f32(cn.EMASS_KEV)
            znus = (1.0 + beta_f * omeges) * gma * znues
            gams = 1.0 - (znue - znues) / jnp.maximum(
                znu_b * znus, 1e-30
            )
            gams = jnp.clip(gams, -_CLAMP_S, _CLAMP_S)
            a2 = jnp.float32(np.pi) * (2.0 * rnd(it, 9) - 1.0)
            cazs = jnp.clip(jnp.cos(a2), -_CLAMP_S, _CLAMP_S)
            mu_b = jnp.clip(mu, -_CLAMP_S, _CLAMP_S)
            wmus = mu_b * gams + cazs * jnp.sqrt(
                jnp.maximum(
                    (1.0 - gams * gams) * (1.0 - mu_b * mu_b), 0.0
                )
            )
            wmus = jnp.clip(wmus, -_CLAMP_S, _CLAMP_S)
            cosd = (gams - mu_b * wmus) / jnp.sqrt(
                jnp.maximum(
                    (1.0 - mu_b * mu_b) * (1.0 - wmus * wmus), 1e-20
                )
            )
            cosd = jnp.clip(cosd, -_CLAMP_S, _CLAMP_S)
            sind = jnp.sqrt(jnp.maximum(1.0 - cosd * cosd, 0.0))
            sgn = jnp.where(rnd(it, 10) < 0.5, 1.0, -1.0)
            sind = sgn * sind
            cphi_s = cphi * cosd - sphi * sind
            sphi_s = sphi * cosd + cphi * sind
            nrm_s = jnp.sqrt(
                jnp.maximum(cphi_s**2 + sphi_s**2, 1e-12)
            )
            e_new = znus * f32(cn.EMASS_KEV)
            wscale = znus / jnp.maximum(znu_b, 1e-30)
            w_new = w * wscale
            d_e = jnp.where(finish, w_new - w, 0.0)

            e = jnp.where(finish, e_new, e)
            w = jnp.where(finish, w_new, w)
            mu = jnp.where(finish, wmus, mu)
            cphi = jnp.where(finish, cphi_s / nrm_s, cphi)
            sphi = jnp.where(finish, sphi_s / nrm_s, sphi)
            mode = jnp.where(finish, MODE_FLY, mode)
            esct = esct + d_e

            # event log (e_ic / n_esp attribution)
            for k in range(K_LOG):
                hit = finish & (sct_cnt == k)
                iglog_o[0, k] = jnp.where(hit, igam, iglog_o[0, k])
                delog_o[0, k] = jnp.where(hit, d_e, delog_o[0, k])
            sct_cnt = jnp.where(finish, sct_cnt + 1, sct_cnt)

        # ---- per-zone tally accumulation: chunk sweep over the
        # tile's zone spread, masked sublane reductions (no Mosaic
        # scatter exists) ---------------------------------------------
        ed_c = edep_add + d_e
        pr_c = prdep_add
        t_lo = z_min // 8
        t_hi = z_max // 8 + 1

        def tbody(gch, _):
            basez = gch * 8
            rows_e = []
            rows_p = []
            for j in range(8):
                mz = zid == basez + j
                rows_e.append(jnp.sum(
                    jnp.where(mz, ed_c, 0.0), axis=0, keepdims=True
                ))
                rows_p.append(jnp.sum(
                    jnp.where(mz, pr_c, 0.0), axis=0, keepdims=True
                ))
            ed_scr[pl.ds(basez, 8), :] = (
                ed_scr[pl.ds(basez, 8), :]
                + jnp.concatenate(rows_e, axis=0)
            )
            pr_scr[pl.ds(basez, 8), :] = (
                pr_scr[pl.ds(basez, 8), :]
                + jnp.concatenate(rows_p, axis=0)
            )
            return 0

        jax.lax.fori_loop(t_lo, t_hi, tbody, 0)

        return (it + 1, e, w, r, z, mu, cphi, sphi, dcen, jz, kr,
                alive, flag, jn, kn, mode, scan_idx, scan_hi,
                scan_cnt, u_e, tries, gma, omg, znue, igam, sct_cnt,
                ekill, esct, epair)

    def cond(carry):
        it = carry[0]
        dcen, jz, kr, alive, flag = carry[8:13]
        mode = carry[15]
        live = (alive == 1) & (flag == FLAG_NONE)
        act = live & ((dcen > 0.0) | (mode != MODE_FLY))
        return (it < max_iters) & jnp.any(act)

    f32 = jnp.float32
    zf = jnp.zeros((SUB, LANE), f32)
    zi = jnp.zeros((SUB, LANE), jnp.int32)
    init = (
        jnp.int32(0), e_ref[0], w_ref[0], r_ref[0], z_ref[0],
        mu_ref[0], cphi_ref[0], sphi_ref[0], dcen_ref[0], jz_ref[0],
        kr_ref[0], alive_ref[0],
        zi,                       # flag
        jz_ref[0], kr_ref[0],     # jn, kn
        zi,                       # mode (always FLY at entry)
        jnp.full((SUB, LANE), -1, jnp.int32),  # scan_idx
        zi, zi,                   # scan_hi, scan_cnt
        zf,                       # u_e
        zi,                       # tries
        jnp.ones((SUB, LANE), f32),            # gma
        zf,                       # omg
        jnp.full((SUB, LANE), 1e-3, f32),      # znue
        zi,                       # igam
        zi,                       # sct_cnt
        zf, zf, zf,               # ekill, esct, epair
    )
    (it_f, e, w, r, z, mu, cphi, sphi, dcen, jz, kr, alive, flag, jn,
     kn, mode, _, _, _, _, _, _, _, _, _, sct_cnt, ekill, esct,
     epair) = jax.lax.while_loop(cond, body, init)

    e_o[0] = e
    w_o[0] = w
    r_o[0] = r
    z_o[0] = z
    mu_o[0] = mu
    cphi_o[0] = cphi
    sphi_o[0] = sphi
    dcen_o[0] = dcen
    jz_o[0] = jz
    kr_o[0] = kr
    alive_o[0] = alive
    mode_o[0] = mode
    flag_o[0] = flag
    jn_o[0] = jn
    kn_o[0] = kn
    it_o[0] = jnp.broadcast_to(
        it_f.reshape(1, 1), (SUB, LANE)
    ).astype(jnp.int32)
    ekill_o[0] = ekill
    esct_o[0] = esct
    epair_o[0] = epair
    cnt_o[0] = sct_cnt

    if win_z:
        # per-tile window tally block (recombined by the caller with
        # the per-tile bases)
        tally_o[0, 0] = ed_scr[...]
        tally_o[0, 1] = pr_scr[...]
    else:
        # shared per-zone tally block: zero on the first tile,
        # accumulate on every tile (revisited-output accumulation)
        @pl.when(pl.program_id(0) == 0)
        def _():
            tally_o[0] = jnp.zeros((nzr8, LANE), f32)
            tally_o[1] = jnp.zeros((nzr8, LANE), f32)

        tally_o[0] = tally_o[0] + ed_scr[...]
        tally_o[1] = tally_o[1] + pr_scr[...]


@functools.partial(
    jax.jit,
    static_argnames=(
        "nz", "nr", "pair_switch", "inline_scatter", "weight_floor",
        "max_iters", "max_tries", "interpret", "dims", "win_z",
    ),
)
def flight_step_v2(
    e, w, w0, r, z, mu, cphi, sphi, dcen, jz, kr, alive,
    tables: KernelTables, seeds,
    *,
    dims: KernelDims, nz: int, nr: int, pair_switch: bool,
    inline_scatter: bool, weight_floor: float, max_iters: int,
    max_tries: int, interpret: bool = False, win_z: int = 0,
):
    """One kernel entry over all photon tiles. Returns
    (soa..., mode, flag, jn, kn, it_used, ekill, esct, epair,
    sct_cnt, tally(2, nzr), iglog(n, K), delog(n, K)).

    ``win_z > 0``: windowed-table mode for grids beyond MAX_ZONES —
    tables must have been built with ``build_kernel_tables(...,
    win_z=win_z)`` (zone axis padded to blocks); each tile sees the
    two win_z-zone blocks around its min active zone (prefetch-indexed
    BlockSpecs, pipelined by Pallas), lanes leaving the window freeze
    with FLAG_WINDOW for the next outer round."""
    n = e.shape[0]
    assert n % TILE == 0, f"n_slots={n} must be a multiple of {TILE}"
    n_tiles = n // TILE
    nzr = nz * nr
    if win_z:
        assert nz <= MAX_EDGE and nr <= MAX_EDGE
        assert win_z % 8 == 0
    else:
        assert nzr <= MAX_ZONES and nz <= MAX_EDGE and nr <= MAX_EDGE
    nzr8 = _cdiv(dims.nzr, 8) * 8

    def tile(a, dt):
        return a.astype(dt).reshape(n_tiles, SUB, LANE)

    f_in = [
        tile(a, jnp.float32)
        for a in (e, w, w0, r, z, mu, cphi, sphi, dcen)
    ]
    i_in = [tile(a, jnp.int32) for a in (jz, kr, alive)]

    vspec = pl.BlockSpec(
        (1, SUB, LANE), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
    )

    def shared(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape, (lambda i, *_: (0,) * nd), memory_space=pltpu.VMEM
        )

    smem = pl.BlockSpec(
        (1, 8), lambda i, *_: (0, 0), memory_space=pltpu.SMEM
    )
    logspec = pl.BlockSpec(
        (1, K_LOG, SUB, LANE), lambda i, *_: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )

    kern = functools.partial(
        _flight_kernel_v2,
        dims=dims, nz=nz, nr=nr, pair_switch=pair_switch,
        inline_scatter=inline_scatter, weight_floor=weight_floor,
        max_iters=max_iters, max_tries=max_tries, interpret=interpret,
        win_z=win_z,
    )

    soa_out_shape = (
        [jax.ShapeDtypeStruct((n_tiles, SUB, LANE), jnp.float32)] * 8
        + [jax.ShapeDtypeStruct((n_tiles, SUB, LANE), jnp.int32)] * 7
        + [jax.ShapeDtypeStruct((n_tiles, SUB, LANE), jnp.int32)]   # it
        + [jax.ShapeDtypeStruct((n_tiles, SUB, LANE), jnp.float32)] * 3
        + [jax.ShapeDtypeStruct((n_tiles, SUB, LANE), jnp.int32)]   # cnt
    )
    log_shape = [
        jax.ShapeDtypeStruct((n_tiles, K_LOG, SUB, LANE), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, K_LOG, SUB, LANE), jnp.float32),
    ]

    if win_z:
        tw = 2 * win_z
        # per-tile base block index: min active zone of the tile
        zid_all = (
            jnp.clip(jz, 0, nz - 1) * nr + jnp.clip(kr, 0, nr - 1)
        ).reshape(n_tiles, TILE)
        act = (alive & (dcen > 0.0)).reshape(n_tiles, TILE)
        zmin_t = jnp.min(
            jnp.where(act, zid_all, nzr - 1), axis=1
        )
        n_blocks = tables.opac_t.shape[0] // (win_z * dims.rpz)
        base_blk = jnp.clip(zmin_t // win_z, 0, n_blocks - 2).astype(
            jnp.int32
        )

        def winspec(rows_per_zone, off):
            return pl.BlockSpec(
                (win_z * rows_per_zone, LANE),
                lambda i, seed_ref, base_ref, _o=off: (
                    base_ref[i] + _o, 0
                ),
                memory_space=pltpu.VMEM,
            )

        in_specs = (
            [vspec] * 12
            + [
                winspec(dims.rpz, 0), winspec(dims.rpz, 1),
                winspec(dims.cg_nt, 0), winspec(dims.cg_nt, 1),
                winspec(dims.cg_gd, 0), winspec(dims.cg_gd, 1),
                shared(tables.gm1_t.shape),
                shared((SUB, LANE)),
                shared((SUB, LANE)),
                smem,
            ]
        )
        tallyspec = pl.BlockSpec(
            (1, 2, tw, LANE), lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = tuple(
            soa_out_shape
            + [jax.ShapeDtypeStruct((n_tiles, 2, tw, LANE), jnp.float32)]
            + log_shape
        )
        out_specs = tuple(
            [vspec] * 20 + [tallyspec, logspec, logspec]
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((tw * dims.rpz, LANE), jnp.float32),
                pltpu.VMEM((tw * dims.cg_nt, LANE), jnp.float32),
                pltpu.VMEM((tw * dims.cg_gd, LANE), jnp.int32),
                pltpu.VMEM((tw, LANE), jnp.float32),
                pltpu.VMEM((tw, LANE), jnp.float32),
            ],
        )
        outs = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(
            seeds, base_blk, *f_in, *i_in,
            tables.opac_t, tables.opac_t,
            tables.cdf_t, tables.cdf_t,
            tables.guide_t, tables.guide_t,
            tables.gm1_t, tables.redges_t, tables.zedges_t,
            tables.scal,
        )
    else:
        tallyspec = pl.BlockSpec(
            (2, nzr8, LANE), lambda i, *_: (0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = tuple(
            soa_out_shape
            + [jax.ShapeDtypeStruct((2, nzr8, LANE), jnp.float32)]
            + log_shape
        )
        out_specs = tuple(
            [vspec] * 20 + [tallyspec, logspec, logspec]
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=(
                [vspec] * 12
                + [
                    shared(tables.opac_t.shape),
                    shared(tables.cdf_t.shape),
                    shared(tables.guide_t.shape),
                    shared(tables.gm1_t.shape),
                    shared((SUB, LANE)),
                    shared((SUB, LANE)),
                    smem,
                ]
            ),
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((nzr8, LANE), jnp.float32),
                pltpu.VMEM((nzr8, LANE), jnp.float32),
            ],
        )
        outs = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(
            seeds, *f_in, *i_in,
            tables.opac_t, tables.cdf_t, tables.guide_t, tables.gm1_t,
            tables.redges_t, tables.zedges_t, tables.scal,
        )
    (e_n, w_n, r_n, z_n, mu_n, cphi_n, sphi_n, dcen_n,
     jz_n, kr_n, alive_n, mode_n, flag, jn, kn, it_used,
     ekill, esct, epair, cnt, tally, iglog, delog) = outs
    flat = lambda a: a.reshape(n)
    if win_z:
        # recombine per-tile window tallies by their bases
        tw = 2 * win_z
        tally_z = jnp.sum(tally, axis=-1)       # (n_tiles, 2, tw)
        # dims.nzr is the window-padded zone count (build_kernel_tables
        # win_z padding), so every loc below is in range
        nz_tot = dims.nzr
        loc = (
            base_blk[:, None] * win_z
            + jnp.arange(tw, dtype=jnp.int32)[None, :]
        )                                        # (n_tiles, tw)
        tall = jnp.zeros((2, nz_tot), jnp.float32)
        for ch in range(2):
            tall = tall.at[ch, loc.reshape(-1)].add(
                tally_z[:, ch, :].reshape(-1), mode="drop"
            )
        tall = tall[:, :nzr]
    else:
        # tally: sum lanes of the shared (2, nzr8, 128) block
        tall = jnp.sum(tally, axis=-1)[:, :nzr]
    return (
        flat(e_n), flat(w_n), flat(r_n), flat(z_n), flat(mu_n),
        flat(cphi_n), flat(sphi_n), flat(dcen_n), flat(jz_n),
        flat(kr_n), flat(alive_n) == 1, flat(mode_n), flat(flag),
        flat(jn), flat(kn),
        jnp.max(it_used), jnp.sum(ekill), jnp.sum(esct),
        jnp.sum(epair), cnt.reshape(n), tall,
        iglog.transpose(0, 2, 3, 1).reshape(n, K_LOG),
        delog.transpose(0, 2, 3, 1).reshape(n, K_LOG),
    )
