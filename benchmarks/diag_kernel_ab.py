"""A/B: the pipeline's scalar-diagnostics tail as a 4th fused kernel (TPU).

pipeline_bisect.py puts the diagnostics tail at 6.5-7.8 ms in situ at 2^18
(anchors_850, lapse/T500, freezing level, melting level; shear and the
(B,)-sized DCIs are excluded here).  This prototypes a Pallas kernel that
computes t850/td850/lapse/t500/flh/mlh for a block of columns in VMEM —
the same jnp column program the modular diagnostics run (interp_many
anchor searches, find_intersections crossings, fast wet bulb) — and
measures:

  dxla      — the diag program as plain XLA on (B, L)     (status quo)
  dkern     — the diag program as one Pallas kernel
  pipe      — conv_properties_fused(dat)                  (status quo)
  pipe_k    — the same pipeline with the tail swapped for the kernel

The megasolve lesson applies: a 4th custom call adds its own fusion
boundary, so only the in-pipeline arms decide adoption.

Usage: python benchmarks/diag_kernel_ab.py   (repo root, TPU backend)
"""

import json
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, '.')
import bench  # noqa: E402
import ab_harness  # noqa: E402
from xarray_parcel_tpu import pipeline, thermo  # noqa: E402
from xarray_parcel_tpu import diagnostics as diag  # noqa: E402
from xarray_parcel_tpu.ops import interp_many  # noqa: E402
from xarray_parcel_tpu.pipeline import _fused_solve  # noqa: E402

B = 1 << 18
L = 90
TB = 256
ROUNDS = 3
ITERS = 5


def _diag_body(p, t, td, h):
    """The tail's column program — the SAME calls the modular pipeline
    makes (diagnostics.py), on (TB, L) blocks."""
    t850, td850 = interp_many((t, td), p, 850.0, log=True)
    lapse, _, t500 = diag.lapse_rate(p, t, h, with_isobars=True)
    flh = diag.freezing_level_height(t, h)
    mlh, _ = diag.melting_level_height(p, t, td, h, fast=True)
    return t850, td850, lapse, t500, flh, mlh


def _diag_kernel(p_ref, t_ref, td_ref, h_ref, *out_refs):
    vals = _diag_body(p_ref[:], t_ref[:], td_ref[:], h_ref[:])
    for ref, val in zip(out_refs, vals):
        ref[:] = val[..., None]


def diag_fused(p, t, td, h, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    Bp = p.shape[0]
    out_shape = [jax.ShapeDtypeStruct((Bp, 1), p.dtype)] * 6
    blk = lambda w: pl.BlockSpec((TB, w), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _diag_kernel,
        grid=(Bp // TB,),
        in_specs=[blk(L)] * 4,
        out_specs=[blk(1)] * 6,
        out_shape=out_shape,
        interpret=interpret,
    )(p, t, td, h)
    return tuple(o[:, 0] for o in outs)


def pipe_kdiag(dat, tables):
    """conv_properties_fused with the diagnostics tail in the 4th kernel."""
    p = jnp.asarray(dat['pressure'])
    t = jnp.asarray(dat['temperature'])
    q = jnp.asarray(dat['specific_humidity'])
    dew = thermo.dewpoint_from_specific_humidity(p, t, q)
    valid = ~(jnp.isnan(dew).any(-1) | jnp.isnan(p).any(-1) |
              jnp.isnan(t).any(-1) | jnp.isnan(q).any(-1))

    from xarray_parcel_tpu.parcels import (bridge_neighbors,
                                           conserved_fields,
                                           from_most_unstable_parcel,
                                           mix_layer)
    mu_fields, mu_parcel = from_most_unstable_parcel(p, t, dew, depth=250.0)
    mu = _fused_solve(mu_fields, mu_parcel, tables, True, 'rows')
    cons = conserved_fields(p, t, dew)
    nbrs = bridge_neighbors(p, ~(jnp.isnan(p) | jnp.isnan(t) |
                                 jnp.isnan(dew)))
    m100_fields, m100_parcel = mix_layer(p, t, dew, depth=100.0,
                                         conserved=cons, neighbors=nbrs,
                                         grow=False)
    m100 = _fused_solve(m100_fields, m100_parcel, tables, True, 'rows')
    m50_fields, m50_parcel = mix_layer(p, t, dew, depth=50.0, conserved=cons,
                                       neighbors=nbrs, grow=False)
    m50 = _fused_solve(m50_fields, m50_parcel, tables, True, 'rows')

    mu_mixing_ratio = thermo.mixing_ratio_from_specific_humidity(
        thermo.specific_humidity_from_dewpoint(mu_parcel['pressure'],
                                               mu_parcel['dewpoint']))
    height = jnp.asarray(dat['height_asl'])
    t850, td850, lapse, temp_500, flh, mlh = diag_fused(p, t, dew, height)
    anchors_850 = (t850, td850)
    out = {
        'mu_cape': mu['cape'], 'mu_cin': mu['cin'],
        'mu_mixing_ratio': mu_mixing_ratio,
        'mixed_100_cape': m100['cape'], 'mixed_100_cin': m100['cin'],
        'mixed_50_cape': m50['cape'], 'mixed_50_cin': m50['cin'],
        'mu_lifted_index': mu['lifted_index'],
        'mixed_100_lifted_index': m100['lifted_index'],
        'mixed_50_lifted_index': m50['lifted_index'],
        'mu_dci': diag.deep_convective_index(
            p, t, dew, mu['lifted_index'], anchors_850=anchors_850)['dci'],
        'mixed_100_dci': diag.deep_convective_index(
            p, t, dew, m100['lifted_index'], anchors_850=anchors_850)['dci'],
        'mixed_50_dci': diag.deep_convective_index(
            p, t, dew, m50['lifted_index'], anchors_850=anchors_850)['dci'],
        'lapse_rate_700_500': lapse,
        'temp_500': temp_500,
        'freezing_level': flh,
        'melting_level': mlh,
    }
    out.update(diag.wind_shear(dat['surface_wind_u'], dat['surface_wind_v'],
                               dat['wind_u'], dat['wind_v'],
                               dat['wind_height_above_surface'],
                               shear_height=6000.0))
    for k, v in out.items():
        out[k] = (jnp.where(valid, v, False) if v.dtype == bool
                  else jnp.where(valid, v, jnp.nan))
    return out


def main():
    tables, dat = ab_harness.setup(B)
    p, t, q = dat['pressure'], dat['temperature'], dat['specific_humidity']
    dew0 = jax.jit(thermo.dewpoint_from_specific_humidity)(p, t, q)
    h = dat['height_asl']

    arms = {
        'dxla': (jax.jit(_diag_body), (p, t, dew0, h)),
        'dkern': (jax.jit(diag_fused), (p, t, dew0, h)),
        'pipe': (jax.jit(lambda d: pipeline.conv_properties_fused(
            d, tables=tables)), (dat,)),
        'pipe_k': (jax.jit(lambda d: pipe_kdiag(d, tables)), (dat,)),
    }

    ab_harness.compile_arms(arms)

    # Kernel-vs-XLA agreement on the tail outputs.
    ax = arms['dxla'][0](p, t, dew0, h)
    bx = arms['dkern'][0](p, t, dew0, h)
    worst = []
    for name, (va, vb) in zip(('t850', 'td850', 'lapse', 't500', 'flh',
                               'mlh'), zip(ax, bx)):
        va, vb = np.asarray(va), np.asarray(vb)
        nanm = int((np.isnan(va) != np.isnan(vb)).sum())
        d = float(np.nanmax(np.abs(va - vb))) if np.isfinite(va).any() else 0.
        worst.append((name, nanm, round(d, 8)))
    bench.log(f'tail agreement (nan-mismatch, max abs): {worst}')

    best = ab_harness.time_arms(arms, rounds=ROUNDS, iters=ITERS)

    ms = {k: round(v * 1e3, 2) for k, v in best.items()}
    print(json.dumps({
        **ms,
        'pipe_speedup': round(best['pipe'] / best['pipe_k'], 4),
        'tail_agreement': worst, 'batch': B}))


if __name__ == '__main__':
    main()
