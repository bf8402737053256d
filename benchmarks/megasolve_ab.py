"""A/B: three fused solves vs ONE concatenated (3B, L) solve (TPU).

solve_anatomy.py measured each solve at a flat ~14.6 ms net on pre-staged
inputs, while pipeline_bisect.py shows the in-situ pipeline pays ~9 ms of
fusion-boundary overhead once Mosaic custom calls split the program.  If
part of that overhead is per-custom-call, stacking the three parcel
problems along the batch axis — one (3B, L) kernel dispatch instead of
three (B, L) ones — should claw some back.  (Round-5 measured the STACKED
pre-pass alone as slower, 11.6 vs 7.2 ms net, so the win must beat that
regression too; this A/B measures the full pipeline either way.)

Arms (interleaved rounds, per-arm minima):
  full   — conv_properties_fused(dat)          (three kernel dispatches)
  mega   — same pipeline, one concatenated solve (one kernel dispatch)

Also compares outputs per column and logs/records the worst diffs (the
kernel itself is column-independent, but the XLA pre-pass recompiles at
the (3B,) shape, so the known fp32 batch-shape wobble — up to ~1e-4 rel
— is expected rather than bit-identity; a LARGE diff would flag a real
mega-path bug).

Usage: python benchmarks/megasolve_ab.py   (repo root, TPU backend)
"""

import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
import bench  # noqa: E402
import ab_harness  # noqa: E402
from xarray_parcel_tpu import pipeline, thermo  # noqa: E402
from xarray_parcel_tpu import diagnostics as diag  # noqa: E402
from xarray_parcel_tpu import fused as _fused  # noqa: E402
from xarray_parcel_tpu.ops import interp_many  # noqa: E402
from xarray_parcel_tpu.parcels import (bridge_neighbors,  # noqa: E402
                                       conserved_fields,
                                       from_most_unstable_parcel, mix_layer)

B = 1 << 18
ROUNDS = 3
ITERS = 5


def conv_properties_mega(dat, tables):
    """conv_properties_fused with the three CAPE solves concatenated into
    one (3B, L) fused kernel call."""
    p = jnp.asarray(dat['pressure'])
    t = jnp.asarray(dat['temperature'])
    q = jnp.asarray(dat['specific_humidity'])
    dew = thermo.dewpoint_from_specific_humidity(p, t, q)
    valid = ~(jnp.isnan(dew).any(-1) | jnp.isnan(p).any(-1) |
              jnp.isnan(t).any(-1) | jnp.isnan(q).any(-1))

    mu_fields, mu_parcel = from_most_unstable_parcel(p, t, dew, depth=250.0)
    cons = conserved_fields(p, t, dew)
    nbrs = bridge_neighbors(p, ~(jnp.isnan(p) | jnp.isnan(t) |
                                 jnp.isnan(dew)))
    m100_fields, m100_parcel = mix_layer(p, t, dew, depth=100.0,
                                         conserved=cons, neighbors=nbrs,
                                         grow=False)
    m50_fields, m50_parcel = mix_layer(p, t, dew, depth=50.0, conserved=cons,
                                       neighbors=nbrs, grow=False)

    cat = lambda key, parts: jnp.concatenate([f[key] for f in parts], axis=0)
    fields3 = {k: cat(k, (mu_fields, m100_fields, m50_fields))
               for k in ('pressure', 'temperature', 'dewpoint')}
    parcel3 = {k: cat(k, (mu_parcel, m100_parcel, m50_parcel))
               for k in ('pressure', 'temperature', 'dewpoint')}

    res, _ = _fused.fused_cape_cin(
        fields3['pressure'], fields3['temperature'], fields3['dewpoint'],
        parcel_pressure=parcel3['pressure'],
        parcel_temperature=parcel3['temperature'],
        parcel_dewpoint=parcel3['dewpoint'],
        tables=tables, with_lifted_index=True)
    n = p.shape[0]
    part = lambda a, i: a[i * n:(i + 1) * n]
    mu = {k: part(v, 0) for k, v in res.items()}
    m100 = {k: part(v, 1) for k, v in res.items()}
    m50 = {k: part(v, 2) for k, v in res.items()}

    mu_mixing_ratio = thermo.mixing_ratio_from_specific_humidity(
        thermo.specific_humidity_from_dewpoint(mu_parcel['pressure'],
                                               mu_parcel['dewpoint']))
    height = jnp.asarray(dat['height_asl'])
    anchors_850 = interp_many((t, dew), p, 850.0, log=True)
    lapse, _, temp_500 = diag.lapse_rate(p, t, height, with_isobars=True)
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
        'freezing_level': diag.freezing_level_height(t, height),
        'melting_level': diag.melting_level_height(p, t, dew, height,
                                                   fast=True)[0],
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

    arms = {
        'full': (jax.jit(lambda d: pipeline.conv_properties_fused(
            d, tables=tables)), (dat,)),
        'mega': (jax.jit(lambda d: conv_properties_mega(d, tables)), (dat,)),
    }

    ab_harness.compile_arms(arms)

    # Equality check (one readback; fp32, expect bit-identical).
    a = arms['full'][0](dat)
    b = arms['mega'][0](dat)
    worst = {}
    for k in a:
        av, bv = np.asarray(a[k]), np.asarray(b[k])
        if av.dtype == bool:
            worst[k] = int((av != bv).sum())
            continue
        nan_mismatch = int((np.isnan(av) != np.isnan(bv)).sum())
        d = float(np.nanmax(np.abs(av - bv))) if np.isfinite(av).any() else 0.0
        worst[k] = [nan_mismatch, d]
    bench.log(f'equality: {worst}')

    best = ab_harness.time_arms(arms, rounds=ROUNDS, iters=ITERS)

    ms = {k: round(v * 1e3, 2) for k, v in best.items()}
    print(json.dumps({
        **ms, 'speedup': round(best['full'] / best['mega'], 4),
        'equality_worst': dict(sorted(
            worst.items(),
            key=lambda kv: (kv[1][1] if isinstance(kv[1], list) else kv[1]),
            reverse=True)[:6]),
        'batch': B}))


if __name__ == '__main__':
    main()
