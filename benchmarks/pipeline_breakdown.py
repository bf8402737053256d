"""Stage breakdown of the fused conv_properties pipeline on the TPU.

Times four jitted programs IN ONE PROCESS with INTERLEAVED rounds (the
in-process A/B in reduction_ab.py measured a systematic ~5 ms penalty on
whichever arm is timed second — interleaving and taking per-arm minima
removes the position bias):

  full   — conv_properties_fused(dat): the deployment path end to end.
  preps  — dewpoint conversion + most-unstable selection + conserved
           mixing fields + the two layer mixes (everything that runs in
           XLA before the first fused solve).
  solves — the three fused CAPE/CIN+LI solves on pre-built parcel args
           (each includes its own O(B) kernel pre-pass: LCL fixed point,
           curve blending, first-valid index).
  diags  — the scalar diagnostics tail (3 DCIs, lapse, T500, freezing/
           melting levels, shear) + the valid-column output masking.

full ≈ preps + solves + diags up to XLA fusion across stage boundaries;
the residual column says how much the factoring hides.  Purpose: the
performance doc's stage table measured preps "at the dispatch floor"
(unresolvable below ~5-10 ms); this pins the ~24 ms of pipeline device
time the round-3 table left unaccounted.

Usage: python benchmarks/pipeline_breakdown.py   (repo root, TPU backend)
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
import bench  # noqa: E402
from xarray_parcel_tpu import adiabat, diagnostics as diag, pipeline, thermo  # noqa: E402
from xarray_parcel_tpu.parcels import (conserved_fields,  # noqa: E402
                                       from_most_unstable_parcel, mix_layer)

B = 1 << 18
ROUNDS = 3
ITERS = 5


def main():
    bench.wait_for_backend()
    bench.log(f'backend={jax.default_backend()}')
    tables = adiabat.load_moist_adiabat_lookups(dtype=jnp.float32)
    tables = jax.tree_util.tree_map(jax.device_put, tables)
    jax.block_until_ready(tables.curves)

    dat = {k: jnp.asarray(v) for k, v in bench.synthetic(B).items()}
    p, t, q = dat['pressure'], dat['temperature'], dat['specific_humidity']

    def preps(p, t, q):
        # Mirrors the round-5 pipeline: shared bridge scans, slot-write mix.
        import jax.numpy as jnp
        from xarray_parcel_tpu.parcels import bridge_neighbors
        dew = thermo.dewpoint_from_specific_humidity(p, t, q)
        mu_fields, mu_parcel = from_most_unstable_parcel(p, t, dew,
                                                         depth=250.0)
        cons = conserved_fields(p, t, dew)
        nbrs = bridge_neighbors(p, ~(jnp.isnan(p) | jnp.isnan(t) |
                                     jnp.isnan(dew)))
        m100 = mix_layer(p, t, dew, depth=100.0, conserved=cons,
                         neighbors=nbrs, grow=False)
        m50 = mix_layer(p, t, dew, depth=50.0, conserved=cons,
                        neighbors=nbrs, grow=False)
        return dew, (mu_fields, mu_parcel), m100, m50

    def solves(parcel_args):
        from xarray_parcel_tpu import fused as _fused
        out = {}
        for name, (fields, parcel) in parcel_args.items():
            res, _ = _fused.fused_cape_cin(
                fields['pressure'], fields['temperature'],
                fields['dewpoint'], parcel_pressure=parcel['pressure'],
                parcel_temperature=parcel['temperature'],
                parcel_dewpoint=parcel['dewpoint'], tables=tables,
                with_lifted_index=True)
            out[name] = res
        return out

    def diags(p, t, dew, height, li, dat):
        valid = ~(jnp.isnan(dew).any(-1) | jnp.isnan(p).any(-1) |
                  jnp.isnan(t).any(-1))
        from xarray_parcel_tpu.ops import interp_many
        anchors = interp_many((t, dew), p, 850.0, log=True)
        lapse, _, t500 = diag.lapse_rate(p, t, height, with_isobars=True)
        out = {
            'mu_dci': diag.deep_convective_index(
                p, t, dew, li, anchors_850=anchors)['dci'],
            'm100_dci': diag.deep_convective_index(
                p, t, dew, li, anchors_850=anchors)['dci'],
            'm50_dci': diag.deep_convective_index(
                p, t, dew, li, anchors_850=anchors)['dci'],
            'lapse_rate_700_500': lapse,
            'temp_500': t500,
            'freezing_level': diag.freezing_level_height(t, height),
            'melting_level': diag.melting_level_height(p, t, dew, height,
                                                       fast=True)[0],
        }
        out.update(diag.wind_shear(
            dat['surface_wind_u'], dat['surface_wind_v'], dat['wind_u'],
            dat['wind_v'], dat['wind_height_above_surface'],
            shear_height=6000.0))
        return {k: jnp.where(valid, v, jnp.nan) for k, v in out.items()}

    # Build the solve/diag inputs ONCE on device (prep outputs), so those
    # arms time only their own stage.
    prep_jit = jax.jit(preps)
    dew, mu, m100, m50 = prep_jit(p, t, q)
    parcel_args = {'mu': mu, 'm100': m100, 'm50': m50}
    li0 = jnp.zeros((B,), jnp.float32)
    height = dat['height_asl']

    arms = {
        'null': (jax.jit(lambda x: x * 2.0), (li0,)),
        'full': (jax.jit(lambda d: pipeline.conv_properties_fused(
            d, tables=tables)), (dat,)),
        'preps': (prep_jit, (p, t, q)),
        'solves': (jax.jit(solves), (parcel_args,)),
        'diags': (jax.jit(diags), (p, t, dew, height, li0, dat)),
    }

    # Warm every arm (compile) before any timing.
    for name, (fn, args) in arms.items():
        t0 = time.perf_counter()
        for attempt in range(4):
            try:
                bench._materialize(fn(*args))
                break
            except Exception as e:
                if attempt == 3:
                    raise
                bench.log(f'  {name} compile attempt {attempt + 1} failed '
                          f'({str(e)[:80]!r}); retrying')
                time.sleep(5)
        bench.log(f'{name}: compiled+first in {time.perf_counter() - t0:.1f}s')

    best = {name: float('inf') for name in arms}
    for r in range(ROUNDS):
        for name, (fn, args) in arms.items():
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(ITERS)]
            for out in outs:
                bench._materialize(out)
            sec = (time.perf_counter() - t0) / ITERS
            best[name] = min(best[name], sec)
            bench.log(f'round {r} {name}: {sec * 1e3:.1f} ms')

    ms = {k: round(v * 1e3, 2) for k, v in best.items()}
    # Every arm is one program dispatch per iteration, so each measured
    # time includes one dispatch floor (the null arm's whole cost).
    net = {k: round(v - ms['null'], 2) for k, v in ms.items()
           if k != 'null'}
    ms['net_of_floor'] = net
    ms['residual_net'] = round(net['full'] - net['preps'] - net['solves']
                               - net['diags'], 2)
    ms['batch'] = B
    ms['full_cols_per_sec'] = round(B / best['full'], 1)
    print(json.dumps(ms))


if __name__ == '__main__':
    main()
