"""Anatomy of one fused solve inside the pipeline (TPU).

pipeline_bisect.py showed the MU solve's in-situ marginal (~23 ms at 2^18)
is ~2x a mixed solve's (~12-15 ms) even though all three dispatch the SAME
cached Mosaic kernel binary.  This experiment separates the candidates:

  null      — dispatch floor
  mu1       — one fused solve (mu parcel) on pre-staged inputs
  m1001     — one fused solve (mixed-100 parcel) on pre-staged inputs
  pre_mu    — ONLY the XLA pre-pass of the mu solve (LCL fixed point,
              curve-index ODE, coefficient-row blend gather, k0 argmax)
  k2        — two solves (mu + m100) in one program
  k3        — three solves (mu + m100 + m50) in one program

mu1 vs m1001 isolates data/parcel dependence; pre_mu splits pre-pass from
kernel; k2-k1 and k3-k2 give the in-program marginal cost of the 2nd/3rd
kernel dispatch (a first-dispatch fixed overhead shows up as k1 marginal
>> k2/k3 marginals).

Usage: python benchmarks/solve_anatomy.py   (repo root, TPU backend)
"""

import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
import bench  # noqa: E402
import ab_harness  # noqa: E402
from xarray_parcel_tpu import adiabat, thermo  # noqa: E402
from xarray_parcel_tpu.lcl import lcl  # noqa: E402
from xarray_parcel_tpu.ops import notnan  # noqa: E402
from xarray_parcel_tpu.parcels import (bridge_neighbors,  # noqa: E402
                                       conserved_fields,
                                       from_most_unstable_parcel, mix_layer)
from xarray_parcel_tpu.pipeline import _fused_solve  # noqa: E402

B = 1 << 18
ROUNDS = 3
ITERS = 5


def main():
    tables, dat = ab_harness.setup(B)

    def preps(dat):
        p = dat['pressure']
        t = dat['temperature']
        dew = thermo.dewpoint_from_specific_humidity(
            p, t, dat['specific_humidity'])
        mu_fields, mu_parcel = from_most_unstable_parcel(p, t, dew,
                                                         depth=250.0)
        cons = conserved_fields(p, t, dew)
        nbrs = bridge_neighbors(p, ~(jnp.isnan(p) | jnp.isnan(t) |
                                     jnp.isnan(dew)))
        m100 = mix_layer(p, t, dew, depth=100.0, conserved=cons,
                         neighbors=nbrs, grow=False)
        m50 = mix_layer(p, t, dew, depth=50.0, conserved=cons,
                        neighbors=nbrs, grow=False)
        return (mu_fields, mu_parcel), m100, m50

    mu, m100, m50 = jax.jit(preps)(dat)
    jax.block_until_ready(mu[0]['pressure'])

    def solve(args):
        fields, parcel = args
        return _fused_solve(fields, parcel, tables, True, 'rows')

    def prepass(args):
        # The fused solve's XLA pre-pass only (fused_cape_cin up to the
        # kernel's scalar operands): LCL fixed point, mixing ratio,
        # curve-index backward ODE, coefficient-row blend, k0 argmax.
        fields, parcel = args
        p0 = parcel['pressure']
        t0 = parcel['temperature']
        td0 = parcel['dewpoint']
        lcls = lcl(p0, t0, td0)
        w0 = thermo.mixing_ratio(t0, td0, p0)
        fidx = adiabat.curve_index_integrate(lcls['lcl_pressure'],
                                             lcls['lcl_temperature'])
        row = adiabat.blend_coeff_rows(tables, fidx)
        k0 = jnp.argmax(notnan(fields['pressure']), axis=-1)
        return (lcls['lcl_pressure'], lcls['lcl_temperature'],
                lcls['lcl_virtual_temperature'], w0, row,
                k0.astype(jnp.float32))

    arms = {
        'null': (jax.jit(lambda x: x * 2.0), (mu[1]['pressure'],)),
        'mu1': (jax.jit(solve), (mu,)),
        'm1001': (jax.jit(solve), (m100,)),
        'pre_mu': (jax.jit(prepass), (mu,)),
        'k2': (jax.jit(lambda a, b: (solve(a), solve(b))), (mu, m100)),
        'k3': (jax.jit(lambda a, b, c: (solve(a), solve(b), solve(c))),
               (mu, m100, m50)),
    }

    ab_harness.compile_arms(arms)

    best = ab_harness.time_arms(arms, rounds=ROUNDS, iters=ITERS)

    ms = {k: round(v * 1e3, 2) for k, v in best.items()}
    net = {k: round(v - ms['null'], 2) for k, v in ms.items() if k != 'null'}
    print(json.dumps({
        **ms, 'net_of_floor': net,
        'marginal': {'k1': net['mu1'],
                     'k2': round(net['k2'] - net['mu1'], 2),
                     'k3': round(net['k3'] - net['k2'], 2)},
        'batch': B}))


if __name__ == '__main__':
    main()
