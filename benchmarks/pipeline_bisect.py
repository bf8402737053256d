"""In-situ bisection of the fused conv_properties pipeline on the TPU.

The round-5 stage breakdown (pipeline_breakdown.py) times each stage as its
OWN program on pre-staged inputs, which leaves a ~10 ms "residual" at 2^18
that the factoring cannot attribute (stage boundaries change what XLA fuses
and where intermediates live).  This benchmark instead strips the REAL
pipeline from the top, one piece at a time — every arm is the production
``conv_properties_fused`` code path with later pieces deleted — so each
difference is an in-situ marginal cost:

  full    — conv_properties_fused(dat)                     (the headline)
  nomask  — ignore_nans=True                               (valid mask cost)
  s3      — preps + all three fused solves, nothing after  (diags tail cost)
  s2      — preps + mu/m100 solves                         (marginal m50)
  s1      — preps + mu solve                               (marginal m100)
  p0      — preps only                                     (marginal mu)

Interleaved rounds, per-arm minima (the in-process A/B penalty is position-
dependent; see benchmarks/reduction_ab.py).

Usage: python benchmarks/pipeline_bisect.py   (repo root, TPU backend)
"""

import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
import bench  # noqa: E402
import ab_harness  # noqa: E402
from xarray_parcel_tpu import pipeline, thermo  # noqa: E402
from xarray_parcel_tpu.parcels import (bridge_neighbors,  # noqa: E402
                                       conserved_fields,
                                       from_most_unstable_parcel, mix_layer)
from xarray_parcel_tpu.pipeline import _fused_solve  # noqa: E402

B = 1 << 18
ROUNDS = 3
ITERS = 5


def main():
    tables, dat = ab_harness.setup(B)

    def truncated(dat, n_solves):
        """The production pipeline's exact prefix: preps + first n solves.

        A solve that is NOT run has its kernel inputs (fields + parcel)
        returned instead, so XLA cannot dead-code-eliminate the prep work
        — the real pipeline materialises those arrays as kernel operands,
        and each arm difference must isolate exactly one kernel call."""
        p = jnp.asarray(dat['pressure'])
        t = jnp.asarray(dat['temperature'])
        q = jnp.asarray(dat['specific_humidity'])
        dew = thermo.dewpoint_from_specific_humidity(p, t, q)

        def solve(fields, parcel):
            return _fused_solve(fields, parcel, tables, True, 'rows')

        out = {}

        def emit(name, fields, parcel, run):
            if run:
                res = solve(fields, parcel)
                out.update({f'{name}_cape': res['cape'],
                            f'{name}_cin': res['cin'],
                            f'{name}_li': res['lifted_index']})
            else:
                out.update({f'{name}_in_{k}': v for k, v in fields.items()})
                out.update({f'{name}_par_{k}': v for k, v in parcel.items()})

        mu_fields, mu_parcel = from_most_unstable_parcel(p, t, dew,
                                                         depth=250.0)
        emit('mu', mu_fields, mu_parcel, n_solves >= 1)
        cons = conserved_fields(p, t, dew)
        nbrs = bridge_neighbors(p, ~(jnp.isnan(p) | jnp.isnan(t) |
                                     jnp.isnan(dew)))
        m100_fields, m100_parcel = mix_layer(p, t, dew, depth=100.0,
                                             conserved=cons, neighbors=nbrs,
                                             grow=False)
        emit('m100', m100_fields, m100_parcel, n_solves >= 2)
        m50_fields, m50_parcel = mix_layer(p, t, dew, depth=50.0,
                                           conserved=cons, neighbors=nbrs,
                                           grow=False)
        emit('m50', m50_fields, m50_parcel, n_solves >= 3)
        return out

    x0 = jnp.zeros((B,), jnp.float32)
    arms = {
        'null': (jax.jit(lambda x: x * 2.0), (x0,)),
        'full': (jax.jit(lambda d: pipeline.conv_properties_fused(
            d, tables=tables)), (dat,)),
        'nomask': (jax.jit(lambda d: pipeline.conv_properties_fused(
            d, tables=tables, ignore_nans=True)), (dat,)),
        's3': (jax.jit(lambda d: truncated(d, 3)), (dat,)),
        's2': (jax.jit(lambda d: truncated(d, 2)), (dat,)),
        's1': (jax.jit(lambda d: truncated(d, 1)), (dat,)),
        'p0': (jax.jit(lambda d: truncated(d, 0)), (dat,)),
    }

    ab_harness.compile_arms(arms)

    best = ab_harness.time_arms(arms, rounds=ROUNDS, iters=ITERS)

    ms = {k: round(v * 1e3, 2) for k, v in best.items()}
    net = {k: round(v - ms['null'], 2) for k, v in ms.items() if k != 'null'}
    marginal = {
        'mask': round(ms['full'] - ms['nomask'], 2),
        'diags_tail': round(ms['nomask'] - ms['s3'], 2),
        'solve_m50': round(ms['s3'] - ms['s2'], 2),
        'solve_m100': round(ms['s2'] - ms['s1'], 2),
        'solve_mu': round(ms['s1'] - ms['p0'], 2),
        'preps': net['p0'],
    }
    print(json.dumps({**ms, 'net_of_floor': net, 'marginal': marginal,
                      'batch': B,
                      'full_cols_per_sec': round(B / best['full'], 1)}))


if __name__ == '__main__':
    main()
