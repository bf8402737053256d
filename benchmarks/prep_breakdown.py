"""Sub-breakdown of the fused pipeline's XLA parcel prep (~14 ms net at
2^18 per pipeline_breakdown.py — 19% of the pipeline).

Arms (interleaved rounds, per-arm minima, null-dispatch arm for the
tunnel floor):

  null — dispatch floor.
  dew  — dewpoint_from_specific_humidity on (B, L).
  mu   — from_most_unstable_parcel on precomputed dew (get_layer + theta-e
         + masked selection).
  cons — conserved_fields (theta + saturation mixing ratio).
  mix  — the two mix_layer calls on precomputed conserved fields
         (get_layer(interpolate=True) + trapz averages + splice, x2).

Usage: python benchmarks/prep_breakdown.py   (repo root, TPU backend)
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
import bench  # noqa: E402
from xarray_parcel_tpu import thermo  # noqa: E402
from xarray_parcel_tpu.parcels import (conserved_fields,  # noqa: E402
                                       from_most_unstable_parcel, mix_layer)

B = 1 << 18
ROUNDS = 3
ITERS = 5


def main():
    bench.wait_for_backend()
    bench.log(f'backend={jax.default_backend()}')
    dat = {k: jnp.asarray(v) for k, v in bench.synthetic(B).items()}
    p, t, q = dat['pressure'], dat['temperature'], dat['specific_humidity']
    dew = jax.jit(thermo.dewpoint_from_specific_humidity)(p, t, q)
    cons = jax.jit(conserved_fields)(p, t, dew)
    jax.block_until_ready(dew)

    def mixes(p, t, dew, cons):
        return (mix_layer(p, t, dew, depth=100.0, conserved=cons),
                mix_layer(p, t, dew, depth=50.0, conserved=cons))

    arms = {
        'null': (jax.jit(lambda x: x * 2.0), (p[:, 0],)),
        'dew': (jax.jit(thermo.dewpoint_from_specific_humidity), (p, t, q)),
        'mu': (jax.jit(from_most_unstable_parcel), (p, t, dew)),
        'cons': (jax.jit(conserved_fields), (p, t, dew)),
        'mix': (jax.jit(mixes), (p, t, dew, cons)),
    }

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
    ms['net_of_floor'] = {k: round(v - ms['null'], 2)
                          for k, v in ms.items() if k != 'null'}
    ms['batch'] = B
    print(json.dumps(ms))


if __name__ == '__main__':
    main()
