"""Round-4 pipeline attrition A/B on the TPU.

Arms (interleaved rounds, per-arm minima, null arm for the dispatch
floor), all in ONE process:

  null    — dispatch floor.
  new     — conv_properties_fused(dat): slot-write layer mix (grow=False)
            + shared 850 hPa DCI anchors + temp_500 reused from lapse.
  splice  — conv_properties_fused(dat, mix_grow=True): the r4-close
            insert_level (L+1) mix path, same shared diagnostics — so
            new-vs-splice isolates the slot-write mix.
  new15   — the new pipeline at 1.5x batch (dispatch-floor amortisation:
            the headline is measured at fixed batch; a bigger batch
            spreads the ~25-35 ms tunnel floor thinner).

Usage: python benchmarks/pipeline_attrition_ab.py   (repo root, TPU)
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
import bench  # noqa: E402
from xarray_parcel_tpu import adiabat, pipeline  # noqa: E402

B = 1 << 19
ROUNDS = 3
ITERS = 5


def main():
    bench.wait_for_backend()
    bench.log(f'backend={jax.default_backend()}')
    tables = adiabat.load_moist_adiabat_lookups(dtype=jnp.float32)
    tables = jax.tree_util.tree_map(jax.device_put, tables)
    jax.block_until_ready(tables.curves)

    dat = {k: jnp.asarray(v) for k, v in bench.synthetic(B).items()}
    dat15 = {k: jnp.asarray(v)
             for k, v in bench.synthetic(B + (B >> 1), seed=1).items()}

    arms = {
        'null': (jax.jit(lambda x: x * 2.0), (dat['surface_wind_u'],)),
        'new': (jax.jit(lambda d: pipeline.conv_properties_fused(
            d, tables=tables)), (dat,)),
        'splice': (jax.jit(lambda d: pipeline.conv_properties_fused(
            d, tables=tables, mix_grow=True)), (dat,)),
        'new15': (jax.jit(lambda d: pipeline.conv_properties_fused(
            d, tables=tables)), (dat15,)),
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
                          for k, v in list(ms.items()) if k != 'null'}
    ms['batch'] = B
    ms['cols_per_sec'] = {
        'new': round(B / best['new'], 1),
        'splice': round(B / best['splice'], 1),
        'new15': round((B + (B >> 1)) / best['new15'], 1),
    }
    print(json.dumps(ms))


if __name__ == '__main__':
    main()
