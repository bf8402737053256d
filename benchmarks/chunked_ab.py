"""Chunked (lax.map) mega-batch A/B on the TPU.

The headline pipeline batch is capped at 1.5x2^19: the whole-batch 2^20
compile blows XLA's memory-pressure scheduler.  ``parallel.chunked`` runs
the same program chunk-by-chunk inside ONE dispatch, so total batch can
grow (amortising the tunnel's ~25-40 ms dispatch floor) while compile
stays chunk-sized.

First attempt's lessons (kept here so they are not relearned):
- 2^21-column pipeline inputs are ~7.5 GB; keeping them AND the 786k
  dataset resident, plus chunked's pad/reshape copy, blew the 16 GB HBM
  (RESOURCE_EXHAUSTED poisoned even the whole-batch arm).  This version
  keeps totals at 2^20 (pipeline) / 2^21 (cape), makes totals divisible
  by every chunk size (no pad copy), and frees each stage's data.
- chunk=2^19 inside lax.map hit a remote-compile HTTP 500 three times
  (whole-batch 2^19 compiles fine) — retried here at the smaller totals;
  arms fail independently now, one arm cannot kill the stage.

Stage 1 (pipeline, interleaved): null floor; whole at 786k (the current
headline config); chunked 2^20 at chunks 2^18 and 2^17.
Stage 2 (cape, interleaved, after freeing stage-1 inputs): fused cape at
2^21, whole vs chunked 2^19; XLA cape chunked 2^19.

Usage: python benchmarks/chunked_ab.py    (repo root, TPU)
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
import bench  # noqa: E402
from xarray_parcel_tpu import adiabat, cape, fused, pipeline  # noqa: E402
from xarray_parcel_tpu.parallel import chunked  # noqa: E402

ROUNDS = 2
ITERS = 3


def compile_arm(name, fn, args, results):
    t0 = time.perf_counter()
    for attempt in range(3):
        try:
            bench._materialize(fn(*args))
            bench.log(f'{name}: compiled+first in '
                      f'{time.perf_counter() - t0:.1f}s')
            return True
        except Exception as e:
            bench.log(f'  {name} compile attempt {attempt + 1} failed '
                      f'({str(e)[:100]!r})')
            time.sleep(5)
    results[name] = {'error': 'compile failed'}
    return False


def run_stage(arms, batches, results):
    live = {}
    for name, (fn, args) in arms.items():
        if compile_arm(name, fn, args, results):
            live[name] = (fn, args)
    best = {name: float('inf') for name in live}
    for r in range(ROUNDS):
        for name, (fn, args) in live.items():
            try:
                t0 = time.perf_counter()
                outs = [fn(*args) for _ in range(ITERS)]
                for out in outs:
                    bench._materialize(out)
                sec = (time.perf_counter() - t0) / ITERS
            except Exception as e:
                bench.log(f'round {r} {name} FAILED ({str(e)[:100]!r})')
                continue
            best[name] = min(best[name], sec)
            bench.log(f'round {r} {name}: {sec * 1e3:.1f} ms')
    for name, sec in best.items():
        if sec == float('inf'):
            results[name] = {'error': 'all timing rounds failed'}
            continue
        results[name] = {
            'ms': round(sec * 1e3, 2),
            'batch': batches.get(name),
            'cols_per_sec': (round(batches[name] / sec, 1)
                             if batches.get(name) else None),
        }


def main():
    bench.wait_for_backend()
    bench.log(f'backend={jax.default_backend()}')
    tables = adiabat.load_moist_adiabat_lookups(dtype=jnp.float32)
    tables = jax.tree_util.tree_map(jax.device_put, tables)
    jax.block_until_ready(tables.curves)

    results = {}

    # ---- stage 1: pipeline ----
    B15 = (1 << 19) + (1 << 18)   # 786k headline config
    B20 = 1 << 20                 # divisible by 2^18 and 2^17: no pad copy
    dat15 = {k: jnp.asarray(v) for k, v in bench.synthetic(B15).items()}
    dat20 = {k: jnp.asarray(v)
             for k, v in bench.synthetic(B20, seed=1).items()}

    pipe = lambda d: pipeline.conv_properties_fused(d, tables=tables)
    arms1 = {
        'null': (jax.jit(lambda x: x * 2.0), (dat15['surface_wind_u'],)),
        'pipe_whole_786k': (jax.jit(pipe), (dat15,)),
        'pipe_chunk18_1m': (jax.jit(chunked(pipe, 1 << 18)), (dat20,)),
        'pipe_chunk17_1m': (jax.jit(chunked(pipe, 1 << 17)), (dat20,)),
    }
    run_stage(arms1, {'pipe_whole_786k': B15, 'pipe_chunk18_1m': B20,
                      'pipe_chunk17_1m': B20}, results)
    del dat15, dat20, arms1

    # ---- stage 2: cape ----
    B21 = 1 << 21
    p, t, td = (jnp.asarray(v) for v in
                __import__('__graft_entry__')._synthetic_columns((B21,)))

    def sb_fused(xs):
        res, _ = fused.fused_surface_cape_cin(*xs, tables=tables)
        return res['cape'], res['cin']

    def sb_xla(xs):
        res, _ = cape.surface_based_cape_cin(*xs, tables=tables)
        return res['cape'], res['cin']

    arms2 = {
        'cape_fused_whole_2m': (jax.jit(sb_fused), ((p, t, td),)),
        'cape_fused_chunk19_2m': (jax.jit(chunked(sb_fused, 1 << 19)),
                                  ((p, t, td),)),
        'cape_xla_chunk19_2m': (jax.jit(chunked(sb_xla, 1 << 19)),
                                ((p, t, td),)),
    }
    run_stage(arms2, {k: B21 for k in arms2}, results)

    null_ms = results.get('null', {}).get('ms')
    print(json.dumps({'rounds': ROUNDS, 'iters': ITERS,
                      'dispatch_floor_ms': null_ms, 'arms': results}))


if __name__ == '__main__':
    main()
