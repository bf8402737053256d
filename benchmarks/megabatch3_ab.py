"""Pipeline batch probe: 786k (current headline) vs 917k = 7 * 2^17.

2^20 (1048k) sends XLA's scheduler into a minutes-long memory-pressure
compile on this 16 GB chip (round-4 finding); 786k = 1.5 * 2^19 compiles
cleanly.  This probes the gap: if 917k compiles in normal time, the
headline batch can grow ~17% and thin the tunnel's ~26 ms dispatch floor
proportionally (measured rate only — net-of-floor rate is flat in batch).

Interleaved rounds, per-arm minima (the in-process A/B penalty on the
second-timed arm is ~5 ms; see benchmarks/reduction_ab.py).

Usage: python benchmarks/megabatch3_ab.py   (repo root, TPU backend)
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
import bench  # noqa: E402
from xarray_parcel_tpu import adiabat, deploy, pipeline  # noqa: E402

ROUNDS = 3
ITERS = 3
BATCHES = [(1 << 19) + (1 << 18), 7 << 17]  # 786432, 917504


def main():
    bench.wait_for_backend()
    deploy.enable_compilation_cache('benchmarks/.xla_cache',
                                    min_compile_time_secs=2.0)
    bench.log(f'backend={jax.default_backend()}')
    tables = adiabat.load_moist_adiabat_lookups(dtype=jnp.float32)
    tables = jax.tree_util.tree_map(jax.device_put, tables)
    jax.block_until_ready(tables.curves)

    @jax.jit
    def pipe(dat):
        return pipeline.conv_properties_fused(dat, tables=tables)

    arms = {}
    for b in BATCHES:
        dat = {k: jnp.asarray(v) for k, v in bench.synthetic(b).items()}
        t0 = time.perf_counter()
        try:
            bench._materialize(pipe(dat))
        except Exception as e:
            bench.log(f'B={b}: compile FAILED after '
                      f'{time.perf_counter() - t0:.0f}s: {str(e)[:120]!r}')
            arms[str(b)] = {'error': str(e)[:200]}
            del dat
            continue
        bench.log(f'B={b}: compile+first run {time.perf_counter() - t0:.1f}s')
        arms[str(b)] = {'dat': dat, 'best_ms': float('inf')}

    live = [b for b in BATCHES if 'dat' in arms.get(str(b), {})]
    for r in range(ROUNDS):
        for b in live:
            a = arms[str(b)]
            t0 = time.perf_counter()
            outs = [pipe(a['dat']) for _ in range(ITERS)]
            for o in outs:
                bench._materialize(o)
            ms = (time.perf_counter() - t0) / ITERS * 1e3
            a['best_ms'] = min(a['best_ms'], ms)
            bench.log(f'round {r} B={b}: {ms:.1f} ms/iter')

    out = {'rounds': ROUNDS, 'iters': ITERS, 'arms': {}}
    for b in BATCHES:
        a = arms[str(b)]
        if 'error' in a:
            out['arms'][str(b)] = a
        else:
            out['arms'][str(b)] = {
                'ms': round(a['best_ms'], 2),
                'cols_per_sec': round(b / (a['best_ms'] / 1e3), 1)}
    print(json.dumps(out))


if __name__ == '__main__':
    main()
