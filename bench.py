"""Benchmark: full conv_properties pipeline + surface CAPE/CIN on one chip.

Prints ONE JSON line:
  metric      — full ~20-variable diagnostics pipeline throughput, the
                reference's headline benchmark (225 columns in 5.17 s
                ~= 43.5 columns/sec on its 2-worker dask cluster;
                BASELINE.md / parcel_functions_demo.ipynb cells 23/30)
  vs_baseline — ours / 43.5
  extra       — surface-based CAPE/CIN-only rate (the BASELINE.json
                north-star metric, target 1e7 columns/sec/chip).

Runs fp32 on the default backend (the real TPU chip under the driver).
"""

import json
import os
import sys
import time

import numpy as np

REF_PIPELINE_COLS_PER_SEC = 225.0 / 5.17

# Optional arms (XLA cape, modular pipeline, columns-layout cape, sharded
# cape) run until the time SPENT IN OPTIONAL ARMS exceeds this; the
# required metrics always print.  Counting arm-time (not wall-clock since
# process start, the round-2 mistake) means startup stalls, backend
# probes and slow required compiles no longer eat the optional budget —
# only a stall inside an optional arm itself does, and then the cheap
# arms have already run (they are ordered cheapest first).
OPTIONAL_ARM_BUDGET_S = 480.0


def log(msg):
    print(f'[bench +{time.perf_counter() - _T0:7.1f}s] {msg}',
          file=sys.stderr, flush=True)


_T0 = time.perf_counter()


def synthetic(batch, L=90, seed=0):
    from __graft_entry__ import _synthetic_columns

    p, t, td = _synthetic_columns((batch,), L=L, seed=seed)
    # q from dewpoint, pure NumPy (host-side data prep must not dispatch
    # eager device ops: each one pays a full compile over the axon tunnel).
    e = 6.112 * np.exp(17.67 * (td - 273.15) / (td - 29.65))
    w = 0.6219569100577033 * e / (p - e)
    q = w / (1.0 + w)
    h = 44330.0 * (1.0 - (p / 1013.25) ** 0.19)
    rng = np.random.default_rng(seed + 1)
    return {
        'pressure': p, 'temperature': t,
        'specific_humidity': q.astype(np.float32),
        'height_asl': h.astype(np.float32),
        'surface_wind_u': rng.normal(3, 2, (batch,)).astype(np.float32),
        'surface_wind_v': rng.normal(0, 2, (batch,)).astype(np.float32),
        'wind_u': rng.normal(8, 5, (batch, L)).astype(np.float32),
        'wind_v': rng.normal(2, 5, (batch, L)).astype(np.float32),
        'wind_height_above_surface': (h - h[..., :1]).astype(np.float32),
    }


def _materialize(out):
    """True device synchronisation: reduce every output to one scalar on
    device and read it back (4 bytes).  jax.block_until_ready does NOT
    reliably wait for remote execution on the tunnel backend (timing loops
    that only block can come out ~1000x too fast), and full-array readback
    would charge the tunnel's slow device->host path (~20 MB/s) against
    compute that a real deployment never pays."""
    import jax
    # One XLA program completes atomically, so one element of one output
    # proves the whole dispatch finished (4-byte readback, one extra
    # dispatch).
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.ravel()[0])


def time_fn(fn, *args, iters=5):
    import jax
    t0 = time.perf_counter()
    # The remote-compile service over the tunnel fails transiently
    # (connection drops, HTTP 500s) — retry the compiling call.
    for attempt in range(4):
        try:
            out = fn(*args)   # compile + warm cache
            _materialize(out)
            break
        except Exception as e:
            if attempt == 3:
                raise
            log(f'  compile attempt {attempt + 1} failed '
                f'({str(e)[:80]!r}); retrying')
            time.sleep(5)
    log(f'  compile+first run: {time.perf_counter() - t0:.1f}s')
    # Amortized throughput: queue all iterations (as a streaming producer
    # would), then materialise every output — honest end-to-end sync.
    # Best of two rounds: tunnel health varies +-30% minute to minute.
    best = float('inf')
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        for out in outs:
            _materialize(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def wait_for_backend(tries=8, probe_timeout=75, compile_probe=True):
    """PJRT client creation over the axon tunnel occasionally hangs for
    minutes (e.g. right after a previous process was killed), and the remote
    COMPILE service independently stalls for minutes at a time.  Probe both
    in a killable subprocess until they answer: device listing first, then a
    trivial jit (which also warms the service for the identical null program
    the dispatch-floor measurement compiles first)."""
    import subprocess
    import sys as _sys
    probe = 'import jax; jax.devices()'
    cprobe = ('import jax, jax.numpy as jnp; '
              'jax.jit(lambda x: x * 2.0)(jnp.zeros((8,), jnp.float32))')
    device_ok = False
    for i in range(tries):
        try:
            r = subprocess.run(
                [_sys.executable, '-c', probe],
                timeout=probe_timeout, capture_output=True)
            if r.returncode == 0:
                log(f'backend probe ok (attempt {i + 1})')
                device_ok = True
                break
            log(f'backend probe exit {r.returncode} (attempt {i + 1})')
        except subprocess.TimeoutExpired:
            log(f'backend probe timed out (attempt {i + 1})')
    if not device_ok:
        log('backend probe never succeeded')
        return False
    if not compile_probe:
        return True
    for i in range(tries):
        try:
            r = subprocess.run(
                [_sys.executable, '-c', cprobe],
                timeout=probe_timeout * 2, capture_output=True)
            if r.returncode == 0:
                log(f'compile probe ok (attempt {i + 1})')
                return True
            log(f'compile probe exit {r.returncode} (attempt {i + 1})')
        except subprocess.TimeoutExpired:
            log(f'compile probe timed out (attempt {i + 1})')
    log('compile probe never succeeded; proceeding anyway')
    return True


def main():
    if not wait_for_backend():
        # The tunnel backend is hard-down (device listing never answered in
        # ~10 min of killable probes).  Entering jax would hang forever;
        # emit a parseable result recording the outage instead.
        print(json.dumps({
            'metric': 'conv_properties_pipeline_columns_per_sec',
            'value': None,
            'unit': 'columns/sec/chip (90-level, ~20-var pipeline, fp32)',
            'vs_baseline': None,
            'extra': {'error': 'TPU backend unreachable '
                               '(axon tunnel down; device probe never '
                               'answered)'},
        }), flush=True)
        return

    import jax
    import jax.numpy as jnp

    from xarray_parcel_tpu import adiabat, cape, deploy, fused, pipeline

    # Persistent compile cache: the seven bench programs cost 25-110 s of
    # remote compilation EACH over the tunnel on every run; a warm cache
    # skips the remote compile entirely (150 s -> 0.35 s measured,
    # benchmarks/results/deploy_tpu_smoke.json).  Steady-state rates are
    # unaffected — compiles are never inside a timed window.
    deploy.enable_compilation_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     'benchmarks', '.xla_cache'),
        min_compile_time_secs=2.0)

    log(f'backend={jax.default_backend()} devices={jax.devices()}')

    # Fixed per-dispatch cost of this environment (the tunnel adds ~35 ms
    # to EVERY program execution, trivial or huge — measured with a null
    # kernel and reported so rates can be judged net of infrastructure).
    null = jax.jit(lambda x: x * 2.0)
    x0 = jnp.zeros((8,), jnp.float32)
    _materialize(null(x0))
    t0 = time.perf_counter()
    outs = [null(x0) for _ in range(5)]
    for o in outs:
        _materialize(o)
    dispatch_floor = (time.perf_counter() - t0) / 5
    log(f'dispatch floor: {dispatch_floor * 1e3:.1f} ms/call')
    tables = adiabat.load_moist_adiabat_lookups(dtype=jnp.float32)
    tables = jax.tree_util.tree_map(jax.device_put, tables)
    jax.block_until_ready(tables.curves)
    log('tables loaded + device_put')

    # --- full pipeline (the reference's headline benchmark) ---
    # Headline arm: the fused-Pallas production pipeline (three CAPE solves
    # + lifted indices inside kernels, shared interpolation anchors); the
    # modular XLA pipeline is timed alongside.  1.5 x 2^19 columns: net
    # throughput is flat in batch (linear scaling), so a bigger batch only
    # thins the tunnel's ~28 ms dispatch floor — 786k compiles cleanly and
    # measured 3.08e6 vs 2.98e6 at 2^19 (pipeline_attrition_ab_v5e_r5);
    # 917k (7*2^17) also compiles but is rate-neutral (+0.5%, within
    # noise — megabatch3_ab_v5e_r8: the per-column time stops improving
    # before the floor amortisation predicts); 2^20 sends XLA's scheduler
    # into a minutes-long memory-pressure compile on this 16 GB chip.
    B_pipe = (1 << 19) + (1 << 18)
    dat = {k: jnp.asarray(v) for k, v in synthetic(B_pipe).items()}

    @jax.jit
    def pipe(dat):
        return pipeline.conv_properties_fused(dat, tables=tables)

    sec = time_fn(pipe, dat)
    pipe_rate = B_pipe / sec
    pipe_rate_net = B_pipe / max(sec - dispatch_floor, 1e-6)
    log(f'pipeline (fused): {sec:.3f}s/iter at B={B_pipe} '
        f'({pipe_rate:.3g} cols/sec, {pipe_rate_net:.3g} net of dispatch)')

    # Optional arms: each is charged only for its own runtime; once the
    # spent total crosses OPTIONAL_ARM_BUDGET_S the rest are skipped (the
    # required metrics must still print one JSON line).  Ordered cheapest
    # first so a stall in an expensive arm cannot starve the cheap ones.
    opt_spent = [0.0]

    def optional_arm(stage, thunk):
        if opt_spent[0] >= OPTIONAL_ARM_BUDGET_S:
            log(f'skipping optional arm {stage!r} '
                f'(optional-arm budget spent: {opt_spent[0]:.0f}s)')
            return None
        t0 = time.perf_counter()
        try:
            sec = thunk()
        except Exception as e:
            log(f'optional arm {stage!r} failed: {str(e)[:120]!r}')
            sec = None
        finally:
            opt_spent[0] += time.perf_counter() - t0
        return sec

    def arm_pipe_modular():
        @jax.jit
        def pipe_mod(dat):
            return pipeline.conv_properties(dat, tables=tables)

        sec = time_fn(pipe_mod, dat)
        log(f'pipeline (modular xla): {sec:.3f}s/iter '
            f'({B_pipe / sec:.3g} cols/sec)')
        return sec

    def arm_pipe_min_fused():
        # The reduced deployment pipeline (one fused solve + scalar
        # diagnostics — reference min_conv_properties :1872-1949).
        @jax.jit
        def pipe_min(dat):
            return pipeline.min_conv_properties_fused(dat, tables=tables)

        sec = time_fn(pipe_min, dat)
        log(f'pipeline (min, fused): {sec:.3f}s/iter '
            f'({B_pipe / sec:.3g} cols/sec)')
        return sec

    # Pipeline-dataset arms run while `dat` is resident; it is then freed
    # so the 2^21-column cape arms get the HBM headroom they need.
    sec_mod = optional_arm('pipeline modular', arm_pipe_modular)
    sec_min = optional_arm('pipeline min fused', arm_pipe_min_fused)
    del dat

    # --- surface-based CAPE/CIN only (the north-star metric) ---
    # 2^21 columns: whole-batch compiles fine and the tunnel's dispatch
    # floor thins to ~18% of the iteration (benchmarks/megabatch_ab.py:
    # fused 1.65e7 at 2^21 vs 1.36e7 at 2^20; XLA clears 1e7).  2^22
    # reproducibly crashes the remote compile helper (HTTP 500 x3), and
    # lax.map chunking loses ~9-18 ms/chunk (benchmarks/chunked_ab.py),
    # so 2^21 whole-batch is the ceiling on this chip.
    B_cape = 1 << 21
    p, t, td = (jnp.asarray(v) for v in
                __import__('__graft_entry__')._synthetic_columns((B_cape,)))

    @jax.jit
    def sb(p, t, td):
        res, _ = fused.fused_surface_cape_cin(p, t, td, tables=tables)
        return res['cape'], res['cin']

    sec_cape = time_fn(sb, p, t, td)
    cape_rate = B_cape / sec_cape
    log(f'cape (fused pallas): {sec_cape:.3f}s/iter at B={B_cape} '
        f'({cape_rate:.3g} cols/sec)')

    def arm_cape_xla():
        @jax.jit
        def sb_xla(p, t, td):
            res, _ = cape.surface_based_cape_cin(p, t, td, tables=tables)
            return res['cape'], res['cin']

        sec = time_fn(sb_xla, p, t, td)
        log(f'cape (xla): {sec:.3f}s/iter ({B_cape / sec:.3g} cols/sec)')
        return sec

    def arm_cape_columns():
        # Columns-on-lanes kernel layout — the committed evidence that the
        # rows default is the faster end-to-end choice (round 3).
        @jax.jit
        def sb_cols(p, t, td):
            res, _ = fused.fused_surface_cape_cin(p, t, td, tables=tables,
                                                  layout='columns')
            return res['cape'], res['cin']

        sec = time_fn(sb_cols, p, t, td)
        log(f'cape (fused, columns layout): {sec:.3f}s/iter '
            f'({B_cape / sec:.3g} cols/sec)')
        return sec

    def arm_cape_sharded():
        # Production sharded path: the fused kernel under shard_map over a
        # real TPU mesh (1 device here), interpret=False — compiles and
        # times the exact deployment configuration a pod slice runs.
        import functools

        from jax.sharding import PartitionSpec as P

        from xarray_parcel_tpu.parallel import (make_mesh, replicate,
                                                shard_batch)

        mesh = make_mesh(jax.devices()[:1])
        tables_r = replicate(tables, mesh)
        ps, ts, tds = shard_batch((p, t, td), mesh)

        @jax.jit
        @functools.partial(jax.shard_map, mesh=mesh, check_vma=False,
                           in_specs=(P('data'), P('data'), P('data')),
                           out_specs=(P('data'), P('data')))
        def sb_sharded(p, t, td):
            res, _ = fused.fused_surface_cape_cin(p, t, td, tables=tables_r,
                                                  interpret=False)
            return res['cape'], res['cin']

        sec = time_fn(sb_sharded, ps, ts, tds)
        log(f'cape (fused, shard_map): {sec:.3f}s/iter '
            f'({B_cape / sec:.3g} cols/sec)')
        return sec

    sec_xla = optional_arm('cape xla', arm_cape_xla)
    sec_alt = optional_arm('cape columns layout', arm_cape_columns)
    sec_sharded = optional_arm('cape sharded', arm_cape_sharded)

    print(json.dumps({
        'metric': 'conv_properties_pipeline_columns_per_sec',
        'value': round(pipe_rate, 1),
        'unit': 'columns/sec/chip (90-level, ~20-var pipeline, fp32)',
        'vs_baseline': round(pipe_rate / REF_PIPELINE_COLS_PER_SEC, 1),
        'extra': {
            'surface_cape_cin_columns_per_sec': round(cape_rate, 1),
            'surface_cape_cin_xla_columns_per_sec': (
                round(B_cape / sec_xla, 1) if sec_xla else None),
            'north_star_target': 1e7,
            'dispatch_floor_ms': round(dispatch_floor * 1e3, 1),
            'cape_cols_per_sec_net_of_dispatch': round(
                B_cape / max(sec_cape - dispatch_floor, 1e-6), 1),
            'pipeline_cols_per_sec_net_of_dispatch': round(pipe_rate_net, 1),
            'pipeline_modular_xla_columns_per_sec': (
                round(B_pipe / sec_mod, 1) if sec_mod else None),
            'surface_cape_cin_columns_layout_columns_per_sec': (
                round(B_cape / sec_alt, 1) if sec_alt else None),
            'surface_cape_cin_sharded_columns_per_sec': (
                round(B_cape / sec_sharded, 1) if sec_sharded else None),
            'pipeline_min_fused_columns_per_sec': (
                round(B_pipe / sec_min, 1) if sec_min else None),
            'pipeline_batch': B_pipe,
            'cape_batch': B_cape,
            'backend': jax.default_backend(),
            'device': str(jax.devices()[0]),
        },
    }))


if __name__ == '__main__':
    try:
        main()
    except SystemExit:
        raise
    except Exception as e:
        # The one-JSON-line contract holds even when a REQUIRED arm dies
        # mid-run (e.g. the tunnel drops after the startup probes passed
        # and time_fn exhausts its retries): emit a parseable failure
        # record, then re-raise so the exit code still flags the run.
        print(json.dumps({
            'metric': 'conv_properties_pipeline_columns_per_sec',
            'value': None,
            'unit': 'columns/sec/chip (90-level, ~20-var pipeline, fp32)',
            'vs_baseline': None,
            'extra': {'error': f'bench failed mid-run: {e!r}'[:500]},
        }), flush=True)
        raise
