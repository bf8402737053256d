"""Shared scaffolding for the one-process interleaved A/B benchmarks.

Every TPU A/B in this directory follows the same protocol (learned the
hard way on the tunneled v5e — see CLAUDE.md and reduction_ab.py):

- probe the backend first (init can hang minutes after a killed process),
- persistent compile cache at benchmarks/.xla_cache (remote compiles cost
  25-110 s each; re-runs of unchanged programs skip them entirely),
- retry each arm's first (compiling) call — the tunnel's remote compile
  service intermittently fails/stalls on a single program,
- time arms in INTERLEAVED rounds and keep per-arm minima: in-process arm
  order carries a ~5 ms (~8%) second-arm penalty, so isolated or
  single-order timings cannot be trusted below ~10%.

Scripts keep their own arm definitions and JSON reporting; only this
protocol lives here.
"""

import os
import time

import jax
import jax.numpy as jnp

import bench
from xarray_parcel_tpu import adiabat, deploy


def setup(batch=None):
    """Backend probe + compile cache + f32 tables staged on device; with
    ``batch``, also a synthetic input grid.  Returns ``(tables, dat)``
    (``dat`` is None without ``batch``)."""
    bench.wait_for_backend()
    deploy.enable_compilation_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     '.xla_cache'), min_compile_time_secs=2.0)
    bench.log(f'backend={jax.default_backend()}')
    tables = adiabat.load_moist_adiabat_lookups(dtype=jnp.float32)
    tables = jax.tree_util.tree_map(jax.device_put, tables)
    jax.block_until_ready(tables.curves)
    dat = None
    if batch is not None:
        dat = {k: jnp.asarray(v) for k, v in bench.synthetic(batch).items()}
    return tables, dat


def compile_arms(arms, attempts=4):
    """Run each arm once (the compiling call), retrying transient remote-
    compile failures.  ``arms``: ``{name: (jitted_fn, args_tuple)}``."""
    for name, (fn, args) in arms.items():
        t0 = time.perf_counter()
        for attempt in range(attempts):
            try:
                bench._materialize(fn(*args))
                break
            except Exception as e:
                if attempt == attempts - 1:
                    raise
                bench.log(f'  {name} compile attempt {attempt + 1} failed '
                          f'({str(e)[:80]!r}); retrying')
                time.sleep(5)
        bench.log(
            f'{name}: compiled+first in {time.perf_counter() - t0:.1f}s')


def time_arms(arms, rounds=3, iters=5):
    """Interleaved timing rounds; returns per-arm best seconds/iter.

    Completion is forced through ``bench._materialize`` (one-element
    readback) — ``block_until_ready`` does not reliably wait on the
    tunnel backend."""
    best = {name: float('inf') for name in arms}
    for r in range(rounds):
        for name, (fn, args) in arms.items():
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(iters)]
            for out in outs:
                bench._materialize(out)
            sec = (time.perf_counter() - t0) / iters
            best[name] = min(best[name], sec)
            bench.log(f'round {r} {name}: {sec * 1e3:.1f} ms')
    return best
