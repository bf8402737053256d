"""NaN-aware masked reductions along the level axis (always axis=-1).

The reference relies pervasively on xarray's skip-NaN reduction semantics
(``.max(dim)`` / ``.min(dim)`` / ``.sum(dim)`` skip NaN; all-NaN max/min -> NaN,
all-NaN sum -> 0).  These helpers reproduce that contract for jax arrays
without the -inf/warning pitfalls of ``jnp.nanmax`` under jit, and support an
extra boolean ``where`` mask (the jnp analogue of ``DataArray.where(cond)``
before a reduction).
"""

import jax.numpy as jnp


def _mask(x, where):
    m = ~jnp.isnan(x)
    if where is not None:
        m = m & where
    return m


def nanmax(x, where=None, axis=-1):
    """Max over axis skipping NaN (and ~where); NaN where nothing is valid."""
    m = _mask(x, where)
    r = jnp.max(jnp.where(m, x, -jnp.inf), axis=axis)
    return jnp.where(jnp.any(m, axis=axis), r, jnp.nan)


def nanmin(x, where=None, axis=-1):
    """Min over axis skipping NaN (and ~where); NaN where nothing is valid."""
    m = _mask(x, where)
    r = jnp.min(jnp.where(m, x, jnp.inf), axis=axis)
    return jnp.where(jnp.any(m, axis=axis), r, jnp.nan)


def nansum(x, where=None, axis=-1):
    """Sum over axis skipping NaN (and ~where); 0 where nothing is valid
    (xarray ``.sum`` semantics)."""
    m = _mask(x, where)
    return jnp.sum(jnp.where(m, x, 0.0), axis=axis)


def nanmean(x, where=None, axis=-1):
    """Mean over axis skipping NaN (and ~where); NaN where nothing is valid."""
    m = _mask(x, where)
    s = jnp.sum(jnp.where(m, x, 0.0), axis=axis)
    n = jnp.sum(m, axis=axis)
    return jnp.where(n > 0, s / jnp.maximum(n, 1), jnp.nan)


def nancount(x, where=None, axis=-1):
    """Count of valid (non-NaN and where) entries along axis."""
    return jnp.sum(_mask(x, where), axis=axis)


def any_valid(x, where=None, axis=-1):
    """True where at least one entry is valid along axis."""
    return jnp.any(_mask(x, where), axis=axis)
