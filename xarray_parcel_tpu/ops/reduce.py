"""NaN-aware masked reductions along the level axis (always axis=-1).

The reference relies pervasively on xarray's skip-NaN reduction semantics
(``.max(dim)`` / ``.min(dim)`` / ``.sum(dim)`` skip NaN; all-NaN max/min -> NaN,
all-NaN sum -> 0).  These helpers reproduce that contract for jax arrays
without the -inf/warning pitfalls of ``jnp.nanmax`` under jit, and support an
extra boolean ``where`` mask (the jnp analogue of ``DataArray.where(cond)``
before a reduction).
"""

import jax.numpy as jnp

from .safe import notnan


def _mask(x, where):
    m = notnan(x)
    if where is not None:
        m = m & where
    return m


def nanmax(x, where=None, axis=-1):
    """Max over axis skipping NaN (and ~where); NaN where nothing is valid.

    Assumes finite-or-NaN inputs (the library-wide contract: every value is
    physical or the NaN sentinel): the all-invalid case is detected by the
    ``-inf`` fill surviving the reduction — one level-axis reduction instead
    of two (the ``jnp.any(mask)`` formulation costs a second full pass, which
    matters inside the fused kernel where these reductions dominate).  A
    *valid* ``-inf`` input would be misread as "nothing valid"."""
    m = _mask(x, where)
    r = jnp.max(jnp.where(m, x, -jnp.inf), axis=axis)
    return jnp.where(r == -jnp.inf, jnp.nan, r)


def nanmin(x, where=None, axis=-1):
    """Min over axis skipping NaN (and ~where); NaN where nothing is valid.

    Finite-or-NaN input contract — see ``nanmax``."""
    m = _mask(x, where)
    r = jnp.min(jnp.where(m, x, jnp.inf), axis=axis)
    return jnp.where(r == jnp.inf, jnp.nan, r)


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
