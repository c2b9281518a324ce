"""Numerical debugging aids.

The reference's closest facility is a commented-out
``torch.autograd.set_detect_anomaly`` pointer (reference: train.py:49-50)
and a NaN guard in the flow path (utils.py:498). Here the capability is
real (SURVEY §5 "race detection / sanitizers" row):

- :func:`enable_nan_debugging`: ``jax.debug_nans`` — jitted code re-runs
  un-jitted on NaN and raises at the originating primitive.
- :func:`checked`: wrap a function with ``checkify`` so NaN/inf and OOB
  errors surface as checked errors with locations.
- Pallas kernels support ``interpret=True`` (kernels/lif_pallas.py) as the
  sanitizer path for kernel logic.
"""

from __future__ import annotations


def enable_nan_debugging(enable: bool = True) -> None:
    import jax

    jax.config.update("jax_debug_nans", enable)


def checked(fn):
    """Returns a wrapped fn that raises informative checked errors."""
    import jax
    from jax.experimental import checkify

    check_fn = checkify.checkify(
        fn, errors=checkify.float_checks | checkify.index_checks
    )

    def wrapper(*args, **kwargs):
        err, out = check_fn(*args, **kwargs)
        err.throw()
        return out

    return wrapper
