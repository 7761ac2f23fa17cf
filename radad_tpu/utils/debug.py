"""Numerical-safety utilities: NaN guards and checked execution.

The reference's runtime invariants are host-side NaN checks on embeddings
and retrieved vectors (``/root/reference/pipeline.py:799-803``). The TPU
equivalents:

  * ``assert_finite`` — checkify-based in-graph assertion usable inside jit
    (the production guard; zero host sync);
  * ``nan_debug`` — context manager flipping ``jax_debug_nans`` for
    interactive debugging sessions;
  * ``sanitize`` — ``nan_to_num`` with the reference's replace-with-zeros
    policy (pipeline.py:802-803).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def sanitize(x: jnp.ndarray) -> jnp.ndarray:
    """Replace NaN/±inf with zeros (reference policy for retrieved
    neighbor vectors)."""
    return jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)


def assert_finite(x: jnp.ndarray, name: str = "tensor") -> None:
    """In-graph finite check; use under ``checkify.checkify``:

        checked = checkify.checkify(fn)
        err, out = checked(*args); err.throw()
    """
    checkify.check(jnp.all(jnp.isfinite(x)),
                   f"non-finite values in {name}")


def checked(fn):
    """Wrap a function so its ``assert_finite`` checks raise on the host."""
    cfn = checkify.checkify(fn)

    def run(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return run


@contextlib.contextmanager
def nan_debug():
    """Enable jax_debug_nans within a scope (traps the first NaN-producing
    primitive with a traceback — the TPU analogue of anomaly detection)."""
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
