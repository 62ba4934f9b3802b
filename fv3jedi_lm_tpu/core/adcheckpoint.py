"""AD-runtime checkpointing: the TPU-native Tapenade-stack replacement.

The reference's adjoint runs as ``fv_dynamics_fwd`` (forward recompute that
PUSHes per-substep trajectory state) followed by ``fv_dynamics_bwd`` (reverse
sweep that POPs and back-propagates) — src/dynamics/fv3jedi_lm_dynamics_mod.
F90:507-633 and utils/tapenade/adStack.c.  `checkpointed_scan` is that design
expressed functionally:

* forward: a `lax.scan` over the substep body that also stacks the per-
  iteration INPUT carry (the "push");
* backward: a reverse `lax.scan` that, for each substep, re-linearizes the
  body at the STORED carry (`jax.vjp`) and pulls the cotangent back (the
  "recompute-forward + pop + reverse sweep").

Why not `jax.checkpoint`?  Its remat recompute is a *separate XLA program
region* from the primal; the compiler may round the two differently by an
ulp, which flips monotone-limiter branches and breaks the TL/AD dot-product
identity at the 1e-4 level (measured).  Here the backward linearizes at the
bitwise-stored carry — the same values every other consumer sees — so
`<M dx, dy> == <dx, M^T dy>` holds to machine precision while peak memory
stays O(n_steps * carry + one substep's residuals), the same cost model as
the reference's Tapenade stack.

`jax.custom_vjp` functions cannot be forward-mode differentiated, so the
facade derives the TLM as `jax.linear_transpose` of the ADM (lm.py): the two
are transposes of one linear jaxpr by construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def checkpointed_scan(body, length, carry, consts):
    """Run ``carry = body(carry, consts)`` `length` times.

    body must be a pure function; `consts` is a pytree of loop-invariant
    (but possibly differentiated) inputs; everything body captures by
    closure must be constant w.r.t. differentiation.
    """
    def f(c, _):
        return body(c, consts), None

    final, _ = lax.scan(f, carry, None, length=length)
    return final


def _cscan_fwd(body, length, carry, consts):
    def f(c, _):
        return body(c, consts), c

    final, stacked = lax.scan(f, carry, None, length=length)
    return final, (stacked, consts)


def _cscan_bwd(body, length, res, ct):
    stacked, consts = res
    zeros_c = jax.tree.map(jnp.zeros_like, consts)

    def b(acc, c_in):
        ct, ct_consts = acc
        _, pull = jax.vjp(body, c_in, consts)
        d_c, d_consts = pull(ct)
        ct_consts = jax.tree.map(jnp.add, ct_consts, d_consts)
        return (d_c, ct_consts), None

    (ct, ct_consts), _ = lax.scan(b, (ct, zeros_c), stacked, reverse=True)
    return ct, ct_consts


checkpointed_scan.defvjp(_cscan_fwd, _cscan_bwd)
