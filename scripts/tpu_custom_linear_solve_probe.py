"""Minimal axon-TPU probe: does lax.custom_linear_solve compile/run?

Round-3 bench regression: the primal now wraps every inner solve in
lax.custom_linear_solve (fvsolve.solve) and the axon-plugin compile of the
SIMPLE primal died with `AssertionError: must override` (jax hijax.py) —
round 2's bench (no custom_linear_solve) compiled fine on the same chip.
This isolates the primitive.
"""

import sys
import traceback

import jax
import jax.numpy as jnp


def main():
    print("platform:", jax.devices()[0].platform, flush=True)

    def mv(x):
        return 2.0 * x

    def slv(matvec, b):
        return b / 2.0

    b = jnp.ones((64,))

    for name, fn in (
        ("plain jit", lambda b: mv(b) + 1.0),
        ("custom_linear_solve fwd",
         lambda b: jax.lax.custom_linear_solve(mv, b, slv,
                                               transpose_solve=slv)),
        ("custom_linear_solve vjp",
         lambda b: jax.vjp(
             lambda bb: jax.lax.custom_linear_solve(
                 mv, bb, slv, transpose_solve=slv), b)[1](b)[0]),
        ("while_loop + cls",
         lambda b: jax.lax.while_loop(
             lambda c: c[0] < 3,
             lambda c: (c[0] + 1,
                        jax.lax.custom_linear_solve(
                            mv, c[1], slv, transpose_solve=slv)),
             (0, b))[1]),
    ):
        try:
            out = jax.jit(fn)(b)
            jax.block_until_ready(out)
            print(f"{name}: ok", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()
            sys.exit(1)


if __name__ == "__main__":
    main()
