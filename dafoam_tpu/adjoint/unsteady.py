"""Time-accurate unsteady adjoint: reverse sweep over the stored history.

Re-designs the reference's DAFoamSolverUnsteady.compute_jacvec_product
(dafoam/mphys/mphys_dafoam.py:1390-1679) and calcdRdWOldTPsiAD
(DASolver.C:1910): the discrete adjoint of implicit-Euler/BDF2 stepping.

Reference mechanism: store every time step to DISK during the primal, then
re-read W^n, W^{n-1}, W^{n-2} per reverse step, with preconditioner
matrices precomputed every PCMatPrecomputeInterval steps and reused
(mphys_dafoam.py:1443-1485). TPU-native equivalents here:

- in-memory sweep (``unsteady_adjoint_totals``): the primal's lax.scan
  stacks the history; one reverse lax.scan does per-step
    rhs    = w_n dF/dW^n - (dR^{n+1}/dW^n)^T psi^{n+1}
             - (dR^{n+2}/dW^n)^T psi^{n+2}
    psi^n  : (dR^n/dW^n)^T psi^n = rhs          (matrix-free FGMRES)
    totals+= w_n pF/px - (dR^n/dx)^T psi^n
  so each GMRES/vjp compiles once and is reused for every step;
- PC amortization: ``pc_assemble`` re-builds the segregated PC matrices
  only every ``pc_interval`` reverse steps (lax.cond on the scan carry) —
  the PCMatPrecomputeInterval analog;
- long histories (``unsteady_adjoint_totals_checkpointed``): classic
  binomial-style checkpoint/recompute — the primal stores only every
  seg_len-th state; the reverse pass recomputes one segment's history at a
  time and sweeps it, so device memory is O(seg_len + T/seg_len) states
  instead of O(T). This replaces the reference's disk round-trip
  (DASolver.C:3193 readStateVars) with on-device recomputation.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from dafoam_tpu.linalg.krylov import gmres


def _at(hist, n):
    return jax.tree_util.tree_map(lambda a: a[n], hist)


def _wrap_time_indep(residual_fn, func_fn, time_dep):
    if time_dep:
        return residual_fn, func_fn
    rf, ff = residual_fn, func_fn
    return (lambda W, Wo, Woo, x, n: rf(W, Wo, Woo, x),
            lambda W, x, n: ff(W, x))


def _segment_sweep(residual_fn, func_fn, hist_ext, base, inputs, weights,
                   carry0, n_hi, length, T,
                   ddt_order, state_scales, res_scales,
                   restart, rel_tol, abs_tol, max_iters,
                   pc_assemble, pc_apply, pc_interval):
    """Sweep steps n = n_hi .. n_hi-length+1 (inclusive, descending).

    ``length`` must be static (scan trip count); ``n_hi``/``base`` may be
    traced. hist_ext: stacked states covering global indices
    [base, base + len - 1] ⊇ [clip(n_hi-length-1), clip(n_hi+2)].
    carry0: (psi^{n_hi+1}, psi^{n_hi+2}, totals, pc_mats|None).
    """

    def _sc(tree, scales, invert=False):
        if not scales:
            return tree
        return {k: (v / scales.get(k, 1.0) if invert
                    else v * scales.get(k, 1.0))
                for k, v in tree.items()}

    def H(n):
        return _at(hist_ext, jnp.clip(n, 0, T) - base)

    def step(carry, n):
        psi1, psi2, totals, pc_mats = carry
        W, W1, W2 = H(n), H(n - 1), H(n - 2)

        g = jax.grad(lambda w: func_fn(w, inputs, n))(W)
        wgt = weights[n - 1]
        rhs = jax.tree_util.tree_map(lambda x: wgt * x, g)

        Wp1 = H(n + 1)
        _, vjp_old = jax.vjp(
            lambda wold: residual_fn(Wp1, wold, W1, inputs, n + 1), W)
        (c1,) = vjp_old(psi1)
        have1 = (n + 1 <= T).astype(weights.dtype)
        rhs = jax.tree_util.tree_map(lambda r, c: r - have1 * c, rhs, c1)

        if ddt_order == 2:
            Wp2 = H(n + 2)
            _, vjp_oo = jax.vjp(
                lambda woo: residual_fn(Wp2, Wp1, woo, inputs, n + 2), W)
            (c2,) = vjp_oo(psi2)
            have2 = (n + 2 <= T).astype(weights.dtype)
            rhs = jax.tree_util.tree_map(lambda r, c: r - have2 * c,
                                         rhs, c2)

        _, f_vjp = jax.vjp(lambda w: residual_fn(w, W1, W2, inputs, n), W)

        def matT(ps):
            p = _sc(ps, res_scales, invert=True)
            (out,) = f_vjp(p)
            return _sc(out, state_scales)

        pc = None
        if pc_assemble is not None:
            rebuild = (T - n) % pc_interval == 0
            pc_mats = jax.lax.cond(
                rebuild, lambda: pc_assemble(W, W1, W2, inputs, n),
                lambda: pc_mats)
            pc = lambda r: pc_apply(pc_mats, r)         # noqa: E731
        psi_s, info = gmres(matT, _sc(rhs, state_scales), precond=pc,
                            restart=restart, rel_tol=rel_tol,
                            abs_tol=abs_tol, max_iters=max_iters)
        psi = _sc(psi_s, res_scales, invert=True)

        _, fx_vjp = jax.vjp(lambda x: func_fn(W, x, n), inputs)
        (dfdx,) = fx_vjp(jnp.asarray(1.0, weights.dtype))
        _, rx_vjp = jax.vjp(lambda x: residual_fn(W, W1, W2, x, n), inputs)
        (drx,) = rx_vjp(psi)
        totals = jax.tree_util.tree_map(
            lambda t, a, b: t + wgt * a - b, totals, dfdx, drx)

        return (psi, psi1, totals, pc_mats), info.resid

    carry, resids = jax.lax.scan(step, carry0,
                                 n_hi - jnp.arange(length))
    return carry, resids


def unsteady_adjoint_totals(
        residual_fn: Callable,   # (W, W_old, W_oldold, inputs[, n]) -> res
        func_fn: Callable,       # (W, inputs[, n]) -> scalar
        hist,                    # pytree stacked (T+1, ...), index 0 = IC
        inputs,
        weights: jnp.ndarray,    # (T,) dJ/df_n from the time op
        ddt_order: int = 1,
        state_scales=None, res_scales=None,
        restart=100, rel_tol=1e-8, abs_tol=1e-14, max_iters=1000,
        precond_builder: Callable | None = None,
        pc_assemble: Callable | None = None,
        pc_apply: Callable | None = None,
        pc_interval: int = 1,
        time_dep: bool = False):
    """In-memory reverse sweep. Returns (totals, per-step adjoint resids).

    pc_assemble(W, W1, W2, inputs, n) -> pytree of PC matrices (rebuilt
    every pc_interval reverse steps, the PCMatPrecomputeInterval analog);
    pc_apply(mats, r) -> preconditioned r. ``precond_builder`` is the
    legacy per-step form (W, W1, W2, inputs) -> pc and implies
    pc_interval=1."""
    residual_fn, func_fn = _wrap_time_indep(residual_fn, func_fn, time_dep)
    if precond_builder is not None and pc_assemble is None:
        pb = precond_builder
        pc_assemble = lambda W, W1, W2, x, n: (W, W1, W2)     # noqa: E731

        def pc_apply(mats, r):
            Wm, W1m, W2m = mats
            return pb(Wm, W1m, W2m, inputs)(r)

        pc_interval = 1

    T = jax.tree_util.tree_leaves(hist)[0].shape[0] - 1
    zeros_state = jax.tree_util.tree_map(lambda a: jnp.zeros_like(a[0]),
                                         hist)
    totals0 = jax.tree_util.tree_map(jnp.zeros_like, inputs)
    pc_mats0 = None
    if pc_assemble is not None:
        pc_mats0 = pc_assemble(_at(hist, T), _at(hist, max(T - 1, 0)),
                               _at(hist, max(T - 2, 0)), inputs,
                               jnp.asarray(T))
    carry0 = (zeros_state, zeros_state, totals0, pc_mats0)
    carry, resids = _segment_sweep(
        residual_fn, func_fn, hist, 0, inputs, weights, carry0,
        T, T, T, ddt_order, state_scales, res_scales,
        restart, rel_tol, abs_tol, max_iters,
        pc_assemble, pc_apply, pc_interval)
    _, _, totals, _ = carry
    return totals, resids


def unsteady_adjoint_totals_checkpointed(
        advance_fn: Callable,    # (W, inputs, n) -> state after step n
        residual_fn: Callable, func_fn: Callable,
        checkpoints,             # pytree stacked (n_seg+1, 3, ...):
                                 # ckpt[s] = states at steps
                                 # (s*L, max(s*L-1,0), max(s*L-2,0))
        seg_len: int, T: int,
        inputs, weights,
        ddt_order: int = 1, state_scales=None, res_scales=None,
        restart=100, rel_tol=1e-8, abs_tol=1e-14, max_iters=1000,
        pc_assemble=None, pc_apply=None, pc_interval: int = 1,
        time_dep: bool = False):
    """Checkpoint/recompute reverse sweep for long histories.

    Device memory: one segment\'s history + the checkpoint stack (3 states
    per segment boundary) instead of the full T-step history — the
    TPU-native replacement for the reference\'s per-step disk re-reads
    (DASolver.C:3193). The jitted segment kernels (forward recompute +
    reverse sweep) compile once and are reused for every segment.
    """
    residual_fn, func_fn = _wrap_time_indep(residual_fn, func_fn, time_dep)
    n_seg = T // seg_len
    assert T == n_seg * seg_len, "T must be a multiple of seg_len"

    @jax.jit
    def forward_segment(ck, n0):
        """hist_ext for the segment starting at step n0: global states
        (n0-2, n0-1, n0, n0+1, ..., n0+seg_len) — base = n0 - 2."""
        W0 = _at(ck, 0)

        def stp(carry, n):
            W, nn = carry
            Wn = advance_fn(W, inputs, nn + 1)
            return (Wn, nn + 1), Wn

        (_, _), hseg = jax.lax.scan(stp, (W0, n0), None, length=seg_len)
        return jax.tree_util.tree_map(
            lambda c, b: jnp.concatenate(
                [c[2][None], c[1][None], c[0][None], b], 0),
            ck, hseg)

    zeros_state = jax.tree_util.tree_map(
        lambda a: jnp.zeros_like(a[0, 0]), checkpoints)
    totals0 = jax.tree_util.tree_map(jnp.zeros_like, inputs)

    @jax.jit
    def sweep_segment(hist_ext, base, carry, n_hi):
        return _segment_sweep(
            residual_fn, func_fn, hist_ext, base, inputs, weights, carry,
            n_hi, seg_len, T, ddt_order, state_scales,
            res_scales, restart, rel_tol, abs_tol, max_iters,
            pc_assemble, pc_apply, pc_interval)

    carry = (zeros_state, zeros_state, totals0, None)
    all_resids = []
    hist_prev_top = None      # states (n1+1, n1+2) for the segment below
    for s in range(n_seg - 1, -1, -1):
        n0 = s * seg_len
        hist_seg = forward_segment(_at(checkpoints, s), jnp.asarray(n0))
        # extend above with the two states the cross-step vjps touch
        if hist_prev_top is None:
            top = jax.tree_util.tree_map(
                lambda a: jnp.stack([a[-1], a[-1]]), hist_seg)
        else:
            top = hist_prev_top
        hist_ext = jax.tree_util.tree_map(
            lambda a, t: jnp.concatenate([a, t], 0), hist_seg, top)
        if pc_assemble is not None and carry[3] is None:
            L = seg_len
            carry = (carry[0], carry[1], carry[2],
                     pc_assemble(_at(hist_seg, L + 2),
                                 _at(hist_seg, L + 1),
                                 _at(hist_seg, L), inputs,
                                 jnp.asarray(n0 + seg_len)))
        carry, resids = sweep_segment(hist_ext, n0 - 2, carry,
                                      n0 + seg_len)
        all_resids.append(resids)
        # bottom two interior entries of THIS segment serve the next one
        hist_prev_top = jax.tree_util.tree_map(
            lambda a: jnp.stack([a[3], a[4]]), hist_ext)
    _, _, totals, _ = carry
    return totals, jnp.concatenate(all_resids)
