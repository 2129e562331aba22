"""Multi-device sequence solve: frames sharded over a mesh axis.

This is the TPU replacement for the reference's single-machine banded QR
(SURVEY.md §2.9 / §5): 10k-frame sequence solves shard their frames across
chips, Jacobian assembly is embarrassingly parallel (the reference's
dispenso frame loop, sequence_solver.cpp:235-370), the temporal band is
solved by substructuring (a block SPIKE algorithm), and the shared
"universal" parameters ride an all-reduce — the reference's "serialize the
common columns" (online_householder_qr.h:369-410) becomes a psum.

Algorithm (window-2 sequence errors → block-tridiagonal + arrowhead):
  per shard s with L local frames:
    1. assemble local diag/off-diag/universal blocks; the window crossing
       the left shard boundary is evaluated from a ppermute'd halo frame
       (owner = shard of the window's start frame; the neighbor keeps only
       its own rows' contributions, so nothing is double-counted)
    2. factor-free local solves: T_s⁻¹ applied to [rhs | U_s | e_0·Bᵀ |
       e_{L-1}·B] by the scan-based block Thomas (block_tridiag.py)
    3. build the reduced interface system in z = (x_{s,0}, x_{s,L-1} ∀s, x_u)
       of size (2·S·p + nu): boundary rows from the SPIKE identities,
       universal row from Schur elimination; all terms are local products
       psum/all_gathered
    4. solve the reduced system replicated (it is tiny), broadcast, and
       back-substitute locally: x_s = T_s⁻¹b − V_s·x_left − W_s·x_right −
       (T_s⁻¹U_s)·x_u

Restrictions: sequence errors must have window ≤ 2 (the common smoothness
case; wider stencils aggregate into superframes first — not yet wired into
the sharded path) and F must divide evenly by the axis size.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from momentum_tpu.sequence.block_tridiag import block_tridiag_solve
from momentum_tpu.sequence.solver import SequenceSolveResult, _single_frame_theta
from momentum_tpu.sequence.solver_function import SequenceSolverFunction
from momentum_tpu.solver.gauss_newton import SolverOptions, _converged

__all__ = ["solve_sequence_sharded"]


def _local_normal_equations(fn: SequenceSolverFunction, pf_local, u, axis):
    """Per-shard block assembly with left-halo window evaluation.

    pf_local: (L, p) local frames. Returns
    (diag (L,p,p), off (L-1,p,p), b_edge (p,p) coupling last-local→next-first,
     uc (L,p,nu), ublock (nu,nu), rhs (L,p), rhs_u (nu,))
    """
    l_frames, p = pf_local.shape
    nu = fn.num_universal
    dtype = pf_local.dtype
    s_count = jax.lax.axis_size(axis)
    s_idx = jax.lax.axis_index(axis)

    # ---- per-frame errors (pure data parallel) ----
    def frame_res(pf_f, u_, ef_f):
        return fn.frame_residual(_single_frame_theta(fn, pf_f, u_), ef_f)

    def frame_jac(pf_f, u_, ef_f):
        jac, rows = jax.jacfwd(
            lambda a, b: (frame_res(a, b, ef_f),) * 2, argnums=(0, 1), has_aux=True
        )(pf_f, u_)
        return rows, jac[0], jac[1]

    rows, j_pf, j_u = jax.vmap(frame_jac, in_axes=(0, None, 0))(
        pf_local, u, fn.per_frame_errors)
    diag = jnp.einsum("frp,frq->fpq", j_pf, j_pf)
    uc = jnp.einsum("frp,fru->fpu", j_pf, j_u)
    ublock = jnp.einsum("fru,frv->uv", j_u, j_u)
    rhs = jnp.einsum("frp,fr->fp", j_pf, rows)
    rhs_u = jnp.einsum("fru,fr->u", j_u, rows)

    off = jnp.zeros((max(l_frames - 1, 0), p, p), dtype)
    b_edge = jnp.zeros((p, p), dtype)

    # ---- window-2 sequence errors ----
    # halo: next shard's first frame (for windows starting locally),
    # and we re-evaluate the left-boundary window for our first frame's rows.
    right_halo = jax.lax.ppermute(
        pf_local[0], axis, [(i, (i - 1) % s_count) for i in range(s_count)])
    left_halo = jax.lax.ppermute(
        pf_local[-1], axis, [(i, (i + 1) % s_count) for i in range(s_count)])
    is_first = s_idx == 0
    is_last = s_idx == s_count - 1

    for sef in fn.sequence_errors:
        if sef.window != 2:
            raise NotImplementedError(
                "sharded sequence solve currently supports window-2 errors only")

        def seq_res(pf_pair, u_, sef=sef):
            thetas = jax.vmap(lambda x: _single_frame_theta(fn, x, u_))(pf_pair)
            ctxs = jax.vmap(fn._context)(thetas)
            return sef.residual(fn.character, ctxs)

        def seq_jac(pf_pair, u_):
            jac, r_ = jax.jacfwd(
                lambda a, b: (seq_res(a, b),) * 2, argnums=(0, 1), has_aux=True
            )(pf_pair, u_)
            return r_, jac[0], jac[1]  # (R,), (R, 2, p), (R, nu)

        # windows starting at local frames 0..L-1 (the last pairs with the halo)
        starts = jnp.concatenate([pf_local, right_halo[None]], axis=0)
        pairs = jnp.stack([starts[:-1], starts[1:]], axis=1)  # (L, 2, p)
        s_rows, s_jw, s_ju = jax.vmap(seq_jac, in_axes=(0, None))(pairs, u)
        # the global last frame starts no window: mask it out on the last shard
        valid = jnp.where(
            is_last,
            jnp.arange(l_frames) < l_frames - 1,
            jnp.ones(l_frames, bool),
        ).astype(dtype)
        s_rows = s_rows * valid[:, None]
        s_jw = s_jw * valid[:, None, None, None]
        s_ju = s_ju * valid[:, None, None]

        j1 = s_jw[:, :, 0, :]
        j2 = s_jw[:, :, 1, :]
        # owner contributions (start frame local)
        diag = diag + jnp.einsum("frp,frq->fpq", j1, j1)
        rhs = rhs + jnp.einsum("frp,fr->fp", j1, s_rows)
        uc = uc + jnp.einsum("frp,fru->fpu", j1, s_ju)
        ublock = ublock + jnp.einsum("fru,frv->uv", s_ju, s_ju)
        rhs_u = rhs_u + jnp.einsum("fru,fr->u", s_ju, s_rows)
        # end-frame contributions for windows fully inside the shard
        diag = diag.at[1:].add(jnp.einsum("frp,frq->fpq", j2[:-1], j2[:-1]))
        rhs = rhs.at[1:].add(jnp.einsum("frp,fr->fp", j2[:-1], s_rows[:-1]))
        uc = uc.at[1:].add(jnp.einsum("frp,fru->fpu", j2[:-1], s_ju[:-1]))
        off = off + jnp.einsum("frp,frq->fpq", j1[:-1], j2[:-1])
        # boundary coupling (last local frame → next shard's first)
        b_edge = b_edge + jnp.einsum("rp,rq->pq", j1[-1], j2[-1])

        # left-boundary window: rows of OUR first frame (end of the window
        # owned by the left neighbor) — re-evaluate with the left halo
        pair_l = jnp.stack([left_halo, pf_local[0]], axis=0)
        lb_rows, lb_jw, lb_ju = seq_jac(pair_l, u)
        w_l = jnp.where(is_first, 0.0, 1.0).astype(dtype)
        j2l = lb_jw[:, 1, :] * w_l
        diag = diag.at[0].add(jnp.einsum("rp,rq->pq", j2l, j2l))
        rhs = rhs.at[0].add(jnp.einsum("rp,r->p", j2l, lb_rows * w_l))
        uc = uc.at[0].add(jnp.einsum("rp,ru->pu", j2l, lb_ju * w_l[..., None] if lb_ju.ndim == 2 else lb_ju))

    return diag, off, b_edge, uc, ublock, rhs, rhs_u


def _sharded_step(fn, pf_local, u, opts, axis):
    """One GN step: assemble + SPIKE solve. Returns (d_pf_local, d_u)."""
    l_frames, p = pf_local.shape
    nu = fn.num_universal
    s_count = jax.lax.axis_size(axis)
    s_idx = jax.lax.axis_index(axis)
    dtype = pf_local.dtype

    diag, off, b_edge, uc, ublock, rhs, rhs_u = _local_normal_equations(
        fn, pf_local, u, axis)
    diag = diag + opts.regularization * jnp.eye(p, dtype=dtype)[None]

    # left edge coupling (from the left neighbor's b_edge)
    b_left = jax.lax.ppermute(
        b_edge, axis, [(i, (i + 1) % s_count) for i in range(s_count)])
    not_first = jnp.where(s_idx == 0, 0.0, 1.0).astype(dtype)
    not_last = jnp.where(s_idx == s_count - 1, 0.0, 1.0).astype(dtype)
    b_left = b_left * not_first
    b_edge = b_edge * not_last

    # local solves: T⁻¹ [rhs | U | e0·B_leftᵀ | e_{L-1}·B_edge]
    n_rhs = 1 + nu + 2 * p
    big_rhs = jnp.zeros((l_frames, p, n_rhs), dtype)
    big_rhs = big_rhs.at[:, :, 0].set(rhs)
    if nu:
        big_rhs = big_rhs.at[:, :, 1:1 + nu].set(uc)
    big_rhs = big_rhs.at[0, :, 1 + nu:1 + nu + p].set(b_left.T)
    big_rhs = big_rhs.at[l_frames - 1, :, 1 + nu + p:].set(b_edge)
    sol = block_tridiag_solve(diag, off, big_rhs)
    g = sol[:, :, 0]  # T⁻¹ rhs (L, p)
    tiu = sol[:, :, 1:1 + nu]  # T⁻¹ U (L, p, nu)
    v_spike = sol[:, :, 1 + nu:1 + nu + p]  # T⁻¹ e0 B_leftᵀ
    w_spike = sol[:, :, 1 + nu + p:]  # T⁻¹ e_{L-1} B_edge

    # reduced system pieces (rows for x_{s,0} and x_{s,L-1})
    #   x_{s,0}    + V[0]   x_{s-1,L-1} + W[0]   x_{s+1,0} + TiU[0] x_u   = g[0]
    #   x_{s,L-1}  + V[L-1] x_{s-1,L-1} + W[L-1] x_{s+1,0} + TiU[L-1] x_u = g[L-1]
    # universal row: Σ_s U_sᵀ x_s + (S + reg) x_u = b_u →
    #   Σ_s [Uᵀg − UᵀV x_{s-1,L-1} − UᵀW x_{s+1,0} − UᵀTiU x_u] + S x_u = b_u
    ut_g = jnp.einsum("fpu,fp->u", uc, g)
    ut_v = jnp.einsum("fpu,fpq->uq", uc, v_spike)
    ut_w = jnp.einsum("fpu,fpq->uq", uc, w_spike)
    ut_tiu = jnp.einsum("fpu,fpv->uv", uc, tiu)

    gathered = jax.lax.all_gather(
        (g[0], g[-1], v_spike[0], v_spike[-1], w_spike[0], w_spike[-1],
         tiu[0], tiu[-1], ut_g, ut_v, ut_w, ut_tiu), axis)
    (g0_all, gl_all, v0_all, vl_all, w0_all, wl_all,
     tiu0_all, tiul_all, utg_all, utv_all, utw_all, uttiu_all) = gathered
    ublock_sum = jax.lax.psum(ublock, axis) + opts.regularization * jnp.eye(nu, dtype=dtype)
    rhs_u_sum = jax.lax.psum(rhs_u, axis)

    # replicated reduced system: unknowns z = [x_{0,0}, x_{0,L-1}, ...,
    # x_{S-1,0}, x_{S-1,L-1}, x_u]
    n_red = 2 * s_count * p + nu
    a_red = jnp.zeros((n_red, n_red), dtype)
    b_red = jnp.zeros((n_red,), dtype)
    eye_p = jnp.eye(p, dtype=dtype)

    def first_idx(s):
        return 2 * s * p

    def last_idx(s):
        return (2 * s + 1) * p

    # python loop over shards is fine: s_count is static inside shard_map
    for s in range(int(s_count)):
        sl = (s - 1) % int(s_count)
        sr = (s + 1) % int(s_count)
        r0 = first_idx(s)
        r1 = last_idx(s)
        a_red = a_red.at[r0:r0 + p, r0:r0 + p].add(eye_p)
        a_red = a_red.at[r1:r1 + p, r1:r1 + p].add(eye_p)
        a_red = a_red.at[r0:r0 + p, last_idx(sl):last_idx(sl) + p].add(v0_all[s])
        a_red = a_red.at[r1:r1 + p, last_idx(sl):last_idx(sl) + p].add(vl_all[s])
        a_red = a_red.at[r0:r0 + p, first_idx(sr):first_idx(sr) + p].add(w0_all[s])
        a_red = a_red.at[r1:r1 + p, first_idx(sr):first_idx(sr) + p].add(wl_all[s])
        if nu:
            a_red = a_red.at[r0:r0 + p, 2 * s_count * p:].add(tiu0_all[s])
            a_red = a_red.at[r1:r1 + p, 2 * s_count * p:].add(tiul_all[s])
            # universal row
            a_red = a_red.at[2 * s_count * p:, last_idx(sl):last_idx(sl) + p].add(
                -utv_all[s])
            a_red = a_red.at[2 * s_count * p:, first_idx(sr):first_idx(sr) + p].add(
                -utw_all[s])
        b_red = b_red.at[r0:r0 + p].set(g0_all[s])
        b_red = b_red.at[r1:r1 + p].set(gl_all[s])
    if nu:
        u_row = 2 * s_count * p
        a_red = a_red.at[u_row:, u_row:].add(ublock_sum - jnp.sum(uttiu_all, axis=0))
        b_red = b_red.at[u_row:].set(rhs_u_sum - jnp.sum(utg_all, axis=0))

    z = jnp.linalg.solve(a_red, b_red)
    d_u = z[2 * s_count * p:] if nu else jnp.zeros((0,), dtype)

    # local back-substitution
    x_left = jax.lax.dynamic_slice(
        z, ((2 * ((s_idx - 1) % s_count) + 1) * p,), (p,))  # x_{s-1, L-1}
    x_right = jax.lax.dynamic_slice(
        z, (2 * ((s_idx + 1) % s_count) * p,), (p,))  # x_{s+1, 0}
    d_pf = g - jnp.einsum("fpq,q->fp", v_spike, x_left) \
        - jnp.einsum("fpq,q->fp", w_spike, x_right)
    if nu:
        d_pf = d_pf - jnp.einsum("fpu,u->fp", tiu, d_u)
    return d_pf, d_u


def solve_sequence_sharded(
    fn: SequenceSolverFunction,
    pf0: jnp.ndarray,
    u0: jnp.ndarray,
    mesh: Mesh,
    axis: str = "seq",
    options: SolverOptions = SolverOptions(),
) -> SequenceSolveResult:
    """GN sequence solve with frames sharded over `mesh[axis]`. The result
    matches `solve_sequence` (tested on a virtual CPU mesh)."""
    from jax import shard_map

    opts = options
    f_total = fn.num_frames
    n_dev = mesh.shape[axis]
    if f_total % n_dev != 0:
        raise ValueError(f"frames ({f_total}) must divide evenly across {n_dev} devices")

    pf_spec = P(axis)
    rep = P()

    # error-function pytrees: frame-stacked arrays shard along F; everything
    # else is replicated. We shard any leaf whose leading dim == F.
    def ef_spec(leaf):
        return P(axis) if (hasattr(leaf, "shape") and leaf.ndim >= 1
                           and leaf.shape[0] == f_total) else P()

    ef_specs = jax.tree_util.tree_map(ef_spec, fn.per_frame_errors)
    seq_specs = jax.tree_util.tree_map(lambda _: P(), fn.sequence_errors)
    char_specs = jax.tree_util.tree_map(lambda _: P(), fn.character)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(char_specs, ef_specs, seq_specs, pf_spec, rep),
        out_specs=(pf_spec, rep, rep, rep, rep),
        check_vma=False,
    )
    def run(character, per_frame_errors, sequence_errors, pf, u):
        import dataclasses as _dc

        fn_local = _dc.replace(
            fn, character=character, per_frame_errors=per_frame_errors,
            sequence_errors=sequence_errors)

        def body(state):
            pf_, u_, last_err, it, done = state
            d_pf, d_u = _sharded_step(fn_local, pf_, u_, opts, axis)
            # energy: local per-frame + owned windows, psum'd
            err = _sharded_error(fn_local, pf_, u_, axis)
            pf_new = jnp.where(done, pf_, pf_ - d_pf)
            u_new = jnp.where(done, u_, u_ - d_u)
            conv = _converged(last_err, err, opts.threshold)
            newly = (it + 1 >= opts.min_iterations) & conv
            return pf_new, u_new, jnp.where(done, last_err, err), it + 1, done | newly

        def cond(state):
            _, _, _, it, done = state
            return (it < opts.max_iterations) & (~done)

        big = jnp.asarray(jnp.finfo(jnp.float32).max, pf.dtype)
        init = (pf, u, big, jnp.asarray(0, jnp.int32), jnp.asarray(False))
        pf_out, u_out, err, it, done = jax.lax.while_loop(cond, body, init)
        return pf_out, u_out, err, it, done

    pf_res, u_res, err, it, done = run(
        fn.character, fn.per_frame_errors, fn.sequence_errors, pf0, u0)
    return SequenceSolveResult(pf_res, u_res, err, it, done)


def _sharded_error(fn, pf_local, u, axis):
    """Total energy with window ownership by start frame (psum-reduced)."""
    s_count = jax.lax.axis_size(axis)
    s_idx = jax.lax.axis_index(axis)
    l_frames = pf_local.shape[0]

    def frame_theta(pf_f):
        return _single_frame_theta(fn, pf_f, u)

    thetas = jax.vmap(frame_theta)(pf_local)
    per_frame = jax.vmap(fn.frame_error)(thetas, fn.per_frame_errors)
    total = jnp.sum(per_frame)

    if fn.sequence_errors:
        right_halo = jax.lax.ppermute(
            pf_local[0], axis, [(i, (i - 1) % s_count) for i in range(s_count)])
        starts = jnp.concatenate([pf_local, right_halo[None]], axis=0)
        pairs = jnp.stack([starts[:-1], starts[1:]], axis=1)
        valid = jnp.where(s_idx == s_count - 1,
                          jnp.arange(l_frames) < l_frames - 1,
                          jnp.ones(l_frames, bool))
        for sef in fn.sequence_errors:
            def win_err(pf_pair):
                th = jax.vmap(frame_theta)(pf_pair)
                ctxs = jax.vmap(fn._context)(th)
                return sef.error(fn.character, ctxs)

            errs = jax.vmap(win_err)(pairs)
            total = total + jnp.sum(jnp.where(valid, errs, 0.0))
    return jax.lax.psum(total, axis)
