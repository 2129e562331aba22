"""Multi-device sequence solve: frames sharded over a mesh axis.

This is the TPU replacement for the reference's single-machine banded QR
(SURVEY.md §2.9 / §5): long sequence solves shard their frames across chips,
Jacobian assembly is embarrassingly parallel (the reference's dispenso frame
loop, sequence_solver.cpp:235-370), the temporal band is solved by
substructuring (a block SPIKE algorithm), and the shared "universal"
parameters ride an all-reduce — the reference's "serialize the common
columns" (online_householder_qr.h:369-410) becomes a psum.

Bandwidth is auto-computed from the widest sequence-error window, matching
the reference (sequence_solver.cpp:54-57): windows of width w ≤ q+1 are
aggregated into superframes of q frames (block_tridiag.banded_to_tridiag), so
accel (w=3) / jerk (w=4) stencils shard exactly like smoothness (w=2).
Arbitrary frame counts are supported by padding to a shard-divisible count
with zero-weight frames.

Assembly is owner-computes: every window is evaluated once, by the shard
owning its START frame, against a q-frame right halo (one ppermute of the
neighbor's first frames). Contributions that land on neighbor-owned frames
(the window's tail) are shipped right with a second ppermute and added into
the neighbor's head blocks — the reference's disjoint-column banded update
(zeroBandedPart) with the cross-boundary rows exchanged explicitly.

Per GN iteration:
  1. per-shard: per-frame + windowed Jacobians → extended banded blocks
     (L+q frames of diag/off/universal/rhs), tail shipped right
  2. aggregate L local frames into G = L/q superframes (qp-sized blocks);
     the shard-edge coupling becomes ONE (qp, qp) superblock
  3. factor-free local solves: T_s⁻¹ applied to [rhs | U_s | e_0·B_leftᵀ |
     e_{G-1}·B] by the scan-based block Thomas (block_tridiag.py)
  4. reduced SPIKE interface system in z = (x_{s,0}, x_{s,G-1} ∀s, x_u) of
     size (2·S·qp + nu), built from all_gathered local products, solved
     replicated (it is tiny), then local back-substitution.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from momentum_tpu.sequence.block_tridiag import banded_to_tridiag, block_tridiag_solve
from momentum_tpu.sequence.solver import (
    SequenceSolveResult,
    _single_frame_theta,
    make_frame_jacobian,
)
from momentum_tpu.sequence.solver_function import SequenceSolverFunction
from momentum_tpu.solver.gauss_newton import SolverOptions, _converged

__all__ = ["solve_sequence_sharded"]


def _bandwidth(fn: SequenceSolverFunction) -> int:
    """Half-bandwidth q = max window − 1 (sequence_solver.cpp:54-57)."""
    q = 1
    for sef in fn.sequence_errors:
        q = max(q, sef.window - 1)
    return q


def _shift_left(x, axis, s_count):
    """Receive from the RIGHT neighbor (shard s gets shard s+1's value)."""
    perm = [(i, (i - 1) % s_count) for i in range(s_count)]
    return jax.tree_util.tree_map(
        lambda a: jax.lax.ppermute(a, axis, perm), x)


def _shift_right(x, axis, s_count):
    """Receive from the LEFT neighbor (shard s gets shard s-1's value)."""
    perm = [(i, (i + 1) % s_count) for i in range(s_count)]
    return jax.tree_util.tree_map(
        lambda a: jax.lax.ppermute(a, axis, perm), x)


def _local_normal_equations(fn, pf_local, u, axis, q, f_real):
    """Owner-computes banded assembly with a q-frame right halo.

    pf_local: (L, p) local frames. Returns
    (diag (L,p,p), offs [d=1..q each (L-d,p,p)], edge (qp,qp) coupling the
     last local superframe to the next shard's first, uc (L,p,nu),
     ublock (nu,nu), rhs (L,p), rhs_u (nu,)).
    Windows whose global span exceeds f_real are masked out, which makes the
    last shard's shipped tail (and the wrap-around edge) exactly zero.
    """
    l_frames, p = pf_local.shape
    nu = fn.num_universal
    dtype = pf_local.dtype
    s_count = jax.lax.axis_size(axis)
    s_idx = jax.lax.axis_index(axis)

    # ---- per-frame errors (pure data parallel; analytic fast path) ----
    frame_jac = make_frame_jacobian(fn)
    rows, j_pf, j_u = jax.vmap(frame_jac, in_axes=(0, None, 0))(
        pf_local, u, fn.per_frame_errors)

    le = l_frames + q  # extended (local + halo) frame range
    diag = jnp.zeros((le, p, p), dtype)
    uc = jnp.zeros((le, p, nu), dtype)
    rhs = jnp.zeros((le, p), dtype)
    offs = [jnp.zeros((le, p, p), dtype) for _ in range(q)]
    ublock = jnp.einsum("fru,frv->uv", j_u, j_u)
    rhs_u = jnp.einsum("fru,fr->u", j_u, rows)
    diag = diag.at[:l_frames].add(jnp.einsum("frp,frq->fpq", j_pf, j_pf))
    uc = uc.at[:l_frames].add(jnp.einsum("frp,fru->fpu", j_pf, j_u))
    rhs = rhs.at[:l_frames].add(jnp.einsum("frp,fr->fp", j_pf, rows))

    # ---- sequence errors: windows starting at local frames ----
    if fn.sequence_errors:
        halo = _shift_left(pf_local[:q], axis, s_count)  # next shard's head
        pf_ext = jnp.concatenate([pf_local, halo], axis=0)  # (L+q, p)
        g_start = s_idx * l_frames + jnp.arange(l_frames)  # global starts

        for sef in fn.sequence_errors:
            w = sef.window

            def seq_res(pf_win, u_, sef=sef):
                thetas = jax.vmap(
                    lambda x: _single_frame_theta(fn, x, u_))(pf_win)
                ctxs = jax.vmap(fn._context)(thetas)
                return sef.residual(fn.character, ctxs)

            def seq_jac(pf_win, u_):
                jac, r_ = jax.jacfwd(
                    lambda a, b: (seq_res(a, b),) * 2, argnums=(0, 1),
                    has_aux=True)(pf_win, u_)
                return r_, jac[0], jac[1]  # (R,), (R, W, p), (R, nu)

            win_idx = jnp.arange(l_frames)[:, None] + jnp.arange(w)[None, :]
            wins = pf_ext[win_idx]  # (L, W, p)
            s_rows, s_jw, s_ju = jax.vmap(seq_jac, in_axes=(0, None))(wins, u)
            # a window starting at global g spans [g, g+w-1]; valid iff
            # g + w - 1 ≤ f_real - 1
            valid = (g_start <= f_real - w).astype(dtype)
            s_rows = s_rows * valid[:, None]
            s_jw = s_jw * valid[:, None, None, None]
            s_ju = s_ju * valid[:, None, None]

            base = jnp.arange(l_frames)
            for k in range(w):
                jk = s_jw[:, :, k, :]  # (L, R, p) — columns of frame start+k
                diag = diag.at[base + k].add(
                    jnp.einsum("frp,frq->fpq", jk, jk))
                rhs = rhs.at[base + k].add(
                    jnp.einsum("frp,fr->fp", jk, s_rows))
                uc = uc.at[base + k].add(
                    jnp.einsum("frp,fru->fpu", jk, s_ju))
                for d in range(1, w - k):
                    jkd = s_jw[:, :, k + d, :]
                    offs[d - 1] = offs[d - 1].at[base + k].add(
                        jnp.einsum("frp,frq->fpq", jk, jkd))
            ublock = ublock + jnp.einsum("fru,frv->uv", s_ju, s_ju)
            rhs_u = rhs_u + jnp.einsum("fru,fr->u", s_ju, s_rows)

        # ---- ship the tail (contributions to neighbor-owned frames) ----
        tail = (diag[l_frames:], rhs[l_frames:], uc[l_frames:],
                jnp.stack([o[l_frames:l_frames + q] for o in offs]))
        r_diag, r_rhs, r_uc, r_offs = _shift_right(tail, axis, s_count)
        diag = diag.at[:q].add(r_diag)
        rhs = rhs.at[:q].add(r_rhs)
        uc = uc.at[:q].add(r_uc)
        offs = [o.at[:q].add(r_offs[d]) for d, o in enumerate(offs)]

    # ---- split in-shard band vs shard-edge superblock ----
    qp = q * p
    edge = jnp.zeros((qp, qp), dtype)
    for d in range(1, q + 1):
        for i in range(q - d, q):  # f = L - q + i couples into the halo
            f = l_frames - q + i
            j = i + d - q  # column superframe-local index of frame f + d
            if 0 <= j < q and 0 <= f < l_frames:
                edge = edge.at[i * p:(i + 1) * p, j * p:(j + 1) * p].add(
                    offs[d - 1][f])
    return (diag[:l_frames], [offs[d - 1][:l_frames - d] for d in range(1, q + 1)],
            edge, uc[:l_frames], ublock, rhs[:l_frames], rhs_u)


def _sharded_step(fn, pf_local, u, opts, axis, q, f_real):
    """One GN step: assemble + superblock SPIKE solve → (d_pf_local, d_u)."""
    l_frames, p = pf_local.shape
    nu = fn.num_universal
    s_count = jax.lax.axis_size(axis)
    s_idx = jax.lax.axis_index(axis)
    dtype = pf_local.dtype
    qp = q * p
    g_blocks = l_frames // q  # superframes per shard

    diag, offs, b_edge, uc, ublock, rhs, rhs_u = _local_normal_equations(
        fn, pf_local, u, axis, q, f_real)
    diag = diag + opts.regularization * jnp.eye(p, dtype=dtype)[None]

    # GLOBAL per-DoF Jacobi equilibration + roundoff jitter + per-frame
    # pivot floor: same guards and SAME scale as solve_sequence (f32 JᵀJ on
    # mm-scale data is indefinite at roundoff — fatal to the block
    # factorization; the global D leaves near-zero pivots in frames where a
    # DoF is unobserved — see the sizing comments in sequence/solver.py).
    # pmax of local maxes == the single-device global max, so both solvers
    # apply an identical D, and the floor depends only on local scaled
    # diagonals; edge-coupling blocks scale locally with no halo traffic.
    from momentum_tpu.sequence.solver import (_EQUILIBRATED_DIAG_FLOOR,
                                              _EQUILIBRATED_JITTER,
                                              _EQUILIBRATED_JITTER_U)

    dloc = jnp.diagonal(diag, axis1=-2, axis2=-1)  # (l_frames, p)
    s_g = jax.lax.rsqrt(jnp.maximum(
        jax.lax.pmax(jnp.max(dloc, axis=0), axis), 1e-30))  # (p,)
    diag = diag * s_g[None, :, None] * s_g[None, None, :]
    dsc = jnp.diagonal(diag, axis1=-2, axis2=-1)  # (l_frames, p), ≤ 1
    lift = (jnp.maximum(_EQUILIBRATED_DIAG_FLOOR - dsc, 0.0)
            + _EQUILIBRATED_JITTER)
    diag = diag + lift[..., None] * jnp.eye(p, dtype=dtype)
    offs = [o * s_g[None, :, None] * s_g[None, None, :] for o in offs]
    s_qp_vec = jnp.tile(s_g, q)
    b_edge = b_edge * s_qp_vec[:, None] * s_qp_vec[None, :]
    ublock_sum = jax.lax.psum(ublock, axis) \
        + opts.regularization * jnp.eye(nu, dtype=dtype)
    s_u = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(ublock_sum), 1e-30))
    ublock_sum = ublock_sum * s_u[:, None] * s_u[None, :] \
        + _EQUILIBRATED_JITTER_U * jnp.eye(nu, dtype=dtype)
    uc = uc * s_g[None, :, None] * s_u[None, None, :]
    rhs = rhs * s_g[None, :]
    rhs_u = rhs_u * s_u

    # aggregate to superblocks: in-shard band → tridiagonal of qp-blocks
    if q == 1:
        sd, su = diag, offs[0]
    else:
        sd, su = banded_to_tridiag(diag, offs)
    uc_s = uc.reshape(g_blocks, qp, nu)
    rhs_s = rhs.reshape(g_blocks, qp)

    # edge coupling from the left neighbor
    b_left = _shift_right(b_edge, axis, s_count)
    not_first = jnp.where(s_idx == 0, 0.0, 1.0).astype(dtype)
    not_last = jnp.where(s_idx == s_count - 1, 0.0, 1.0).astype(dtype)
    b_left = b_left * not_first
    b_edge = b_edge * not_last

    # local solves: T⁻¹ [rhs | U | e0·B_leftᵀ | e_{G-1}·B_edge]
    n_rhs = 1 + nu + 2 * qp
    big_rhs = jnp.zeros((g_blocks, qp, n_rhs), dtype)
    big_rhs = big_rhs.at[:, :, 0].set(rhs_s)
    if nu:
        big_rhs = big_rhs.at[:, :, 1:1 + nu].set(uc_s)
    big_rhs = big_rhs.at[0, :, 1 + nu:1 + nu + qp].set(b_left.T)
    big_rhs = big_rhs.at[g_blocks - 1, :, 1 + nu + qp:].set(b_edge)
    sol = block_tridiag_solve(sd, su, big_rhs)
    g = sol[:, :, 0]  # T⁻¹ rhs (G, qp)
    tiu = sol[:, :, 1:1 + nu]  # T⁻¹ U (G, qp, nu)
    v_spike = sol[:, :, 1 + nu:1 + nu + qp]  # T⁻¹ e0 B_leftᵀ
    w_spike = sol[:, :, 1 + nu + qp:]  # T⁻¹ e_{G-1} B_edge

    # reduced system pieces (rows for x_{s,0} and x_{s,G-1})
    #   x_{s,0}    + V[0]   x_{s-1,G-1} + W[0]   x_{s+1,0} + TiU[0] x_u   = g[0]
    #   x_{s,G-1}  + V[G-1] x_{s-1,G-1} + W[G-1] x_{s+1,0} + TiU[G-1] x_u = g[G-1]
    # universal row: Σ_s U_sᵀ x_s + (S + reg) x_u = b_u →
    #   Σ_s [Uᵀg − UᵀV x_{s-1,G-1} − UᵀW x_{s+1,0} − UᵀTiU x_u] + S x_u = b_u
    ut_g = jnp.einsum("fpu,fp->u", uc_s, g)
    ut_v = jnp.einsum("fpu,fpq->uq", uc_s, v_spike)
    ut_w = jnp.einsum("fpu,fpq->uq", uc_s, w_spike)
    ut_tiu = jnp.einsum("fpu,fpv->uv", uc_s, tiu)

    gathered = jax.lax.all_gather(
        (g[0], g[-1], v_spike[0], v_spike[-1], w_spike[0], w_spike[-1],
         tiu[0], tiu[-1], ut_g, ut_v, ut_w, ut_tiu), axis)
    (g0_all, gl_all, v0_all, vl_all, w0_all, wl_all,
     tiu0_all, tiul_all, utg_all, utv_all, utw_all, uttiu_all) = gathered
    rhs_u_sum = jax.lax.psum(rhs_u, axis)

    # replicated reduced system: unknowns z = [x_{0,0}, x_{0,G-1}, ...,
    # x_{S-1,0}, x_{S-1,G-1}, x_u]
    n_red = 2 * s_count * qp + nu
    a_red = jnp.zeros((n_red, n_red), dtype)
    b_red = jnp.zeros((n_red,), dtype)
    eye_p = jnp.eye(qp, dtype=dtype)

    def first_idx(s):
        return 2 * s * qp

    def last_idx(s):
        return (2 * s + 1) * qp

    # python loop over shards is fine: s_count is static inside shard_map
    for s in range(int(s_count)):
        sl = (s - 1) % int(s_count)
        sr = (s + 1) % int(s_count)
        r0 = first_idx(s)
        r1 = last_idx(s)
        a_red = a_red.at[r0:r0 + qp, r0:r0 + qp].add(eye_p)
        a_red = a_red.at[r1:r1 + qp, r1:r1 + qp].add(eye_p)
        a_red = a_red.at[r0:r0 + qp, last_idx(sl):last_idx(sl) + qp].add(v0_all[s])
        a_red = a_red.at[r1:r1 + qp, last_idx(sl):last_idx(sl) + qp].add(vl_all[s])
        a_red = a_red.at[r0:r0 + qp, first_idx(sr):first_idx(sr) + qp].add(w0_all[s])
        a_red = a_red.at[r1:r1 + qp, first_idx(sr):first_idx(sr) + qp].add(wl_all[s])
        if nu:
            a_red = a_red.at[r0:r0 + qp, 2 * s_count * qp:].add(tiu0_all[s])
            a_red = a_red.at[r1:r1 + qp, 2 * s_count * qp:].add(tiul_all[s])
            # universal row
            a_red = a_red.at[2 * s_count * qp:, last_idx(sl):last_idx(sl) + qp].add(
                -utv_all[s])
            a_red = a_red.at[2 * s_count * qp:, first_idx(sr):first_idx(sr) + qp].add(
                -utw_all[s])
        b_red = b_red.at[r0:r0 + qp].set(g0_all[s])
        b_red = b_red.at[r1:r1 + qp].set(gl_all[s])
    if nu:
        u_row = 2 * s_count * qp
        a_red = a_red.at[u_row:, u_row:].add(ublock_sum - jnp.sum(uttiu_all, axis=0))
        b_red = b_red.at[u_row:].set(rhs_u_sum - jnp.sum(utg_all, axis=0))

    z = jnp.linalg.solve(a_red, b_red)
    d_u = z[2 * s_count * qp:] if nu else jnp.zeros((0,), dtype)

    # local back-substitution
    x_left = jax.lax.dynamic_slice(
        z, ((2 * ((s_idx - 1) % s_count) + 1) * qp,), (qp,))  # x_{s-1, G-1}
    x_right = jax.lax.dynamic_slice(
        z, (2 * ((s_idx + 1) % s_count) * qp,), (qp,))  # x_{s+1, 0}
    d_pf = g - jnp.einsum("fpq,q->fp", v_spike, x_left) \
        - jnp.einsum("fpq,q->fp", w_spike, x_right)
    if nu:
        d_pf = d_pf - jnp.einsum("fpu,u->fp", tiu, d_u)
    # undo the equilibration: the solved unknowns are D⁻½-scaled
    return d_pf.reshape(l_frames, p) * s_g[None, :], d_u * s_u


def solve_sequence_sharded(
    fn: SequenceSolverFunction,
    pf0: jnp.ndarray,
    u0: jnp.ndarray,
    mesh: Mesh,
    axis: str = "seq",
    options: SolverOptions = SolverOptions(),
) -> SequenceSolveResult:
    """GN sequence solve with frames sharded over `mesh[axis]`. The result
    matches `solve_sequence` (tested on a virtual CPU mesh). Arbitrary frame
    counts and sequence-error windows are supported: frames pad to a
    shard-divisible count with zero-weight frames, windows > 2 aggregate into
    superframes."""
    from jax import shard_map

    opts = options
    f_real = fn.num_frames
    n_dev = mesh.shape[axis]
    q = _bandwidth(fn)
    chunk = n_dev * q
    f_pad = ((f_real + chunk - 1) // chunk) * chunk
    pad = f_pad - f_real

    per_frame_errors = fn.per_frame_errors
    pf0_p = pf0
    if pad:
        # zero-weight padding frames: residual rows scale by sqrt(weight·w)=0,
        # so their Jacobians and energies vanish; diag blocks become reg·I
        pf0_p = jnp.concatenate(
            [pf0, jnp.zeros((pad,) + pf0.shape[1:], pf0.dtype)], axis=0)
        per_frame_errors = jax.tree_util.tree_map(
            lambda x: jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
            if (hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == f_real)
            else x,
            fn.per_frame_errors)
    import dataclasses as _dc

    fn_pad = _dc.replace(fn, per_frame_errors=per_frame_errors,
                         num_frames=f_pad)

    pf_spec = P(axis)
    rep = P()

    # error-function pytrees: frame-stacked arrays shard along F; everything
    # else is replicated. We shard any leaf whose leading dim == F.
    def ef_spec(leaf):
        return P(axis) if (hasattr(leaf, "shape") and leaf.ndim >= 1
                           and leaf.shape[0] == f_pad) else P()

    ef_specs = jax.tree_util.tree_map(ef_spec, fn_pad.per_frame_errors)
    seq_specs = jax.tree_util.tree_map(lambda _: P(), fn_pad.sequence_errors)
    char_specs = jax.tree_util.tree_map(lambda _: P(), fn_pad.character)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(char_specs, ef_specs, seq_specs, pf_spec, rep),
        out_specs=(pf_spec, rep, rep, rep, rep),
        check_vma=False,
    )
    def run(character, per_frame_errors, sequence_errors, pf, u):
        import dataclasses as _dc

        fn_local = _dc.replace(
            fn_pad, character=character, per_frame_errors=per_frame_errors,
            sequence_errors=sequence_errors)

        def body(state):
            pf_, u_, last_err, it, done = state
            d_pf, d_u = _sharded_step(fn_local, pf_, u_, opts, axis, q, f_real)
            # energy: local per-frame + owned windows, psum'd
            err = _sharded_error(fn_local, pf_, u_, axis, q, f_real)
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
        fn_pad.character, fn_pad.per_frame_errors, fn_pad.sequence_errors,
        pf0_p, u0)
    return SequenceSolveResult(pf_res[:f_real], u_res, err, it, done)


def _sharded_error(fn, pf_local, u, axis, q, f_real):
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
        halo = _shift_left(pf_local[:q], axis, s_count)
        pf_ext = jnp.concatenate([pf_local, halo], axis=0)
        g_start = s_idx * l_frames + jnp.arange(l_frames)
        for sef in fn.sequence_errors:
            w = sef.window
            win_idx = jnp.arange(l_frames)[:, None] + jnp.arange(w)[None, :]
            wins = pf_ext[win_idx]

            def win_err(pf_win):
                th = jax.vmap(frame_theta)(pf_win)
                ctxs = jax.vmap(fn._context)(th)
                return sef.error(fn.character, ctxs)

            errs = jax.vmap(win_err)(wins)
            valid = g_start <= f_real - w
            total = total + jnp.sum(jnp.where(valid, errs, 0.0))
    return jax.lax.psum(total, axis)
