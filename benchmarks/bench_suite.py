"""Staged benchmark suite — the BASELINE.json configs + real-data stages.

Each stage prints one JSON line {"config", "metric", "value", "unit", ...}.
`python benchmarks/bench_suite.py [1 2 3 4 5 6 7]` (default: all).

Stages (BASELINE.json "configs" 1-5; 6-7 added):
  1 single-character position-GN IK, one frame (CPU-runnable reference)
  2 full-body LM with position+orientation+limit+pose-prior residuals
    (2b: batched at the driver shape, compacted tail refinement)
  3 batched marker tracking (the driver metric — same workload as bench.py)
  4 skinned-mesh shape+pose fitting (LBS + blendshapes, vertex residuals)
    (4b: batched, compacted)
  5 sequence calibration: shared scale + per-frame pose over long sequences
    ("5f" = full-body rig; "5=10000" = BASELINE 10k-frame scale)
  6 REAL data (CMU 02_01.c3d): per-frame scan latency, refine stage,
    batched-throughput mode — marker-error stats on measured positions
  7 rasterizer throughput (shadows + 2× supersampling) vs the reference's
    one published perf number (~45 fps on 8-thread CPU)
"""

from __future__ import annotations

import os as _os
import sys as _sys

_repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _repo not in _sys.path:  # runnable from any cwd without PYTHONPATH
    _sys.path.insert(0, _repo)

import dataclasses
import json
import sys
import time

import numpy as np


def _sync(out):
    """Force a REAL device round trip. Over the axon tunnel
    jax.block_until_ready can return before execution completes (measured:
    3 queued 300-ms solves "blocked" in 0.0 ms), so timings must end on a
    host transfer of a scalar derived from the result."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))
    return out


def _timeit(fn, *args, reps: int = 5):
    out = _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)  # in-order queue: one terminal sync covers every rep
    return (time.perf_counter() - t0) / reps, out


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def _roofline_frac(flops_per_unit: float, bytes_per_unit: float,
                   units_per_sec: float) -> dict:
    """min(MXU, HBM) bound at this arithmetic intensity — same peaks as
    bench.py's _roofline (v5e: 197 TFLOP/s bf16 MXU / 6 passes for
    f32-highest matmul precision = 32.8 TF/s effective; 819 GB/s HBM).
    flops/bytes are the IDEAL per-unit costs (no layout padding) so
    roofline_frac states how far the shipped program is from a perfect
    implementation, padding included in the gap."""
    peak_flops = 197e12 / 6.0
    peak_bw = 819e9
    bound = min(peak_flops / flops_per_unit, peak_bw / bytes_per_unit)
    return {
        "roofline_units_per_sec": round(bound, 0),
        "roofline_frac": round(units_per_sec / bound, 5),
        "arithmetic_intensity_flops_per_byte": round(
            flops_per_unit / bytes_per_unit, 1),
    }


def config1():
    """Single-frame position GN IK on the bundled test character."""
    import jax
    import jax.numpy as jnp

    from momentum_tpu.errors import PositionErrorFunction
    from momentum_tpu.solver import SkeletonSolverFunction, SolverOptions
    from momentum_tpu.solver.ik import solve_ik
    from momentum_tpu.testing.fixtures import create_test_character

    char = create_test_character(16)
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(-0.3, 0.3, char.num_model_parameters),
                     jnp.float32)
    targets = char.locators.world_positions(char.skeleton_states(gt))
    ef = PositionErrorFunction.create(
        np.asarray(char.locators.parent), np.asarray(char.locators.offset),
        np.asarray(targets))
    fn = SkeletonSolverFunction(char, (ef,))
    opts = SolverOptions(max_iterations=30)

    solve = jax.jit(lambda x0: solve_ik(fn, x0, None, opts))
    dt, res = _timeit(solve, jnp.zeros(char.num_model_parameters))
    _emit(config=1, metric="single_frame_gn_ik_latency", value=dt * 1e3,
          unit="ms", residual=float(jnp.sqrt(res.error)),
          converged=bool(res.converged))


def config2():
    """Full-body LM with position+orientation+limit+pose-prior residuals."""
    import jax
    import jax.numpy as jnp

    from momentum_tpu.errors import (
        LimitErrorFunction, OrientationErrorFunction, PosePriorErrorFunction,
        PositionErrorFunction,
    )
    from momentum_tpu.math import skel_state as ss
    from momentum_tpu.errors.pose_prior import Mppca
    from momentum_tpu.solver import SkeletonSolverFunction, SolverOptions
    from momentum_tpu.solver.ik import solve_ik
    from momentum_tpu.testing.fixtures import create_fullbody_character

    char = create_fullbody_character()
    p = char.num_model_parameters
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(-0.3, 0.3, p), jnp.float32)
    states = char.skeleton_states(gt)
    targets = char.locators.world_positions(states)
    _, q, _ = ss.split(states)
    pos = PositionErrorFunction.create(
        np.asarray(char.locators.parent), np.asarray(char.locators.offset),
        np.asarray(targets))
    ori = OrientationErrorFunction.create(
        np.arange(char.num_joints, dtype=np.int32), np.asarray(q))
    lim = LimitErrorFunction.create()
    # simple 2-mode pose prior around the rest pose
    mu = np.zeros((2, p), np.float32)
    w = [np.full((p, 4), 0.01, np.float32)] * 2
    prior = Mppca.from_components(
        pi=np.asarray([0.6, 0.4]), mu=mu, w_list=w,
        sigma2=np.asarray([1.0, 2.0]),
        names=char.parameter_transform.names)
    pp = PosePriorErrorFunction.create(
        prior, char.parameter_transform.names)
    fn = SkeletonSolverFunction(char, (pos, ori, lim, pp))
    opts = SolverOptions(max_iterations=20)
    solve = jax.jit(lambda x0: solve_ik(fn, x0, None, opts,
                                        method="levenberg_marquardt"))
    x0 = gt + 0.05 * jnp.asarray(rng.normal(0, 1, p), jnp.float32)
    dt, res = _timeit(solve, x0)
    _emit(config=2, metric="fullbody_lm_full_residual_latency", value=dt * 1e3,
          unit="ms", error=float(res.error))

    # batched variant (2b): the full residual stack at the driver metric's
    # workload shape — batch 2048, warm-started LM (tracking scenario,
    # marker_tracker.cpp:754), pose prior + limits contributing through the
    # normal-equation fast path. Convergence is measured against each
    # element's own 40-iteration optimum (the full-stack energy has a nonzero
    # floor from the prior, so an absolute 1e-5 energy bar is meaningless).
    import os

    b = int(os.environ.get("MOMENTUM_TPU_BENCH_BATCH", 2048))
    iters = int(os.environ.get("MOMENTUM_TPU_BENCH_FULLSTACK_ITERS", 3))
    method = os.environ.get("MOMENTUM_TPU_BENCH_FULLSTACK_METHOD",
                            "gauss_newton")
    # compacted tail refinement — same defaults as bench.py's full stack
    # (GN 2+1@K=1024; GN is memoryless so the refined elements reproduce the
    # uncompacted GN-(k+r) iterates exactly). "off" disables.
    fs_spec = os.environ.get("MOMENTUM_TPU_BENCH_FULLSTACK_REFINE", "2,1,1024")
    fs_refine = None
    if fs_spec.lower() not in ("off", "0", ""):
        fk_, fr_, fcap = (int(v) for v in fs_spec.split(","))
        fs_refine = (fk_, fr_, fcap) if fcap > 0 else None
    import dataclasses as dc

    gt_b = jnp.asarray(rng.uniform(-0.3, 0.3, (b, p)), jnp.float32)
    states_b = jax.vmap(char.skeleton_states)(gt_b)
    tgt_b = jax.vmap(char.locators.world_positions)(states_b)
    from momentum_tpu.math import skel_state as _ss

    _, q_b, _ = _ss.split(states_b)
    pos_b = dc.replace(pos, target=tgt_b)
    ori_b = dc.replace(ori, target=q_b)
    fn_b = SkeletonSolverFunction(char, (pos_b, ori_b, lim, pp),
                                  prefer_fused=True)
    # GN matches the reference's per-frame tracking solver choice
    # (trackPosesPerframe uses GaussNewtonSolverQRT, marker_tracker.cpp:913)
    opts_b = SolverOptions(max_iterations=iters, regularization=1e-5,
                           energy_from_residual=True)

    def _stage_2b(tg, qt, x, it):
        fn_s = SkeletonSolverFunction(
            char, (dc.replace(pos, target=tg), dc.replace(ori, target=qt),
                   lim, pp), prefer_fused=True)
        return solve_ik(fn_s, x, None,
                        dc.replace(opts_b, max_iterations=it), method=method)

    def _pos_energy_2b(tg, x):
        fn_pos = SkeletonSolverFunction(char, (dc.replace(pos, target=tg),))
        return fn_pos.error(x)

    if fs_refine is None:
        def _solve_b(x0):
            r = solve_ik(fn_b, x0, None, opts_b, method=method)
            return r.params, r.error
    else:
        # refinement ranked by MARKER energy (zero floor → a direct
        # unconvergedness proxy; the full-stack energy's prior floor varies
        # per pose and mis-ranks the tail — measured conv 0.04 vs 1.00)
        fk_, fr_, fcap = fs_refine

        def _solve_b(x0):
            r1 = _stage_2b(tgt_b, q_b, x0, fk_)
            e1 = _pos_energy_2b(tgt_b, r1.params)
            key = jnp.nan_to_num(e1, nan=jnp.float32(3e38),
                                 posinf=jnp.float32(3e38))
            _, idx = jax.lax.top_k(key, fcap)
            r2 = _stage_2b(tgt_b[idx], q_b[idx], r1.params[idx], fr_)
            return (r1.params.at[idx].set(r2.params),
                    r1.error.at[idx].set(r2.error))

    solve_b = jax.jit(_solve_b)
    x0_b = gt_b + 0.05 * jnp.asarray(rng.normal(0, 1, (b, p)), jnp.float32)
    dt_b, (params_b, err_b) = _timeit(solve_b, x0_b)
    # per-element converged optimum (40 LM iterations)
    opts_ref = dc.replace(opts_b, max_iterations=40)
    res_ref = jax.jit(lambda x0: solve_ik(fn_b, x0, None, opts_ref,
                                          method="levenberg_marquardt"))(x0_b)
    excess = err_b - res_ref.error
    pos_e = jax.jit(_pos_energy_2b)(tgt_b, params_b)
    _emit(config=2, metric="fullbody_full_residual_batched",
          value=b / dt_b, unit="solves/s", batch=b, iterations=iters,
          method=method, refine=fs_spec if fs_refine else "off",
          median_error=float(jnp.median(err_b)),
          marker_conv_at_1e5=float(jnp.mean(pos_e < 1e-5)),
          conv_at_1e5=float(jnp.mean(excess < 1e-5)),
          median_excess_vs_40it=float(jnp.median(excess)))


def config3():
    """The driver metric — delegate to bench.py's workload."""
    import subprocess

    out = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                         text=True, cwd=__import__("os").path.dirname(
                             __import__("os").path.dirname(
                                 __import__("os").path.abspath(__file__))))
    line = out.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    rec["config"] = 3
    print(json.dumps(rec), flush=True)


def config4():
    """Skinned-mesh shape+pose fitting: vertex residuals over LBS+blendshapes."""
    import jax
    import jax.numpy as jnp

    from momentum_tpu.character.utility import add_blend_shape_parameters
    from momentum_tpu.character.blend_shape import BlendShape
    from momentum_tpu.errors.vertex import VertexPositionErrorFunction
    from momentum_tpu.solver import SkeletonSolverFunction, SolverOptions
    from momentum_tpu.solver.ik import solve_ik
    from momentum_tpu.testing.fixtures import create_fullbody_character

    char = create_fullbody_character()
    rng = np.random.default_rng(0)
    v = char.mesh.num_vertices
    k = 8
    bs = BlendShape(
        base_shape=char.mesh.vertices,
        shape_vectors=jnp.asarray(
            rng.normal(0, 0.01, (k, v, 3)).astype(np.float32)))
    char = add_blend_shape_parameters(char, bs)
    p = char.num_model_parameters
    gt = jnp.asarray(np.concatenate([
        rng.uniform(-0.2, 0.2, p - k), rng.uniform(-1, 1, k)]), jnp.float32)
    # posed ground-truth vertices as targets
    from momentum_tpu.solver.skeleton_solver_function import (
        SkeletonSolverFunction as SSF,
    )
    vid = np.arange(0, v, max(v // 256, 1), dtype=np.int32)
    ef0 = VertexPositionErrorFunction.create(vid, np.zeros((len(vid), 3)))
    fn0 = SSF(char, (ef0,))
    ctx = fn0.context(gt)
    targets = np.asarray(ctx.mesh_vertices)[vid]
    ef = VertexPositionErrorFunction.create(vid, targets)
    fn = SkeletonSolverFunction(char, (ef,))
    opts = SolverOptions(max_iterations=20)
    solve = jax.jit(lambda x0: solve_ik(fn, x0, None, opts,
                                        method="levenberg_marquardt"))
    dt, res = _timeit(solve, jnp.zeros(p))
    _emit(config=4, metric="shape_pose_vertex_fit_latency", value=dt * 1e3,
          unit="ms", error=float(res.error),
          vertices=int(len(vid)), blend_shapes=k)

    # 4b: BATCHED mesh fitting — where the analytic LBS vertex Jacobian
    # (skinning-walk + blendshape columns, solver/analytic_jacobian.py)
    # pays off; single-solve latency above is tunnel-dispatch bound.
    b = 256
    rng_b = np.random.default_rng(1)
    gt_b = jnp.asarray(np.concatenate([
        rng_b.uniform(-0.2, 0.2, (b, p - k)),
        rng_b.uniform(-1, 1, (b, k))], axis=-1), jnp.float32)
    ctx_b = jax.vmap(fn0.context)(gt_b)
    targets_b = jnp.take(ctx_b.mesh_vertices, jnp.asarray(vid), axis=-2)
    ef_b = dataclasses.replace(ef, target=targets_b)
    fn_b = SkeletonSolverFunction(char, (ef_b,))
    x0_b = gt_b + 0.05 * jnp.asarray(
        rng_b.normal(0, 1, (b, p)), jnp.float32)
    opts_b = SolverOptions(max_iterations=6, regularization=1e-5,
                           energy_from_residual=True)
    # compacted tail refinement (GN 4+2@K=64 default — same economics as the
    # driver metric; GN is memoryless so refined elements reproduce GN-6
    # exactly). MOMENTUM_TPU_BENCH_4B_REFINE="k,r,K" / "off".
    import os as _os

    spec_4b = _os.environ.get("MOMENTUM_TPU_BENCH_4B_REFINE", "4,2,64")
    refine_4b = None
    if spec_4b.lower() not in ("off", "0", ""):
        k4, r4, c4 = (int(v) for v in spec_4b.split(","))
        refine_4b = (k4, r4, c4) if c4 > 0 else None

    def _stage_4b(tg, x, it, _lam0):
        fn_s = SkeletonSolverFunction(
            char, (dataclasses.replace(ef, target=tg),))
        return solve_ik(fn_s, x, None,
                        dataclasses.replace(opts_b, max_iterations=it),
                        method="gauss_newton")

    from momentum_tpu.solver import solve_compacted

    if refine_4b is None:
        solve_b = jax.jit(lambda x0: solve_ik(fn_b, x0, None, opts_b,
                                              method="gauss_newton"))
    else:
        k4, r4, c4 = refine_4b
        solve_b = jax.jit(lambda x0: solve_compacted(
            _stage_4b, targets_b, x0, capacity=c4, k_full=k4, r_refine=r4))
    dt_b, res_b = _timeit(solve_b, x0_b, reps=3)
    err_b = jnp.sum((res_b.params - gt_b) ** 2, axis=-1)
    # analytic roofline for the vertex-fit shape (VERDICT r4 #4): per GN
    # iteration per element — K_infl masked point-Jacobian accumulations
    # over the (C, 3, nJ·7) joint-space block (skinned_point_jacobian's
    # influence loop), the dense PT chain matmul, JᵀJ/Jᵀr, and the damped
    # factor+solve. Bytes: the (C, 3, nJ·7) accumulator r/w per influence
    # (the dominant traffic), J in model space, JᵀJ ~3 passes.
    c_rows = 3 * len(vid)
    nj7 = char.skeleton.num_joints * 7
    k_infl = int(char.skin_weights.index.shape[1])
    iters_eq = (6.0 if refine_4b is None
                else refine_4b[0] + refine_4b[1] * refine_4b[2] / b)
    fl_it = (6.0 * k_infl * c_rows * nj7          # influence-loop assembly
             + 2.0 * c_rows * nj7 * p             # PT chain matmul
             + 2.0 * c_rows * p * p + 2 * c_rows * p   # JᵀJ + Jᵀr
             + p ** 3 / 3 + 4.0 * p * p)          # factor + substitutions
    by_it = (2.0 * k_infl * c_rows * nj7 * 4      # accumulator r/w
             + 2.0 * c_rows * p * 4               # J write+read
             + 3.0 * p * p * 4)                   # JᵀJ passes
    roof_4b = _roofline_frac(fl_it * iters_eq, by_it * iters_eq, b / dt_b)
    _emit(config=4, metric="shape_pose_vertex_fit_batched", value=b / dt_b,
          unit="solves/s", batch=b, vertices=int(len(vid)), blend_shapes=k,
          refine=spec_4b if refine_4b else "off",
          median_param_sq_err=float(jnp.median(err_b)), **roof_4b)
    # A/B: same workload with the AD Jacobian (shows the analytic LBS
    # vertex-walk gain)
    fn_ad = SkeletonSolverFunction(char, (ef_b,), force_ad=True)
    solve_ad = jax.jit(lambda x0: solve_ik(fn_ad, x0, None, opts_b,
                                           method="gauss_newton"))
    dt_ad, _ = _timeit(solve_ad, x0_b, reps=3)
    _emit(config=4, metric="shape_pose_vertex_fit_batched_ad", value=b / dt_ad,
          unit="solves/s", batch=b, speedup_analytic=dt_ad / dt_b)


def config5(frames: int = 1024, fullbody: bool = False):
    """Sequence calibration: universal scale + per-frame pose, banded solve.

    Frames/sec on the block-tridiagonal sequence solver (single device; the
    sharded SPIKE variant covers the multi-chip case in dryrun_multichip).
    fullbody=True (CLI: "5f[=frames]") runs the 52-joint humanoid rig."""
    import jax
    import jax.numpy as jnp

    from momentum_tpu.errors import PositionErrorFunction
    from momentum_tpu.sequence.errors import (
        ModelParametersSequenceErrorFunction,
    )
    from momentum_tpu.sequence.solver import solve_sequence
    from momentum_tpu.sequence.solver_function import (
        SequenceSolverFunction, stack_frames,
    )
    from momentum_tpu.solver import SolverOptions
    from momentum_tpu.testing.fixtures import (
        create_fullbody_character, create_test_character)

    char = create_fullbody_character() if fullbody else create_test_character(16)
    p = char.num_model_parameters
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(-0.2, 0.2, (frames, p)), jnp.float32)
    states = jax.vmap(char.skeleton_states)(gt)
    targets = jax.vmap(char.locators.world_positions)(states)
    ef0 = PositionErrorFunction.create(
        np.asarray(char.locators.parent), np.asarray(char.locators.offset),
        np.zeros((char.locators.num_locators, 3)))
    stacked = jax.vmap(
        lambda t: dataclasses.replace(ef0, target=t))(targets)
    smooth = ModelParametersSequenceErrorFunction.create(p, weight=0.1)
    universal = np.zeros(p, bool)
    if "scaling" in char.parameter_transform.parameter_sets:
        universal[list(char.parameter_transform.parameter_sets["scaling"])] = True
    fn = SequenceSolverFunction.create(
        char, frames, universal=universal, per_frame_errors=(stacked,),
        sequence_errors=(smooth,))
    pf0, u0 = fn.split(jnp.zeros((frames, p)))
    opts = SolverOptions(max_iterations=8)

    solve = jax.jit(lambda pf, u: solve_sequence(fn, pf, u, opts))
    dt, res = _timeit(solve, pf0, u0, reps=3)
    # analytic roofline for the banded sequence shape (VERDICT r4 #4): per
    # frame per GN iteration — per-frame Jacobian/JᵀJ assembly, the
    # block-tridiagonal factor (diag Cholesky p³/3 + off-diag triangular
    # solve p³ + Schur update 2p³ — SPIKE adds only the small interface
    # system), substitutions. Bytes: the (F, p, p) diag+off band blocks at
    # ~4 passes (assemble, factor r/w, solve).
    p_f = int(fn.num_per_frame)
    r_rows = 3 * char.locators.num_locators
    fl_fr = (2.0 * r_rows * p_f * p_f          # JᵀJ
             + (10.0 / 3.0) * p_f ** 3          # factor + off-diag + Schur
             + 6.0 * p_f * p_f)                 # substitutions
    by_fr = 2.0 * p_f * p_f * 4 * 4             # diag+off blocks, ~4 passes
    roof_5 = _roofline_frac(fl_fr * opts.max_iterations,
                            by_fr * opts.max_iterations, frames / dt)
    _emit(config=5, metric="sequence_calibration_frames_per_sec",
          value=frames / dt, unit="frames/s", frames=frames,
          fullbody=fullbody, error=float(res.error), **roof_5)


def config6():
    """Real-data tracking: the reference's CMU walking take 02_01.c3d (343
    frames × 41 Vicon markers, measured positions — genuine noise, occlusion
    and model mismatch; NO inverse crime). Calibrates the built-in CMU
    humanoid once, then times warm-started per-frame tracking over the whole
    clip. Reports frames/s + marker-residual statistics."""
    import os
    import time

    import jax
    import jax.numpy as jnp

    c3d = "/root/reference/pymomentum/test/resources/02_01.c3d"
    if not os.path.exists(c3d):
        print("config 6 skipped: reference C3D unavailable")
        return
    from momentum_tpu.io.markers import load_c3d
    from momentum_tpu.tracking import (
        CalibrationConfig, MarkerSequence, TrackingConfig, calibrate_model,
        track_poses_per_frame)
    from momentum_tpu.tracking.cmu import create_cmu_character
    from momentum_tpu.tracking.tracker import _match_locators

    raw = load_c3d(c3d)
    char = create_cmu_character()
    seq = MarkerSequence(positions=jnp.asarray(raw.positions),
                         occluded=jnp.asarray(raw.occluded),
                         names=tuple(raw.names))
    p = char.num_model_parameters
    seed = jnp.zeros(p).at[:3].set(jnp.mean(seq.positions[0], axis=0))
    cfg = CalibrationConfig(calib_frames=10, major_iter=2, max_iter=25,
                            regularization=1e-3,
                            method="levenberg_marquardt")
    identity, _ = calibrate_model(char, seq, cfg, initial=seed)
    cfg_loc = dataclasses.replace(cfg, locators_only=True, major_iter=1)
    _, _, char2 = calibrate_model(char, seq, cfg_loc, initial=identity)

    tcfg = TrackingConfig(max_iter=15, regularization=1e-3,
                          method="levenberg_marquardt")
    tr = track_poses_per_frame(char2, seq, tcfg, initial=identity)  # compile
    float(jnp.sum(tr.motion))  # real host round trip (see _sync)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        tr = track_poses_per_frame(char2, seq, tcfg, initial=identity)
    float(jnp.sum(tr.motion))
    dt = (time.perf_counter() - t0) / reps

    li, mi = _match_locators(char2, seq)

    def _err_mm(motion):
        states = jax.vmap(char2.skeleton_states)(motion)
        wp = jax.vmap(char2.locators.world_positions)(states)
        d = np.linalg.norm(np.asarray(wp[:, li])
                           - np.asarray(seq.positions[:, mi]), axis=-1)
        occ = np.asarray(seq.occluded[:, mi])
        return d[~occ]

    d = _err_mm(tr.motion)
    _emit(config=6, metric="real_clip_tracking_frames_per_sec",
          value=seq.positions.shape[0] / dt, unit="frames/s",
          frames=int(seq.positions.shape[0]),
          median_marker_err_mm=float(np.median(d)),
          p90_marker_err_mm=float(np.percentile(d, 90)))

    # 6b: the refine stage (refineMotion, process_markers.cpp:292→359) on
    # the per-frame track — whole-sequence smoothed solve, measured data
    from momentum_tpu.tracking import refine_motion
    from momentum_tpu.tracking.config import RefineConfig

    rcfg = RefineConfig(max_iter=10, regularization=1e-3, smoothing=1e-4,
                        method="levenberg_marquardt")
    refined, _ = refine_motion(char2, seq, tr.motion, rcfg)  # compile
    float(jnp.sum(refined.motion))
    t0 = time.perf_counter()
    for _ in range(reps):
        refined, _ = refine_motion(char2, seq, tr.motion, rcfg)
    float(jnp.sum(refined.motion))
    dt_r = (time.perf_counter() - t0) / reps
    dr = _err_mm(refined.motion)
    _emit(config=6, metric="real_clip_refine_frames_per_sec",
          value=seq.positions.shape[0] / dt_r, unit="frames/s",
          median_marker_err_mm=float(np.median(dr)),
          p90_marker_err_mm=float(np.percentile(dr, 90)),
          p90_improvement_mm=float(np.percentile(d, 90)
                                   - np.percentile(dr, 90)))

    # 6c: THROUGHPUT mode on the same measured clip — hierarchical tracking:
    # a warm-started scan over every 8th frame, linear interpolation of the
    # keyframe solutions, then ALL frames refined independently in one
    # batch (compacted tail). Cold batched starts are a measured dead end
    # on this clip (centroid-root init: 32.7 mm median at 10+5 iterations,
    # 9.2 mm at 20+10 — a walking pose is too far from rest for any
    # practical iteration budget); the keyframe chain restores the scan's
    # warm-start economics at ~stride× less sequential work. The whole call
    # is jitted: eager dispatch over the tunnel costs ~25-30 ms/op
    # (measured 9.6 frames/s).
    from momentum_tpu.tracking import track_poses_hierarchical

    f_cnt = int(seq.positions.shape[0])
    bcfg = dataclasses.replace(tcfg, refine=(10, 5, 64))
    names = seq.names

    @jax.jit
    def _track_hier(pos, occ):
        sq = MarkerSequence(positions=pos, occluded=occ, names=names)
        return track_poses_hierarchical(char2, sq, bcfg, initial=identity,
                                        stride=8).motion

    motion_b = _track_hier(seq.positions, seq.occluded)  # compile
    float(jnp.sum(motion_b))
    t0 = time.perf_counter()
    for _ in range(reps):
        motion_b = _track_hier(seq.positions, seq.occluded)
    float(jnp.sum(motion_b))
    dt_b = (time.perf_counter() - t0) / reps
    db = _err_mm(motion_b)
    _emit(config=6, metric="real_clip_batched_tracking_frames_per_sec",
          value=f_cnt / dt_b, unit="frames/s", mode="hierarchical stride=8",
          median_marker_err_mm=float(np.median(db)),
          p90_marker_err_mm=float(np.percentile(db, 90)))


def config7(frames: int = 32):
    """Rasterizer throughput vs the reference's ONE published perf number.

    The only performance figure the reference publishes anywhere is its
    software rasterizer: ~45 fps rendering a 675-frame clip with shadows +
    2× supersampling on an 8-thread CPU (BASELINE.md; website
    docs_python/02_examples/02_visualization_pymomentum_rasterizer.md:371).
    Same recipe here: posed full-body skinned mesh, Lambert + shadow-mapped
    lighting, rendered at 2× (1280×960) and box-filtered to 640×480 —
    frames batched through vmap on the device.
    """
    import jax
    import jax.numpy as jnp

    from momentum_tpu.character.skinning import skin_points
    from momentum_tpu.rasterizer import render_mesh_shadowed
    from momentum_tpu.rasterizer.utils import create_camera_for_body
    from momentum_tpu.testing.fixtures import create_fullbody_character

    char = create_fullbody_character().with_inverse_bind_pose()
    p = char.num_model_parameters
    rng = np.random.default_rng(0)
    # smooth motion: random walk in pose space (what a real clip looks like)
    steps = 0.02 * rng.normal(0, 1, (frames, p)).astype(np.float32)
    motion = jnp.asarray(np.cumsum(steps, axis=0))
    states = jax.vmap(char.skeleton_states)(motion)
    cam = create_camera_for_body(char, states, 960, 1280)
    w, h, ss = 640, 480, 2

    @jax.jit
    def render_clip(motion):
        def frame(theta):
            st = char.skeleton_states(theta)
            verts = skin_points(char.skin_weights, st,
                                char.inverse_bind_pose, char.mesh.vertices)
            out = render_mesh_shadowed(cam, verts, char.mesh.faces,
                                       w * ss, h * ss)
            color = out["color"].reshape(h, ss, w, ss, 3).mean(axis=(1, 3))
            return color

        return jax.lax.map(frame, motion)

    dt, imgs = _timeit(render_clip, motion, reps=3)
    _emit(config=7, metric="rasterizer_shadowed_2xss_fps",
          value=frames / dt, unit="frames/s", frames=frames,
          resolution="640x480@2xSS",
          vs_reference_cpu_fps=round(frames / dt / 45.0, 2),
          mean_coverage=float(jnp.mean(imgs > 0)))


def main():
    # args: config numbers; "5=10000" parameterizes config 5's frame count
    # (BASELINE config 5 is 10k frames)
    stages = sys.argv[1:] or ["1", "2", "3", "4", "5", "6", "7"]
    for s in stages:
        kw = {}
        if s.startswith("5f"):
            s = "5" + s[2:]
            kw = {"fullbody": True}
        if "=" in s:
            num, arg = s.split("=", 1)
            globals()[f"config{num}"](int(arg), **kw)
        else:
            globals()[f"config{s}"](**kw)


if __name__ == "__main__":
    main()
