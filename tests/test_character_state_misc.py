"""CharacterState, UnionErrorFunction, GradientDescentSolver,
texture classification (reference: character_state.h, diff_ik/union_error_
function.h, solver/gradient_descent_solver.h, character/texture_
classification.h)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from momentum_tpu.character.character_state import character_state
from momentum_tpu.testing.fixtures import create_test_character


def test_character_state_snapshot():
    char = create_test_character(4)
    theta = jnp.zeros(char.num_model_parameters).at[0].set(0.25)
    st = character_state(char, theta)
    assert st.skeleton_state.shape == (4, 8)
    assert st.joint_parameters.shape == (28,)
    assert st.locator_positions.shape == (char.locators.num_locators, 3)
    assert st.mesh_vertices.shape == char.mesh.vertices.shape
    assert st.collision_origin.shape[0] == char.collision.num_primitives
    # consistency with the underlying pipelines
    np.testing.assert_allclose(
        np.asarray(st.skeleton_state),
        np.asarray(char.skeleton_states(theta)), atol=1e-6)
    # vmap-able
    import jax
    batch = jax.vmap(lambda t: character_state(char, t))(
        jnp.zeros((3, char.num_model_parameters)))
    assert batch.skeleton_state.shape == (3, 4, 8)


def test_union_error_function():
    from momentum_tpu.errors import PositionErrorFunction, UnionErrorFunction
    from momentum_tpu.solver import SkeletonSolverFunction

    char = create_test_character(4)
    ef1 = PositionErrorFunction.create(
        np.asarray(char.locators.parent), np.asarray(char.locators.offset),
        np.zeros((char.locators.num_locators, 3)))
    ef2 = PositionErrorFunction.create(
        np.asarray(char.locators.parent), np.asarray(char.locators.offset),
        np.ones((char.locators.num_locators, 3)))
    union = UnionErrorFunction(children=(ef1, ef2))
    fn_u = SkeletonSolverFunction(char, (union,))
    fn_2 = SkeletonSolverFunction(char, (ef1, ef2))
    theta = jnp.zeros(char.num_model_parameters).at[1].set(0.1)
    np.testing.assert_allclose(float(fn_u.error(theta)),
                               float(fn_2.error(theta)), rtol=1e-6)
    ru = np.asarray(fn_u.residual(theta))
    r2 = np.asarray(fn_2.residual(theta))
    np.testing.assert_allclose(np.sort(np.abs(ru)), np.sort(np.abs(r2)),
                               atol=1e-6)


def test_gradient_descent_solver_decreases_energy():
    from momentum_tpu.errors import PositionErrorFunction
    from momentum_tpu.solver import SkeletonSolverFunction
    from momentum_tpu.solver.solvers import GradientDescentSolver

    char = create_test_character(4)
    gt = jnp.zeros(char.num_model_parameters).at[0].set(0.4)
    targets = char.locators.world_positions(char.skeleton_states(gt))
    ef = PositionErrorFunction.create(
        np.asarray(char.locators.parent), np.asarray(char.locators.offset),
        np.asarray(targets))
    fn = SkeletonSolverFunction(char, (ef,))
    from momentum_tpu.solver.gauss_newton import SolverOptions
    sol = GradientDescentSolver(fn, SolverOptions(max_iterations=100),
                                learning_rate=0.005)
    x0 = jnp.zeros(char.num_model_parameters)
    out = sol.solve(x0)
    assert float(fn.error(out)) < 0.5 * float(fn.error(x0))


def _uv_mesh():
    # unit quad split into 2 triangles, uv == xy
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                       np.float32)
    faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    uv = verts[:, :2].copy()
    char_mesh = dataclasses.make_dataclass(
        "M", ["vertices", "faces", "texcoords", "texcoord_faces"])(
        verts, faces, uv, None)
    return char_mesh


def test_classify_triangles_by_texture():
    from momentum_tpu.character.texture_classification import (
        classify_triangles_by_texture,
    )

    # two disjoint triangles: one with UVs in the left (red) half, one in
    # the right (green) half
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                        [2, 0, 0], [3, 0, 0], [2, 1, 0]], np.float32)
    faces = np.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
    uv = np.asarray([[0.1, 0.1], [0.3, 0.1], [0.2, 0.3],
                     [0.7, 0.1], [0.9, 0.1], [0.8, 0.3]], np.float32)
    mesh = dataclasses.make_dataclass(
        "M", ["vertices", "faces", "texcoords", "texcoord_faces"])(
        verts, faces, uv, None)
    tex = np.zeros((8, 16, 3), np.uint8)
    tex[:, :8] = [255, 0, 0]
    tex[:, 8:] = [0, 255, 0]
    regions = np.asarray([[255, 0, 0], [0, 255, 0]], np.uint8)
    out = classify_triangles_by_texture(mesh, tex, regions, threshold=0.9)
    assert list(out[0]) == [0]   # red region = left triangle
    assert list(out[1]) == [1]   # green region = right triangle
    # threshold 0 (any sample) gives the same here
    out0 = classify_triangles_by_texture(mesh, tex, regions, threshold=0.0)
    assert list(out0[0]) == [0] and list(out0[1]) == [1]


def test_split_mesh_by_texture_region():
    from momentum_tpu.character.texture_classification import (
        split_mesh_by_texture_region,
    )

    mesh = _uv_mesh()
    # left half (u < 0.5) is the kept region
    tex = np.zeros((8, 16, 3), np.uint8)
    tex[:, :8] = [255, 255, 255]
    regions = np.asarray([[255, 255, 255]], np.uint8)
    verts, faces = split_mesh_by_texture_region(mesh, tex, regions,
                                                num_binary_search_steps=12)
    assert faces.shape[0] >= 2  # boundary triangles were split
    # every kept vertex is (approximately) in the left half
    assert verts[:, 0].max() <= 0.6
    assert verts[:, 0].min() >= -1e-6
    # the kept area is about half the quad
    area = 0.0
    for f in faces:
        a, b, c = verts[f]
        area += 0.5 * abs(np.cross(b[:2] - a[:2], c[:2] - a[:2]))
    assert 0.3 < area < 0.7


def test_skinned_locator_triangle_error():
    import jax
    from momentum_tpu.errors.skinned_locator import (
        SkinnedLocatorTriangleErrorFunction,
    )
    from momentum_tpu.solver import SkeletonSolverFunction

    char = create_test_character(4).with_inverse_bind_pose()
    mesh = char.mesh
    f0 = np.asarray(mesh.faces)[0]
    # locator skinned to joint 0, rest position = the face centroid
    centroid = np.asarray(mesh.vertices)[f0].mean(0)
    ef = SkinnedLocatorTriangleErrorFunction.create(
        parents=np.asarray([[0, 0]], np.int32),
        skin_weights=np.asarray([[1.0, 0.0]], np.float32),
        rest_position=centroid[None],
        tri_indices=f0[None],
        bary=np.asarray([[1 / 3, 1 / 3, 1 / 3]], np.float32),
    )
    fn = SkeletonSolverFunction(char, (ef,))
    theta = jnp.zeros(char.num_model_parameters)
    # at rest, locator == barycentric target → zero error
    assert float(fn.error(theta)) < 1e-8
    # posed: still near zero because both sides move with the mesh/skeleton
    theta2 = theta.at[0].set(0.3)
    assert float(fn.error(theta2)) < 1e-6
    # depth shifts the target off the surface → nonzero error
    import dataclasses as dc
    ef_d = dc.replace(ef, depth=jnp.asarray([0.5]))
    fn_d = SkeletonSolverFunction(char, (ef_d,))
    assert float(fn_d.error(theta)) > 1e-3
    # gradient finite
    g = jax.grad(fn_d.error)(theta)
    assert np.isfinite(np.asarray(g)).all()


def test_skinned_locator_triangle_sliding():
    from momentum_tpu.errors.skinned_locator import (
        SkinnedLocatorTriangleErrorFunction,
    )
    from momentum_tpu.solver import SkeletonSolverFunction

    char = create_test_character(4).with_inverse_bind_pose()
    mesh = char.mesh
    faces = np.asarray(mesh.faces)
    f0 = faces[0]
    centroid = np.asarray(mesh.vertices)[f0].mean(0)
    # candidates include the true triangle and a far one; sliding must pick
    # the near one and give ~zero error
    ef = SkinnedLocatorTriangleErrorFunction.create(
        parents=np.asarray([[0, 0]], np.int32),
        skin_weights=np.asarray([[1.0, 0.0]], np.float32),
        rest_position=centroid[None],
        tri_indices=f0[None],
        bary=np.asarray([[1 / 3, 1 / 3, 1 / 3]], np.float32),
        candidates=np.asarray([[0, len(faces) - 1]], np.int32),
        faces=faces,
    )
    fn = SkeletonSolverFunction(char, (ef,))
    assert float(fn.error(jnp.zeros(char.num_model_parameters))) < 1e-6
